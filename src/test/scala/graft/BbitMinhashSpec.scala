package graft

import org.apache.spark.sql.functions._

import graft.functions.Hashing
import graft.operators.DedupOps

/** Pins for `dedup_bbit_minhash`: the b-bit lane matches agree with a
  * driver-side fold over the gated signature relation, dominate the
  * full-lane matches (a 64-bit match implies a b-bit match), and an
  * identical-text pair estimates exactly 1.0 — the compression never
  * splits a true duplicate. */
class BbitMinhashSpec extends SparkSpec {

  private lazy val rows =
    SparkEntry.queries("dedup_bbit_minhash")(spark, Sf).collect()

  test("b-bit matches equal a driver-side fold of the signatures") {
    val sigs = SparkEntry.queries("dedup_minhash_sig")(spark, Sf)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (0 until Hashing.K).map(i => r.getAs[Long](s"mh$i")).toArray)
      .toMap
    val mod = 1L << DedupOps.BbitBits
    rows.foreach { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      val want = (0 until Hashing.K)
        .count(i => sigs(a)(i) % mod == sigs(b)(i) % mod).toLong
      assert(r.getAs[Long]("n_match_bbit") == want, s"pair ($a,$b)")
      val c = want.toDouble / Hashing.K.toDouble
      val rr = 1.0 / mod
      assert(r.getAs[Double]("est_bbit") == (c - rr) / (1.0 - rr))
    }
  }

  test("a full-lane match implies a b-bit match on every pair") {
    val full = SparkEntry.queries("dedup_minhash_est")(spark, Sf)
      .select("doc_a", "doc_b", "n_match_lanes").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val key = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      assert(r.getAs[Long]("n_match_bbit") >= full(key),
        s"b-bit truncation can only ADD collisions: $key")
    }
  }

  test("a planted exact-duplicate pair estimates exactly 1.0") {
    import spark.implicits._
    val twin = "the quick brown fox jumps over the lazy dog tonight"
    val docs = Seq((1L, twin), (2L, twin),
      (3L, "completely different words in every single position here"))
      .map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
    val dir = tmpDir("bbit-planted")
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val dupes = DedupOps.dedupBbitMinhash(spark, dir).collect()
    assert(dupes.exists(r => r.getAs[Long]("doc_a") == 1L &&
      r.getAs[Long]("doc_b") == 2L))
    dupes.filter(_.getAs[Double]("jaccard") == 1.0).foreach { r =>
      assert(r.getAs[Long]("n_match_bbit") == Hashing.K.toLong)
      assert(r.getAs[Double]("est_bbit") == 1.0)
    }
  }
}
