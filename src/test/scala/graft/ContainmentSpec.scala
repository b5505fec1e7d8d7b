package graft

import org.apache.spark.sql.functions._

import graft.operators.DedupOps

/** `dedup_containment` — asymmetric near-dup by Broder containment.
  * The planted shape is the one Jaccard-based dedup structurally
  * misses: a short document pasted verbatim inside a much longer
  * host. Its Jaccard is |A|/|B| → small, so no LSH band fires — the
  * CDC shared-chunk generator must surface the pair, and the exact
  * shingle verify must label it `a_in_b`.
  */
class ContainmentSpec extends SparkSpec {

  import spark.implicits._

  // a distinctive ~120-token passage; tokens unique to the passage so
  // the only shingle overlap with the host is the pasted copy itself
  private val passage = (1 to 120).map(i => s"pasted$i").mkString(" ")
  private val junk = (n: Int, tag: String) =>
    (1 to n).map(i => s"$tag$i").mkString(" ")

  private lazy val fixtureDir: String = {
    val dir = tmpDir("containment")
    val small = passage
    val big = junk(360, "pre") + " " + passage + " " + junk(360, "post")
    val other = junk(200, "other")
    Seq((1L, small), (2L, big), (3L, other))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("a small-in-big paste is invisible to LSH but surfaced by the " +
      "CDC generator and labeled a_in_b") {
    val lsh = DedupOps.lshCandidatePairs(spark, fixtureDir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(!lsh.contains((1L, 2L)),
      "fixture regressed: the paste pair fired an LSH band, so this " +
        "test no longer demonstrates the containment blind spot " +
        "(J = |A|/|B| is ~0.14 here; re-tune the junk sizes)")
    val out = SparkEntry.queries("dedup_containment")(spark, fixtureDir)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
        -> ((r.getAs[Double]("contain_a"), r.getAs[Double]("contain_b"),
          r.getAs[String]("verdict")))).toMap
    val pair = out.get((1L, 2L))
    assert(pair.isDefined,
      "the pasted pair never reached the containment verifier — the " +
        "CDC shared-chunk generator lost its union slot")
    val (ca, cb, verdict) = pair.get
    assert(verdict == "a_in_b", s"expected a_in_b, got $verdict")
    assert(ca >= 0.9, s"contain_a should be ~1 for a verbatim paste: $ca")
    assert(cb < 0.5, s"contain_b must stay low (host is 7x larger): $cb")
  }

  test("verdict thresholds are the exact integer cross-multiplication " +
      "of the emitted counts") {
    val rows = SparkEntry.queries("dedup_containment")(spark, fixtureDir)
      .select("n_inter", "n_a", "n_b", "verdict")
      .as[(Long, Long, Long, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (i, na, nb, v) =>
      val aIn = i * DedupOps.ContainDen >= na * DedupOps.ContainNum
      val bIn = i * DedupOps.ContainDen >= nb * DedupOps.ContainNum
      val want = if (aIn && bIn) "mutual" else if (aIn) "a_in_b"
        else if (bIn) "b_in_a" else "partial"
      assert(v == want, s"verdict $v != $want for ($i, $na, $nb)")
    }
  }

  test("mutual near-dups (the symmetric LSH class) verify as mutual") {
    val dir = tmpDir("containment-mutual")
    val a = (1 to 100).map(i => s"tok$i").mkString(" ")
    val b = a.replace("tok50", "tokX") // 1-token edit: J ~ 0.94
    Seq((1L, a), (2L, b))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("dedup_containment")(spark, dir)
      .filter(col("doc_a") === 1L && col("doc_b") === 2L)
      .select("verdict").as[String].collect()
    assert(out.toSeq == Seq("mutual"))
  }
}
