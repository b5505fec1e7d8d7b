package graft

import graft.operators.TextOps

/** Pins for `tf_oov_burst`: a driver-side exact fold at sf0.001 and
  * a planted three-batch stream hitting the no-new (rate 0), the
  * rate-doubling burst, and the 0 -> positive "infinite increase"
  * arms, plus the batch-0 no-baseline pin.
  */
class OovBurstSpec extends SparkSpec {

  test("matches a driver-side exact fold at sf0.001") {
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0) / TextOps.OovBatchDocs,
        r.getString(1).split(" ").filter(_.nonEmpty).toSeq))
    val firstBatch = docs.flatMap { case (b, ts) => ts.map(_ -> b) }
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val expected = docs.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (b, ds) =>
        val occ = ds.flatMap(_._2)
        val newOcc = occ.count(t => firstBatch(t) == b).toLong
        val newTypes = occ.distinct.count(t => firstBatch(t) == b).toLong
        (b, ds.size.toLong, occ.size.toLong, newOcc, newTypes)
    }
    val got = SparkEntry.queries("tf_oov_burst")(spark, Sf).collect()
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (r, (b, nd, tot, no, nt)) =>
      assert(r.getAs[Long]("batch") == b)
      assert(r.getAs[Long]("n_docs") == nd, s"batch $b")
      assert(r.getAs[Long]("total_occ") == tot, s"batch $b")
      assert(r.getAs[Long]("new_occ") == no, s"batch $b")
      assert(r.getAs[Long]("new_types") == nt, s"batch $b")
      assert(r.getAs[Double]("oov_rate") ==
        (if (tot == 0L) 0.0 else no.toDouble / tot.toDouble), s"batch $b")
    }
    // batch 0 has no baseline: everything is new but nothing bursts
    assert(got.head.getAs[Double]("oov_rate") == 1.0)
    assert(!got.head.getAs[Boolean]("burst"))
  }

  test("planted: steady batch -> no burst; rate-doubling batch and " +
      "a 0 -> positive transition both flag") {
    import spark.implicits._
    val b = TextOps.OovBatchDocs
    val docs = Seq(
      // batch 0: vocabulary {a b c d}, 8 occurrences, all new
      (0L, "a b c d a b c d"),
      // batch 1: all seen -> rate 0, no burst
      (b, "a b a b a b a b"),
      // batch 2: 3 of 8 new (x y z) -> 0 -> positive, bursts
      (2 * b, "a b c d e a b f"),
      // batch 3: rate jumps from 2/8 to 6/8 -> more than doubled
      (3 * b, "p q r s t u a b"))
    val dir = tmpDir("oov-planted")
    docs.map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val out = TextOps.tfOovBurst(spark, dir).collect()
      .map(r => r.getAs[Long]("batch") -> r).toMap
    assert(out(0L).getAs[Double]("oov_rate") == 1.0)
    assert(!out(0L).getAs[Boolean]("burst"))
    assert(out(1L).getAs[Long]("new_occ") == 0L)
    assert(out(1L).getAs[Double]("oov_rate") == 0.0)
    assert(!out(1L).getAs[Boolean]("burst"))
    assert(out(2L).getAs[Long]("new_occ") == 2L) // e, f
    assert(out(2L).getAs[Boolean]("burst"),
      "0 -> positive OOV rate is an infinite increase and must flag")
    assert(out(3L).getAs[Long]("new_occ") == 6L) // p q r s t u
    assert(out(3L).getAs[Boolean]("burst"),
      "2/8 -> 6/8 is a tripling and must flag")
  }
}
