package graft

import graft.operators.DedupOps

/** Pins for `dedup_weighted_jaccard`: a driver-side recomputation
  * from raw texts, the planted boilerplate-only pair collapsing to
  * exactly 0.0 while plain Jaccard stays high, and the integer weight
  * bounds on the corpus. */
class WeightedJaccardSpec extends SparkSpec {

  private def refShingles(text: String): Set[String] = {
    val toks = text.split(" ").filter(_.nonEmpty).toSeq
    if (toks.length < 3) Set.empty
    else toks.sliding(3).map(_.mkString(" ")).toSet
  }

  test("matches a driver-side recomputation from raw texts") {
    val texts = spark.read.parquet(s"$Sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val df = texts.values.toSeq.flatMap(refShingles)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    def w(sh: String): Long =
      math.max(0L, DedupOps.WeightDfCap - df(sh))
    val rows = SparkEntry.queries("dedup_weighted_jaccard")(spark, Sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      val (sa, sb) = (refShingles(texts(a)), refShingles(texts(b)))
      val wInter = (sa & sb).toSeq.map(w).sum
      val wUnion = (sa | sb).toSeq.map(w).sum
      assert(r.getAs[Long]("w_inter") == wInter, s"($a,$b)")
      assert(r.getAs[Long]("w_union") == wUnion, s"($a,$b)")
      val wantWj = if (wUnion == 0L) 0.0
        else wInter.toDouble / wUnion.toDouble
      assert(r.getAs[Double]("jaccard_weighted") == wantWj, s"($a,$b)")
    }
  }

  test("a pair similar only through boilerplate collapses to 0.0") {
    import spark.implicits._
    // the boiler phrase saturates df across 6 docs (>= cap 5), so its
    // shingles weigh 0; docs 1 and 2 share ONLY boiler shingles
    val boiler = "all rights reserved contact the site administrator today"
    val docs = Seq(
      (1L, s"$boiler alpha"), (2L, s"$boiler omega"),
      (3L, boiler), (4L, boiler), (5L, boiler), (6L, boiler))
      .map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
    val dir = tmpDir("wjac-planted")
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val rows = DedupOps.dedupWeightedJaccard(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        ((r.getAs[Double]("jaccard"),
          r.getAs[Double]("jaccard_weighted")))).toMap
    val pair = rows.get((1L, 2L))
    assert(pair.isDefined,
      s"near-identical docs must be LSH candidates, got ${rows.keys}")
    val (plain, weighted) = pair.get
    assert(plain > 0.5, s"plain Jaccard sees the boilerplate: $plain")
    assert(weighted == 0.0,
      "every shared shingle is saturated boilerplate — weighted " +
        "similarity must vanish")
  }

  test("corpus integer bounds: weights never exceed (cap-1) per " +
      "shingle") {
    val cap = DedupOps.WeightDfCap
    SparkEntry.queries("dedup_weighted_jaccard")(spark, Sf).collect()
      .foreach { r =>
        assert(r.getAs[Long]("w_inter") <= r.getAs[Long]("w_union"))
        assert(r.getAs[Long]("w_union") >= 0L &&
          r.getAs[Long]("w_inter") >= 0L)
        val wj = r.getAs[Double]("jaccard_weighted")
        assert(wj >= 0.0 && wj <= 1.0, s"cap $cap keeps wj in [0,1]")
      }
  }
}
