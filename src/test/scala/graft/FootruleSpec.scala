package graft

import graft.operators.SimilarityOps

/** Pins for `ann_footrule` (Fagin–Kumar–Sivakumar induced footrule
  * over the four ANN tiers): a driver-side fold recomputing every
  * per-query distance from the tier outputs themselves, and the
  * combinatorial invariants of the induced metric.
  */
class FootruleSpec extends SparkSpec {

  private val K = SimilarityOps.TopK

  private def ranks(name: String): Map[(Long, Long), Long] =
    SparkEntry.queries(name)(spark, Sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id")) ->
        r.getAs[Long]("rank")).toMap

  test("matches a driver-side fold over the tier outputs") {
    val brute = ranks("knn_brute")
    val tiers = Map(
      "ivf" -> ranks("ann_ivf"), "lsh" -> ranks("ann_lsh_probe"),
      "pq_rerank" -> ranks("ann_pq_rerank"),
      "proj_rerank" -> ranks("ann_proj_rerank"))
    val rows = SparkEntry.queries("ann_footrule")(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val tier = r.getAs[String]("tier")
      val qid = r.getAs[Long]("query_id")
      val t = tiers(tier)
      val bq = brute.collect { case ((q, c), rk) if q == qid => c -> rk }
      val tq = t.collect { case ((q, c), rk) if q == qid => c -> rk }
      val union = bq.keySet ++ tq.keySet
      val want = union.toSeq.map { c =>
        math.abs(bq.getOrElse(c, (K + 1).toLong) -
          tq.getOrElse(c, (K + 1).toLong))
      }.sum
      assert(r.getAs[Long]("footrule") == want, s"$tier q$qid")
      assert(r.getAs[Long]("n_common") ==
        (bq.keySet & tq.keySet).size.toLong, s"$tier q$qid")
      assert(r.getAs[Double]("footrule_norm") ==
        want.toDouble / (K * (K + 1)).toDouble, s"$tier q$qid")
    }
  }

  test("induced-metric invariants: range, the overlap lower bound, " +
      "and evenness when both lists are full") {
    val bruteCounts = SparkEntry.queries("knn_brute")(spark, Sf)
      .collect().groupBy(_.getAs[Long]("query_id")).view
      .mapValues(_.length).toMap
    val tierCounts: Map[String, Map[Long, Int]] = Map(
      "ivf" -> "ann_ivf", "lsh" -> "ann_lsh_probe",
      "pq_rerank" -> "ann_pq_rerank", "proj_rerank" -> "ann_proj_rerank")
      .view.mapValues(q => SparkEntry.queries(q)(spark, Sf).collect()
        .groupBy(_.getAs[Long]("query_id")).view.mapValues(_.length)
        .toMap).toMap
    SparkEntry.queries("ann_footrule")(spark, Sf).collect().foreach { r =>
      val f = r.getAs[Long]("footrule")
      val common = r.getAs[Long]("n_common")
      assert(f >= 0L && f <= (K * (K + 1)).toLong)
      assert(common >= 0L && common <= K.toLong)
      // every element missing from one list displaces by >= 1, and
      // there are >= 2*(K - common) of them when both lists are full
      val qid = r.getAs[Long]("query_id")
      val nb = bruteCounts.getOrElse(qid, 0)
      val nt = tierCounts(r.getAs[String]("tier")).getOrElse(qid, 0)
      if (nb == K && nt == K) {
        assert(f >= 2L * (K - common),
          s"${r.getAs[String]("tier")} q$qid")
        assert(f % 2L == 0L,
          "equal-size lists force an even footrule " +
            s"(${r.getAs[String]("tier")} q$qid)")
      }
      // perfect rank agreement is exactly footrule 0 <-> common = K
      if (f == 0L && nb == K && nt == K) assert(common == K.toLong)
    }
  }
}
