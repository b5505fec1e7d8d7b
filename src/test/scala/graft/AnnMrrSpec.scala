package graft

import org.apache.spark.sql.functions._

import graft.operators.SimilarityOps

/** `ann_mrr` — the retrieval-eval metric over the four gated ANN
  * tiers: a full driver-side recomputation from the tiers' own
  * outputs (the DsirSpec convention), plus the contract that a tier
  * with an empty shortlist still reports the query at rr = 0.
  */
class AnnMrrSpec extends SparkSpec {

  import spark.implicits._

  test("every (tier, query) row equals the driver-side reciprocal " +
      "rank of the brute-force true neighbor") {
    val truth = SimilarityOps.knnBrute(spark, Sf)
      .filter(col("rank") === 1L)
      .select(col("query_id"), col("cand_id"))
      .as[(Long, Long)].collect().toMap
    val tiers: Seq[(String, (org.apache.spark.sql.SparkSession, String)
        => org.apache.spark.sql.DataFrame)] = Seq(
      "ivf" -> SimilarityOps.annIvf,
      "lsh" -> SimilarityOps.annLshProbe,
      "pq_rerank" -> SimilarityOps.annPqRerank,
      "proj_rerank" -> SimilarityOps.annProjRerank)
    val want = tiers.flatMap { case (name, q) =>
      val byQuery = q(spark, Sf)
        .select(col("query_id"), col("rank"), col("cand_id"))
        .as[(Long, Long, Long)].collect()
        .groupBy(_._1)
      truth.keys.map { qid =>
        val hit = byQuery.getOrElse(qid, Array.empty)
          .filter(_._3 == truth(qid)).map(_._2)
          .sorted.headOption
        (name, qid) ->
          ((truth(qid), hit.getOrElse(0L),
            hit.map(1.0 / _.toDouble).getOrElse(0.0)))
      }
    }.toMap
    val got = SparkEntry.queries("ann_mrr")(spark, Sf)
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got == want)
    // EVERY (tier, truth-query) pair must be present — a tier that
    // misses a query entirely reports rr = 0 rather than vanishing
    assert(got.size == tiers.size * truth.size)
  }
}
