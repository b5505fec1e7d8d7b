package graft

import org.apache.spark.sql.functions._

import graft.operators.SimilarityOps

/** Pins for `ann_mmr_diversify`: bit-exact agreement with an
  * independent driver-side greedy recomputation (same sequential
  * double fold as [[graft.functions.FloatDot]]), the step-1 = brute
  * rank-1 contract, and the diversification property on a planted
  * two-cluster corpus where plain top-k drowns in one cluster.
  */
class MmrDiversifySpec extends SparkSpec {

  private def refDot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }
  private def refCos(a: Array[Float], b: Array[Float]): Double =
    refDot(a, b) / (math.sqrt(refDot(a, a)) * math.sqrt(refDot(b, b)))

  /** The full MMR greedy loop, recomputed from raw embeddings. */
  private def refMmr(embs: Map[Long, Array[Float]])
      : Seq[(Long, Long, Long, Double, Double, Double)] = {
    val queries = embs.keys.filter(_ < SimilarityOps.NQueries).toSeq.sorted
    val cands = embs.keys.filter(_ >= SimilarityOps.NQueries).toSeq
    queries.flatMap { qid =>
      val rel = cands.map(c => c -> refCos(embs(qid), embs(c))).toMap
      val short = cands
        .sortBy(c => (-rel(c), c)).take(SimilarityOps.MmrShort)
      var selected = Vector.empty[Long]
      (1 to SimilarityOps.MmrK).map { step =>
        val scored = short.filterNot(selected.contains).map { c =>
          val maxsim =
            if (selected.isEmpty) 0.0
            else selected.map(s => refCos(embs(c), embs(s))).max
          (c, rel(c), maxsim, 0.5 * rel(c) - 0.5 * maxsim)
        }
        val (c, r, ms, sc) = scored.minBy { case (c, _, _, sc) => (-sc, c) }
        selected :+= c
        (qid, step.toLong, c, r, ms, sc)
      }
    }
  }

  test("bit-exact agreement with the driver-side greedy fold") {
    val embs = spark.read.parquet(s"$Sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val want = refMmr(embs)
    val got = SparkEntry.queries("ann_mmr_diversify")(spark, Sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
    assert(got == want)
  }

  test("step 1 is the brute-force rank-1 neighbor") {
    val top1 = SimilarityOps.knnBrute(spark, Sf)
      .filter(col("rank") === 1L)
      .select("query_id", "cand_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    SparkEntry.queries("ann_mmr_diversify")(spark, Sf)
      .filter(col("step") === 1L).collect()
      .foreach(r => assert(r.getLong(2) == top1(r.getLong(0))))
  }

  test("planted two-cluster corpus: top-k floods one cluster, MMR " +
      "covers both") {
    import spark.implicits._
    val dims = SimilarityOps.Dims
    // clusters live on ORTHOGONAL halves of the dims; the query tilts
    // toward A (rel_A ≈ 0.89 ≫ rel_B ≈ 0.45) but after the first A
    // pick every A twin scores 0.5·(0.89 − ~1) < 0 while B scores
    // 0.5·(0.45 − ~0) > 0 — the second pick MUST cross clusters
    def aVec(jitter: Int): Array[Float] = {
      val a = Array.fill(dims)(0f)
      for (i <- 0 until dims / 2) a(i) = 0.3f
      a(jitter % (dims / 2)) += 0.01f * ((jitter % 7) + 1)
      a
    }
    def bVec(jitter: Int): Array[Float] = {
      val a = Array.fill(dims)(0f)
      for (i <- dims / 2 until dims) a(i) = 0.3f
      a(dims / 2 + jitter % (dims / 2)) += 0.01f * ((jitter % 5) + 1)
      a
    }
    val qVec: Array[Float] = {
      val a = Array.fill(dims)(0f)
      for (i <- 0 until dims / 2) a(i) = 0.27f
      for (i <- dims / 2 until dims) a(i) = 0.135f
      a
    }
    val rows =
      Seq((0L, qVec, 0)) ++
        (8L to 17L).map(i => (i, aVec(i.toInt), 0)) ++
        (18L to 27L).map(i => (i, bVec(i.toInt), 1))
    val dir = tmpDir("mmr-clusters")
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val picks = SparkEntry.queries("ann_mmr_diversify")(spark, dir)
      .filter(col("query_id") === 0L)
      .select("cand_id").collect().map(_.getLong(0)).toSet
    assert(picks.size == SimilarityOps.MmrK)
    assert(picks.exists(_ >= 18L),
      s"MMR must surface a cluster-B representative, got $picks")
    // the contrast: the pure-relevance top-MmrK is all cluster A
    val knn = SimilarityOps.knnBrute(spark, dir)
      .filter(col("query_id") === 0L)
      .select("cand_id").collect().map(_.getLong(0)).toSet
    assert(knn.forall(_ <= 17L),
      s"fixture broken: plain top-k should stay in cluster A: $knn")
  }
}
