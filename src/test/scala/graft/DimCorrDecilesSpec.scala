package graft

import org.apache.spark.sql.functions._

/** Pins for `emb_dim_corr` (driver-side BIGINT covariance recompute
  * over the engine's own quantized lanes) and `q44_spend_deciles`
  * (NTILE partition laws + exact share conservation). */
class DimCorrDecilesSpec extends SparkSpec {

  test("emb_dim_corr matches a driver-side BIGINT covariance " +
      "recompute at sf0.001") {
    val lanes = SparkEntry.queries("emb_quantize")(spark, Sf)
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("dim"),
        r.getAs[Long]("q_int8")))
    val byVec = lanes.groupBy(_._1)
    val n = byVec.size.toLong
    val dims = lanes.map(_._2).max.toInt + 1
    val s = Array.fill(dims)(0L)
    lanes.foreach { case (_, d2, q) => s(d2.toInt) += q }
    val p = scala.collection.mutable.Map
      .empty[(Int, Int), Long].withDefaultValue(0L)
    byVec.values.foreach { vs =>
      val arr = vs.sortBy(_._2).map(_._3).toArray
      var i = 0
      while (i < dims) {
        var j = i + 1
        while (j < dims) {
          p((i, j)) += arr(i) * arr(j); j += 1
        }
        i += 1
      }
    }
    val want = p.toSeq
      .map { case ((i, j), pij) =>
        (i.toLong, j.toLong, n, pij, s(i), s(j), n * pij - s(i) * s(j))
      }
      .sortBy { case (i, j, _, _, _, _, c) => (-math.abs(c), i, j) }
      .take(graft.operators.SimilarityOps.DimCorrTopK)
    val got = SparkEntry.queries("emb_dim_corr")(spark, Sf)
      .collect()
      .map(r => (r.getAs[Long]("di"), r.getAs[Long]("dj"),
        r.getAs[Long]("n"), r.getAs[Long]("p"), r.getAs[Long]("si"),
        r.getAs[Long]("sj"), r.getAs[Long]("cov_num"))).toSeq
    assert(got == want)
  }

  test("q44 deciles: NTILE partition laws and exact share " +
      "conservation at sf0.001") {
    val rows = SparkEntry.queries("q44_spend_deciles")(spark, Sf)
      .collect()
    assert(rows.map(_.getAs[Long]("decile")).toSeq == (1L to 10L))
    val counts = rows.map(_.getAs[Long]("n_customers"))
    // NTILE remainder rule: earlier buckets carry at most one extra
    assert(counts.max - counts.min <= 1L)
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    val nCust = graft.sources.Tables.orders(spark, Sf)
      .select(col("o_custkey")).distinct().count()
    assert(counts.sum == nCust)
    // deciles are spend-ordered: decile 1's min >= decile 2's max
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("min_spend") >= b.getAs[Double]("max_spend"))
    }
    val shareSum = rows.map(_.getAs[Double]("revenue_share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-9)
    assert(rows.head.getAs[Double]("revenue_share") >
      rows.last.getAs[Double]("revenue_share"),
      "the top decile must out-earn the bottom")
  }
}
