package graft

import graft.operators.SimilarityOps

/** Pins for `emb_dim_variance`: a driver-side BigInt fold over the
  * gated quantized lanes, the integer variance identity, and a
  * planted collapsed dimension that must flag `dead_dim`.
  */
class DimVarianceSpec extends SparkSpec {

  test("matches a BigInt fold over the emb_quantize output") {
    val lanes = SparkEntry.queries("emb_quantize")(spark, Sf).collect()
      .map(r => (r.getAs[Long]("dim"), r.getAs[Long]("q_int8")))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val rows = SparkEntry.queries("emb_dim_variance")(spark, Sf).collect()
    assert(rows.map(_.getAs[Long]("dim")).toSet == lanes.keySet)
    rows.foreach { r =>
      val qs = lanes(r.getAs[Long]("dim"))
      val n = BigInt(qs.length)
      val sq = qs.map(BigInt(_)).sum
      val sq2 = qs.map(q => BigInt(q) * q).sum
      val varNum = n * sq2 - sq * sq
      assert(BigInt(r.getAs[Long]("n")) == n)
      assert(BigInt(r.getAs[Long]("sum_q")) == sq)
      assert(BigInt(r.getAs[Long]("sum_q2")) == sq2)
      assert(BigInt(r.getAs[Long]("var_num")) == varNum)
      assert(r.getAs[Double]("variance") ==
        varNum.toDouble / (n * n).toDouble)
      assert(r.getAs[Boolean]("dead_dim") == (varNum == 0))
      // n*E[q^2] >= (E[q])^2 — the numerator is never negative
      assert(varNum >= 0)
    }
  }

  test("a collapsed (constant) dimension flags dead_dim with " +
      "variance exactly 0") {
    import spark.implicits._
    val dims = SimilarityOps.Dims
    // dim 0 constant across vectors; dim 1 varies
    val vecs = (0L until 20L).map { i =>
      (i, Array.tabulate(dims)(j =>
        if (j == 0) 0.25f
        else (((i * 31 + j) % 7).toFloat / 7.0f) - 0.4f), (i % 3).toInt)
    }
    val dir = tmpDir("dimvar-dead")
    vecs.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val rows = SimilarityOps.embDimVariance(spark, dir).collect()
      .map(r => r.getAs[Long]("dim") -> r).toMap
    assert(rows(0L).getAs[Boolean]("dead_dim"),
      "constant raw dim quantizes to one lane value")
    assert(rows(0L).getAs[Long]("var_num") == 0L)
    assert(rows(0L).getAs[Double]("variance") == 0.0)
    assert(!rows(1L).getAs[Boolean]("dead_dim"))
    assert(rows(1L).getAs[Long]("var_num") > 0L)
  }
}
