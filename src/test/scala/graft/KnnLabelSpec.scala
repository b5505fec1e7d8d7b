package graft

import graft.operators.SimilarityOps

/** Pins for `emb_knn_label_agreement`: accounting sanity at sf0.001
  * and a planted two-cluster corpus with one mislabeled vector whose
  * neighbor vote must catch it (agreement 4/5 vs 1.0).
  */
class KnnLabelSpec extends SparkSpec {

  test("accounting sanity at sf0.001: partitions the corpus, scored " +
      "is a subset, agreement is a ratio") {
    val got = SparkEntry.queries("emb_knn_label_agreement")(spark, Sf)
      .collect()
    val total = spark.read.parquet(s"$Sf/embeddings.parquet").count()
    assert(got.map(_.getAs[Long]("n")).sum == total)
    got.foreach { r =>
      val n = r.getAs[Long]("n")
      val scored = r.getAs[Long]("n_scored")
      val agree = r.getAs[Long]("n_agree")
      assert(scored <= n && agree <= scored)
      val a = r.getAs[Double]("agreement")
      assert(a >= 0.0 && a <= 1.0)
      if (scored > 0)
        assert(a == agree.toDouble / scored.toDouble)
    }
  }

  test("planted: identical-twin clusters agree fully; a mislabeled " +
      "vector votes with its true cluster and drags its label to 4/5") {
    import spark.implicits._
    val dims = 8
    def v(hot: Int) =
      Array.tabulate(dims)(i => if (i == hot) 1.0f else 0.0f)
    val rows =
      (1L to 4L).map(id => (id, v(0), 0L)) ++
        (11L to 14L).map(id => (id, v(1), 1L)) ++
        Seq((21L, v(1), 0L)) // labeled 0, sits in cluster 1
    val dir = tmpDir("knn-label")
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val out = SimilarityOps.embKnnLabelAgreement(spark, dir).collect()
      .map(r => r.getAs[Long]("label") -> r).toMap
    assert(out(0L).getAs[Long]("n") == 5L)
    assert(out(0L).getAs[Long]("n_scored") == 5L,
      "identical twins always share a bucket, so everyone scores")
    assert(out(0L).getAs[Long]("n_agree") == 4L,
      "the mislabeled vector's nearest neighbor votes cluster 1")
    assert(out(0L).getAs[Double]("agreement") == 0.8)
    assert(out(1L).getAs[Double]("agreement") == 1.0,
      "ties at cosine 1 break to the lowest neighbor id, which is " +
        "always a true cluster-1 member here")
  }
}
