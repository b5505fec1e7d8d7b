package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Pins for `emb_pq_distortion`: the hotlist must be exactly the
  * per-label top of `emb_pq_encode`'s sq_err (driver recomputed), in
  * rank order with id tie-breaks, and the per-label rank filter must
  * compile to a WindowGroupLimit, not a full per-label sort.
  */
class PqDistortionSpec extends SparkSpec {

  test("the hotlist is the per-label argmax of emb_pq_encode") {
    val err = SparkEntry.queries("emb_pq_encode")(spark, Sf).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("sq_err"))
      .toMap
    val labels = spark.read.parquet(s"$Sf/embeddings.parquet")
      .selectExpr("vec_id", "CAST(label AS BIGINT) AS label").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = labels.groupBy(_._2).view.mapValues { vs =>
      vs.keys.toSeq.sortBy(v => (-err(v), v))
        .take(graft.operators.SimilarityOps.DistortionTopK)
    }.toMap
    val got = SparkEntry.queries("emb_pq_distortion")(spark, Sf)
      .collect()
    got.groupBy(_.getAs[Long]("label")).foreach { case (l, rows) =>
      val ordered = rows.sortBy(_.getAs[Long]("rank"))
      assert(ordered.map(_.getAs[Long]("vec_id")).toSeq == expected(l),
        s"label $l")
      ordered.foreach { r =>
        assert(r.getAs[Double]("sq_err") ==
          err(r.getAs[Long]("vec_id")))
      }
    }
    assert(got.groupBy(_.getAs[Long]("label")).keySet == expected.keySet)
  }

  test("the per-label rank filter compiles to WindowGroupLimit") {
    val p = graft.operators.SimilarityOps
      .embPqDistortion(spark, Sf).queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan.toString
      case other => other.toString
    }
    assert(p.contains("WindowGroupLimit"),
      s"expected a top-k-per-group plan:\n${p.take(2000)}")
  }
}
