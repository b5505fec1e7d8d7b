package graft

import org.apache.spark.sql.functions._

/** Pins for `q47_lateral_topk`: the LATERAL form must equal the
  * window `rank() <= 3` form (two different decorrelation paths, one
  * semantics), every nation contributes at most 3 rows, and the plan
  * decorrelates (no per-outer-row lateral subquery survives).
  */
class LateralTopkSpec extends SparkSpec {

  test("LATERAL form = window top-3 form, row for row; <= 3 per nation") {
    val got = SparkEntry.queries("q47_lateral_topk")(spark, Sf)
      .collect()
      .map(r => (r.getAs[Long]("nationkey"), r.getAs[Long]("c_custkey"),
        r.getAs[Double]("spend")))
    got.groupBy(_._1).foreach { case (nk, rs) =>
      assert(rs.length <= 3, s"nation $nk over the LIMIT")
    }
    val spend = graft.sources.Tables.customer(spark, Sf)
      .join(graft.sources.Tables.orders(spark, Sf),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"), col("c_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,6)")).as("sp"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("c_nationkey"))
      .orderBy(col("sp").desc, col("c_custkey"))
    val expected = spend
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("c_nationkey").cast("long"), col("c_custkey"),
        col("sp").cast("double"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got.nonEmpty && got.toSet == expected,
      "lateral LIMIT and window rank cut the identical rows")
  }

  test("the optimized plan decorrelates the lateral subquery") {
    val df = SparkEntry.queries("q47_lateral_topk")(spark, Sf)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("LateralJoin") && !plan.contains("Outer("),
      "no lateral/outer-reference node survives optimization")
  }
}
