package graft

import org.apache.spark.sql.functions._

/** Pins for `q46_correlated_spend`: the correlated-subquery form must
  * return exactly the rows of the hand-decorrelated aggregate+join
  * form (the rewrite Catalyst performs), and the optimized plan must
  * not execute per-row subqueries.
  */
class CorrelatedSpendSpec extends SparkSpec {

  test("correlated form = hand-decorrelated form, row for row") {
    val got = SparkEntry.queries("q46_correlated_spend")(spark, Sf)
      .collect().map(r => (r.getAs[Long]("c_custkey"),
        r.getAs[Long]("nationkey"), r.getAs[Double]("spend")))
    val spend = graft.sources.Tables.customer(spark, Sf)
      .join(graft.sources.Tables.orders(spark, Sf),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_nationkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,6)")).as("sp"))
    val nat = spend.groupBy(col("c_nationkey").as("nk"))
      .agg(count(lit(1)).as("n_cust"), sum(col("sp")).as("tot"))
    val expected = spend.join(nat, col("c_nationkey") === col("nk"))
      .filter(col("sp") * col("n_cust") > col("tot") * 2)
      .select(col("c_custkey"), col("c_nationkey").cast("long"),
        col("sp").cast("double"))
      .orderBy("c_custkey")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty && got.sameElements(expected),
      "decorrelation is semantics-preserving")
  }

  test("the optimized plan decorrelates: no correlated subquery " +
      "survives optimization") {
    val df = SparkEntry.queries("q46_correlated_spend")(spark, Sf)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Outer("),
      "no outer-reference (correlated) expression in the optimized plan")
  }
}
