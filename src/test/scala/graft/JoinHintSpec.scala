package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Join-strategy hints pinned to their physical operators — the
  * escape hatch an operator author reaches for when statistics
  * mislead the planner at 100 TB (a "small" side that is not, a
  * broadcast that should be forced despite a missing stat). Each hint
  * must actually change the physical plan, or the escape hatch is
  * decorative.
  */
class JoinHintSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan.toString
      case p => p.toString
    }

  private def orders = spark.read.parquet(s"$Sf/orders.parquet")
    .select("o_orderkey", "o_custkey")
  private def li = spark.read.parquet(s"$Sf/lineitem.parquet")
    .select("l_orderkey", "l_quantity")

  test("broadcast hint forces BroadcastHashJoin on an over-threshold " +
      "side") {
    val small = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // with broadcast disabled, the join would sort-merge...
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val unhinted = li.join(orders,
        col("l_orderkey") === col("o_orderkey"))
      assert(!plan(unhinted).contains("BroadcastHashJoin"))
      // ...unless the author forces the broadcast
      val hinted = li.join(broadcast(orders),
        col("l_orderkey") === col("o_orderkey"))
      assert(plan(hinted).contains("BroadcastHashJoin"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", small)
    }
  }

  test("merge and shuffle_hash hints pick their operators") {
    val merged = li.hint("merge").join(orders,
      col("l_orderkey") === col("o_orderkey"))
    assert(plan(merged).contains("SortMergeJoin"))
    val hashed = li.hint("shuffle_hash").join(orders,
      col("l_orderkey") === col("o_orderkey"))
    assert(plan(hashed).contains("ShuffledHashJoin"))
  }

  test("hinted plans return the hinted-free answer") {
    val base = li.join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey").count().orderBy("o_custkey").collect()
    val viaMerge = li.hint("merge")
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey").count().orderBy("o_custkey").collect()
    assert(base.toSeq == viaMerge.toSeq,
      "a strategy hint may move bytes, never rows")
  }
}
