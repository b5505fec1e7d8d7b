package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.sources.{Bucketing, Tables}

/** Co-located joins via bucketing: pre-shuffling at write time means
  * the fact-fact equi-join runs with zero Exchange — the plan property
  * that decides whether a 100 TB join re-shuffles petabytes or reads
  * co-located buckets. */
class BucketedJoinSpec extends SparkSpec {

  test("co-bucketed fact tables join with zero exchange") {
    val dir = tmpDir("graft-buckets")
    Bucketing.writeBucketed(
      Tables.lineitem(spark, Sf), "li_bucketed", s"$dir/li", "l_orderkey", 8)
    Bucketing.writeBucketed(
      Tables.orders(spark, Sf), "o_bucketed", s"$dir/o", "o_orderkey", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the join must prove co-location, not hide
      // behind a small-table broadcast
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.initialPlan.toString
        case p => p.toString
      }
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n${plan.take(3000)}")
      assert(plan.contains("SortMergeJoin"), plan.take(1000))
      // and it computes the same join as the unbucketed plan
      val expected = Tables.lineitem(spark, Sf)
        .join(Tables.orders(spark, Sf),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }

  test("aggregation on the bucket key needs no exchange either") {
    val dir = tmpDir("graft-buckets-agg")
    Bucketing.writeBucketed(
      Tables.lineitem(spark, Sf), "li_bucketed2", s"$dir/li", "l_orderkey", 8)
    try {
      val agg = spark.table("li_bucketed2")
        .groupBy("l_orderkey").agg(count(lit(1)).as("n"))
      val plan = agg.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.initialPlan.toString
        case p => p.toString
      }
      assert(!plan.contains("Exchange"),
        s"bucketed groupBy must not shuffle:\n${plan.take(3000)}")
    } finally spark.sql("DROP TABLE IF EXISTS li_bucketed2")
  }
}
