package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.functions.Exact._
import graft.operators.Relational

/** Pins for incremental aggregate maintenance (`q31_agg_delta`):
  * state+delta merge is bit-identical to a full recompute, and the
  * merged plan does O(|delta|) scan work, not O(|corpus|). */
class IncrementalAggSpec extends SparkSpec {

  test("state+delta merge equals the full recompute bit-for-bit") {
    val merged = Relational.q31AggDelta(spark, Sf).collect()
    val full = spark.read.parquet(s"$Sf/lineitem.parquet")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(asD(sum(qty(col("l_quantity")))).as("sum_qty"),
        asD(sum(money(col("l_extendedprice")))).as("sum_base_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
      .collect()
    assert(merged.toSeq == full.toSeq)
  }

  test("the merged plan scans lineitem once (delta only, cutoff " +
      "pushed down); the state side is a checkpoint leaf") {
    val qe = Relational.q31AggDelta(spark, Sf).queryExecution
    val p = qe.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan.toString
      case other => other.toString
    }
    val scans = p.linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 1, s"expected exactly one parquet scan, got $scans:\n" +
      p.take(3000))
    assert(p.contains("ExistingRDD"), "state must be a checkpoint leaf")
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"),
      "delta cutoff must reach the scan")
  }

  test("delta tail is non-empty and a small fraction of the corpus") {
    val li = spark.read.parquet(s"$Sf/lineitem.parquet")
    val cutoff = lit(Relational.AggDeltaCutoff).cast("timestamp")
    val n = li.count()
    val nDelta = li.filter(col("l_shipdate") >= cutoff).count()
    assert(nDelta > 0, "delta must be non-empty at every SF")
    assert(nDelta.toDouble / n < 0.2,
      s"delta should be a small tail, got $nDelta/$n")
  }
}
