package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Pins for incremental join maintenance (`q32_join_delta`): the
  * three-term delta plus the checkpointed state partitions the full
  * join exactly, old⋈old is never recomputed in the refresh plan,
  * and every delta scan carries its cutoff pushdown. */
class JoinDeltaSpec extends SparkSpec {

  private val cutoff = lit(Relational.AggDeltaCutoff).cast("timestamp")

  test("the four join terms partition the full join row-for-row") {
    val o = spark.read.parquet(s"$Sf/orders.parquet")
    val l = spark.read.parquet(s"$Sf/lineitem.parquet")
    def cnt(oldO: Boolean, oldL: Boolean): Long = {
      val os = if (oldO) o.filter(col("o_orderdate") < cutoff)
               else o.filter(col("o_orderdate") >= cutoff)
      val ls = if (oldL) l.filter(col("l_shipdate") < cutoff)
               else l.filter(col("l_shipdate") >= cutoff)
      os.join(ls, col("o_orderkey") === col("l_orderkey")).count()
    }
    val full = o.join(l, col("o_orderkey") === col("l_orderkey")).count()
    assert(cnt(true, true) + cnt(false, true) + cnt(true, false) +
      cnt(false, false) == full,
      "disjoint old/delta halves must tile the join exactly")
    assert(cnt(false, true) + cnt(true, false) + cnt(false, false) > 0,
      "the delta terms must be non-empty at every SF")
  }

  test("refresh equals the full recompute bit-for-bit") {
    val got = Relational.q32JoinDelta(spark, Sf).collect()
    val o = spark.read.parquet(s"$Sf/orders.parquet")
    val l = spark.read.parquet(s"$Sf/lineitem.parquet")
    val full = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"), col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        graft.functions.Exact.asD(sum(graft.functions.Exact.discPrice(
          col("l_extendedprice"), col("l_discount")))).as("revenue"))
      .orderBy("o_orderpriority", "l_returnflag")
      .collect()
    assert(got.toSeq == full.toSeq)
  }

  test("the refresh plan joins only delta-sided terms — the old⋈old " +
      "state is a checkpoint leaf, cutoffs pushed to every scan") {
    val qe = Relational.q32JoinDelta(spark, Sf).queryExecution
    val p = qe.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan.toString
      case other => other.toString
    }
    val joins = p.linesIterator.count(l =>
      l.contains("SortMergeJoin") || l.contains("BroadcastHashJoin") ||
        l.contains("ShuffledHashJoin"))
    assert(joins == 3,
      s"exactly the three delta terms may join at refresh, got $joins:\n" +
        p.take(3000))
    assert(p.contains("ExistingRDD"), "state must be a checkpoint leaf")
    assert(p.contains("PushedFilters") && p.contains("o_orderdate") &&
      p.contains("l_shipdate"), "both cutoffs must reach the scans")
  }
}
