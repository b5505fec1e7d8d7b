package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** AQE's automatic skew-join splitting — the runtime safety net for
  * fact-fact joins nobody pre-salted (SURVEY §8: manual salting is
  * proven by `ev_top_users_salted`; THIS pins the knob that handles
  * the hot key you didn't see coming). A sort-merge join with one
  * dominant key must come back from AQE with the skewed partition
  * split (`skew=true` on the join node), and the result must equal
  * the unsplit join exactly.
  */
class AdaptiveSkewSpec extends SparkSpec {

  /** Fact side: 100k rows, half on hot key 0, padded so the hot
    * shuffle partition dwarfs the scaled-down skew threshold. The
    * aggregate references every fact column (so nothing is pruned
    * before the shuffle) but does NOT group by the join key — a
    * downstream hash-requirement on `k` would legitimately veto the
    * split (it would destroy the partitioning the agg needs). */
  private def skewedJoin(s: SparkSession): DataFrame = {
    val fact = s.range(100000L)
      .select(
        when(col("id") % 2 === 0, 0L).otherwise(col("id") % 97).as("k"),
        col("id").as("v"),
        lpad(lit("x"), 64, "x").as("pad"))
    val dim = s.range(97L).select(col("id").as("k"), (col("id") * 10).as("w"))
    fact.join(dim, "k")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
        sum(col("w")).as("sw"), sum(length(col("pad"))).as("sp"))
  }

  private def asTuples(df: DataFrame) =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

  test("AQE splits a skewed sort-merge join partition (skew=true in final plan)") {
    // isolated session: thresholds scaled down so local test data
    // triggers the same decision a multi-GB hot partition would
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.5")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    // no broadcast escape hatch: force the shuffled join path
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.shuffle.partitions", "8")

    val joined = skewedJoin(s)
    val got = asTuples(joined)

    val adaptive = joined.queryExecution.executedPlan
      .collectFirst { case a: AdaptiveSparkPlanExec => a }
    assert(adaptive.isDefined,
      s"expected an adaptive plan:\n${joined.queryExecution.executedPlan}")
    val finalPlan = adaptive.get.executedPlan.toString
    assert(finalPlan.contains("skew=true"),
      s"AQE did not split the skewed join partition:\n$finalPlan")

    // correctness unchanged by the split: compare against the same
    // join with skew handling off
    val ref = spark.newSession()
    ref.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    ref.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    ref.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    assert(got === asTuples(skewedJoin(ref)))
    // and the join really carried every fact row (hot key included)
    assert(got.head._1 === 100000L)
  }
}
