package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Runtime bloom-filter join pruning — the third leg of the adaptive
  * scale story next to AQE coalescing and skew splitting
  * (AdaptiveSkewSpec): when one join side is small and selectively
  * filtered, Spark builds a bloom filter from its join keys at runtime
  * and applies it on the big side's scan, so a shuffled fact-fact join
  * reads only rows that can possibly match. At 100 TB this is what
  * keeps a selective dimension predicate from shuffling the whole fact
  * table. Thresholds are scaled down so local test data crosses them;
  * results must equal the unfiltered join exactly.
  */
class RuntimeFilterSpec extends SparkSpec {

  private def joined(s: SparkSession): DataFrame = {
    // selective creation side: one order priority (~20% of orders)
    val o = Tables.orders(s, Sf)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderpriority"))
    val l = Tables.lineitem(s, Sf)
      .select(col("l_orderkey"), col("l_quantity"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("long")).as("qty"))
  }

  test("a selective join injects a runtime bloom filter on the big side") {
    val s = spark.newSession()
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "64MB")
    s.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "0")
    // no broadcast escape hatch: the filter exists to protect the
    // shuffled-join path
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    val df = joined(s)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("might_contain"),
      s"expected an injected bloom filter in the optimized plan:\n${plan.take(2000)}")

    val ref = spark.newSession()
    ref.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    ref.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    ref.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val refPlan = joined(ref).queryExecution.optimizedPlan.toString
    assert(!refPlan.contains("might_contain"))

    assert(df.head() === joined(ref).head(),
      "bloom pruning must not change the result")
  }
}
