package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.Exact._
import graft.operators.Relational

/** Pins for incremental top-k maintenance (`q33_topk_delta`): the
  * candidate-set refresh equals a full re-rank (the monotone-total
  * lemma, checked row-for-row), the refresh plan touches no standing
  * order data (state/delta/old-topk are checkpoint leaves), and a
  * planted delta promotes a previously-unranked customer.
  */
class TopkDeltaSpec extends SparkSpec {
  import spark.implicits._

  test("candidate refresh equals the full re-rank bit-for-bit") {
    val got = Relational.q33TopkDelta(spark, Sf).collect()
    val w = Window.partitionBy(col("n_name"))
      .orderBy(col("total").desc, col("c_custkey"))
    val full = spark.read.parquet(s"$Sf/orders.parquet")
      .groupBy(col("o_custkey"))
      .agg(sum(price6(col("o_totalprice"))).as("total"))
      .join(spark.read.parquet(s"$Sf/customer.parquet"),
        col("o_custkey") === col("c_custkey"))
      .join(spark.read.parquet(s"$Sf/nation.parquet"),
        col("c_nationkey") === col("n_nationkey"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= Relational.TopkDeltaK)
      .select(col("n_name"), col("rank"), col("c_custkey"),
        asD(col("total")).as("total_spent"))
      .orderBy("n_name", "rank")
      .collect()
    assert(got.toSeq == full.toSeq)
  }

  test("the refresh plan reads no order rows: every orders-derived " +
      "input is a checkpoint leaf") {
    val qe = Relational.q33TopkDelta(spark, Sf).queryExecution
    val p = qe.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan.toString
      case other => other.toString
    }
    val orderScans = p.linesIterator.count(l =>
      l.contains("Scan parquet") && l.contains("orders"))
    assert(orderScans == 0,
      s"state, delta and old-topk must all be leaves:\n${p.take(3000)}")
    assert(p.contains("ExistingRDD"), "checkpoint leaves missing")
    val custScans = p.linesIterator.count(l =>
      l.contains("Scan parquet") && l.contains("customer"))
    assert(custScans == 1, s"customer dim read once, got $custScans")
  }

  test("a planted delta promotes an unranked customer into the view " +
      "and demotes the old k-th") {
    val dir = tmpDir("topk-delta")
    Seq((0L, "ALPHA", 0L)).toDF("n_nationkey", "n_name", "n_regionkey")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    (1L to 5L).map(i => (i, s"Customer#$i", 0L, 0.0, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    // old totals: c1=400, c2=300, c3=200, c4=100, c5=50 -> top3 =
    // {1,2,3}; delta: c5 books 500 -> new totals put c5 first and
    // demote c3
    val old = Seq((1L, 400.0), (2L, 300.0), (3L, 200.0), (4L, 100.0),
      (5L, 50.0)).zipWithIndex.map { case ((c, p), i) =>
      (i + 1L, c, "O", p, "2001-01-01")
    }
    val fresh = Seq((100L, 5L, "O", 500.0, "2001-07-01"))
    (old ++ fresh)
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"),
        col("o_orderdate").cast("timestamp").as("o_orderdate"),
        lit("1-URGENT").as("o_orderpriority"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = Relational.q33TopkDelta(spark, dir).collect()
      .map(r => r.getAs[Long]("rank") ->
        ((r.getAs[Long]("c_custkey"), r.getAs[Double]("total_spent"))))
      .toMap
    assert(out(1L) == ((5L, 550.0)), s"promoted straggler leads: $out")
    assert(out(2L) == ((1L, 400.0)))
    assert(out(3L) == ((2L, 300.0)))
    assert(out.size == Relational.TopkDeltaK,
      "old 3rd place must be demoted out of the view")
  }
}
