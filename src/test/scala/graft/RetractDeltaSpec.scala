package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.functions.Exact._
import graft.operators.Relational

/** Pins for retractable aggregate maintenance (`q37_retract_delta`):
  * the signed-partial merge is bit-identical to recomputing over the
  * survivors, the refresh plan scans the fact table for the delete
  * batch only (state is a checkpoint leaf), and the synthetic delete
  * batch is a real but small slice.
  */
class RetractDeltaSpec extends SparkSpec {

  private def isDeleted =
    graft.functions.Hashing.charHash(concat_ws("|",
      col("l_orderkey").cast("string"),
      col("l_linenumber").cast("string"))) %
      Relational.RetractMod === Relational.RetractTag

  test("state minus retractions equals the survivor recompute " +
      "bit-for-bit") {
    val merged = Relational.q37RetractDelta(spark, Sf).collect()
    val full = spark.read.parquet(s"$Sf/lineitem.parquet")
      .filter(!isDeleted)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(asD(sum(qty(col("l_quantity")))).as("sum_qty"),
        asD(sum(money(col("l_extendedprice")))).as("sum_base_price"),
        count(lit(1)).as("count_order"))
      .select(col("l_returnflag"), col("l_linestatus"), col("sum_qty"),
        col("sum_base_price"), col("count_order"),
        (col("sum_qty") / col("count_order").cast("double"))
          .as("avg_qty"))
      .orderBy("l_returnflag", "l_linestatus")
      .collect()
    assert(merged.toSeq == full.toSeq)
  }

  test("the refresh plan scans lineitem once (the delete batch); " +
      "the state side is a checkpoint leaf") {
    val qe = Relational.q37RetractDelta(spark, Sf).queryExecution
    val p = qe.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan.toString
      case other => other.toString
    }
    val scans = p.linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 1, s"expected exactly one parquet scan, got $scans:\n" +
      p.take(3000))
    assert(p.contains("ExistingRDD"), "state must be a checkpoint leaf")
  }

  test("the synthetic delete batch is non-empty, small, and no group " +
      "fully vanishes at sf0.001") {
    val li = spark.read.parquet(s"$Sf/lineitem.parquet")
    val n = li.count()
    val nDel = li.filter(isDeleted).count()
    assert(nDel > 0, "delete batch must be non-empty at every SF")
    assert(nDel.toDouble / n < 0.15,
      s"delete batch should be a small slice, got $nDel/$n")
    val groupsFull = li.select("l_returnflag", "l_linestatus")
      .distinct().count()
    val groupsAfter = Relational.q37RetractDelta(spark, Sf).count()
    assert(groupsAfter == groupsFull,
      "the ~5% residue slice must not erase a whole group here; the " +
        "vanishing-group arm is pinned below")
  }

  test("a fully-retracted group leaves the view") {
    import spark.implicits._
    // one group whose only row hashes onto the delete residue: search
    // a small key range for a (orderkey, linenumber=1) that deletes
    val probe = (1L to 400L).map(k => (k, 1L))
      .toDF("l_orderkey", "l_linenumber")
      .filter(isDeleted)
      .collect()
    assert(probe.nonEmpty, "no key in the probe range hits the residue")
    val delKey = probe.head.getLong(0)
    val rows = Seq(
      // group ("A","F"): two rows, one deleted -> survives partially
      (delKey + 1L, 1L, "A", "F", 5.0, 100.0),
      (delKey, 1L, "A", "F", 7.0, 200.0),
      // group ("Z","Z"): single row, deleted -> vanishes
      (delKey, 2L, "Z", "Z", 9.0, 300.0))
    // (delKey, 2) may or may not delete; force it by reusing (delKey, 1)
    // semantics: build the doomed group from the KNOWN deleting key
    val rows2 = rows.take(2) ++ Seq((delKey, 1L, "Z", "Z", 9.0, 300.0))
    val dir = tmpDir("retract-planted")
    rows2.toDF("l_orderkey", "l_linenumber", "l_returnflag",
        "l_linestatus", "l_quantity", "l_extendedprice")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    val out = Relational.q37RetractDelta(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out.keySet == Set(("A", "F")),
      "the fully-retracted (Z,Z) group must leave the view")
    assert(out(("A", "F")).getAs[Long]("count_order") == 1L)
    assert(out(("A", "F")).getAs[Double]("sum_qty") == 5.0)
    assert(out(("A", "F")).getAs[Double]("avg_qty") == 5.0)
  }
}
