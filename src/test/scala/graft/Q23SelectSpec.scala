package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Differential pin for the round-15 q23_percentiles restructure:
  * the registered query now computes exact interpolated percentiles
  * by histogram-cut rank selection (bucket counts → rank intervals →
  * per-bucket windows over only the hit buckets) instead of a
  * per-flag external-sort window. This spec holds the ROUND-14 form
  * (full window row_number + rank interpolation) as an independent
  * reference and asserts bit-equal output on corpora built to stress
  * the seams: ties AT the straddling ranks, prices exactly on the
  * 64-wide bucket boundary, integral (n−1)·p positions (frac = 0, lo
  * rank == hi rank), single- and two-row groups, and a larger seeded
  * random group. Bit-equal (==), not tolerance: both forms end in
  * the identical `lo·(1-frac) + hi·frac` double tree over identical
  * operands or the restructure is wrong.
  */
class Q23SelectSpec extends SparkSpec {

  /** The pre-round-15 q23 plan, verbatim, as the value reference. */
  private def q23Ref(fact: DataFrame): Seq[Row] = {
    val price = col("l_extendedprice")
    val wAll = Window.partitionBy(col("l_returnflag"))
    val wSort = wAll.orderBy(price)
    def pos(p: Double) = (col("n") - 1).cast("double") * lit(p)
    def pick(p: Double) = {
      val lo = max(when(col("rn") === floor(pos(p)).cast("long") + 1, price))
      val hi = max(when(col("rn") === ceil(pos(p)).cast("long") + 1, price))
      val frac = max(pos(p) - floor(pos(p)))
      lo * (lit(1.0) - frac) + hi * frac
    }
    fact.select(col("l_returnflag"), price)
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("rn", row_number().over(wSort))
      .groupBy(col("l_returnflag"))
      .agg(pick(0.25).as("p25"), pick(0.5).as("p50"), pick(0.75).as("p75"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
      .collect().toSeq
  }

  private def check(rows: Seq[(String, Double)], label: String): Unit = {
    val dir = tmpDir(s"q23-$label")
    import spark.implicits._
    rows.toDF("l_returnflag", "l_extendedprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = SparkEntry.queries("q23_percentiles")(spark, dir).collect().toSeq
    val want = q23Ref(spark.read.parquet(s"$dir/lineitem.parquet"))
    assert(got == want, s"[$label] selection form diverged from the " +
      s"window reference:\n got=$got\nwant=$want")
  }

  test("ties at the straddling ranks and on bucket boundaries pick " +
      "the identical values") {
    // 8 rows: p25 position = 1.75 (ranks 2,3 both 128.0 — a tie the
    // arbitrary row_number order must not be able to break), and
    // several prices exactly k*64.0 (bucket boundary)
    val a = Seq(64.0, 128.0, 128.0, 128.0, 192.0, 256.0, 256.0, 320.0)
      .map(("A", _))
    // 5 rows: integral positions at p25/p50/p75 when n = 5 → frac = 0
    val b = Seq(10.0, 20.0, 30.0, 40.0, 50.0).map(("B", _))
    check(a ++ b, "ties-boundaries")
  }

  test("degenerate group sizes: n = 1 and n = 2") {
    check(Seq(("A", 42.5), ("B", 1.0), ("B", 99999.99)), "tiny-n")
  }

  test("seeded random corpus across many buckets equals the window " +
      "reference bit for bit") {
    val r = new scala.util.Random(23)
    val rows = (1 to 4000).map { _ =>
      (Seq("A", "N", "R")(r.nextInt(3)), 900.0 + r.nextInt(10410000) / 100.0)
    } ++ Seq(("A", 900.68), ("N", 104999.91)) // corpus min/max extremes
    check(rows, "random")
  }
}
