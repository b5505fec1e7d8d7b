package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Watermark semantics under a controlled source — the unbounded-stream
  * guarantees the reference's long-running pipelines rely on
  * (README.md:11-17): bounded state, exactly-once window emission in
  * append mode, late data beyond the watermark dropped, and
  * watermark-scoped dedup state that actually expires.
  *
  * A MemoryStream drives the event-time clock deterministically: the
  * watermark advances only when we feed rows, so every assertion is
  * timing-independent.
  */
class StreamingWatermarkSpec extends SparkSpec {
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  // base aligned to a 10-minute boundary — tumbling windows align to
  // the epoch, so window starts match ts(0)/ts(10)/... exactly
  private def ts(minutes: Int): Timestamp =
    new Timestamp(1699999800000L + minutes * 60000L)

  private def startAppend(df: org.apache.spark.sql.DataFrame, name: String)
      : StreamingQuery =
    df.writeStream.format("memory").queryName(name).outputMode("append").start()

  test("append-mode windowed agg: watermark finalizes windows exactly once") {
    val in = MemoryStream[(Timestamp, String)]
    val agg = in.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("start"), col("n"))
    val q = startAppend(agg, "wm_agg")
    try {
      // two rows in the first 10-minute window; nothing can be emitted
      // yet (watermark = 5 - 10 min, window [0,10) still open)
      in.addData((ts(0), "a"), (ts(5), "b"))
      q.processAllAvailable()
      assert(spark.table("wm_agg").count() === 0)

      // event at t=25 min pushes the watermark to 15 min > window end
      // 10 min -> the first window is finalized and emitted, once
      in.addData((ts(25), "c"))
      q.processAllAvailable()
      val emitted = spark.table("wm_agg").as[(Timestamp, Long)].collect()
      assert(emitted.toSeq === Seq((ts(0), 2L)))
    } finally q.stop()
  }

  test("late data beyond the watermark is dropped, not re-aggregated") {
    val in = MemoryStream[(Timestamp, String)]
    val agg = in.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("start"), col("n"))
    val q = startAppend(agg, "wm_late")
    try {
      in.addData((ts(0), "a"), (ts(5), "b"))
      q.processAllAvailable()
      in.addData((ts(25), "c")) // watermark -> 15 min, window [0,10) emitted
      q.processAllAvailable()
      assert(spark.table("wm_late").count() === 1)

      // t=3 min is far behind the 15-minute watermark: its window was
      // finalized; the row must be discarded (no new emission, no
      // duplicate/updated window)
      in.addData((ts(3), "late"))
      q.processAllAvailable()
      val rows = spark.table("wm_late").as[(Timestamp, Long)].collect()
      assert(rows.toSeq === Seq((ts(0), 2L)))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark: dedups in-window, expires state after") {
    val in = MemoryStream[(Timestamp, String)]
    val dedup = in.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("k")
    val q = startAppend(dedup, "wm_dedup")
    try {
      // duplicate k within the watermark window -> emitted once
      in.addData((ts(0), "k1"), (ts(5), "k1"))
      q.processAllAvailable()
      assert(spark.table("wm_dedup").count() === 1)

      // advance the watermark far past k1's expiry (0 + 10 min)
      in.addData((ts(60), "k2"))
      q.processAllAvailable()
      assert(spark.table("wm_dedup").count() === 2)

      // k1's state has expired -> a fresh k1 is emitted again: state
      // is truly watermark-bounded, not grow-forever
      in.addData((ts(61), "k1"))
      q.processAllAvailable()
      val ks = spark.table("wm_dedup").as[(Timestamp, String)].collect()
        .map(_._2).toSeq
      assert(ks.count(_ == "k1") === 2 && ks.count(_ == "k2") === 1)
    } finally q.stop()
  }
}
