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
      // and the drop is OBSERVABLE, not silent: the progress feed the
      // ops side monitors must account for the discarded row
      val dropped = q.recentProgress
        .flatMap(_.stateOperators).map(_.numRowsDroppedByWatermark).sum
      assert(dropped >= 1L,
        "late-row drops must surface in numRowsDroppedByWatermark")
    } finally q.stop()
  }

  /** Poll until the memory sink reaches `n` rows — timeout processing
    * runs in a no-data micro-batch that `processAllAvailable` does not
    * always wait for. */
  private def awaitCount(table: String, n: Long): Unit = {
    val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
    while (spark.table(table).count() < n && System.nanoTime() < deadline)
      Thread.sleep(100)
    assert(spark.table(table).count() === n)
  }

  test("sessionizer: idle user's open session is flushed by event-time timeout " +
      "and its state evicted") {
    import graft.operators.StreamOps
    val in = MemoryStream[(Timestamp, Long, Long)]
    // 10-minute watermark delay; the operator's gap is 30 minutes
    val events = in.toDF().toDF("ts", "user_id", "event_id")
      .withWatermark("ts", "10 minutes")
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("tsec"), col("ts"))
      .as[StreamOps.SessEvent]
    val q = startAppend(StreamOps.sessionize(events).toDF(), "wm_sess")
    try {
      // user 1: two events 5 minutes apart -> one open session, no output
      in.addData((ts(0), 1L, 10L), (ts(5), 1L, 11L))
      q.processAllAvailable()
      assert(spark.table("wm_sess").count() === 0)

      // user 2's event at t=60 pushes the watermark to 50 min — past
      // user 1's timeout deadline (end 5 + gap 30 = 35 min): the idle
      // session MUST be emitted without any further user-1 event
      in.addData((ts(60), 2L, 20L))
      q.processAllAvailable()
      awaitCount("wm_sess", 1)
      val flushed = spark.table("wm_sess")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(flushed === Set(
        (1L, 2L, ts(0).getTime / 1000, ts(5).getTime / 1000)))

      // state eviction proof: were the flushed session still in state,
      // user 1's event at t=61 would close it by gap and RE-EMIT the
      // (0,5) session — a duplicate row. Exactly 3 rows must exist.
      in.addData((ts(61), 1L, 12L))
      q.processAllAvailable()
      in.addData((ts(200), 1L, 13L))
      q.processAllAvailable()
      // the t=200 batch also times out user 2 (deadline 90 < wm 190)
      awaitCount("wm_sess", 3)
      val all = spark.table("wm_sess")
        .as[(Long, Long, Long, Long)].collect()
      assert(all.length === 3, s"duplicate emission: ${all.toSeq}")
      assert(all.toSet === Set(
        (1L, 2L, ts(0).getTime / 1000, ts(5).getTime / 1000),
        (2L, 1L, ts(60).getTime / 1000, ts(60).getTime / 1000),
        (1L, 1L, ts(61).getTime / 1000, ts(61).getTime / 1000)))
    } finally q.stop()
  }

  test("sessionStep: a session already expired vs the watermark is emitted " +
      "immediately, not deferred to a timeout that may never fire") {
    import graft.operators.StreamOps
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.Optional
    // open session ended at t=0; the eviction watermark has jumped to
    // 90 min (it can outrun the LAGGING late-event watermark across
    // batches, so an in-gap t=25min event still reaches the step).
    // The merged session's deadline (25+30=55 min) is behind the
    // watermark: it must close in THIS invocation — round 3's wm+1
    // deferred timeout never fires if the watermark stalls here,
    // diverging from the oracle's `deadline < final wm` rule.
    val state = TestGroupState.create[StreamOps.OpenSession](
      Optional.of(StreamOps.OpenSession(0L, 0L, 1L)),
      GroupStateTimeout.EventTimeTimeout, 0L,
      Optional.of(90L * 60000L), false)
    val out = StreamOps.sessionStep(7L,
      Iterator(StreamOps.SessEvent(7L, 1L, 25L * 60L, ts(25))), state).toList
    assert(out === List(StreamOps.ClosedSession(7L, 2L, 0L, 25L * 60L)))
    assert(state.isRemoved, "expired session's state must not linger")
  }

  test("sessionStep: deadline exactly AT the watermark stays open " +
      "(eviction is strict <) with a timeout just past the watermark") {
    import graft.operators.StreamOps
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.Optional
    val wmMs = (25L * 60L + StreamOps.SessionGapSec) * 1000L // == deadline
    val state = TestGroupState.create[StreamOps.OpenSession](
      Optional.of(StreamOps.OpenSession(0L, 0L, 1L)),
      GroupStateTimeout.EventTimeTimeout, 0L,
      Optional.of(wmMs), false)
    val out = StreamOps.sessionStep(7L,
      Iterator(StreamOps.SessEvent(7L, 1L, 25L * 60L, ts(25))), state).toList
    assert(out.isEmpty, "deadline == wm is not yet closed (strict <)")
    assert(state.isUpdated)
    assert(state.get === StreamOps.OpenSession(0L, 25L * 60L, 2L))
    assert(state.getTimeoutTimestampMs.get() === wmMs + 1L)
  }

  test("checkpointed restart: aggregation state survives and each window " +
      "is emitted exactly once across runs") {
    // the ack-fidelity claim (SURVEY S4/E5): offsets commit only after
    // a batch completes, state is reloaded from the checkpoint on
    // restart, and a finalized window is emitted exactly once even
    // when its state was built in a previous run of the query
    import scala.collection.mutable
    val in = MemoryStream[(Timestamp, String)]
    val ckpt = tmpDir("restart-ckpt")
    val emitted = mutable.Map.empty[Long, Seq[(Timestamp, Long)]]
    def startQ() = in.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("start"), col("n"))
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        val rows = df.collect().map(r => (r.getTimestamp(0), r.getLong(1))).toSeq
        // keyed by batchId — the documented idempotent-sink contract:
        // a replayed batch overwrites, never duplicates
        emitted.synchronized { emitted(id) = rows }
        ()
      }.start()

    val q1 = startQ()
    try {
      in.addData((ts(0), "a"), (ts(5), "b"))
      q1.processAllAvailable()
      in.addData((ts(25), "c")) // watermark -> 15: finalizes [0,10)
      q1.processAllAvailable()
    } finally q1.stop()
    val afterRun1 = emitted.synchronized(emitted.values.flatten.toSeq)
    assert(afterRun1 === Seq((ts(0), 2L)), s"run 1 emissions: $afterRun1")

    // data arrives while the query is DOWN; the restart must pick it
    // up from the committed offset and still hold [20,30)'s state
    in.addData((ts(65), "d")) // watermark -> 55: finalizes [20,30)
    val q2 = startQ()
    try q2.processAllAvailable() finally q2.stop()
    val all = emitted.synchronized(
      emitted.values.flatten.toList.sortBy(_._1.getTime))
    assert(all === List((ts(0), 2L), (ts(20), 1L)),
      s"windows must be emitted exactly once across restarts: $all")
  }

  test("sessionizer output is identical replayed as one batch or many triggers") {
    import graft.operators.StreamOps
    import java.nio.file.{Files, Paths}
    // time-ordered file split (the realistic deep-replay layout:
    // history arrives as time-partitioned files) — 4 files, replayed
    // with maxFilesPerTrigger=1 -> 4 micro-batches with the watermark
    // advancing between them, vs all 4 in one batch
    val dir = tmpDir("sess-replay")
    val ev = graft.sources.Tables.events(spark, Sf)
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("tsec"), col("ts"))
      .orderBy("tsec", "event_id").collect()
    val slices = ev.grouped((ev.length + 3) / 4).toSeq
    val schema = graft.sources.Tables.events(spark, Sf)
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("tsec"), col("ts")).schema
    slices.zipWithIndex.foreach { case (rows, i) =>
      spark.createDataFrame(
        new java.util.ArrayList(java.util.Arrays.asList(rows: _*)), schema)
        .coalesce(1).write.parquet(s"$dir/f$i")
      // file-source ordering is by modification time: force it
      val f = Files.list(Paths.get(s"$dir/f$i"))
        .filter(p => p.toString.endsWith(".parquet")).findFirst().get
      Files.move(f, Paths.get(s"$dir/part$i.parquet"))
      Files.setLastModifiedTime(Paths.get(s"$dir/part$i.parquet"),
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 60000L))
    }

    def replay(maxFiles: Option[Int], name: String): Seq[(Long, Long, Long, Long)] = {
      val reader = spark.readStream.schema(schema)
      val src = maxFiles.fold(reader)(n =>
        reader.option("maxFilesPerTrigger", n.toString))
        .parquet(dir).filter(col("ts").isNotNull)
        .withWatermark("ts", "1 hour")
        .as[StreamOps.SessEvent]
      val q = StreamOps.sessionize(src).toDF()
        .writeStream.format("memory").queryName(name).outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.table(name).as[(Long, Long, Long, Long)].collect().toSeq.sorted
    }

    val oneBatch = replay(None, "sess_one")
    val manyTriggers = replay(Some(1), "sess_many")
    assert(oneBatch.nonEmpty)
    assert(manyTriggers === oneBatch)
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
