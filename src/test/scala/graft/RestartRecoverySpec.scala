package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Round-11 directive: the ack/nack story (S4/K3 — "never lose a
  * message, auto-recover from failures", reference README.md:13-17)
  * was proven for the stateless enrichment pipeline in round 8; this
  * spec extends the proof to a STATEFUL stream — a watermarked
  * windowed aggregate (the `stream_hourly_wm` shape) killed and
  * restarted from its checkpoint mid-corpus, with late rows arriving
  * after the restart into windows whose STATE the first incarnation
  * built.
  *
  * What restart must preserve, each pinned below:
  *  - source offsets: the second incarnation reads only the new file
  *    (no replay of committed chunks — ack = offset commit, S4);
  *  - state store: a window that received rows in BOTH incarnations
  *    emits the exact combined aggregate (state recovered once, not
  *    recomputed from raw history, not double-applied);
  *  - sink contract: per-key last-write-wins upsert over the
  *    update-mode emissions equals the batch mirror over the full
  *    corpus — exactly-once OUTPUT through the idempotent-by-batch
  *    sink even though emissions themselves are at-least-once.
  */
class RestartRecoverySpec extends SparkSpec {
  import spark.implicits._

  private val EvSchema = "ts timestamp, event_type string, value long"

  private def writeChunk(dir: String, name: String,
      rows: Seq[(String, String, Long)]): Unit =
    rows.toDF("ts_s", "event_type", "value")
      .select(col("ts_s").cast("timestamp").as("ts"),
        col("event_type"), col("value"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/.stage_$name")
      .ensuring(_ => {
        // the file stream source lists FILES; move the one part file
        // in atomically under a stable name
        val part = new java.io.File(s"$dir/.stage_$name").listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        java.nio.file.Files.move(part.toPath,
          java.nio.file.Paths.get(s"$dir/$name.parquet"))
        true
      })

  /** One incarnation: watermarked hourly agg in update mode, emissions
    * appended with their batch id (the replay-safe upsert journal). */
  private def runIncarnation(srcDir: String, ckpt: String,
      outDir: String): Seq[org.apache.spark.sql.streaming.StreamingQueryProgress] = {
    val q = spark.readStream.schema(EvSchema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("tv"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:00:00")
        .as("hour"), col("event_type"), col("n"), col("tv"))
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        batch.withColumn("batch_id", lit(id))
          .write.mode("append").parquet(outDir)
      }
      .start()
    q.awaitTermination()
    val prog = q.recentProgress.toSeq
    q.stop()
    prog
  }

  test("watermarked hourly aggregate killed and restarted from its " +
      "checkpoint: offsets resume, state recovers, upserted output " +
      "equals the batch mirror exactly once") {
    val srcDir = tmpDir("restart-src")
    val ckpt = tmpDir("restart-ckpt")
    val outDir = tmpDir("restart-out")
    val day = "2024-03-01"
    // chunk A: hours 0-3 (two files -> two micro-batches). After A the
    // watermark is max(A) - 1h = 02:30, so windows >= 02:00 stay LIVE
    // in state across the restart; windows 00/01 are finalized.
    val a1 = Seq((s"$day 00:10:00", "view", 5L), (s"$day 00:40:00", "view", 7L),
      (s"$day 01:10:00", "buy", 11L), (s"$day 01:20:00", "view", 1L))
    val a2 = Seq((s"$day 02:05:00", "view", 2L), (s"$day 02:45:00", "buy", 3L),
      (s"$day 03:15:00", "view", 9L), (s"$day 03:30:00", "buy", 4L))
    writeChunk(srcDir, "a1", a1)
    writeChunk(srcDir, "a2", a2)
    val prog1 = runIncarnation(srcDir, ckpt, outDir)
    val rows1 = prog1.map(_.numInputRows).sum
    assert(rows1 == (a1.size + a2.size).toLong,
      s"first incarnation must ingest all of chunk A, got $rows1")

    // the kill: the first incarnation is gone. Chunk B lands while
    // nothing is running — LATE rows into hour 03 (live state built
    // by incarnation 1) plus a fresh hour 04.
    val b = Seq((s"$day 03:50:00", "view", 20L),
      (s"$day 03:55:00", "buy", 30L), (s"$day 04:10:00", "view", 6L))
    writeChunk(srcDir, "b1", b)
    val prog2 = runIncarnation(srcDir, ckpt, outDir)
    val rows2 = prog2.map(_.numInputRows).sum
    assert(rows2 == b.size.toLong,
      s"restart must resume from committed offsets and read ONLY " +
        s"chunk B (${b.size} rows), got $rows2 — chunk A was replayed")

    // last-write-wins upsert over the emission journal
    val emitted = spark.read
      .schema("hour string, event_type string, n long, tv long, batch_id long")
      .parquet(outDir)
    val wLast = org.apache.spark.sql.expressions.Window
      .partitionBy(col("hour"), col("event_type"))
      .orderBy(col("batch_id").desc)
    val upserted = emitted.distinct()
      .withColumn("rk", row_number().over(wLast))
      .filter(col("rk") === 1)
      .select(col("hour"), col("event_type"), col("n"), col("tv"))
    val mirror = (a1 ++ a2 ++ b).toDF("ts_s", "event_type", "value")
      .select(col("ts_s").cast("timestamp").as("ts"),
        col("event_type"), col("value"))
      .groupBy(date_format(window(col("ts"), "1 hour")
          .getField("start"), "yyyy-MM-dd HH:00:00").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("tv"))
    val got = upserted.collect().map(_.toSeq).toSet
    val want = mirror.collect().map(_.toSeq).toSet
    assert(got == want,
      s"upserted restart output must equal the batch mirror exactly:\n" +
        s"got      $got\nexpected $want")
    // the cross-restart window specifically: hour 03 must show the
    // COMBINED aggregate (2 rows from A + 2 late rows from B per the
    // fixture) — the state-recovery crux
    val h3 = upserted.filter(col("hour") === s"$day 03:00:00")
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(h3 == Set(("view", 2L, 29L), ("buy", 2L, 34L)),
      s"hour-03 state must accumulate across the restart, got $h3")
  }
}
