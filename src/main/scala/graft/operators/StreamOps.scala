package graft.operators

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.functions.Exact._
import graft.sources.Tables

/** Structured Streaming exercised through the oracle gate: each query
  * here REALLY runs a streaming query (readStream → transform →
  * memory sink, `Trigger.AvailableNow`) over the events parquet, then
  * returns the materialized result for the driver's DuckDB compare —
  * proving the streaming path computes exactly what the equivalent
  * batch SQL computes.
  *
  * Complete-mode aggregation is used where the batch oracle must see
  * every group (append mode would withhold the final watermark
  * window); watermark/append/late-data semantics are covered by
  * ScalaTest specs instead, where a controlled source can drive the
  * watermark (SURVEY.md §5 "timing-sensitive tests" note).
  */
object StreamOps {
  type Q = (SparkSession, String) => DataFrame

  private val nameCounter = new AtomicLong(0)

  /** readStream over the events parquet with the same nanos→micros
    * timestamp rebuild as the batch loader. The file stream source
    * needs a *directory*, so the single parquet file is exposed via a
    * symlink in a temp dir (zero-copy). */
  private def eventsStream(s: SparkSession, d: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft-stream-src")
    Files.createSymbolicLink(
      dir.resolve("events.parquet"), Paths.get(s"$d/events.parquet"))
    val schema = Tables.load(s, d, "events").schema
    s.readStream.schema(schema).parquet(dir.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  private def runToTable(s: SparkSession, df: DataFrame, mode: String)
      : DataFrame = {
    val qn = s"graft_stream_${nameCounter.incrementAndGet()}"
    val q = df.writeStream.format("memory").queryName(qn)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    s.table(qn)
  }

  /** Streaming hourly aggregate — must equal the batch `ev_hourly`. */
  val streamHourly: Q = (s, d) => {
    val agg = eventsStream(s, d)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd HH:00:00").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(money(col("value"))).as("tv"))
    runToTable(s, agg, "complete")
      .select(col("hour"), col("event_type"), col("n"),
        asD(col("tv")).as("total_value"))
      .orderBy("hour", "event_type")
  }

  /** Streaming exact dedup (state-store backed dropDuplicates) — the
    * emitted key set must equal batch DISTINCT. */
  val streamDedupKeys: Q = (s, d) => {
    val dedup = eventsStream(s, d)
      .select(col("user_id"), col("event_type"))
      .dropDuplicates("user_id", "event_type")
    runToTable(s, dedup, "append")
      .orderBy("user_id", "event_type")
  }

  val defs: Map[String, Q] = Map(
    "stream_hourly" -> streamHourly,
    "stream_dedup_keys" -> streamDedupKeys)

  val oracle: Map[String, String] = Map(
    "stream_hourly" ->
      s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
          event_type, COUNT(*) AS n,
          CAST(SUM(${sqlMoney("value")}) AS DOUBLE) AS total_value
          FROM events GROUP BY hour, event_type ORDER BY hour, event_type""",
    "stream_dedup_keys" ->
      """SELECT DISTINCT user_id, event_type FROM events
         ORDER BY user_id, event_type""")
}
