package graft

import java.sql.Timestamp

import graft.operators.StreamOps

/** Pins for the hot-key-banded stream-stream interval joins: the
  * (user, hour-bucket) equi-key must be RESULT-NEUTRAL vs the bare
  * range semantics — every cross-bucket match still found, interval
  * edges exact, no pair duplicated by the purchase-side explode, no
  * view double-emitted by the click-side explode. (The round-12 skew
  * probe caught the bare-user key at 187× under a 20%-one-user
  * corpus; banding took it to ~2×.)
  */
class IntervalBandingSpec extends SparkSpec {

  private def writeEvents(dir: String,
      rows: Seq[(Long, String, Long, String)]): Unit = {
    import spark.implicits._
    rows.map { case (id, ts, u, tpe) =>
      (id, Timestamp.valueOf(ts), u, tpe, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
  }

  test("planted interval join: cross-bucket matches found, edges " +
      "exact, no duplicate pairs from the explode") {
    val dir = tmpDir("band-interval")
    writeEvents(dir, Seq(
      (1L, "2024-01-01 10:30:00", 1L, "purchase"),
      (10L, "2024-01-01 09:30:00", 1L, "click"), // exactly 1h before: IN
      (11L, "2024-01-01 09:29:59", 1L, "click"), // 1h+1s before: OUT
      (12L, "2024-01-01 09:45:00", 1L, "click"), // previous hour bucket: IN
      (13L, "2024-01-01 10:00:00", 1L, "click"), // same bucket: IN
      (14L, "2024-01-01 10:30:00", 1L, "click"), // equal ts: IN
      (15L, "2024-01-01 10:31:00", 1L, "click"), // after purchase: OUT
      (16L, "2024-01-01 10:00:00", 2L, "click"))) // other user: OUT
    val out = StreamOps.streamIntervalJoin(spark, dir).collect()
    val pairs = out.map(r => (r.getAs[Long]("purchase_id"),
      r.getAs[Long]("click_id"))).toSeq
    assert(pairs.sorted == Seq((1L, 10L), (1L, 12L), (1L, 13L), (1L, 14L)))
    assert(pairs.distinct.size == pairs.size,
      "the two-bucket purchase explode must never mint duplicate pairs")
  }

  test("planted conversion window: a view with clicks in BOTH its " +
      "buckets is still emitted exactly once") {
    val dir = tmpDir("band-conv")
    writeEvents(dir, Seq(
      (1L, "2024-01-01 10:30:00", 1L, "view"),
      // two matching clicks in different hour buckets of the view's
      // [v, v+1h] window: 10:45 (bucket 10) and 11:15 (bucket 11)
      (10L, "2024-01-01 10:45:00", 1L, "click"),
      (11L, "2024-01-01 11:15:00", 1L, "click"),
      (2L, "2024-01-01 12:00:00", 1L, "view"),
      (12L, "2024-01-01 13:00:00", 1L, "click"), // exactly v+1h: IN
      (3L, "2024-01-01 14:00:00", 1L, "view"),
      (13L, "2024-01-01 15:00:01", 1L, "click"), // v+1h+1s: OUT
      (4L, "2024-01-01 16:00:00", 2L, "view"))) // no click: OUT
    val out = StreamOps.streamConversionWindow(spark, dir).collect()
    val ids = out.map(_.getAs[Long]("view_id")).toSeq
    assert(ids.sorted == Seq(1L, 2L),
      s"views 1 (two-bucket clicks, once) and 2 (edge) convert; got $ids")
    assert(ids.distinct.size == ids.size,
      "left-semi over the exploded click side must not double-emit")
  }
}
