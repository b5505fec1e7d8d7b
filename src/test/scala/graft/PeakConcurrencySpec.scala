package graft

import java.sql.Timestamp

import graft.operators.EventOps

/** Pins for `ev_peak_concurrency`: a driver-side sweep over the
  * engine's own session intervals at sf0.001, and a planted corpus
  * pinning the stack, the earliest-peak tie, and the
  * departure-before-arrival boundary convention.
  */
class PeakConcurrencySpec extends SparkSpec {

  private def sweep(iv: Seq[(Long, Long)]): (Long, Long) = {
    val bounds = iv.flatMap { case (s, e) => Seq((s, 1L), (e + 1, -1L)) }
      .sortBy { case (t, d) => (t, d) }
    var live = 0L; var peak = 0L; var peakT = Long.MaxValue
    bounds.foreach { case (t, d) =>
      live += d
      if (live > peak) { peak = live; peakT = t }
    }
    (peak, peakT)
  }

  test("matches a driver-side sweep over the engine's sessions at " +
      "sf0.001") {
    val iv = SparkEntry.queries("ev_sessionize")(spark, Sf).collect()
      .map(r => (r.getAs[Long]("start_sec"), r.getAs[Long]("end_sec")))
      .toSeq
    val (peak, peakT) = sweep(iv)
    val r = SparkEntry.queries("ev_peak_concurrency")(spark, Sf)
      .collect().head
    assert(r.getAs[Long]("n_sessions") == iv.size.toLong)
    assert(r.getAs[Long]("peak_concurrent") == peak)
    assert(r.getAs[Long]("first_peak_sec") == peakT)
    assert(peak >= 1L && peak <= iv.size.toLong)
  }

  test("planted: three overlapping sessions stack to 3; a session " +
      "starting the second another expires does not overlap it") {
    import spark.implicits._
    def t(sec: Long) = new Timestamp(
      Timestamp.valueOf("2024-01-01 00:00:00").getTime + sec * 1000L)
    // one user = one session (events 1 s apart stay in-session)
    val events = Seq(
      (1L, t(0L), 1L), (2L, t(100L), 1L),      // [0, 100]
      (3L, t(50L), 2L), (4L, t(150L), 2L),     // [50, 150]
      (5L, t(60L), 3L), (6L, t(90L), 3L),      // [60, 90]
      (7L, t(151L), 4L), (8L, t(200L), 4L))    // [151, 200] abuts #2
    val dir = tmpDir("peak-planted")
    events.map { case (id, ts, u) => (id, ts, u, "view", 0.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = EventOps.evPeakConcurrency(spark, dir).collect().head
    assert(r.getAs[Long]("n_sessions") == 4L)
    assert(r.getAs[Long]("peak_concurrent") == 3L,
      "sessions 1/2/3 overlap at t=60; session 4 must NOT stack on " +
        "session 2's expiry second")
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime / 1000L
    assert(r.getAs[Long]("first_peak_sec") == base + 60L)
  }

  test("the registered (day-sharded) plan equals the global audit " +
      "sweep at sf0.001") {
    val audit = SparkEntry.queries("ev_peak_concurrency_audit")(spark, Sf)
      .collect()
    val production = SparkEntry.queries("ev_peak_concurrency")(spark, Sf)
      .collect()
    assert(production.toSeq == audit.toSeq)
  }

  test("planted: a session OPEN ACROSS MIDNIGHT is carried into the " +
      "next day's shard by the seed") {
    import spark.implicits._
    def t(s: String) = Timestamp.valueOf(s)
    // user 1's session spans midnight UTC (events 10 min apart stay
    // in-session); users 2 and 3 are short sessions entirely inside
    // day 2, stacking on top of the carried-open session 1
    val events = Seq(
      (1L, t("2024-01-01 23:50:00"), 1L),
      (2L, t("2024-01-02 00:10:00"), 1L),
      (3L, t("2024-01-02 00:05:00"), 2L),
      (4L, t("2024-01-02 00:08:00"), 2L),
      (5L, t("2024-01-02 00:06:00"), 3L),
      (6L, t("2024-01-02 00:07:00"), 3L))
    val dir = tmpDir("peak-midnight")
    events.map { case (id, ts, u) => (id, ts, u, "view", 0.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val g = EventOps.evPeakConcurrency(spark, dir).collect().head
    val s = EventOps.evPeakConcurrencySharded(spark, dir).collect().head
    assert(g.getAs[Long]("peak_concurrent") == 3L,
      "the midnight-spanning session must count inside day 2")
    assert(s.getAs[Long]("n_sessions") == g.getAs[Long]("n_sessions"))
    assert(s.getAs[Long]("peak_concurrent") ==
      g.getAs[Long]("peak_concurrent"))
    assert(s.getAs[Long]("first_peak_sec") ==
      g.getAs[Long]("first_peak_sec"))
  }
}
