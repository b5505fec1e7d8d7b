package graft

import java.sql.Timestamp

import graft.operators.EventOps

/** Pins for `ev_anomaly_mad`: a driver-side recompute of the
  * all-integer 2×median / 4×MAD statistics at sf0.001, and a planted
  * corpus where ONE 10× spike day is flagged while the z-score's
  * spike-inflated σ would mask a smaller (but real) second anomaly —
  * the breakdown-point argument for running the robust monitor.
  */
class MadAnomalySpec extends SparkSpec {

  private def med2Of(xs: Seq[Long]): Long = {
    val s = xs.sorted
    val n = s.length
    s((n + 1) / 2 - 1) + s(n / 2 + 1 - 1)
  }

  test("matches a driver-side recompute at sf0.001") {
    import org.apache.spark.sql.functions._
    val daily = graft.sources.Tables.events(spark, Sf)
      .select(col("event_type"),
        expr("unix_timestamp(ts) div 86400").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq
    val byType = daily.groupBy(_._1)
    val got = SparkEntry.queries("ev_anomaly_mad")(spark, Sf).collect()
    assert(got.length == daily.length)
    got.foreach { r =>
      val t = r.getAs[String]("event_type")
      val day = r.getAs[Long]("day_sec") / 86400L
      val ns = byType(t).map(_._3)
      val med2 = med2Of(ns)
      val n = byType(t).find(_._2 == day).get._3
      val dev2 = math.abs(2 * n - med2)
      val mad4 = med2Of(byType(t).map(x => math.abs(2 * x._3 - med2)))
      assert(r.getAs[Long]("n") == n, s"$t/$day")
      assert(r.getAs[Long]("med2") == med2, s"$t")
      assert(r.getAs[Long]("dev2") == dev2, s"$t/$day")
      assert(r.getAs[Long]("mad4") == mad4, s"$t")
      assert(r.getAs[String]("verdict") ==
        (if (2 * dev2 > 3 * mad4) "anomaly" else "normal"))
    }
  }

  test("planted: MAD flags the 3x day the spike-inflated z-score " +
      "masks") {
    import spark.implicits._
    // 30 quiet days of 10 events, one 3x day (30), one 100x day
    // (1000). sigma ~ 178 -> the 3x day's z ~ 0.1 (masked); MAD = 0
    // deviation for quiet days, so both non-median days flag.
    val days = (1 to 30).map(d => (d, 10)) :+ ((31, 30)) :+ ((32, 1000))
    // each logical day d at 2024-01-01 + d days via epoch arithmetic
    val base = Timestamp.valueOf("2024-01-01 12:00:00").getTime
    val events = days.flatMap { case (d, k) =>
      (1 to k).map { i =>
        (d.toLong * 100000L + i,
          new Timestamp(base + d.toLong * 86400000L),
          i.toLong, "view", 1.0, "{}")
      }
    }
    val dir = tmpDir("mad-planted")
    events.toDF("event_id", "ts", "user_id", "event_type", "value",
      "props")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val out = EventOps.evAnomalyMad(spark, dir).collect()
    val flagged = out.filter(_.getAs[String]("verdict") == "anomaly")
      .map(_.getAs[Long]("n")).sorted.toSeq
    assert(flagged == Seq(30L, 1000L),
      s"exactly the 3x and 100x days must flag, got $flagged")
    // the z-score monitor at |z| > 3 would keep the 3x day: verify
    // the masking arithmetic that motivates the MAD twin
    val ns = days.map(_._2.toDouble)
    val mean = ns.sum / ns.length
    val std = math.sqrt(ns.map(x => x * x).sum / ns.length - mean * mean)
    assert(math.abs((30.0 - mean) / std) < 3.0,
      "fixture invariant: the 3x day must be inside 3 sigma")
  }
}
