package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.EventOps

/** Pins for `ev_cusum_change`: a driver-side exact fold on the dense
  * grid at sf0.001, and a planted level shift located exactly at the
  * last day of the old regime with the analytic peak value.
  */
class CusumSpec extends SparkSpec {

  test("matches a driver-side exact fold at sf0.001") {
    val daily = graft.sources.Tables.events(spark, Sf)
      .groupBy(col("event_type"),
        expr("unix_timestamp(ts) div 86400").as("day"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    val d0 = daily.keys.map(_._2).min
    val d1 = daily.keys.map(_._2).max
    val types = daily.keys.map(_._1).toSeq.distinct
    val got = SparkEntry.queries("ev_cusum_change")(spark, Sf)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    assert(got.keySet == types.toSet)
    types.foreach { t =>
      val xs = (d0 to d1).map(day => daily.getOrElse((t, day), 0L))
      val dd = xs.length.toLong
      val tt = xs.sum
      var s = 0L
      val walk = xs.zipWithIndex.map { case (x, i) =>
        s += x * dd - tt; (d0 + i, s.abs)
      }
      val (day, peak) = walk.maxBy { case (dy, a) => (a, -dy) }
      val r = got(t)
      assert(r.getAs[Long]("n_days") == dd, t)
      assert(r.getAs[Long]("total") == tt, t)
      assert(r.getAs[Long]("change_day") == day, t)
      assert(r.getAs[Long]("max_abs_s") == peak, t)
      assert(r.getAs[Double]("max_cusum") ==
        peak.toDouble / dd.toDouble, t)
    }
  }

  test("planted: a mid-series level shift peaks at the last day of " +
      "the old regime") {
    import spark.implicits._
    val base = Timestamp.valueOf("2024-01-01 12:00:00").getTime
    // days 0..9: one event/day; days 10..19: five events/day
    val events = (0 until 10).map { d =>
      Seq((d.toLong, new Timestamp(base + d * 86400000L)))
    }.flatten ++ (10 until 20).flatMap { d =>
      (0 until 5).map(i =>
        (100L + d * 5 + i, new Timestamp(base + d * 86400000L)))
    }
    val dir = tmpDir("cusum-planted")
    events.map { case (id, ts) => (id, ts, 1L, "view", 0.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = EventOps.evCusumChange(spark, dir).collect().head
    val day0 = base / 1000L / 86400L
    assert(r.getAs[Long]("n_days") == 20L)
    assert(r.getAs[Long]("total") == 60L)
    assert(r.getAs[Long]("change_day") == day0 + 9L,
      "the walk bottoms out on the old regime's last day")
    // each old-regime day contributes 1*20 - 60 = -40; ten of them
    assert(r.getAs[Long]("max_abs_s") == 400L)
    assert(r.getAs[Double]("max_cusum") == 20.0)
  }
}
