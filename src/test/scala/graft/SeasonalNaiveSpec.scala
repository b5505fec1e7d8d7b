package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.EventOps

/** Pins for `ev_seasonal_naive`: a driver-side dense-grid fold at
  * sf0.001 (zero-event hours forecast and are forecast against), and
  * a planted exactly-weekly stream at wMAPE 0 with a deviation
  * costing exactly its integer error mass.
  */
class SeasonalNaiveSpec extends SparkSpec {

  test("matches a driver-side dense-calendar fold at sf0.001") {
    val rows = graft.sources.Tables.events(spark, Sf)
      .groupBy(col("event_type"),
        expr("unix_timestamp(ts) div 3600").as("hour"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    val types = rows.keys.map(_._1).toSeq.distinct.sorted
    val h0 = rows.keys.map(_._2).min
    val h1 = rows.keys.map(_._2).max
    val lag = EventOps.SeasonalLagHours
    val got = SparkEntry.queries("ev_seasonal_naive")(spark, Sf)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    assert(got.keySet == types.toSet)
    types.foreach { t =>
      val hours = (h0 + lag) to h1
      val errs = hours.map { h =>
        val a = rows.getOrElse((t, h), 0L)
        val f = rows.getOrElse((t, h - lag), 0L)
        (a, (a - f).abs)
      }
      val r = got(t)
      assert(r.getAs[Long]("n_hours") == hours.length.toLong, t)
      assert(r.getAs[Long]("total_actual") == errs.map(_._1).sum, t)
      assert(r.getAs[Long]("total_abs_err") == errs.map(_._2).sum, t)
      assert(r.getAs[Double]("mae") ==
        errs.map(_._2).sum.toDouble / hours.length.toDouble, t)
    }
  }

  test("planted: an exactly weekly stream scores wMAPE 0; one " +
      "deviation costs its exact error mass") {
    import spark.implicits._
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def at(hourOffset: Long, id: Long) =
      (id, new Timestamp(base + hourOffset * 3600000L), 1L, "view",
        0.0, "{}")
    // hour 0 and hour 168: one event each (perfect repeat); hour 170:
    // two events vs zero forecast at hour 2 -> abs err 2
    val events = Seq(at(0L, 1L), at(168L, 2L), at(170L, 3L),
      at(170L, 4L))
    val dir = tmpDir("seasonal-planted")
    events.toDF("event_id", "ts", "user_id", "event_type", "value",
        "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = EventOps.evSeasonalNaive(spark, dir).collect().head
    // evaluated hours: 168..170 -> actual (1, 0, 2), forecast (1, 0, 0)
    assert(r.getAs[Long]("n_hours") == 3L)
    assert(r.getAs[Long]("total_actual") == 3L)
    assert(r.getAs[Long]("total_abs_err") == 2L,
      "only the unforecast spike at hour 170 errs")
    assert(r.getAs[Double]("wmape") == 2.0 / 3.0)
  }
}
