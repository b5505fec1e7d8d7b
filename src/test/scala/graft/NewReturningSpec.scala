package graft

import org.apache.spark.sql.functions._

/** Pins for `ev_new_vs_returning`: a driver-side exact fold at
  * sf0.001 plus the conservation laws (the first day is all new;
  * every user is new exactly once; active = new + returning).
  */
class NewReturningSpec extends SparkSpec {

  test("matches a driver-side exact fold with the conservation laws") {
    val userDays = graft.sources.Tables.events(spark, Sf)
      .select(col("user_id"), expr("unix_timestamp(ts) div 86400")
        .as("day"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val firstDay = userDays.groupBy(_._1).view.mapValues(_.map(_._2).min)
      .toMap
    val expected = userDays.groupBy(_._2).map { case (day, us) =>
      day -> ((us.size.toLong,
        us.count(u => firstDay(u._1) == day).toLong))
    }
    val got = SparkEntry.queries("ev_new_vs_returning")(spark, Sf)
      .collect().map(r => r.getAs[Long]("day") -> r).toMap
    assert(got.size == expected.size)
    expected.foreach { case (day, (active, nw)) =>
      val r = got(day)
      assert(r.getAs[Long]("n_active") == active, s"day $day")
      assert(r.getAs[Long]("n_new") == nw, s"day $day")
      assert(r.getAs[Long]("n_returning") == active - nw, s"day $day")
      assert(r.getAs[Double]("new_share") ==
        nw.toDouble / active.toDouble, s"day $day")
    }
    val firstRow = got(got.keys.min)
    assert(firstRow.getAs[Long]("n_new") == firstRow.getAs[Long]("n_active"),
      "on the corpus's first day everyone is new")
    assert(got.values.map(_.getAs[Long]("n_new")).sum ==
      firstDay.size.toLong, "every user is new exactly once")
  }
}
