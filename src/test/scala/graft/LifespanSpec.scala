package graft

import java.sql.Timestamp

import graft.operators.EventOps

/** Pins for `ev_user_lifespan`: the survival-table conservation laws
  * on sf0.001 plus a planted corpus with known lifespans, censoring,
  * and hazards. */
class LifespanSpec extends SparkSpec {

  test("conservation laws at sf0.001: risk set telescopes, age 0 " +
      "covers every user, events + censored = leavers") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("ev_user_lifespan")(spark, Sf)
      .collect()
    val nUsers = graft.sources.Tables.events(spark, Sf)
      .select(col("user_id")).distinct().count()
    assert(rows.head.getAs[Long]("age_days") == 0L)
    assert(rows.head.getAs[Long]("n_at_risk") == nUsers,
      "every user is at risk at age 0")
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("n_at_risk") ==
        a.getAs[Long]("n_at_risk") - a.getAs[Long]("n_churned") -
          a.getAs[Long]("n_censored"),
        s"risk set must telescope at age ${a.getAs[Long]("age_days")}")
    }
    val last = rows.last
    assert(last.getAs[Long]("n_at_risk") ==
      last.getAs[Long]("n_churned") + last.getAs[Long]("n_censored"))
    rows.foreach { r =>
      assert(r.getAs[Double]("hazard") ==
        r.getAs[Long]("n_churned").toDouble /
          r.getAs[Long]("n_at_risk").toDouble)
    }
  }

  test("planted: lifespans, right-censoring on the max day, hazards") {
    import spark.implicits._
    val base = Timestamp.valueOf("2024-01-01 12:00:00").getTime
    def at(day: Long) = new Timestamp(base + day * 86400000L)
    // user 1: days 0..2 (lifespan 2, churned)
    // user 2: days 0..5 (lifespan 5, last day = corpus max -> CENSORED)
    // user 3: day 1 only (lifespan 0, churned)
    // user 4: days 4..5 (lifespan 1, censored)
    val events = Seq(
      (1L, at(0), 1L), (2L, at(2), 1L),
      (3L, at(0), 2L), (4L, at(5), 2L),
      (5L, at(1), 3L),
      (6L, at(4), 4L), (7L, at(5), 4L))
    val dir = tmpDir("lifespan-planted")
    events.map { case (id, ts, u) => (id, ts, u, "view", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val out = EventOps.evUserLifespan(spark, dir).collect()
      .map(r => r.getAs[Long]("age_days") -> r).toMap
    assert(out.keySet == (0L to 5L).toSet)
    assert(out(0L).getAs[Long]("n_at_risk") == 4L)
    assert(out(0L).getAs[Long]("n_churned") == 1L) // user 3
    assert(out(0L).getAs[Long]("n_censored") == 0L)
    assert(out(1L).getAs[Long]("n_at_risk") == 3L)
    assert(out(1L).getAs[Long]("n_censored") == 1L) // user 4
    assert(out(1L).getAs[Long]("n_churned") == 0L)
    assert(out(2L).getAs[Long]("n_churned") == 1L) // user 1
    assert(out(5L).getAs[Long]("n_at_risk") == 1L)
    assert(out(5L).getAs[Long]("n_censored") == 1L) // user 2
    assert(out(5L).getAs[Long]("n_churned") == 0L,
      "a max-day user must never count as churned")
    assert(out(0L).getAs[Double]("hazard") == 0.25)
  }
}
