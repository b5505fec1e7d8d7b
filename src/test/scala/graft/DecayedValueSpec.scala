package graft

import java.sql.Timestamp

import graft.operators.EventOps

/** Pins for `ev_decayed_value`: a driver-side fold of the integer
  * shift-decay at sf0.001 (cents taken from the engine's own
  * DECIMAL(12,2) cast so the pin targets the decay arithmetic, not
  * the rounding), and a planted ledger hitting the exact-halving,
  * floor, and week-boundary arms.
  */
class DecayedValueSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("matches a driver-side fold of the shift decay at sf0.001") {
    val rows = graft.sources.Tables.events(spark, Sf)
      .select(col("user_id"),
        (graft.functions.Exact.money(col("value")) * 100).cast("long")
          .as("cents"),
        to_date(col("ts")).as("day"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDate(2).toLocalDate))
    val maxd = rows.map(_._3).max
    val exp = rows.groupBy(_._1).map { case (u, es) =>
      val ages = es.map { case (_, c, day) =>
        val age = java.time.temporal.ChronoUnit.DAYS.between(day, maxd)
        (c, age, c >> (age / EventOps.DecayHalfLifeDays).toInt)
      }
      u -> ((es.length.toLong, ages.map(_._1).sum, ages.map(_._3).sum,
        ages.map(_._2).min))
    }
    val got = SparkEntry.queries("ev_decayed_value")(spark, Sf).collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    assert(got.size == exp.size)
    exp.foreach { case (u, (n, raw, dec, age)) =>
      val r = got(u)
      assert(r.getAs[Long]("n_events") == n, s"user $u")
      assert(r.getAs[Long]("raw_cents") == raw, s"user $u")
      assert(r.getAs[Long]("decayed_cents") == dec, s"user $u")
      assert(r.getAs[Long]("last_age_days") == age, s"user $u")
      assert(r.getAs[Double]("decayed_value") == dec.toDouble / 100.0,
        s"user $u")
    }
    // decay must bite somewhere or the operator degenerates to a sum
    assert(exp.exists { case (_, (_, raw, dec, _)) => dec < raw })
  }

  test("planted: one halving per whole week of age, with the " +
      "per-event floor") {
    import spark.implicits._
    def t(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      // user 1: 8.00 at ages 0/7/14 days -> 800 + 400 + 200 cents
      (1L, t("2024-02-01 00:00:00"), 1L, "buy", 8.00, "{}"),
      (2L, t("2024-01-25 00:00:00"), 1L, "buy", 8.00, "{}"),
      (3L, t("2024-01-18 00:00:00"), 1L, "buy", 8.00, "{}"),
      // user 2: 8.01 at age 21 days -> 801 >> 3 = 100 (floor)
      (4L, t("2024-01-11 00:00:00"), 2L, "buy", 8.01, "{}"),
      // user 3: age 6 days is still week 0 -> undecayed
      (5L, t("2024-01-26 00:00:00"), 3L, "buy", 2.50, "{}"))
    val dir = tmpDir("decay-planted")
    events.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = EventOps.evDecayedValue(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    assert(out(1L).getAs[Long]("raw_cents") == 2400L)
    assert(out(1L).getAs[Long]("decayed_cents") == 1400L)
    assert(out(1L).getAs[Long]("last_age_days") == 0L)
    assert(out(1L).getAs[Double]("decayed_value") == 14.0)
    assert(out(2L).getAs[Long]("decayed_cents") == 100L,
      "801 cents three half-lives old floors to 100, not 100.125")
    assert(out(3L).getAs[Long]("decayed_cents") == 250L,
      "six days is inside the first half-life -- no decay")
  }

  test("an event >= 64 half-lives old decays to ZERO -- the shift is " +
      "clamped, so Java's mod-64 shift wrap cannot resurrect full " +
      "undecayed cents") {
    import spark.implicits._
    def t(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      // age 448 days = exactly 64 half-lives: unclamped shiftright
      // would wrap to shift 0 and contribute the FULL 800 cents
      (1L, t("2022-11-10 00:00:00"), 1L, "buy", 8.00, "{}"),
      // age 700 days = 100 half-lives: also wraps without the clamp
      (2L, t("2022-03-03 00:00:00"), 1L, "buy", 8.00, "{}"),
      // the max-date anchor (age 0, undecayed)
      (3L, t("2024-02-01 00:00:00"), 1L, "buy", 1.00, "{}"))
    val dir = tmpDir("decay-wrap")
    events.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = EventOps.evDecayedValue(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    assert(out(1L).getAs[Long]("raw_cents") == 1700L)
    assert(out(1L).getAs[Long]("decayed_cents") == 100L,
      "both ancient events must contribute 0, not 800 each")
  }
}
