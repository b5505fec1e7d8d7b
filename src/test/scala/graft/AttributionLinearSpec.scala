package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.EventOps

/** Pins for `ev_attribution_linear`: a driver-side mirror of the
  * forward assignment + largest-remainder split at sf0.001 (which is
  * also the exact-conservation proof), and a planted stream hitting
  * the remainder split, the untouched-purchase, and the
  * orphan-click arms.
  */
class AttributionLinearSpec extends SparkSpec {

  test("matches a driver-side mirror at sf0.001 and conserves every " +
      "purchase's cents exactly") {
    val rows = graft.sources.Tables.events(spark, Sf)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("tsec"), col("event_type"),
        (graft.functions.Exact.money(col("value")) * 100).cast("long")
          .as("cents"), hour(col("ts")).as("hh"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4), r.getInt(5)))
    // forward as-of: first purchase at-or-after each click
    case class Touch(hh: Int, tsec: Long, id: Long, nxt: Long)
    val touches = rows.groupBy(_._1).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._3, if (e._4 == "purchase") 1 else 0, e._2))
      var next = Option.empty[Long] // packed, scanning right to left
      sorted.reverseIterator.flatMap { e =>
        if (e._4 == "purchase") {
          val packed = e._3 * EventOps.AttrPackScale + e._2
          next = Some(next.fold(packed)(math.min(_, packed)))
          None
        } else next.map(p => Touch(e._6, e._3, e._2, p))
      }.toSeq
    }.toSeq
    val pcents = rows.filter(_._4 == "purchase")
      .map(e => (e._3 * EventOps.AttrPackScale + e._2) -> e._5).toMap
    val credits = touches.groupBy(_.nxt).toSeq.flatMap { case (nxt, ts) =>
      val k = ts.size.toLong
      val c = pcents(nxt)
      ts.sortBy(t => (t.tsec, t.id)).zipWithIndex.map { case (t, i) =>
        (t.hh, c / k + (if (i.toLong < c % k) 1L else 0L), nxt)
      }
    }
    // conservation: the split loses no cent of any touched purchase
    credits.groupBy(_._3).foreach { case (nxt, cs) =>
      assert(cs.map(_._2).sum == pcents(nxt), s"purchase $nxt")
    }
    val expected = credits.groupBy(_._1).map { case (hh, cs) =>
      hh.toLong -> ((cs.size.toLong, cs.map(_._3).distinct.size.toLong,
        cs.map(_._2).sum))
    }
    val got = SparkEntry.queries("ev_attribution_linear")(spark, Sf)
      .collect().map(r => r.getAs[Long]("click_hour") -> r).toMap
    assert(got.size == expected.size)
    expected.foreach { case (hh, (n, np, cc)) =>
      val r = got(hh)
      assert(r.getAs[Long]("n_touches") == n, s"hour $hh")
      assert(r.getAs[Long]("n_purchases") == np, s"hour $hh")
      assert(r.getAs[Long]("credit_cents") == cc, s"hour $hh")
      assert(r.getAs[Double]("credit") == cc.toDouble / 100.0, s"hour $hh")
    }
  }

  test("planted: 100 cents over 3 touches splits 34/33/33 in time " +
      "order; orphan clicks and untouched purchases get nothing") {
    import spark.implicits._
    def t(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      // user 1: three clicks in hours 1/2/3, then a 1.00 purchase
      (1L, t("2024-01-01 01:00:00"), 1L, "click", 0.0, "{}"),
      (2L, t("2024-01-01 02:00:00"), 1L, "click", 0.0, "{}"),
      (3L, t("2024-01-01 03:00:00"), 1L, "click", 0.0, "{}"),
      (4L, t("2024-01-01 04:00:00"), 1L, "purchase", 1.00, "{}"),
      // orphan click after the purchase: no credit
      (5L, t("2024-01-01 05:00:00"), 1L, "click", 0.0, "{}"),
      // user 2: a purchase with no clicks: contributes nothing
      (6L, t("2024-01-01 06:00:00"), 2L, "purchase", 9.99, "{}"))
    val dir = tmpDir("attr-linear")
    events.toDF("event_id", "ts", "user_id", "event_type", "value",
        "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = EventOps.evAttributionLinear(spark, dir).collect()
      .map(r => r.getAs[Long]("click_hour") -> r).toMap
    assert(out.keySet == Set(1L, 2L, 3L),
      "the orphan click's hour 5 must not appear")
    assert(out(1L).getAs[Long]("credit_cents") == 34L,
      "the remainder cent goes to the EARLIEST touch")
    assert(out(2L).getAs[Long]("credit_cents") == 33L)
    assert(out(3L).getAs[Long]("credit_cents") == 33L)
    assert(out.values.map(_.getAs[Long]("credit_cents")).sum == 100L,
      "conservation: exactly the purchase's 100 cents, 9.99 untouched")
  }
}
