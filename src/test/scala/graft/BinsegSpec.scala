package graft

/** Pins for `ev_changepoint_binseg`: the full-series rows must equal
  * `ev_cusum_change` (same statistic, same pick), and the children
  * must partition the parent exactly (days and totals conserve, the
  * split lands on the parent's change day).
  */
class BinsegSpec extends SparkSpec {

  test("full rows = the parent CUSUM query; children partition the " +
      "grid exactly at the parent's change day") {
    val rows = SparkEntry.queries("ev_changepoint_binseg")(spark, Sf)
      .collect()
      .groupBy(_.getAs[String]("event_type"))
    assert(rows.nonEmpty)
    val parent = SparkEntry.queries("ev_cusum_change")(spark, Sf)
      .collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    rows.foreach { case (t, segs) =>
      val by = segs.map(r => r.getAs[String]("seg") -> r).toMap
      val full = by("full")
      val p = parent(t)
      assert(full.getAs[Long]("n_days") == p.getAs[Long]("n_days"))
      assert(full.getAs[Long]("total") == p.getAs[Long]("total"))
      assert(full.getAs[Long]("change_day") == p.getAs[Long]("change_day"))
      assert(full.getAs[Long]("max_abs_s") == p.getAs[Long]("max_abs_s"))
      val left = by.get("left")
      val right = by.get("right")
      val childDays = left.map(_.getAs[Long]("n_days")).getOrElse(0L) +
        right.map(_.getAs[Long]("n_days")).getOrElse(0L)
      val childTotal = left.map(_.getAs[Long]("total")).getOrElse(0L) +
        right.map(_.getAs[Long]("total")).getOrElse(0L)
      assert(childDays == full.getAs[Long]("n_days"), s"$t days conserve")
      assert(childTotal == full.getAs[Long]("total"), s"$t mass conserves")
      left.foreach { l =>
        assert(l.getAs[Long]("change_day") <= full.getAs[Long]("change_day"),
          "the left pick stays inside the left segment")
      }
      right.foreach { r =>
        assert(r.getAs[Long]("change_day") > full.getAs[Long]("change_day"),
          "the right pick stays inside the right segment")
      }
    }
  }
}
