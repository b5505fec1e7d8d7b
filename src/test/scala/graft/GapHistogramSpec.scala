package graft

import org.apache.spark.sql.functions._

import graft.operators.EventOps

/** Pins for `ev_gap_histogram`: a driver-side fold of per-(user,
  * type) consecutive gaps, and a planted stream hitting every decade
  * bucket including the zero-gap edge.
  */
class GapHistogramSpec extends SparkSpec {
  import spark.implicits._

  private def bucket(g: Long): String =
    EventOps.GapEdgesSec.find(g < _).map(e => s"lt_${e}s")
      .getOrElse(s"ge_${EventOps.GapEdgesSec.last}s")

  test("matches a driver-side gap fold at sf0.001") {
    val evs = graft.sources.Tables.events(spark, Sf)
      .select(col("user_id"), col("event_type"), col("event_id"),
        expr("unix_timestamp(ts)").as("ts_sec"))
      .as[(Long, String, Long, Long)].collect()
    val gaps = evs.groupBy(e => (e._1, e._2)).toSeq.flatMap {
      case ((_, t), rows) =>
        rows.sortBy(r => (r._4, r._3)).sliding(2)
          .collect { case Array(a, b) => t -> (b._4 - a._4) }
    }
    val want = gaps.groupBy { case (t, g) => (t, bucket(g)) }.map {
      case (k, gs) =>
        k -> ((gs.length.toLong, gs.map(_._2).min, gs.map(_._2).max))
    }
    val got = SparkEntry.queries("ev_gap_histogram")(spark, Sf).collect()
    assert(got.length == want.size)
    got.foreach { r =>
      val k = (r.getAs[String]("event_type"), r.getAs[String]("gap_bucket"))
      val (n, mn, mx) = want(k)
      assert(r.getAs[Long]("n_gaps") == n, k)
      assert(r.getAs[Long]("min_gap_sec") == mn, k)
      assert(r.getAs[Long]("max_gap_sec") == mx, k)
    }
  }

  test("a planted stream hits every decade including the zero-gap " +
      "edge") {
    // one user, one type, event times: 0, 0 (gap 0), 5 (5), 55 (50),
    // 555 (500), 5555 (5000), 55555 (50000)
    val times = Seq(0L, 0L, 5L, 55L, 555L, 5555L, 55555L)
    val rows = times.zipWithIndex.map { case (t, i) =>
      (i + 1L, t, 9L, "a")
    }
    val dir = tmpDir("gap-hist")
    rows.toDF("event_id", "ts_sec", "user_id", "event_type")
      .select(col("event_id"), timestamp_seconds(col("ts_sec")).as("ts"),
        col("user_id"), col("event_type"), lit(1.0).as("value"),
        lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventOps.evGapHistogram(spark, dir).collect()
      .map(r => r.getAs[String]("gap_bucket") ->
        r.getAs[Long]("n_gaps")).toMap
    assert(got == Map("lt_1s" -> 1L, "lt_10s" -> 1L, "lt_100s" -> 1L,
      "lt_1000s" -> 1L, "lt_10000s" -> 1L, "ge_10000s" -> 1L))
  }
}
