package graft

import org.apache.spark.sql.functions._

import graft.operators.EventOps

/** Pins for `ev_watermark_audit`: a driver-side fold of the
  * running-max disorder per stream, and a planted out-of-order stream
  * whose drop counts at each candidate delay are known exactly.
  */
class WatermarkAuditSpec extends SparkSpec {
  import spark.implicits._

  test("matches a driver-side running-max fold at sf0.001") {
    val evs = graft.sources.Tables.events(spark, Sf)
      .select(col("event_type"), col("event_id"),
        expr("unix_timestamp(ts)").as("ts_sec"))
      .as[(String, Long, Long)].collect()
    val want = evs.groupBy(_._1).map { case (t, rows) =>
      val ordered = rows.sortBy(_._2)
      var maxPrev = Long.MinValue
      val dis = ordered.map { r =>
        val d = if (maxPrev == Long.MinValue) 0L
          else math.max(maxPrev - r._3, 0L)
        maxPrev = math.max(maxPrev, r._3)
        d
      }
      t -> ((ordered.length.toLong, dis.max,
        EventOps.WmDelaysSec.map(dl => dis.count(_ > dl).toLong)))
    }
    val got = SparkEntry.queries("ev_watermark_audit")(spark, Sf)
      .collect()
    assert(got.map(_.getAs[String]("event_type")).toSet == want.keySet)
    got.foreach { r =>
      val (n, maxDis, lates) = want(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n_events") == n)
      assert(r.getAs[Long]("max_disorder_sec") == maxDis)
      EventOps.WmDelaysSec.zip(lates).foreach { case (dl, lw) =>
        assert(r.getAs[Long](s"late_at_${dl}s") == lw,
          s"${r.getAs[String]("event_type")} delay $dl")
      }
    }
  }

  test("planted disorder: drop counts step down as the candidate " +
      "delay absorbs the lateness") {
    // arrival (event_id) order with event-time seconds:
    //   a: 1000, 2000, 1500 (150 s... no: 500 s late), 2000+3601 -> next
    //   disorder profile: [0, 0, 500, 0, 4000]
    val rows = Seq(
      (1L, 1000L), (2L, 2000L), (3L, 1500L), (4L, 6000L), (5L, 2000L))
    val dir = tmpDir("wm-audit")
    rows.map { case (id, sec) => (id, sec, 7L, "a") }
      .toDF("event_id", "ts_sec", "user_id", "event_type")
      .select(col("event_id"), timestamp_seconds(col("ts_sec")).as("ts"),
        col("user_id"), col("event_type"), lit(1.0).as("value"),
        lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = EventOps.evWatermarkAudit(spark, dir).collect()
    assert(r.length == 1)
    val row = r.head
    // disorders: id1 0, id2 0, id3 2000-1500=500, id4 0, id5 6000-2000=4000
    assert(row.getAs[Long]("n_events") == 5L)
    assert(row.getAs[Long]("max_disorder_sec") == 4000L)
    assert(row.getAs[Long]("late_at_0s") == 2L,
      "both out-of-order events drop with no tolerance")
    assert(row.getAs[Long]("late_at_600s") == 1L,
      "10 minutes absorbs the 500 s straggler only")
    assert(row.getAs[Long]("late_at_3600s") == 1L,
      "the 4000 s straggler outlives even the 1 h delay")
  }
}
