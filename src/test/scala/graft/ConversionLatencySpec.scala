package graft

import java.sql.Timestamp

import graft.operators.EventOps

/** Pins for `ev_conversion_latency`: the decade buckets recomputed in
  * the driver from the attribution pairing at sf0.001 (mass
  * conservation against the purchase count), and a planted stream
  * hitting each decade plus the unattributed bucket.
  */
class ConversionLatencySpec extends SparkSpec {

  private def bucketOf(lat: Option[Long]): String = lat match {
    case None => "unattributed"
    case Some(l) if l <= 1L => "d0_1s"
    case Some(l) if l <= 10L => "d1_10s"
    case Some(l) if l <= 100L => "d2_100s"
    case Some(l) if l <= 1000L => "d3_1000s"
    case Some(l) if l <= 10000L => "d4_10000s"
    case _ => "d5_over"
  }

  test("buckets recompute from the attribution pairing; mass equals " +
      "the purchase count at sf0.001") {
    val att = SparkEntry.queries("ev_attribution")(spark, Sf).collect()
      .map { r =>
        val p = r.getAs[Long]("purchase_tsec")
        val c = if (r.isNullAt(r.fieldIndex("click_tsec"))) None
          else Some(r.getAs[Long]("click_tsec"))
        bucketOf(c.map(p - _))
      }
    val expected = att.groupBy(identity).view.mapValues(_.length.toLong)
      .toMap
    val got = SparkEntry.queries("ev_conversion_latency")(spark, Sf)
      .collect().map(r => r.getAs[String]("bucket") -> r).toMap
    assert(got.keySet == expected.keySet)
    val total = att.length.toLong
    expected.foreach { case (b, n) =>
      assert(got(b).getAs[Long]("n") == n, s"bucket $b")
      assert(got(b).getAs[Double]("share") ==
        n.toDouble / total.toDouble, s"bucket $b")
    }
    assert(got.values.map(_.getAs[Long]("n")).sum == total,
      "every purchase lands in exactly one bucket")
  }

  test("planted: one purchase per decade plus an unattributed one") {
    import spark.implicits._
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def t(sec: Long) = new Timestamp(base + sec * 1000L)
    var id = 0L
    def ev(sec: Long, u: Long, typ: String) = {
      id += 1; (id, t(sec), u, typ, 1.0, "{}")
    }
    val events = Seq(
      ev(0L, 1L, "click"), ev(1L, 1L, "purchase"),        // d0
      ev(100L, 2L, "click"), ev(107L, 2L, "purchase"),    // d1
      ev(200L, 3L, "click"), ev(280L, 3L, "purchase"),    // d2
      ev(1000L, 4L, "click"), ev(1900L, 4L, "purchase"),  // d3
      ev(5000L, 5L, "click"), ev(14000L, 5L, "purchase"), // d4
      ev(20000L, 6L, "click"), ev(90000L, 6L, "purchase"),// d5
      ev(99000L, 7L, "purchase"))                         // no click
    val dir = tmpDir("convlat")
    events.toDF("event_id", "ts", "user_id", "event_type", "value",
        "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = EventOps.evConversionLatency(spark, dir).collect()
      .map(r => r.getAs[String]("bucket") -> r.getAs[Long]("n")).toMap
    assert(out == Map("d0_1s" -> 1L, "d1_10s" -> 1L, "d2_100s" -> 1L,
      "d3_1000s" -> 1L, "d4_10000s" -> 1L, "d5_over" -> 1L,
      "unattributed" -> 1L))
  }
}
