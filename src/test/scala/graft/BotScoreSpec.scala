package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.functions.Hashing
import graft.operators.EventOps

/** Pins for `ev_bot_score`: a driver-side exact fold of all three
  * rules at sf0.001, and a planted corpus with a referral 5-clique
  * (ring rule), a round-the-clock whale (rate + all-hours = bot), and
  * a night owl (all-hours only).
  */
class BotScoreSpec extends SparkSpec {

  test("matches a driver-side exact fold of the three rules at " +
      "sf0.001") {
    val pu = graft.sources.Tables.events(spark, Sf)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), countDistinct(hour(col("ts"))).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nUsers = pu.length.toLong
    val total = pu.map(_._2).sum
    val edges = EventOps.referralUndirected(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val nbrs = edges.toSeq.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def triOf(u: Long): Long = nbrs.get(u).fold(0L) { ns =>
      ns.toSeq.combinations(2).count(p =>
        edges.contains((p(0) min p(1), p(0) max p(1)))).toLong
    }
    val expected = pu.flatMap { case (u, n, h) =>
      val deg = nbrs.get(u).fold(0L)(_.size.toLong)
      val tri = triOf(u)
      val rate = n * nUsers > total * 3L
      val hours = h >= 20L
      val ring = deg >= 4L && tri * 10L >= deg * (deg - 1L) * 4L
      val flags = Seq(rate, hours, ring).count(identity).toLong
      if (flags >= 1L)
        Some(u -> ((n, h, deg, tri, rate, hours, ring, flags)))
      else None
    }.toMap
    val got = SparkEntry.queries("ev_bot_score")(spark, Sf).collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (u, (n, h, deg, tri, rate, hours, ring, f)) =>
      val r = got(u)
      assert(r.getAs[Long]("n_events") == n, s"user $u")
      assert(r.getAs[Long]("n_hours") == h, s"user $u")
      assert(r.getAs[Long]("degree") == deg, s"user $u")
      assert(r.getAs[Long]("tri_count") == tri, s"user $u")
      assert(r.getAs[Boolean]("rate_flag") == rate, s"user $u")
      assert(r.getAs[Boolean]("allhours_flag") == hours, s"user $u")
      assert(r.getAs[Boolean]("ring_flag") == ring, s"user $u")
      assert(r.getAs[Long]("n_flags") == f, s"user $u")
      assert(r.getAs[Boolean]("bot") == (f >= 2L), s"user $u")
    }
  }

  test("planted: a referral 5-clique rings, a round-the-clock whale " +
      "is a bot, a night owl is a suspect only") {
    import spark.implicits._
    // engaged users (hash residue < PrEngagedPct) found via the engine
    val engaged = spark.range(1, 200)
      .filter(Hashing.charHash(col("id").cast("string")) % 10 <
        EventOps.PrEngagedPct)
      .collect().map(_.longValue())
    val ring = engaged.take(5)
    assert(ring.length == 5)
    val whale = 9001L
    val owl = 9002L
    var id = 0L
    val buf = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Timestamp, Long, String, Double, String)]
    def t(min: Long) =
      new Timestamp(Timestamp.valueOf("2024-01-01 00:00:00").getTime +
        min * 60000L)
    // one event_type per clique edge -> exactly that referral edge
    for (i <- 0 until 5; j <- (i + 1) until 5) {
      id += 1; buf += ((id, t(id), ring(i), s"e$i$j", 0.0, "{}"))
      id += 1; buf += ((id, t(id), ring(j), s"e$i$j", 0.0, "{}"))
    }
    // whale: 50 events across 21 distinct hours
    (0 until 50).foreach { k =>
      id += 1; buf += ((id, t(k % 21 * 60L + 2), whale, "w", 0.0, "{}"))
    }
    // owl: one event in each of 20 hours
    (0 until 20).foreach { k =>
      id += 1; buf += ((id, t(k * 60L + 30), owl, "o", 0.0, "{}"))
    }
    val dir = tmpDir("bot-planted")
    buf.toSeq.toDF("event_id", "ts", "user_id", "event_type", "value",
        "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = EventOps.evBotScore(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    ring.foreach { u =>
      assert(out.contains(u), s"clique member $u must be a suspect")
      assert(out(u).getAs[Boolean]("ring_flag"), s"user $u")
      assert(!out(u).getAs[Boolean]("bot"),
        s"one rule alone must not convict user $u")
    }
    assert(out(whale).getAs[Boolean]("rate_flag"))
    assert(out(whale).getAs[Boolean]("allhours_flag"))
    assert(out(whale).getAs[Boolean]("bot"))
    assert(out(owl).getAs[Boolean]("allhours_flag"))
    assert(!out(owl).getAs[Boolean]("bot"))
  }
}
