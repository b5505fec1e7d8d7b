package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.operators.EventOps

/** Pins for `ev_user_hits`: a driver-side BigInt power iteration
  * reproducing both L1-normalized half-steps bit-for-bit, mass
  * conservation up to div floors, a planted star graph separating
  * hubs from authorities, and the all-zero contract on an edgeless
  * corpus.
  */
class HitsSpec extends SparkSpec {
  import spark.implicits._

  private val S = EventOps.HitsScale

  /** The referral edges exactly as the query builds them. */
  private def refEdges(sfDir: String): Seq[(Long, Long, Long)] = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts_sec"), col("event_id"))
    graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("unix_timestamp(ts)").as("ts_sec"))
      .withColumn("next_user", lead(col("user_id"), 1).over(w))
      .filter(col("next_user").isNotNull)
      .filter(graft.functions.Hashing.charHash(
        col("user_id").cast("string")) % 10 < EventOps.PrEngagedPct)
      .groupBy(col("user_id").as("src"), col("next_user").as("dst"))
      .agg(count(lit(1)).as("w"))
      .as[(Long, Long, Long)].collect().toSeq
  }

  /** BigInt mirror of the weighted L1-normalized iteration. */
  private def refHits(nodes: Seq[Long], edges: Seq[(Long, Long, Long)])
      : (Map[Long, BigInt], Map[Long, BigInt]) = {
    var h: Map[Long, BigInt] =
      nodes.map(_ -> BigInt(S / nodes.size)).toMap
    var a: Map[Long, BigInt] = Map.empty
    for (_ <- 1 to EventOps.HitsIters) {
      val araw = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map(e => h.getOrElse(e._1, BigInt(0)) * e._3).sum }
      val sa = araw.values.sum
      a = araw.map { case (d, v) => d -> v * S / sa }
      val hraw = edges.groupBy(_._1).map { case (src, es) =>
        src -> es.map(e => a(e._2) * e._3).sum }
      val sh = hraw.values.sum
      h = hraw.map { case (sr, v) => sr -> v * S / sh }
    }
    (a, h)
  }

  test("matches the driver-side BigInt iteration bit-for-bit at " +
      "sf0.001") {
    val nodes = graft.sources.Tables.events(spark, Sf)
      .select(col("user_id")).distinct().as[Long].collect().toSeq
    val (wantA, wantH) = refHits(nodes, refEdges(Sf))
    val rows = SparkEntry.queries("ev_user_hits")(spark, Sf).collect()
    assert(rows.length == nodes.size,
      "a user dropped out of the hits relation")
    rows.foreach { r =>
      val u = r.getAs[Long]("user_id")
      assert(BigInt(r.getAs[Long]("auth_scaled")) ==
        wantA.getOrElse(u, BigInt(0)), s"auth u$u")
      assert(BigInt(r.getAs[Long]("hub_scaled")) ==
        wantH.getOrElse(u, BigInt(0)), s"hub u$u")
      assert(r.getAs[Double]("authority") ==
        r.getAs[Long]("auth_scaled").toDouble / S.toDouble)
      assert(r.getAs[Double]("hub") ==
        r.getAs[Long]("hub_scaled").toDouble / S.toDouble)
    }
  }

  test("both vectors conserve L1 mass up to quantization floors") {
    val rows = SparkEntry.queries("ev_user_hits")(spark, Sf)
      .select(col("auth_scaled"), col("hub_scaled"))
      .as[(Long, Long)].collect()
    val (ta, th) = (rows.map(_._1).sum, rows.map(_._2).sum)
    assert(ta <= S && th <= S, "normalization can only LOSE mass")
    assert(ta >= S * 99L / 100L, s"authority mass leaked: $ta")
    assert(th >= S * 99L / 100L, s"hub mass leaked: $th")
  }

  /** Engaged user ids (hash residue < 7) and a lurker id (>= 7),
    * discovered by mirroring the gate. */
  private def byResidue(pred: Long => Boolean, k: Int): Seq[Long] = {
    def res(u: Long): Long = {
      var h = 0L
      u.toString.foreach(c => h = (h * 31 + c.toLong) % 2147483647L)
      h % 10
    }
    (1L to 500L).filter(u => pred(res(u))).take(k)
  }

  test("planted star: referrers become hubs, the referred-to becomes " +
      "THE authority with zero hub mass") {
    val spokes = byResidue(_ < EventOps.PrEngagedPct, 3)
    val center = byResidue(_ < EventOps.PrEngagedPct, 4).last
    // three event-type streams, each [spoke_i, center]: edges
    // spoke_i -> center only (center never transitions out)
    val rows = spokes.zipWithIndex.flatMap { case (sp, i) =>
      Seq((i * 2 + 1L, i * 100L + 10L, sp, s"t$i"),
        (i * 2 + 2L, i * 100L + 20L, center, s"t$i"))
    }
    val dir = tmpDir("hits-star")
    rows.toDF("event_id", "ts_sec", "user_id", "event_type")
      .select(col("event_id"), timestamp_seconds(col("ts_sec")).as("ts"),
        col("user_id"), col("event_type"), lit(1.0).as("value"),
        lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = EventOps.evUserHits(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("auth_scaled"), r.getAs[Long]("hub_scaled"))))
      .toMap
    assert(out(center)._1 >= S - 10L,
      s"the star center holds ~all authority: ${out(center)}")
    assert(out(center)._2 == 0L, "no out-referrals -> zero hub mass")
    spokes.foreach { sp =>
      assert(out(sp)._1 == 0L, s"spoke $sp has no in-referrals")
      assert(out(sp)._2 >= S / spokes.length - 10L &&
        out(sp)._2 <= S / spokes.length + 10L,
        s"equal spokes split hub mass evenly: ${out(sp)}")
    }
  }

  test("an edgeless corpus (all lurkers) emits every user at exactly " +
      "zero") {
    val lurkers = byResidue(_ >= EventOps.PrEngagedPct, 2)
    val rows = lurkers.zipWithIndex.map { case (u, i) =>
      (i + 1L, i * 10L + 5L, u, "t0")
    }
    val dir = tmpDir("hits-empty")
    rows.toDF("event_id", "ts_sec", "user_id", "event_type")
      .select(col("event_id"), timestamp_seconds(col("ts_sec")).as("ts"),
        col("user_id"), col("event_type"), lit(1.0).as("value"),
        lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = EventOps.evUserHits(spark, dir).collect()
    assert(out.length == lurkers.length)
    out.foreach { r =>
      assert(r.getAs[Long]("auth_scaled") == 0L)
      assert(r.getAs[Long]("hub_scaled") == 0L)
    }
  }
}
