package graft

import java.sql.Timestamp

import graft.operators.EventOps

/** Pins for `ev_type_overlap`: a driver-side exact set fold at
  * sf0.001 and a planted corpus whose disjoint audiences must still
  * appear (grid completion) at Jaccard 0.
  */
class TypeOverlapSpec extends SparkSpec {

  test("matches a driver-side exact set fold at sf0.001, covering " +
      "every type pair") {
    val tu = graft.sources.Tables.events(spark, Sf)
      .select("event_type", "user_id").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val sets = tu.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val types = sets.keys.toSeq.sorted
    val got = SparkEntry.queries("ev_type_overlap")(spark, Sf).collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b"))
        -> r).toMap
    val expectedPairs = for {
      a <- types; b <- types if a < b
    } yield (a, b)
    assert(got.keySet == expectedPairs.toSet,
      "every pair reports, shared audience or not")
    expectedPairs.foreach { case (a, b) =>
      val inter = (sets(a) intersect sets(b)).size.toLong
      val union = (sets(a) union sets(b)).size.toLong
      val r = got((a, b))
      assert(r.getAs[Long]("n_a") == sets(a).size.toLong)
      assert(r.getAs[Long]("n_b") == sets(b).size.toLong)
      assert(r.getAs[Long]("n_inter") == inter, s"pair ($a,$b)")
      assert(r.getAs[Long]("n_union") == union, s"pair ($a,$b)")
      assert(r.getAs[Double]("jaccard") ==
        inter.toDouble / union.toDouble, s"pair ($a,$b)")
    }
  }

  test("planted: disjoint audiences report Jaccard 0, not a missing " +
      "row") {
    import spark.implicits._
    def t(i: Int) = Timestamp.valueOf(f"2024-01-01 00:00:0$i")
    val events = Seq(
      (1L, t(1), 1L, "view", 0.0, "{}"),
      (2L, t(2), 2L, "view", 0.0, "{}"),
      (3L, t(3), 3L, "click", 0.0, "{}"),
      (4L, t(4), 2L, "purchase", 1.0, "{}"))
    val dir = tmpDir("overlap-planted")
    events.toDF("event_id", "ts", "user_id", "event_type", "value",
        "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = EventOps.evTypeOverlap(spark, dir).collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b"))
        -> r).toMap
    assert(out.size == 3)
    assert(out(("click", "view")).getAs[Long]("n_inter") == 0L)
    assert(out(("click", "view")).getAs[Double]("jaccard") == 0.0)
    assert(out(("purchase", "view")).getAs[Double]("jaccard") == 0.5,
      "user 2 of {1,2} x {2}")
  }
}
