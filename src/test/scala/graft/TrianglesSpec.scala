package graft

import graft.operators.EventOps

/** Pins for `ev_user_triangles`: a planted K4-plus-pendant graph with
  * hand-computed degrees/triangle counts/clustering pushed through
  * the degree-oriented core (the K4 exercises the equal-degree
  * tie-break; the pendant exercises the deg<2 clustering guard), and
  * a driver-side brute-force census of the sf0.001 referral graph
  * against the full registered query.
  */
class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  test("K4 plus a pendant: counts and clustering exact through the " +
      "degree-oriented core") {
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (1L, 5L)).toDF("u", "v")
    val got = EventOps.trianglesOf(edges).collect()
      .map(r => r.getAs[Long]("node") ->
        ((r.getAs[Long]("degree"), r.getAs[Long]("tri_count"),
          r.getAs[Double]("clustering")))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(got(1L) == ((4L, 3L, 0.5)),
      "hub: 3 of its C(4,2)=6 neighbor pairs close")
    Seq(2L, 3L, 4L).foreach { n =>
      assert(got(n) == ((3L, 3L, 1.0)), s"K4 corner $n fully clustered")
    }
    assert(got(5L) == ((1L, 0L, 0.0)), "pendant: deg<2 guard")
  }

  test("matches a driver-side brute-force census at sf0.001") {
    val und = EventOps.referralUndirected(spark, Sf)
      .as[(Long, Long)].collect().toSet
    assert(und.nonEmpty)
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
    und.foreach { case (u, v) =>
      adj(u) = adj.getOrElse(u, Set.empty) + v
      adj(v) = adj.getOrElse(v, Set.empty) + u
    }
    val want = adj.map { case (n, nb) =>
      val nbs = nb.toSeq.sorted
      val t = (for {
        i <- nbs.indices
        j <- (i + 1) until nbs.length
        if und.contains((nbs(i), nbs(j)))
      } yield 1).size.toLong
      n -> ((nb.size.toLong, t))
    }.toMap
    val got = SparkEntry.queries("ev_user_triangles")(spark, Sf)
      .collect()
    assert(got.map(_.getAs[Long]("user_id")).toSet == want.keySet)
    got.foreach { r =>
      val (d, t) = want(r.getAs[Long]("user_id"))
      assert(r.getAs[Long]("degree") == d)
      assert(r.getAs[Long]("tri_count") == t)
      val expC = if (d >= 2) (t * 2L).toDouble / (d * (d - 1L)).toDouble
        else 0.0
      assert(r.getAs[Double]("clustering") == expC)
    }
  }
}
