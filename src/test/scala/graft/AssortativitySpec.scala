package graft

import graft.operators.EventOps

/** Pins for `ev_graph_assortativity`: a driver-side exact-moment
  * mirror at sf0.001, the star graph at exactly -1.0, and the
  * regular-graph / empty-graph 0.0 pins.
  */
class AssortativitySpec extends SparkSpec {

  private def mirror(edges: Seq[(Long, Long)])
      : (Long, Long, Double) = {
    val deg = edges.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val xs = edges.flatMap(e =>
      Seq((deg(e._1), deg(e._2)), (deg(e._2), deg(e._1))))
    val m = xs.size.toLong
    val sx = xs.map(p => BigInt(p._1)).sum
    val sxx = xs.map(p => BigInt(p._1) * BigInt(p._1)).sum
    val sxy = xs.map(p => BigInt(p._1) * BigInt(p._2)).sum
    val r =
      if (m == 0L || xs.map(_._1).distinct.size == 1) 0.0
      else (m.toDouble * sxy.toDouble - sx.toDouble * sx.toDouble) /
        (m.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble)
    (deg.size.toLong, m / 2, r)
  }

  test("matches a driver-side exact-moment mirror at sf0.001") {
    val edges = EventOps.referralUndirected(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val (n, e, r) = mirror(edges)
    val row = SparkEntry.queries("ev_graph_assortativity")(spark, Sf)
      .collect().head
    assert(row.getAs[Long]("n_nodes") == n)
    assert(row.getAs[Long]("n_edges") == e)
    assert(row.getAs[Double]("assortativity") == r)
    // a correlation is a correlation
    assert(r >= -1.0 - 1e-12 && r <= 1.0 + 1e-12)
  }

  test("planted: a star is exactly -1; a clique (regular) pins 0.0") {
    import spark.implicits._
    val star = (2L to 9L).map(i => (1L, i)).toDF("u", "v")
    val starRow = EventOps.assortativityOf(star).collect().head
    assert(starRow.getAs[Double]("assortativity") == -1.0,
      "hub-to-leaf degrees are perfectly anticorrelated")
    assert(starRow.getAs[Long]("n_nodes") == 9L)
    assert(starRow.getAs[Long]("n_edges") == 8L)
    val clique = (for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b))
      .toDF("u", "v")
    val cliqueRow = EventOps.assortativityOf(clique).collect().head
    assert(cliqueRow.getAs[Double]("assortativity") == 0.0,
      "zero degree variance must pin 0.0, not NaN")
  }
}
