package graft

import graft.operators.EventOps

/** Pins for `ev_user_kcore`: a driver-side peel of the referral graph
  * at sf0.001 (membership, both degrees, and a round count far inside
  * the oracle's unroll), and a planted clique + pendant-chain +
  * sub-core-cycle fixture.
  */
class KcoreSpec extends SparkSpec {

  /** Driver mirror of the peel; returns (core-degrees, full-degrees,
    * rounds). */
  private def peel(edges0: Set[(Long, Long)])
      : (Map[Long, Long], Map[Long, Long], Int) = {
    def degs(es: Set[(Long, Long)]): Map[Long, Long] =
      es.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val full = degs(edges0)
    var edges = edges0
    var rounds = 0
    var done = edges.isEmpty
    while (!done) {
      val keep = degs(edges).filter(_._2 >= EventOps.KcoreK).keySet
      val next = edges.filter(e => keep(e._1) && keep(e._2))
      rounds += 1
      done = next.size == edges.size || next.isEmpty
      edges = next
    }
    (degs(edges), full, rounds)
  }

  test("matches a driver-side peel at sf0.001, converging far " +
      "inside the oracle unroll") {
    val edges = EventOps.referralUndirected(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val (core, full, rounds) = peel(edges)
    assert(rounds <= EventOps.KcorePeelUnroll / 2,
      s"gate corpus peeled in $rounds rounds; the oracle unrolls " +
        s"${EventOps.KcorePeelUnroll} — headroom gone, raise the unroll")
    val got = SparkEntry.queries("ev_user_kcore")(spark, Sf).collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    assert(got.keySet == core.keySet)
    got.foreach { case (u, r) =>
      assert(r.getAs[Long]("core_degree") == core(u), s"user $u")
      assert(r.getAs[Long]("degree") == full(u), s"user $u")
      assert(core(u) >= EventOps.KcoreK,
        s"user $u survived the peel below K -- not a fixpoint")
      assert(core(u) <= full(u), s"user $u")
    }
  }

  test("planted: a 5-clique survives as the 3-core; a pendant chain " +
      "and a 4-cycle peel away entirely") {
    import spark.implicits._
    val clique = for {
      a <- 1L to 5L; b <- (a + 1) to 5L
    } yield (a, b)
    val chain = Seq((5L, 10L), (10L, 11L), (11L, 12L)) // pendant path
    val cycle = Seq((20L, 21L), (21L, 22L), (22L, 23L), (20L, 23L))
    val und = (clique ++ chain ++ cycle).toDF("u", "v")
    val out = EventOps.kcoreOf(und).collect()
      .map(r => (r.getAs[Long]("node"),
        (r.getAs[Long]("degree"), r.getAs[Long]("core_degree")))).toMap
    assert(out.keySet == (1L to 5L).toSet,
      "only the clique survives a 3-core peel")
    (1L to 4L).foreach { n =>
      assert(out(n) == ((4L, 4L)), s"node $n keeps all clique edges")
    }
    assert(out(5L) == ((5L, 4L)),
      "the chain anchor keeps the clique but loses its pendant edge")
  }
}
