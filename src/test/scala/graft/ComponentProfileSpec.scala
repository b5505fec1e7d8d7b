package graft

import graft.operators.DedupOps

/** Pins for `dedup_component_profile`: the profile covers exactly the
  * multi-member components, respects connectivity lower bounds, and
  * its per-component stats match a driver-side fold of the labeling
  * and the exact-Jaccard edge list it claims to aggregate. */
class ComponentProfileSpec extends SparkSpec {

  private lazy val profile =
    DedupOps.dedupComponentProfile(spark, Sf).collect()
  private lazy val comps = DedupOps.dedupComponents(spark, Sf).collect()
    .map(r => r.getLong(0) -> r.getLong(1)).toMap
  private lazy val edges = DedupOps.dedupJaccard(spark, Sf).collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))

  test("one row per multi-member component, none missing, no singletons") {
    val want = comps.groupBy(_._2).filter(_._2.size > 1).keySet
    assert(profile.map(_.getLong(0)).toSet == want)
  }

  test("a connected component on n members aggregates at least n-1 " +
      "edges, and min <= max") {
    profile.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1) - 1,
        s"component ${r.getLong(0)}: ${r.getLong(2)} edges cannot " +
          s"connect ${r.getLong(1)} members")
      assert(r.getDouble(3) <= r.getDouble(4), r.toString)
    }
  }

  test("stats match a driver-side fold of labeling + edge list") {
    val byComp = edges.groupBy { case (a, _, _) => comps(a) }
    profile.foreach { r =>
      val es = byComp(r.getLong(0))
      assert(r.getLong(1) == comps.count(_._2 == r.getLong(0)).toLong)
      assert(r.getLong(2) == es.length.toLong)
      assert(r.getDouble(3) == es.map(_._3).min)
      assert(r.getDouble(4) == es.map(_._3).max)
    }
  }
}
