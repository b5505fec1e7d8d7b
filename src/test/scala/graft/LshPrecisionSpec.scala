package graft

import graft.operators.DedupOps

/** Pins for `dedup_lsh_precision`: the sweep is computed over the
  * SAME candidate set at every threshold, counts are monotone in the
  * threshold, and each row matches a driver-side fold of the exact
  * Jaccard verifier's output. */
class LshPrecisionSpec extends SparkSpec {

  private lazy val sweep = DedupOps.dedupLshPrecision(spark, Sf).collect()
  private lazy val jac = DedupOps.dedupJaccard(spark, Sf)
    .select("jaccard").collect().map(_.getDouble(0))

  test("one row per threshold over a constant candidate set") {
    assert(sweep.map(_.getDouble(0)).toSeq == DedupOps.SweepThresholds)
    assert(sweep.map(_.getLong(1)).distinct.length == 1)
    assert(sweep.head.getLong(1) == jac.length)
  }

  test("n_true is non-increasing in the threshold and matches a " +
      "driver-side fold of the exact verifier") {
    val trues = sweep.map(_.getLong(2))
    assert(trues.zip(trues.tail).forall { case (a, b) => a >= b })
    sweep.foreach { r =>
      val t = r.getDouble(0)
      val want = jac.count(_ >= t).toLong
      assert(r.getLong(2) == want, s"threshold $t")
      assert(r.getDouble(3) == want.toDouble / jac.length.toDouble)
    }
  }
}
