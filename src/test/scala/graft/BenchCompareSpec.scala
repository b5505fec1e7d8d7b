package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the paired same-binary reproducibility statistic (round 15):
  * the exact scenario the retired 5%-of-totals bar failed on — a
  * host-wide multiplicative swing — must PASS, a genuine single-query
  * regression must FLAG that query and fail, and the rep-interval
  * noise model must absorb within-run dispersion the way a fixed
  * percentile bar cannot. Also replays the committed round-14 run
  * pair where the totals bar failed, proving the paired statistic
  * passes on it (the verdict's "Done" criterion).
  */
class BenchCompareSpec extends AnyFunSuite {

  private def reps(qs: (String, Seq[Double])*): Map[String, Seq[Double]] =
    qs.toMap

  // a 20-query baseline with realistic dispersion: rep i of query q
  // deterministic but uneven (pseudo-noise ±12%)
  private val base: Map[String, Seq[Double]] =
    (1 to 20).map { q =>
      val t = 0.2 + q * 0.3
      s"q$q" -> Seq(t, t * 1.12, t * 0.94)
    }.toMap

  test("identical runs pass with host factor 1") {
    val r = BenchCompare.compare(base, base)
    assert(r.pass && r.hostFactor == 1.0 && r.hostComparable)
    assert(r.nQueries == 20)
  }

  test("uniform 1.3x host swing passes — the scenario that killed " +
      "the totals bar — while the totals delta reads 30%") {
    val swung = base.view.mapValues(_.map(_ * 1.3)).toMap
    val r = BenchCompare.compare(base, swung)
    assert(r.pass, s"host weather must not fail the gate: ${r.flags}")
    assert(math.abs(r.hostFactor - 1.3) < 1e-9 && !r.hostComparable)
    assert(r.totalsDeltaPct > 25.0,
      "…precisely where the old 5%-of-totals bar would have failed")
  }

  test("a genuine single-query regression flags that query and " +
      "fails, even under a simultaneous host swing") {
    val b = base.view.mapValues(_.map(_ * 1.15)).toMap
      .updated("q7", base("q7").map(_ * 1.15 * 2.0)) // 2x real regression
    val r = BenchCompare.compare(base, b)
    assert(!r.pass)
    assert(r.flags.map(f => (f.query, f.direction)) ==
      Seq(("q7", "regressed")))
    // the host factor still reads the swing, not the regression
    assert(math.abs(r.hostFactor - 1.15) < 0.01)
  }

  test("an unexplained improvement is flagged symmetrically") {
    val b = base.updated("q3", base("q3").map(_ / 2.0))
    val r = BenchCompare.compare(base, b)
    assert(r.flags.map(f => (f.query, f.direction)) ==
      Seq(("q3", "improved")))
  }

  test("noisy-but-overlapping rep intervals never flag: each query's " +
      "own within-run spread is its noise model") {
    // B shifted +25% on medians but with wide reps whose ranges still
    // overlap A's after normalization (m = 1.0 here: only q1 moves)
    val a = base.updated("q1", Seq(1.0, 1.4, 0.9))
    val b = base.updated("q1", Seq(1.35, 1.1, 1.6))
    assert(BenchCompare.compare(a, b).pass)
  }

  test("the absolute floor keeps a sub-50ms query from flagging on " +
      "jitter, however large its ratio") {
    val a = base.updated("tiny", Seq(0.010, 0.011, 0.012))
    val b = base.updated("tiny", Seq(0.040, 0.041, 0.045)) // 4x, but 30ms
    assert(BenchCompare.compare(a, b).pass)
  }

  test("failed reps (-1) are dropped per query; a query failing all " +
      "reps on one side is excluded, not compared") {
    val a = base.updated("q2", Seq(-1.0, base("q2")(1), base("q2")(2)))
      .updated("dead", Seq(-1.0, -1.0, -1.0))
    val b = base.updated("dead", Seq(1.0, 1.0, 1.0))
    val r = BenchCompare.compare(a, b)
    assert(r.pass && r.nQueries == 20)
  }

  test("round-14 committed pair replay: the runs where the totals " +
      "bar failed pass the paired statistic with zero flags") {
    // the verdict's Done criterion, pinned against the committed
    // artifacts so the calibration can never silently rot
    val runD = BenchCompare.parseReps("benchdata/bench_v2_runD_reps.json")
    val close = BenchCompare.parseReps("benchdata/bench_v2_close_reps.json")
    val r = BenchCompare.compare(runD, close)
    assert(math.abs(r.totalsDeltaPct) > 5.0,
      "this pair is only interesting because totals disagree > 5%")
    assert(r.pass, s"same-binary pair must pass: ${r.flags.map(_.query)}")
    // and the known cross-BINARY pair still catches its plan change
    val runA = BenchCompare.parseReps("benchdata/bench_v2_runA_reps.json")
    val x = BenchCompare.compare(runA, runD)
    assert(x.flags.map(_.query) == Seq("dedup_sn_multipass"),
      "the pre- vs post-JW-prune pair must flag exactly the changed query")
  }
}
