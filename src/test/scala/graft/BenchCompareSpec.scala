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
    // artifacts so the calibration can never silently rot (frozen
    // under r14_* names — the live bench_v2_* files are overwritten
    // by every round's gate)
    val runD = BenchCompare.parseReps("benchdata/r14_runD_reps.json")
    val close = BenchCompare.parseReps("benchdata/r14_close_reps.json")
    val r = BenchCompare.compare(runD, close)
    assert(math.abs(r.totalsDeltaPct) > 5.0,
      "this pair is only interesting because totals disagree > 5%")
    assert(r.pass, s"same-binary pair must pass: ${r.flags.map(_.query)}")
    // and the known cross-BINARY pair still catches its plan change
    val runA = BenchCompare.parseReps("benchdata/r14_runA_reps.json")
    val x = BenchCompare.compare(runA, runD)
    assert(x.flags.map(_.query) == Seq("dedup_sn_multipass"),
      "the pre- vs post-JW-prune pair must flag exactly the changed query")
  }

  // ---- the plan-identity demotion (round-15 refinement) ----

  test("sigSame: equal stages + bytes within the drift tolerance; " +
      "zero/zero equal, zero/nonzero not") {
    import BenchCompare.{ShuffleSig, sigSame}
    assert(sigSame(ShuffleSig(82895, 4), ShuffleSig(82834, 4)))
    assert(!sigSame(ShuffleSig(82895, 4), ShuffleSig(82895, 5)))
    assert(!sigSame(ShuffleSig(130, 4), ShuffleSig(100, 4)))
    assert(sigSame(ShuffleSig(0, 3), ShuffleSig(0, 3)))
    assert(!sigSame(ShuffleSig(0, 3), ShuffleSig(10, 3)))
  }

  test("an improvement with a drift-equivalent signature demotes to " +
      "a note; with a changed signature it still flags; a regression " +
      "gates even with an identical signature") {
    import BenchCompare.ShuffleSig
    val sig = (1 to 20).map(q => s"q$q" -> ShuffleSig(1000L * q, 5)).toMap
    val faster = base.updated("q3", base("q3").map(_ / 2.0))
    // same plan -> warming note, PASS
    val r1 = BenchCompare.compare(base, faster, sig, sig)
    assert(r1.pass &&
      r1.notes.map(f => (f.query, f.direction)) == Seq(("q3", "improved")))
    // q3's signature moved -> a genuine plan change, still FAIL
    val moved = sig.updated("q3", ShuffleSig(99999, 7))
    val r2 = BenchCompare.compare(base, faster, sig, moved)
    assert(!r2.pass && r2.flags.map(_.query) == Seq("q3") && r2.notes.isEmpty)
    // regression is never excused by plan identity
    val slower = base.updated("q7", base("q7").map(_ * 2.0))
    val r3 = BenchCompare.compare(base, slower, sig, sig)
    assert(!r3.pass && r3.flags.map(f => (f.query, f.direction)) ==
      Seq(("q7", "regressed")))
    // no signatures supplied -> improved direction gates as before
    assert(!BenchCompare.compare(base, faster).pass)
  }

  test("round-15 committed C/D pair replay: the quiet-host " +
      "same-binary pair passes with tf_zipf's warming demoted by " +
      "plan identity") {
    // frozen under r15_* names (the r14 lesson, re-learned live this
    // round: every gate overwrites the bench_v2_* / shuffle_run*
    // files, which would rot this replay on the NEXT pair)
    val c = BenchCompare.parseReps("benchdata/r15_runC_reps.json")
    val d = BenchCompare.parseReps("benchdata/r15_runD_reps.json")
    val bare = BenchCompare.compare(c, d)
    assert(bare.flags.map(f => (f.query, f.direction)) ==
      Seq(("tf_zipf", "improved")),
      "without the plan-identity proof the warming false positive gates")
    val r = BenchCompare.compare(c, d,
      BenchCompare.parseSigs("benchdata/r15_shuffle_runC.json"),
      BenchCompare.parseSigs("benchdata/r15_shuffle_runD.json"))
    assert(r.pass, s"C/D must pass with signatures: ${r.flags.map(_.query)}")
    assert(r.notes.map(f => (f.query, f.direction)) ==
      Seq(("tf_zipf", "improved")))
    assert(math.abs(r.totalsDeltaPct) < 10.0)
  }
}
