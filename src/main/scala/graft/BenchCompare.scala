package graft

import com.fasterxml.jackson.databind.ObjectMapper

/** Same-binary bench reproducibility — the PAIRED per-query statistic
  * that replaces the retired 5%-of-totals bar (round-15 directive).
  *
  * The old bar compared the difference of two sum-of-medians totals,
  * which is not robust to host-wide speed swings: round 14's gate ran
  * it twice and it failed twice (9.5%, 11.4%) on a host whose
  * canary-only reps spread 25.5% within one session — so a genuine
  * single-query compute regression would have been indistinguishable
  * from weather. This comparison makes each query its own control:
  *
  *  1. per query q, the run medians mA(q), mB(q) over successful reps
  *     (the same `bench_reps.json` numbers behind every committed
  *     median — no new measurement protocol);
  *  2. the HOST FACTOR m = median over queries of mB(q)/mA(q). A
  *     host-wide multiplicative swing moves every ratio equally, so it
  *     moves m and is normalized out; a single-query regression moves
  *     one ratio and cannot move the median of ~334;
  *  3. a query FLAGS iff its two rep intervals stay disjoint after
  *     host normalization with margin: min(B)/m > max(A)·[[Margin]]
  *     (regressed) or min(A) > max(B)/m·[[Margin]] (improved), AND the
  *     gap exceeds [[AbsFloorSec]] so a 20 ms query cannot flag on
  *     scheduler jitter. Using the per-run rep EXTREMES makes every
  *     query's own within-run dispersion its noise model — a query
  *     whose three reps already spread 30% needs a correspondingly
  *     larger between-run shift to flag, exactly the calibration a
  *     fixed percentile bar lacks (within-run rep spread on the gate
  *     host: median 18%, p90 36% — a raw p90-of-ratios bar at 10%
  *     would fail on noise alone);
  *  4. PASS iff zero queries flag — a same-binary pair must reproduce
  *     the whole per-query distribution up to one global host factor.
  *     A REGRESSED-direction disjoint interval always flags. An
  *     IMPROVED-direction one flags unless the two runs' shuffle
  *     signatures (bytes + stage count from the bench's per-query
  *     sidecar) are DRIFT-EQUIVALENT for that query — equal stage
  *     count and bytes within [[SigDriftTol]], the same tolerance the
  *     gate's byte-drift comparison already defines "no plan drift"
  *     by (exchange payloads compress nondeterministically at the
  *     margin: 279 of 335 signatures are byte-exact between the
  *     committed C/D runs, the rest move a few hundredths of a
  *     percent) — in which case it demotes to a reported note: an
  *     improvement with an unchanged physical plan on the same
  *     binary cannot be a plan change, and on a back-to-back pair it
  *     is second-run cache warming. The round-15 gate's first two live pairs each produced
  *     exactly one such false positive (`q0_scan` then `tf_zipf` —
  *     sub-second scans dropping a uniform ~0.1 s with zero shuffle
  *     drift across all 335 queries), which is the mechanism this
  *     demotion targets; an improvement whose signature DID move still
  *     flags (that is precisely the JW-prune calibration case below).
  *     When no signatures are supplied the improved direction gates
  *     as before — the demotion needs the plan-identity proof.
  *
  * Calibration on the committed round-14 artifacts (the harshest
  * available pairs — CROSS-session, where the totals bar failed):
  * runA→close and runD→close (same surface) pass with zero flags at
  * host factors 1.19 / 0.89, while runA→runD (pre- vs post-JW-prune
  * BINARIES) flags exactly `dedup_sn_multipass` — the one query whose
  * plan genuinely changed between those binaries. Round-15 adds the
  * live C/D quiet-host pair: PASS with the `tf_zipf` warming note
  * under identical signatures, and the spec replays it committed.
  * The statistic passes weather and catches plan changes, which is
  * the certificate the totals bar was supposed to be.
  *
  * Totals and their delta are still reported for cross-round
  * continuity; they no longer gate.
  */
object BenchCompare {

  /** Disjoint-interval margin: host-normalized rep ranges must be
    * separated by this factor before a query flags. Calibrated so the
    * round-14 cross-session same-surface pairs (the worst committed
    * weather) sit just under it with zero flags while the one known
    * cross-binary plan change still flags. */
  val Margin = 1.2

  /** Absolute separation floor (seconds): below this gap a flag is
    * scheduler jitter on a sub-100 ms query, not evidence. */
  val AbsFloorSec = 0.05

  /** |host factor − 1| under this classifies the pair as measured on
    * comparable host weather (reported, never gated — weather is
    * exactly what this statistic exists to not gate on). */
  val HostComparableTol = 0.03

  /** One flagged query: direction, raw A reps, host-normalized B reps. */
  final case class Flag(query: String, direction: String,
      repsA: Seq[Double], repsBNorm: Seq[Double])

  /** Per-query shuffle signature from the bench sidecar
    * (`bench_shuffle.json`): total exchange bytes + stage count of the
    * first successful rep. */
  final case class ShuffleSig(bytes: Long, stages: Long)

  /** Byte tolerance for signature equivalence — the same 1.2x the
    * round gates' shuffle-drift comparison uses, because exchange
    * payload sizes are not bit-deterministic at the margin. */
  val SigDriftTol = 1.2

  /** Drift-equivalence: same stage count, bytes within
    * [[SigDriftTol]] (both-zero counts as equal). */
  def sigSame(x: ShuffleSig, y: ShuffleSig): Boolean =
    x.stages == y.stages && {
      if (x.bytes == 0 && y.bytes == 0) true
      else if (x.bytes <= 0 || y.bytes <= 0) false
      else {
        val r = x.bytes.toDouble / y.bytes.toDouble
        r <= SigDriftTol && r >= 1.0 / SigDriftTol
      }
    }

  final case class Result(hostFactor: Double, hostComparable: Boolean,
      nQueries: Int, totalA: Double, totalB: Double,
      totalsDeltaPct: Double, flags: Seq[Flag],
      notes: Seq[Flag] = Nil) {
    def pass: Boolean = flags.isEmpty
  }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  /** The pure statistic over two runs' per-query rep lists (the
    * `queries` maps of two `bench_reps.json` files). Failed reps
    * (−1.0) are dropped per query; a query with no successful rep on
    * either side, or present on only one side, is excluded (the
    * correctness gate owns all-rep failures — this is a timing
    * statistic). */
  def compare(repsA: Map[String, Seq[Double]],
      repsB: Map[String, Seq[Double]],
      sigA: Map[String, ShuffleSig] = Map.empty,
      sigB: Map[String, ShuffleSig] = Map.empty): Result = {
    val cleaned = (repsA.keySet intersect repsB.keySet).toSeq.sorted
      .flatMap { q =>
        val (a, b) = (repsA(q).filter(_ >= 0), repsB(q).filter(_ >= 0))
        if (a.nonEmpty && b.nonEmpty && median(a) > 0) Some((q, a, b))
        else None
      }
    require(cleaned.nonEmpty, "no comparable queries between the two runs")
    val m = median(cleaned.map { case (_, a, b) => median(b) / median(a) })
    // plan identity holds only when BOTH sides report a signature and
    // they are drift-equivalent; a missing side never demotes
    def samePlan(q: String): Boolean =
      (sigA.get(q), sigB.get(q)) match {
        case (Some(x), Some(y)) => sigSame(x, y)
        case _ => false
      }
    val (flags, notes) = {
      val all = cleaned.flatMap { case (q, a, bRaw) =>
        val b = bRaw.map(_ / m)
        if (b.min > a.max * Margin && b.min - a.max > AbsFloorSec)
          Some((Flag(q, "regressed", a, b), true))
        else if (a.min > b.max * Margin && a.min - b.max > AbsFloorSec)
          Some((Flag(q, "improved", a, b), !samePlan(q)))
        else None
      }
      (all.collect { case (f, true) => f },
        all.collect { case (f, false) => f })
    }
    val (ta, tb) = (cleaned.map(c => median(c._2)).sum,
      cleaned.map(c => median(c._3)).sum)
    Result(m, math.abs(m - 1.0) <= HostComparableTol, cleaned.size,
      ta, tb, (tb - ta) / ta * 100.0, flags, notes)
  }

  private[graft] def parseReps(path: String): Map[String, Seq[Double]] = {
    val root = new ObjectMapper()
      .readTree(java.nio.file.Paths.get(path).toFile)
    val qs = root.get("queries")
    require(qs != null, s"$path has no 'queries' object")
    val it = qs.fields()
    val out = Map.newBuilder[String, Seq[Double]]
    while (it.hasNext) {
      val e = it.next()
      val arr = e.getValue
      out += e.getKey -> (0 until arr.size).map(arr.get(_).asDouble())
    }
    out.result()
  }

  private[graft] def parseSigs(path: String): Map[String, ShuffleSig] = {
    val root = new ObjectMapper()
      .readTree(java.nio.file.Paths.get(path).toFile)
    val qs = root.get("queries")
    require(qs != null, s"$path has no 'queries' object")
    val it = qs.fields()
    val out = Map.newBuilder[String, ShuffleSig]
    while (it.hasNext) {
      val e = it.next()
      val v = e.getValue
      if (!v.has("all_reps_failed"))
        out += e.getKey -> ShuffleSig(v.get("shuffle_bytes").asLong(),
          v.get("stages").asLong())
    }
    out.result()
  }

  /** CLI: `BenchCompare <repsA.json> <repsB.json> [<shuffleA.json>
    * <shuffleB.json>]` — prints the human table then ONE machine JSON
    * line; exit 0 iff PASS. The optional shuffle sidecars enable the
    * plan-identity demotion of improved-direction flags. */
  def main(args: Array[String]): Unit = {
    require(args.length == 2 || args.length == 4,
      "usage: BenchCompare <bench_reps_A.json> <bench_reps_B.json>" +
        " [<bench_shuffle_A.json> <bench_shuffle_B.json>]")
    val (sa, sb) =
      if (args.length == 4) (parseSigs(args(2)), parseSigs(args(3)))
      else (Map.empty[String, ShuffleSig], Map.empty[String, ShuffleSig])
    val r = compare(parseReps(args(0)), parseReps(args(1)), sa, sb)
    val fmt = Bench.fmt _
    println(f"paired same-binary comparison over ${r.nQueries} queries")
    println(f"  host factor (median of per-query ratios): ${r.hostFactor}%.3f"
      + (if (r.hostComparable) "  [host-comparable]"
         else "  [host swing - normalized out]"))
    println(f"  totals (continuity only): ${r.totalA}%.1f -> ${r.totalB}%.1f"
      + f" s (${r.totalsDeltaPct}%+.1f%%)")
    r.flags.foreach { f =>
      println(s"  FLAG ${f.query} ${f.direction}: A=" +
        f.repsA.map(fmt).mkString("[", ",", "]") + " B/m=" +
        f.repsBNorm.map(fmt).mkString("[", ",", "]"))
    }
    r.notes.foreach { f =>
      println(s"  note ${f.query} ${f.direction}, identical plan " +
        "signature (second-run warming): A=" +
        f.repsA.map(fmt).mkString("[", ",", "]") + " B/m=" +
        f.repsBNorm.map(fmt).mkString("[", ",", "]"))
    }
    println(s"  ${if (r.pass) "PASS" else "FAIL"} (bar: zero " +
      s"disjoint-interval queries at ${Margin}x + ${AbsFloorSec}s)")
    def fj(fs: Seq[Flag]) = fs.map(f =>
      s"""{"query":"${f.query}","direction":"${f.direction}"}""")
      .mkString("[", ",", "]")
    println(s"""{"metric":"bench_compare","host_factor":${fmt(r.hostFactor)},""" +
      s""""host_comparable":${r.hostComparable},"n_queries":${r.nQueries},""" +
      s""""total_a":${fmt(r.totalA)},"total_b":${fmt(r.totalB)},""" +
      s""""totals_delta_pct":${fmt(r.totalsDeltaPct)},""" +
      s""""flags":${fj(r.flags)},"notes":${fj(r.notes)},"pass":${r.pass}}""")
    if (!r.pass) sys.exit(1)
  }
}
