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
  *  4. PASS iff zero queries flag, in either direction — a same-binary
  *     pair must reproduce the whole per-query distribution up to one
  *     global host factor, and an unexplained IMPROVEMENT is the same
  *     evidence of instability as a regression.
  *
  * Calibration on the committed round-14 artifacts (the harshest
  * available pairs — CROSS-session, where the totals bar failed):
  * runA→close and runD→close (same surface) pass with zero flags at
  * host factors 1.19 / 0.89, while runA→runD (pre- vs post-JW-prune
  * BINARIES) flags exactly `dedup_sn_multipass` — the one query whose
  * plan genuinely changed between those binaries. The statistic
  * passes weather and catches plan changes, which is the certificate
  * the totals bar was supposed to be.
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

  final case class Result(hostFactor: Double, hostComparable: Boolean,
      nQueries: Int, totalA: Double, totalB: Double,
      totalsDeltaPct: Double, flags: Seq[Flag]) {
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
      repsB: Map[String, Seq[Double]]): Result = {
    val cleaned = (repsA.keySet intersect repsB.keySet).toSeq.sorted
      .flatMap { q =>
        val (a, b) = (repsA(q).filter(_ >= 0), repsB(q).filter(_ >= 0))
        if (a.nonEmpty && b.nonEmpty && median(a) > 0) Some((q, a, b))
        else None
      }
    require(cleaned.nonEmpty, "no comparable queries between the two runs")
    val m = median(cleaned.map { case (_, a, b) => median(b) / median(a) })
    val flags = cleaned.flatMap { case (q, a, bRaw) =>
      val b = bRaw.map(_ / m)
      if (b.min > a.max * Margin && b.min - a.max > AbsFloorSec)
        Some(Flag(q, "regressed", a, b))
      else if (a.min > b.max * Margin && a.min - b.max > AbsFloorSec)
        Some(Flag(q, "improved", a, b))
      else None
    }
    val (ta, tb) = (cleaned.map(c => median(c._2)).sum,
      cleaned.map(c => median(c._3)).sum)
    Result(m, math.abs(m - 1.0) <= HostComparableTol, cleaned.size,
      ta, tb, (tb - ta) / ta * 100.0, flags)
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

  /** CLI: `BenchCompare <repsA.json> <repsB.json>` — prints the human
    * table then ONE machine JSON line; exit 0 iff PASS. */
  def main(args: Array[String]): Unit = {
    require(args.length == 2,
      "usage: BenchCompare <bench_reps_A.json> <bench_reps_B.json>")
    val r = compare(parseReps(args(0)), parseReps(args(1)))
    val fmt = Bench.fmt _
    println(f"paired same-binary comparison over ${r.nQueries} queries")
    println(f"  host factor (median of per-query ratios): ${r.hostFactor}%.3f"
      + (if (r.hostComparable) "  [host-comparable]"
         else "  [host swing — normalized out]"))
    println(f"  totals (continuity only): ${r.totalA}%.1f -> ${r.totalB}%.1f"
      + f" s (${r.totalsDeltaPct}%+.1f%%)")
    r.flags.foreach { f =>
      println(s"  FLAG ${f.query} ${f.direction}: A=" +
        f.repsA.map(fmt).mkString("[", ",", "]") + " B/m=" +
        f.repsBNorm.map(fmt).mkString("[", ",", "]"))
    }
    println(s"  ${if (r.pass) "PASS" else "FAIL"} (bar: zero " +
      s"disjoint-interval queries at ${Margin}x + ${AbsFloorSec}s)")
    val flagsJson = r.flags.map(f =>
      s"""{"query":"${f.query}","direction":"${f.direction}"}""")
      .mkString("[", ",", "]")
    println(s"""{"metric":"bench_compare","host_factor":${fmt(r.hostFactor)},""" +
      s""""host_comparable":${r.hostComparable},"n_queries":${r.nQueries},""" +
      s""""total_a":${fmt(r.totalA)},"total_b":${fmt(r.totalB)},""" +
      s""""totals_delta_pct":${fmt(r.totalsDeltaPct)},""" +
      s""""flags":$flagsJson,"pass":${r.pass}}""")
    if (!r.pass) sys.exit(1)
  }
}
