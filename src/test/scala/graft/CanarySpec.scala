package graft

/** The host-speed canary (`Bench.CanaryNames`): every committed
  * bench carries its own ambient-host-speed measurement, so an
  * r8→r9-style uniform cross-round swing self-explains instead of
  * costing a judge round-trip. These pins keep the canary honest:
  * the set stays registered, the serialized lines stay parseable and
  * inside the driver's tail window, and the committed reference file
  * stays paired with the exact set that produced it.
  */
class CanarySpec extends SparkSpec {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper

  test("every canary name is a registered query") {
    val missing = Bench.CanaryNames.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"stale canary names: $missing")
    assert(Bench.CanaryNames.size == 10,
      "the canary is a FROZEN 10-query set; changing its size " +
        "invalidates benchdata/canary_ref.json")
    assert(Bench.CanaryNames.distinct.size == Bench.CanaryNames.size)
  }

  test("canarySec is the MEDIAN of reps and canarySpread the relative " +
      "dispersion (the round-11 min-of-3 convention minted a phantom " +
      "17% regression from one lucky rep)") {
    // round 11's actual dispersed rep set: min said 5.06, median 5.99
    assert(Bench.canarySec(Seq(5.99, 6.62, 5.06)) === 5.99)
    assert(Bench.canarySec(Seq(4.0, 1.0, 3.0, 2.0)) === 2.5)
    assert(Bench.canarySec(Seq(7.0)) === 7.0)
    assert(math.abs(Bench.canarySpread(Seq(5.99, 6.62, 5.06)) -
      (6.62 - 5.06) / 5.99) < 1e-12)
    assert(Bench.CanaryReps === 5,
      "5 reps: the median is then a 3-rep agreement")
  }

  test("result lines with the canary triple parse and the summary " +
      "stays inside the driver's 256 B tail window") {
    val results = SparkEntry.queries.keys.toSeq.sorted.map(_ -> 123.456)
    val sfDir = "/root/testdata/sf0.1"
    val canary = Some((5.432, Some(5.1)))
    val full = mapper.readTree(Bench.fullLine(results, sfDir, canary))
    assert(full.get("canary_sec").asDouble === 5.432)
    assert(full.get("canary_ref_sec").asDouble === 5.1)
    val ratio = full.get("canary_ratio").asDouble
    assert(math.abs(ratio - 5.432 / 5.1) < 0.001)
    // format v2 RETIRED the normalized headline: round 12's two
    // same-binary runs normalized 45% apart (raw only 10%) — a scalar
    // sampled at one instant amplifies burstiness instead of removing
    // it. The ratio stays as a host-health flag; nothing divides by it.
    assert(full.get("value_canary_norm") == null,
      "value_canary_norm is retired in format v2 — the canary is a " +
        "host-health flag, not a normalizer")
    val summary = Bench.summaryLine(results, sfDir, canary)
    assert(summary.length <= 256,
      s"canary fields pushed the final line past the tail window: " +
        s"${summary.length}B")
    val s = mapper.readTree(summary)
    assert(s.get("canary_ratio").asDouble === ratio)
    assert(s.get("value").asDouble > 0.0)
  }

  test("a missing reference degrades to raw-only fields, never a " +
      "crash or a fabricated ratio") {
    val results = Seq("q0_scan" -> 1.0)
    val line = mapper.readTree(
      Bench.fullLine(results, "sf", Some((5.432, None))))
    assert(line.get("canary_sec").asDouble === 5.432)
    assert(line.get("canary_ratio") == null)
    val noCanary = mapper.readTree(Bench.fullLine(results, "sf", None))
    assert(noCanary.get("canary_sec") == null)
  }

  test("the committed reference file pairs with the FROZEN canary " +
      "set and the driver's bench SF") {
    val p = java.nio.file.Paths.get("benchdata/canary_ref.json")
    assert(java.nio.file.Files.exists(p),
      "benchdata/canary_ref.json must be committed — without it " +
        "every round's canary is raw-only and cross-round drift " +
        "stays a judgement call")
    val j = mapper.readTree(java.nio.file.Files.readString(p))
    assert(j.get("canary_sec").asDouble > 0.0)
    val names = (0 until j.get("names").size())
      .map(i => j.get("names").get(i).asText)
    assert(names == Bench.CanaryNames,
      "canary_ref.json was measured on a DIFFERENT query set than " +
        "Bench.CanaryNames — re-measure the reference in the same " +
        "commit that changes the set")
    assert(j.get("sf").asText.endsWith("sf0.1"),
      "the reference must be measured at the driver's bench SF")
    assert(j.get("statistic").asText == "median",
      "canary_ref.json was measured under a DIFFERENT rep statistic " +
        "than Bench.canarySec — re-measure the reference in the same " +
        "commit that changes the statistic")
  }
}
