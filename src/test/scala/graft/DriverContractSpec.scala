package graft

import java.nio.file.{Files, Paths}

/** Guards the driver's interface: Verify must dump a parquet dir per
  * requested query plus an `oracle_sql.json` that parses as JSON and
  * carries EVERY oracle entry (a single broken escape here would zero
  * the round's correctness gate). Jackson is already on the Spark
  * classpath — the same parser family the driver's json.load uses. */
class DriverContractSpec extends SparkSpec {

  test("Verify dumps parquet + a parseable, complete oracle_sql.json") {
    val out = tmpDir("verify-contract")
    Verify.main(Array(Sf, out, "q0_scan", "mm_meta"))

    assert(Files.list(Paths.get(s"$out/q0_scan")).count() > 0)
    assert(Files.list(Paths.get(s"$out/mm_meta")).count() > 0)

    val json = Files.readString(Paths.get(s"$out/oracle_sql.json"))
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper
    val tree = mapper.readTree(json)   // throws on malformed JSON
    val keys = {
      val it = tree.fieldNames()
      val b = Set.newBuilder[String]
      while (it.hasNext) b += it.next()
      b.result()
    }
    assert(keys === SparkEntry.oracleSql.keySet,
      "every oracle entry must round-trip through the JSON dump")
    // spot-check a query whose SQL contains newlines and quotes
    assert(tree.get("dedup_jaccard").asText === SparkEntry.oracleSql("dedup_jaccard"))
  }

  /** The driver's oracle checker (pandas sort_values + row hash) only
    * handles scalar cells — round 2's emb_centroids ARRAY<DOUBLE>
    * column crashed it (`unhashable type: numpy.ndarray`), turning a
    * correct answer into a red row. Complex output types are therefore
    * banned from the query surface; reshape to long-format scalar rows
    * instead (or allowlist here with a reason). */
  test("no query output schema contains ARRAY/MAP/STRUCT columns") {
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val allowed = Set.empty[String] // name -> add a why-comment if ever used
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (n, _) => allowed(n) }
      .flatMap { case (name, fn) =>
        fn(spark, Sf).schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType] ||
              f.dataType.isInstanceOf[MapType] ||
              f.dataType.isInstanceOf[StructType] =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
      }
    assert(offenders.isEmpty,
      s"complex-typed output columns break the driver's checker: $offenders")
  }

  test("bench JSON lines parse; the FINAL line fits the driver's tail window") {
    // run Bench's real serialization (not its timing loop) over every
    // registered query name
    val results = SparkEntry.queries.keys.toSeq.sorted.map(_ -> 123.456)
    val sfDir = "/root/testdata/sf0.1"
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper

    val full = mapper.readTree(Bench.fullLine(results, sfDir))
    assert(full.get("queries").size() === SparkEntry.queries.size)

    // The driver reads only a ~2.2 KB tail of stdout; the full
    // per-query line outgrew it at 88 queries (3 rounds of
    // parsed:null). The final stdout line is therefore the compact
    // summary, and this bound keeps query growth from silently
    // re-breaking it.
    // 256 B leaves >1.9 KB of the window for whatever logging noise
    // precedes the line; the real line is ~110 B and fixed-size, so
    // any growth past this bound is a structural change to review
    val summary = Bench.summaryLine(results, sfDir)
    assert(summary.length <= 256,
      s"final bench line must fit the driver's tail window, got ${summary.length}B")
    val s = mapper.readTree(summary)
    assert(s.get("metric").asText === "total")
    assert(s.get("unit").asText === "sec")
    assert(s.get("value").asDouble > 0.0)
    assert(s.get("n_queries").asInt === SparkEntry.queries.size)
  }

  test("format v2: rep fields serialize, the summary still fits the " +
      "tail window, and the per-query median is failure-aware") {
    val results = SparkEntry.queries.keys.toSeq.sorted.map(_ -> 123.456)
    val sfDir = "/root/testdata/sf0.1"
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper
    val canary = Some((5.432, Some(5.1)))
    val passes = Seq(40615.0, 40712.5, 40333.1)

    val full = mapper.readTree(
      Bench.fullLine(results, sfDir, canary, Some(31.3), passes))
    assert(full.get("format").asText === "v2")
    assert(full.get("reps").asInt === 3)
    assert(full.get("value_pass1").asDouble === 40615.0)

    val summary = Bench.summaryLine(results, sfDir, canary, Some(31.3), passes)
    assert(summary.length <= 256,
      s"v2 rep fields pushed the final line past the driver's tail " +
        s"window: ${summary.length}B")
    val s = mapper.readTree(summary)
    assert(s.get("value").asDouble > 0.0)

    // single-pass runs keep the exact v1 shape (no rep fields)
    val v1 = mapper.readTree(Bench.summaryLine(results, sfDir, canary))
    assert(v1.get("format") == null && v1.get("value_pass1") == null)

    // median ignores failed (-1.0) reps; all-failed stays -1.0
    assert(Bench.medianRep(Seq(2.0, -1.0, 1.0)) === 1.5)
    assert(Bench.medianRep(Seq(3.0, 1.0, 2.0)) === 2.0)
    assert(Bench.medianRep(Seq(-1.0, -1.0)) === -1.0)
  }
}
