package graft

/** Every driver-contract query must run and return rows at sf0.001
  * (full value-correctness is the DuckDB oracle gate; this is the
  * fast in-repo guard against schema/runtime regressions). */
class OperatorSmokeSpec extends SparkSpec {
  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  /** Queries with no SQL oracle by design (driver applies its weaker
    * rows-only gate). Each entry must say why. */
  private val RowsOnly = Set(
    // sketch outputs (HLL++, percentile_approx) are engine-specific
    // approximations — no exact cross-engine mirror exists
    "ev_approx_stats")

  test("query names are collision-free across operator modules") {
    import graft.operators._
    val maps = Seq(Relational.defs, EventOps.defs, EnrichOps.defs,
      TextOps.defs, DedupOps.defs, SimilarityOps.defs, MultimodalOps.defs,
      StreamOps.defs, SketchOps.defs)
    val total = maps.map(_.size).sum
    assert(total === SparkEntry.queries.size,
      "a duplicate query name across modules would silently shadow one " +
        s"implementation: ${maps.flatMap(_.keys).groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }}")
  }

  test("every query has an oracle or is explicitly rows-only") {
    val noOracle =
      SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- RowsOnly
    assert(noOracle.isEmpty,
      s"queries without oracle (add SQL or document why): $noOracle")
    val stale = RowsOnly -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"rows-only allowlist entries without query: $stale")
    // the inverse direction: an oracle entry with no query would reach
    // the driver's DuckDB compare with no spark output -> guaranteed FAIL
    val orphaned = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphaned.isEmpty, s"oracle entries without a query: $orphaned")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs with rows > 0 at sf0.001") {
      assert(fn(spark, Sf).count() > 0)
    }
  }
}
