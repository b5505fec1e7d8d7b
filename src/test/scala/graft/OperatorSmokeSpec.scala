package graft

/** Every driver-contract query must run and return rows at sf0.001
  * (full value-correctness is the DuckDB oracle gate; this is the
  * fast in-repo guard against schema/runtime regressions). */
class OperatorSmokeSpec extends SparkSpec {
  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle or is explicitly rows-only") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty,
      s"queries without oracle (add SQL or document why): $noOracle")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs with rows > 0 at sf0.001") {
      assert(fn(spark, Sf).count() > 0)
    }
  }
}
