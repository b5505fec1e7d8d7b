package graft

/** The SQL surface installed by [[GraftExtensions]]: every codegen
  * expression is callable from `spark.sql` with the same results as
  * the Column API. */
class ExtensionsSpec extends SparkSpec {

  test("graft functions are callable from SQL") {
    val r = spark.sql(
      """SELECT graft_char_hash('abc') AS h,
                graft_simhash32(array(5L, 7L)) AS sh,
                graft_minhash_sig(array(42L)) AS sig,
                graft_float_dot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)),
                                array(CAST(2.0 AS FLOAT), CAST(0.5 AS FLOAT))) AS d
      """).head()
    // h = ((0*31+97)*31+98)*31+99 mod P
    assert(r.getLong(0) === ((97L * 31 + 98) * 31 + 99) % 2147483647L)
    // bits where both 5 (101) and 7 (111) vote: bit0 +2, bit1 0, bit2 +2
    // -> ties (vote 0) are NOT set: simhash(5,7) = bit0 + bit2 = 5
    assert(r.getLong(1) === 5L)
    assert(r.getSeq[Long](2).length === graft.functions.Hashing.K)
    assert(r.getDouble(3) === 1.5 * 2.0 + 2.0 * 0.5)
  }

  test("SQL and Column API agree on the documents table") {
    import org.apache.spark.sql.functions.col
    graft.sources.Tables.documents(spark, Sf).createOrReplaceTempView("docs_ext")
    val viaSql = spark.sql(
      "SELECT doc_id, graft_char_hash(text) AS h FROM docs_ext ORDER BY doc_id")
      .collect()
    val viaCol = graft.sources.Tables.documents(spark, Sf)
      .select(col("doc_id"), graft.functions.Hashing.charHash(col("text")).as("h"))
      .orderBy("doc_id").collect()
    assert(viaSql.toSeq === viaCol.toSeq)
  }

  test("wrong-typed SQL calls fail at analysis with a readable message") {
    // before checkInputDataTypes these died inside codegen
    // (ClassCastException / generated-code compile error)
    val cases = Seq(
      "SELECT graft_char_hash(42)" -> "STRING",
      "SELECT graft_tokens(array(1))" -> "STRING",
      "SELECT graft_char_hash_all('x')" -> "ARRAY<STRING>",
      "SELECT graft_minhash_sig('x')" -> "ARRAY<BIGINT>",
      "SELECT graft_simhash32(array('a'))" -> "ARRAY<BIGINT>",
      "SELECT graft_lsh_bucket(array(1.0))" -> "ARRAY<FLOAT>",
      "SELECT graft_float_dot(array(CAST(1.0 AS FLOAT)), 3)" -> "ARRAY<FLOAT>",
      "SELECT graft_sq_dist(array(CAST(1.0 AS FLOAT)), array('x'))" ->
        "ARRAY<DOUBLE>")
    cases.foreach { case (sql, expected) =>
      val e = intercept[org.apache.spark.sql.AnalysisException](
        spark.sql(sql).collect())
      assert(e.getMessage.contains(expected),
        s"$sql should name the expected type; got: ${e.getMessage}")
    }
  }

  test("minhash lane 0 from SQL matches the lane formula") {
    val sig = spark.sql("SELECT graft_minhash_sig(array(10L, 20L)) AS s")
      .head().getSeq[Long](0)
    val expected = Seq(10L, 20L)
      .map(h => (h * graft.functions.Hashing.A(0) +
        graft.functions.Hashing.B(0)) % graft.functions.Hashing.P).min
    assert(sig.head === expected)
  }
}
