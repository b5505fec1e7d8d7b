package graft

import org.apache.spark.sql.functions._

import graft.functions.UnicodeExprs
import graft.operators.DedupOps

/** Pins for `dedup_unicode` and the [[graft.functions.NfcNormalize]]
  * expression: composed/decomposed twins collapse into one class, the
  * expression is codegen'd (no UDF), and on the real corpus the query
  * refines `dedup_exact` (never merges less). */
class NfcDedupSpec extends SparkSpec {

  private val composed = "caf\u00e9 menu"
  private val decomposed = "cafe\u0301 menu"

  test("NFC maps decomposed onto composed, byte-identically") {
    import spark.implicits._
    val out = Seq(composed, decomposed).toDF("text")
      .select(UnicodeExprs.nfcNormalize(col("text")).as("n"))
      .collect().map(_.getString(0))
    assert(out(0) == composed)
    assert(out(1) == composed, "decomposed form must compose")
  }

  test("planted decomposed twin joins the composed doc's dup class") {
    import spark.implicits._
    val docs = Seq(
      (1L, composed), (2L, decomposed), (3L, "unrelated text"))
      .toDF("doc_id", "text")
    val classes = docs
      .groupBy(UnicodeExprs.nfcNormalize(col("text")).as("norm"))
      .agg(min(col("doc_id")).as("canonical_id"),
        count(lit(1)).as("n_copies"),
        count_distinct(col("text")).as("n_byte_forms"))
      .select("canonical_id", "n_copies", "n_byte_forms")
      .orderBy("canonical_id")
      .collect()
    assert(classes.length == 2)
    assert(classes(0).getLong(0) == 1L && classes(0).getLong(1) == 2L &&
      classes(0).getLong(2) == 2L, "two byte forms, one NFC class")
    assert(classes(1).getLong(0) == 3L && classes(1).getLong(1) == 1L)
  }

  test("the expression stays inside codegen — no UDF in the plan") {
    val p = DedupOps.dedupUnicode(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("graft_nfc"), p.take(2000))
    assert(!p.contains("ScalaUDF"), "must not fall back to a UDF")
  }

  test("on the corpus, unicode dedup refines exact dedup") {
    val nUnicode = DedupOps.dedupUnicode(spark, Sf).count()
    val nExact = spark.read.parquet(s"$Sf/documents.parquet")
      .select("text").distinct().count()
    assert(nUnicode <= nExact,
      "NFC classes can only merge byte-distinct texts, never split")
  }
}
