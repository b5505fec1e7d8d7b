package graft

import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Pins for `text_pii_scrub`: planted PII is detected and priced
  * exactly, clean text stays zero, and the detectors run as codegen'd
  * regexp built-ins (no UDF). The planted expectations are
  * hand-computed, so this spec is the cross-engine parity anchor for
  * the Java-regex side (the gate compares against RE2 on the corpus,
  * where matches are rare).
  */
class PiiScrubSpec extends SparkSpec {

  private def fixture(): String = {
    val docs = Seq(
      // s0: one email (26 chars) + one ipv4 (8 chars)
      (1L, "contact bob.smith+x@ex-ample.co.uk or 10.0.0.1 now", "en",
        "s0"),
      // s0: a 12-digit account number
      (2L, "acct 123456789012 pending", "en", "s0"),
      // s1: clean
      (3L, "no pii here 12345678", "en", "s1"),
      // s1: boundary — trailing .5 keeps the \b match at 1.2.3.4
      (4L, "probe 1.2.3.4.5 and x@y.zz done", "en", "s1"))
      .map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
    // single-FILE documents.parquet (testdata convention — the
    // streaming source symlinks it and a directory would list empty)
    val dir = tmpDir("pii-planted")
    val raw = tmpDir("pii-planted-raw")
    import spark.implicits._
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(raw)
    val part = new java.io.File(raw).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(s"$dir/documents.parquet"))
    dir
  }

  test("planted PII: counts and redacted volume are exact per source") {
    val rows = TextOps.textPiiScrub(spark, fixture()).collect()
      .map(r => r.getString(0) -> r).toMap
    val s0 = rows("s0")
    assert(s0.getAs[Long]("n_docs") == 2L)
    assert(s0.getAs[Long]("docs_with_pii") == 2L)
    assert(s0.getAs[Long]("n_emails") == 1L)
    assert(s0.getAs[Long]("n_ipv4") == 1L)
    assert(s0.getAs[Long]("n_long_numbers") == 1L)
    // "bob.smith+x@ex-ample.co.uk"(26) + "10.0.0.1"(8) +
    // "123456789012"(12)
    assert(s0.getAs[Long]("chars_redacted") == 26L + 8L + 12L)
    val s1 = rows("s1")
    assert(s1.getAs[Long]("n_docs") == 2L)
    assert(s1.getAs[Long]("docs_with_pii") == 1L, "doc 3 is clean")
    assert(s1.getAs[Long]("n_emails") == 1L, "x@y.zz (a@b.c TLD too short)")
    assert(s1.getAs[Long]("n_ipv4") == 1L, "1.2.3.4 via \\b, not .4.5")
    assert(s1.getAs[Long]("n_long_numbers") == 0L, "8 digits < 9")
    assert(s1.getAs[Long]("chars_redacted") == 6L + 7L)
  }

  test("detectors are built-in expressions — no UDF, one scan") {
    val p = TextOps.textPiiScrub(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("ScalaUDF"), p.take(2000))
    assert(p.linesIterator.count(_.contains("Scan parquet")) == 1,
      "one pass over documents computes all detectors")
  }

  test("stream gate quarantines exactly the planted PII carriers") {
    val got = SparkEntry.queries("stream_pii_gate")(spark, fixture())
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("decision"))
      .toMap
    assert(got == Map(1L -> "quarantined", 2L -> "quarantined",
      3L -> "admitted", 4L -> "quarantined"))
  }

  test("corpus run: totals are consistent") {
    val rows = TextOps.textPiiScrub(spark, Sf).collect()
    val nDocs = spark.read.parquet(s"$Sf/documents.parquet").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    rows.foreach { r =>
      assert(r.getAs[Long]("docs_with_pii") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("chars_redacted") >= 0L)
    }
  }
}
