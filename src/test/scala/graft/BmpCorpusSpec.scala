package graft

import org.apache.spark.sql.functions._

/** Guards the edit-kernel parity convention (round-15 hardening,
  * carried from the round-14 verdict): the Damerau/Jaro kernels walk
  * UTF-16 units while DuckDB walks codepoints — identical if and only
  * if the text stays in the Basic Multilingual Plane. The gate
  * corpora satisfy that today; this spec makes a future testdata
  * refresh that introduces supplementary-plane text (emoji, rare CJK)
  * a loud failure instead of a silent oracle divergence. One
  * codegen'd scan per corpus: any character above U+FFFF appears in a
  * Spark string as a surrogate pair, and the regex range below
  * matches exactly the supplementary codepoints.
  */
class BmpCorpusSpec extends SparkSpec {

  private val NonBmp = "[\\x{10000}-\\x{10FFFF}]"

  test("every gated documents corpus is BMP-only — the edit kernels' " +
      "UTF-16-unit/codepoint parity precondition") {
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1").foreach { sf =>
      val offenders = graft.sources.Tables.documents(spark, sf)
        .filter(col("text").rlike(NonBmp))
        .count()
      assert(offenders == 0L,
        s"$sf has $offenders docs with supplementary-plane chars — " +
          "the Damerau/JW oracle parity convention no longer holds " +
          "there (EditExprs scaladoc: a codepoint walk is required)")
    }
  }

  test("the regex itself distinguishes BMP from supplementary text") {
    import spark.implicits._
    val df = Seq(
      ("bmp", "café � 中文"), // é, U+FFFD, CJK
      ("supp", "ok " + new String(Character.toChars(0x1F600))), // emoji
      ("supp2", new String(Character.toChars(0x10400)))) // Deseret
      .toDF("tag", "text")
    val hit = df.filter(col("text").rlike(NonBmp))
      .collect().map(_.getString(0)).sorted
    assert(hit.toSeq == Seq("supp", "supp2"))
  }
}
