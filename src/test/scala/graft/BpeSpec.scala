package graft

import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Semantic pins for the BPE tokenizer-training family (value
  * correctness vs DuckDB is the driver gate; these pin the algorithm
  * properties the oracle can't express).
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("double-space merge application IS greedy left-to-right BPE") {
    // the adversarial overlap cases for a substring-replace BPE:
    // a a a a -> (a,a) -> aa aa   (single-space encodings get aa a a)
    // a a a   -> (a,a) -> aa a    (leftmost pair wins)
    // t al o  -> (al,o) must NOT merge inside the longer symbol "tal"
    val rows = Seq(
      ("  a  a  a  a  ", "a a", "  aa  aa  "),
      ("  a  a  a  ", "a a", "  aa  a  "),
      ("  tal  o  ", "al o", "  tal  o  "),
      ("  al  o  ", "al o", "  alo  "),
      ("  m  er  g  er  ", "g er", "  m  er  ger  ")).toDF(
      "repr", "gram", "expected")
    val out = rows.select(
      TextOps.bpeApplyMerge(col("repr"), col("gram")).as("got"),
      col("expected")).collect()
    out.foreach(r => assert(r.getString(0) === r.getString(1)))
  }

  test("encoding is lossless: symbols concatenate back to the word") {
    val out = TextOps.tfBpeEncode(spark, Sf)
      .select(col("word"), col("encoded"), col("n_chars"), col("n_symbols"))
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[String]("encoded").replace(" ", "") ===
        r.getAs[String]("word"),
        "merges must never create or destroy characters")
      assert(r.getAs[Long]("n_symbols") <= r.getAs[Long]("n_chars"))
      assert(r.getAs[Long]("n_symbols") >= 1L)
    }
  }

  test("training compresses the corpus (freq-weighted symbol count)") {
    val out = TextOps.tfBpeEncode(spark, Sf).collect()
    val before = out.map(r => r.getAs[Long]("freq") * r.getAs[Long]("n_chars")).sum
    val after = out.map(r => r.getAs[Long]("freq") * r.getAs[Long]("n_symbols")).sum
    assert(after < before,
      s"$BpeInfo merges must strictly reduce corpus symbols ($after vs $before)")
  }

  test("merge table: one merge per step, merged = left || right") {
    val m = TextOps.tfBpeTrain(spark, Sf).collect()
    assert(m.map(_.getAs[Long]("step")).toSeq === (1L to TextOps.BpeMerges))
    m.foreach { r =>
      assert(r.getAs[String]("merged") ===
        r.getAs[String]("left_sym") + r.getAs[String]("right_sym"))
      assert(r.getAs[Long]("pair_count") > 0L)
    }
    // merge counts never increase with step ONLY within equal symbol
    // regimes is not a theorem (later merges can unlock new pairs),
    // but the FIRST merge is the global argmax of round-1 pairs:
    val topPair = TextOps.tfBpePairs(spark, Sf).limit(1).collect().head
    assert(m.head.getAs[Long]("pair_count") === topPair.getAs[Long]("n"))
    assert(m.head.getAs[String]("left_sym") + " " +
      m.head.getAs[String]("right_sym") === topPair.getAs[String]("pair"))
  }

  private def BpeInfo = TextOps.BpeMerges
}
