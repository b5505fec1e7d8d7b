package graft

import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Pins for `tf_compression_ratio`: group totals agree with the
  * per-document queries it aggregates, and ratios divide the exact
  * totals. */
class CompressionRatioSpec extends SparkSpec {

  test("totals agree with per-document langid + token counts") {
    val got = TextOps.tfCompressionRatio(spark, Sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val langs = TextOps.textLangid(spark, Sf)
      .select(col("doc_id"), col("heur_lang"))
    val toks = TextOps.textTokenCount(spark, Sf)
      .select(col("doc_id"), col("n_bpe_tokens"))
    val bytes = spark.read.parquet(s"$Sf/documents.parquet")
      .select(col("doc_id"), expr("octet_length(text)").cast("long").as("b"))
    val want = langs.join(toks, "doc_id").join(bytes, "doc_id")
      .groupBy("heur_lang")
      .agg(count(lit(1)).as("n"), sum("b").as("tb"),
        sum("n_bpe_tokens").as("tt"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == want)
  }

  test("bytes_per_token is the single IEEE division of the totals") {
    TextOps.tfCompressionRatio(spark, Sf).collect().foreach { r =>
      val expect = r.getLong(2).toDouble / r.getLong(3).toDouble
      assert(r.getDouble(4) == expect, r.toString)
    }
  }
}
