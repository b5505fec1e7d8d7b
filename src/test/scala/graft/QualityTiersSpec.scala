package graft

import graft.operators.TextOps

/** Pins for `doc_quality_tiers`: a planted corpus with one doc per
  * distinct bin cuts into exact thirds, the straddling-bin rule sends
  * a degenerate single-bin language wholly to the lowest tier, and
  * the corpus rollup conserves doc counts per language.
  */
class QualityTiersSpec extends SparkSpec {

  /** Doc i = one unique word repeated m times → its corpus tf is m,
    * so bin = (m·m) div m = m exactly. */
  private def fixture(ms: Seq[Int], lang: String = "en"): String = {
    val docs = ms.zipWithIndex.map { case (m, i) =>
      val text = Seq.fill(m)(s"w$i").mkString(" ")
      (i.toLong, text, lang, "s0", text.length.toLong)
    }
    val dir = tmpDir("tiers-planted")
    import spark.implicits._
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  test("nine distinct bins cut into exact thirds") {
    val rows = TextOps.docQualityTiers(spark, fixture(1 to 9))
      .collect().map(r => r.getString(1) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_bins"),
          r.getAs[Long]("min_bin"), r.getAs[Long]("max_bin")))).toMap
    assert(rows("rare") == ((3L, 3L, 1L, 3L)))
    assert(rows("mid") == ((3L, 3L, 4L, 6L)))
    assert(rows("common") == ((3L, 3L, 7L, 9L)))
  }

  test("a single-bin language lands wholly in the rare tier") {
    val rows = TextOps.docQualityTiers(spark, fixture(Seq(5, 5, 5, 5)))
      .collect()
    // four docs of 5 copies of doc-unique words: every tf is 5, every
    // bin is 5 → one straddling bin, assigned to the lower tier
    assert(rows.length == 1)
    assert(rows(0).getString(1) == "rare")
    assert(rows(0).getAs[Long]("n_docs") == 4L)
  }

  test("corpus rollup conserves per-language doc counts") {
    val got = TextOps.docQualityTiers(spark, Sf).collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    val want = spark.read.parquet(s"$Sf/documents.parquet")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want, "every doc with tokens lands in exactly one tier")
    // tier sizes are thirds at bin granularity: no tier may exceed
    // two thirds of a language unless its bins straddle the cuts
    TextOps.docQualityTiers(spark, Sf).collect()
      .groupBy(_.getString(0)).foreach { case (lang, rows) =>
        assert(rows.map(_.getString(1)).distinct.length == rows.length,
          s"$lang: one row per tier")
      }
  }
}
