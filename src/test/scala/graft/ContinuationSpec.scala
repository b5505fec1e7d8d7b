package graft

import graft.operators.TextOps

/** Pins for `tf_continuation_counts`: the planted "Francisco" shape —
  * a high-frequency token locked to one collocation must score BELOW
  * a low-frequency token with diverse contexts, which is the entire
  * point of Kneser-Ney continuation counts over raw frequency. */
class ContinuationSpec extends SparkSpec {

  test("diverse contexts beat raw frequency; counts are exact") {
    val docs = (1 to 10).map(i => (i.toLong, "san francisco")) ++
      Seq((20L, "red dog"), (21L, "blue dog"), (22L, "old dog"))
    val dir = tmpDir("kn-planted")
    import spark.implicits._
    docs.map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = TextOps.tfContinuationCounts(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("left_types"),
        r.getAs[Long]("right_types"),
        r.getAs[Long]("n_distinct_bigrams"),
        r.getAs[Double]("p_continuation")))).toMap
    // 4 distinct bigrams: (san,francisco) ×10 collapses to one type
    assert(got("francisco") == ((1L, 0L, 4L, 0.25)),
      s"frequency 10 but ONE context type: $got")
    assert(got("dog") == ((3L, 0L, 4L, 0.75)),
      "frequency 3 but three context types — the KN win")
    assert(got("san") == ((0L, 1L, 4L, 0.0)),
      "a sentence-initial-only token survives the full outer join")
    assert(got.size == 6)
  }

  test("corpus invariants: p_continuation sums to 1 over the vocab " +
      "when unbounded") {
    // over the top-50 cut the sum is <= 1; the full-vocab identity
    // Σ left_types = n_distinct_bigrams is checked on the pair set
    val rows = TextOps.tfContinuationCounts(spark, Sf).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    val total = rows.head.getAs[Long]("n_distinct_bigrams")
    rows.foreach { r =>
      assert(r.getAs[Long]("left_types") <= total)
      assert(r.getAs[Long]("n_distinct_bigrams") == total)
    }
    assert(rows.map(_.getAs[Long]("left_types")).sum <= total)
  }
}
