package graft

import graft.operators.TextOps

/** Pins for `text_langid_margin`: agreement with the classifier
  * (`text_langid_ngram`) on argmax and top overlap at sf0.001, the
  * margin/flag arithmetic, and a planted corpus hitting the exact-tie
  * ambiguity, the clear-winner, and the no-gram arms.
  */
class LangidMarginSpec extends SparkSpec {

  test("agrees with text_langid_ngram's argmax and pins the margin " +
      "arithmetic at sf0.001") {
    val cls = SparkEntry.queries("text_langid_ngram")(spark, Sf)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("ngram_lang"), r.getAs[Long]("overlap"))).toMap
    val got = SparkEntry.queries("text_langid_margin")(spark, Sf).collect()
    assert(got.length == cls.size)
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (lang, overlap) = cls(id)
      val top = r.getAs[Long]("top_overlap")
      val second = r.getAs[Long]("second_overlap")
      assert(r.getAs[String]("top_lang") == lang, s"doc $id")
      assert(top == overlap, s"doc $id")
      assert(second <= top, s"doc $id: rank 2 cannot beat rank 1")
      assert(r.getAs[Long]("margin") == top - second, s"doc $id")
      assert(r.getAs[Boolean]("ambiguous") ==
        (top == 0L || second * 5L >= top * 4L), s"doc $id")
      if (second > 0L)
        assert(r.getAs[String]("second_lang") != "none", s"doc $id")
    }
    // the synthetic languages share most of their trigram space, so
    // the corpus itself lands almost entirely in the ambiguous arm —
    // the planted test below exercises both arms deterministically
    assert(got.exists(_.getAs[Boolean]("ambiguous")))
  }

  test("planted: an exact profile tie flags ambiguous with the " +
      "lexicographic argmax; a clear winner does not; a doc with no " +
      "trigrams is unknown and ambiguous") {
    import spark.implicits._
    val docs = Seq(
      (1L, "abcabc", "a1"), // grams {abc,bca,cab} -> a1 3 vs b1 1
      (2L, "abcxyz", "b1"), // grams {abc,bcx,cxy,xyz} -> b1 4 vs a1 1
      (3L, "abc", "a1"),    // gram {abc} in BOTH profiles -> 1 vs 1 tie
      (4L, "ab", "a1"))     // too short for a trigram
    val dir = tmpDir("langid-margin")
    docs.map { case (id, t, l) => (id, t, l, "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val out = TextOps.textLangidMargin(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[String]("top_lang") == "a1")
    assert(out(1L).getAs[Long]("top_overlap") == 3L)
    assert(out(1L).getAs[Long]("second_overlap") == 1L)
    assert(out(1L).getAs[Long]("margin") == 2L)
    assert(!out(1L).getAs[Boolean]("ambiguous"))
    assert(out(2L).getAs[Long]("margin") == 3L)
    assert(!out(2L).getAs[Boolean]("ambiguous"))
    assert(out(3L).getAs[String]("top_lang") == "a1",
      "an exact tie resolves to the lexicographically first language")
    assert(out(3L).getAs[String]("second_lang") == "b1")
    assert(out(3L).getAs[Long]("margin") == 0L)
    assert(out(3L).getAs[Boolean]("ambiguous"))
    assert(out(4L).getAs[String]("top_lang") == "unknown")
    assert(out(4L).getAs[Long]("top_overlap") == 0L)
    assert(out(4L).getAs[String]("second_lang") == "none")
    assert(out(4L).getAs[Boolean]("ambiguous"),
      "zero evidence is ambiguous by definition")
  }
}
