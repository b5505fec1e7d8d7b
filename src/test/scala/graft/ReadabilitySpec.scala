package graft

import graft.operators.TextOps

/** Pins for `text_readability`: a driver-side Java-regex recount at
  * sf0.001 and a planted corpus hitting the easy, hard, and
  * fragment-floor arms.
  */
class ReadabilitySpec extends SparkSpec {

  private def counts(t: String): (Long, Long, Long) = (
    math.max("[.!?]+".r.findAllIn(t).length.toLong, 1L),
    t.split(" ").count(_.nonEmpty).toLong,
    "[aeiouyAEIOUY]+".r.findAllIn(t).length.toLong)

  test("matches a driver-side recount and formula at sf0.001") {
    val texts = spark.read.parquet(s"$Sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val got = SparkEntry.queries("text_readability")(spark, Sf)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val nonEmpty = texts.filter(t => counts(t._2)._2 > 0L)
    assert(got.size == nonEmpty.length)
    nonEmpty.foreach { case (id, t) =>
      val (sents, words, syls) = counts(t)
      val r = got(id)
      assert(r.getAs[Long]("n_sentences") == sents, s"doc $id")
      assert(r.getAs[Long]("n_words") == words, s"doc $id")
      assert(r.getAs[Long]("n_syllables") == syls, s"doc $id")
      val flesch = 206.835 - 1.015 * (words.toDouble / sents.toDouble) -
        84.6 * (syls.toDouble / words.toDouble)
      assert(r.getAs[Double]("flesch") == flesch, s"doc $id")
      assert(r.getAs[String]("band") ==
        (if (flesch >= 60.0) "easy"
         else if (flesch >= 30.0) "medium" else "hard"), s"doc $id")
    }
  }

  test("planted: simple prose is easy, polysyllabic run-ons are " +
      "hard, a fragment floors at one sentence") {
    import spark.implicits._
    val docs = Seq(
      (1L, "The cat sat. The dog ran. It was fun."),
      (2L, "Incomprehensibility characterizes organizational " +
        "bureaucratization methodologies notwithstanding " +
        "considerable organizational interdependencies " +
        "extraordinarily complicated administratively"),
      (3L, "just a fragment with no terminal punctuation"))
    val dir = tmpDir("readability")
    docs.map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val out = TextOps.textReadability(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[String]("band") == "easy")
    assert(out(1L).getAs[Long]("n_sentences") == 3L)
    assert(out(2L).getAs[String]("band") == "hard",
      "a 14-syllable-per-wordish monster cannot read easy")
    assert(out(3L).getAs[Long]("n_sentences") == 1L,
      "the fragment floor keeps the ratio defined")
  }
}
