package graft

import graft.operators.TextOps

/** Pins for `doc_gopher_rules`: a driver-side recompute of every rule
  * bit at sf0.001, each rule exercised in BOTH directions somewhere
  * in the corpus-or-fixture, and a planted doc per failure arm. */
class GopherRulesSpec extends SparkSpec {

  private val stops = TextOps.Stopwords.toSet

  private def bits(text: String): (Long, Long, Long, Long, Long,
      Long, Long, Long, Long) = {
    val t = text.split(" ").filter(_.nonEmpty).toSeq
    val n = t.size.toLong
    val sl = t.map(_.length.toLong).sum
    val ns = (t.toSet & stops).size.toLong
    val na = t.count(_.matches("[a-zA-Z]+")).toLong
    def b(x: Boolean) = if (x) 1L else 0L
    (n, sl, ns, na,
      b(n >= TextOps.GopherMinTokens && n <= TextOps.GopherMaxTokens),
      b(sl >= n * 3 && sl <= n * 10),
      b(ns >= TextOps.GopherMinStops),
      b(na * 5 >= n * 4),
      b(n >= TextOps.GopherMinTokens && n <= TextOps.GopherMaxTokens
        && sl >= n * 3 && sl <= n * 10 && ns >= TextOps.GopherMinStops
        && na * 5 >= n * 4))
  }

  test("matches a driver-side recompute of every rule bit at sf0.001, " +
      "and both verdicts occur") {
    import org.apache.spark.sql.functions._
    val texts = spark.read.parquet(s"$Sf/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = SparkEntry.queries("doc_gopher_rules")(spark, Sf).collect()
    assert(got.length == texts.size)
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (n, sl, ns, na, wc, mwl, st, al, keep) = bits(texts(id))
      assert(r.getAs[Long]("n_tokens") == n, s"doc $id")
      assert(r.getAs[Long]("sum_token_chars") == sl, s"doc $id")
      assert(r.getAs[Long]("n_distinct_stops") == ns, s"doc $id")
      assert(r.getAs[Long]("n_alpha_tokens") == na, s"doc $id")
      assert(r.getAs[Long]("wc_ok") == wc, s"doc $id")
      assert(r.getAs[Long]("mwl_ok") == mwl, s"doc $id")
      assert(r.getAs[Long]("stop_ok") == st, s"doc $id")
      assert(r.getAs[Long]("alpha_ok") == al, s"doc $id")
      assert(r.getAs[String]("verdict") ==
        (if (keep == 1L) "keep" else "drop"), s"doc $id")
    }
    val verdicts = got.map(_.getAs[String]("verdict")).toSet
    assert(verdicts == Set("keep", "drop"),
      "the rules must bite somewhere on the real corpus")
  }

  test("planted: one doc per failure arm") {
    import spark.implicits._
    val keepBody = "the cat and the dog walk to the park for fun " +
      "with many plain words " + (1 to 20)
        .map(i => "word" + ("abcdefghijklmnopqrst" (i - 1)))
        .mkString(" ")
    val docs = Seq(
      (1L, keepBody),                                    // keep
      (2L, "the of short"),                              // wc fails
      (3L, "the of " + (1 to 30).map(_ => "a").mkString(" ")), // mwl low
      (4L, (1 to 30).map(i => s"word$i").mkString(" ")), // no stops
      (5L, "the of " + (1 to 30).map(i => s"$i").mkString(" ")))
    // doc 5: numeric tokens -> alpha fraction fails
    val dir = tmpDir("gopher-planted")
    docs.map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val out = TextOps.docGopherRules(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[String]("verdict") == "keep")
    assert(out(2L).getAs[Long]("wc_ok") == 0L)
    assert(out(3L).getAs[Long]("mwl_ok") == 0L)
    assert(out(4L).getAs[Long]("stop_ok") == 0L)
    assert(out(5L).getAs[Long]("alpha_ok") == 0L)
    Seq(2L, 3L, 4L, 5L).foreach { id =>
      assert(out(id).getAs[String]("verdict") == "drop", s"doc $id")
    }
  }
}
