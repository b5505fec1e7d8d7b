package graft

import graft.operators.TextOps

/** Pins for `text_script_mix`: a driver-side recount at sf0.001
  * (class partition must tie out to n_chars) and a planted corpus
  * hitting the pure, two-script, and accent arms.
  */
class ScriptMixSpec extends SparkSpec {

  test("class counts partition n_chars at sf0.001 and match a " +
      "driver recount") {
    val texts = spark.read.parquet(s"$Sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = SparkEntry.queries("text_script_mix")(spark, Sf).collect()
    assert(got.length == texts.size)
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val t = texts(id)
      val ascii = t.count(c => c.isLetterOrDigit && c < 128).toLong
      val cjk = t.count(c => c >= 0x4e00 && c <= 0x9fff).toLong
      val accent = t.count("àâçéèêëîïôùûüáíóúñ".contains(_)).toLong
      val space = t.count(_ == ' ').toLong
      assert(r.getAs[Long]("n_chars") == t.length.toLong, s"doc $id")
      assert(r.getAs[Long]("n_ascii_alnum") == ascii, s"doc $id")
      assert(r.getAs[Long]("n_cjk") == cjk, s"doc $id")
      assert(r.getAs[Long]("n_accent") == accent, s"doc $id")
      assert(r.getAs[Long]("n_space") == space, s"doc $id")
      assert(r.getAs[Long]("n_other") ==
        t.length.toLong - ascii - cjk - accent - space, s"doc $id")
      assert(r.getAs[Boolean]("mixed_script") ==
        (Seq(ascii, cjk, accent).count(_ > 0L) >= 2), s"doc $id")
    }
  }

  test("planted: two letter scripts flag; one plus punctuation does " +
      "not") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hello world 42!"),          // pure ascii + punct
      (2L, "hello 世界"),       // ascii + CJK -> mixed
      (3L, "àéî ôù"),                   // accents only
      (4L, "café life"))                // ascii + accent -> mixed
    val dir = tmpDir("scriptmix")
    docs.map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val out = TextOps.textScriptMix(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(!out(1L).getAs[Boolean]("mixed_script"))
    assert(out(1L).getAs[Long]("n_other") == 1L, "the bang")
    assert(out(2L).getAs[Boolean]("mixed_script"))
    assert(out(2L).getAs[Long]("n_cjk") == 2L)
    assert(!out(3L).getAs[Boolean]("mixed_script"))
    assert(out(3L).getAs[Long]("n_accent") == 5L)
    assert(out(4L).getAs[Boolean]("mixed_script"),
      "a stray accented letter inside ASCII text is the homoglyph arm")
  }
}
