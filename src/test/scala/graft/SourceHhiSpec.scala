package graft

import graft.operators.TextOps

/** Pins for `doc_source_hhi`: a driver-side exact fold, the
  * Cauchy–Schwarz range of the index, and a planted one-source
  * monoculture that must flag concentrated at HHI = 1.
  */
class SourceHhiSpec extends SparkSpec {

  private def ws(t: String): Long =
    t.split(" ").count(_.nonEmpty).toLong

  test("matches a driver-side exact fold at sf0.001") {
    val rows = spark.read.parquet(s"$Sf/documents.parquet")
      .select("lang", "source", "text").collect()
      .map(r => (r.getString(0), r.getString(1), ws(r.getString(2))))
    val got = SparkEntry.queries("doc_source_hhi")(spark, Sf).collect()
      .map(r => r.getAs[String]("lang") -> r).toMap
    rows.groupBy(_._1).foreach { case (lang, docs) =>
      val perSrc = docs.groupBy(_._2).view.mapValues(_.map(_._3).sum)
      val total = perSrc.values.sum
      val num = perSrc.values.map(t => t * t).sum
      val r = got(lang)
      assert(r.getAs[Long]("n_sources") == perSrc.size.toLong, lang)
      assert(r.getAs[Long]("total_tokens") == total, lang)
      assert(r.getAs[Long]("hhi_num") == num, lang)
      assert(r.getAs[Double]("hhi") ==
        num.toDouble / (total * total).toDouble, lang)
      assert(r.getAs[Double]("effective_sources") ==
        (total * total).toDouble / num.toDouble, lang)
      assert(r.getAs[Boolean]("concentrated") ==
        (num * 4L > total * total), lang)
      // Cauchy-Schwarz: 1/n_sources <= hhi <= 1, effective in [1, n]
      val hhi = r.getAs[Double]("hhi")
      assert(hhi >= 1.0 / perSrc.size.toDouble - 1e-12 && hhi <= 1.0)
    }
  }

  test("a one-source monoculture flags at HHI exactly 1; an even " +
      "split sits at 1/n and does not flag") {
    import spark.implicits._
    val docs =
      // lang "mono": every token from one source
      (1L to 10L).map(i => (i, "alpha beta gamma delta", "mono", "only")) ++
        // lang "even": four sources, identical token mass
        (11L to 18L).map(i =>
          (i, "one two three four five", "even", s"s${(i - 11) % 4}"))
    val dir = tmpDir("hhi-planted")
    docs.map { case (id, t, l, src) => (id, t, l, src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val out = TextOps.docSourceHhi(spark, dir).collect()
      .map(r => r.getAs[String]("lang") -> r).toMap
    assert(out("mono").getAs[Double]("hhi") == 1.0)
    assert(out("mono").getAs[Double]("effective_sources") == 1.0)
    assert(out("mono").getAs[Boolean]("concentrated"))
    assert(out("even").getAs[Double]("hhi") == 0.25)
    assert(out("even").getAs[Double]("effective_sources") == 4.0)
    assert(!out("even").getAs[Boolean]("concentrated"),
      "HHI must be STRICTLY above the 0.25 bar to flag")
  }
}
