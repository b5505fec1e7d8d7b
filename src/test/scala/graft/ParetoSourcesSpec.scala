package graft

import graft.operators.TextOps

/** Pins for `doc_pareto_sources`: a driver-side exact fold of the
  * n80 prefix count at sf0.001, plus a planted fixture hitting the
  * dominant-source (n80 = 1, Pareto flag on), the uniform (n80 = n,
  * flag off), and the zero-token (n80 pinned to 0, not a vacuous 1)
  * arms.
  */
class ParetoSourcesSpec extends SparkSpec {

  private def ws(t: String): Long =
    t.split(" ").count(_.nonEmpty).toLong

  test("matches a driver-side exact fold at sf0.001") {
    val rows = spark.read.parquet(s"$Sf/documents.parquet")
      .select("lang", "source", "text").collect()
      .map(r => (r.getString(0), r.getString(1), ws(r.getString(2))))
    val got = SparkEntry.queries("doc_pareto_sources")(spark, Sf).collect()
      .map(r => r.getAs[String]("lang") -> r).toMap
    assert(got.size == rows.map(_._1).distinct.length)
    rows.groupBy(_._1).foreach { case (lang, docs) =>
      val perSrc = docs.groupBy(_._2).view.mapValues(_.map(_._3).sum)
        .toSeq.sortBy { case (src, t) => (-t, src) }
      val total = perSrc.map(_._2).sum
      val cums = perSrc.map(_._2).scanLeft(0L)(_ + _).tail
      val n80 =
        if (total == 0L) 0L
        else cums.count(c => c * 5L < total * 4L).toLong + 1L
      val r = got(lang)
      assert(r.getAs[Long]("n_sources") == perSrc.size.toLong, lang)
      assert(r.getAs[Long]("total_tokens") == total, lang)
      assert(r.getAs[Long]("n80") == n80, lang)
      assert(r.getAs[Boolean]("pareto") ==
        (total > 0L && n80 * 5L <= perSrc.size.toLong), lang)
      assert(r.getAs[Double]("top_share") ==
        (if (total == 0L) 0.0
         else perSrc.map(_._2).max.toDouble / total.toDouble), lang)
      // n80 is a valid prefix size when any mass exists
      if (total > 0L) assert(n80 >= 1L && n80 <= perSrc.size.toLong)
    }
  }

  test("planted: dominant source -> n80 = 1 and the Pareto flag; " +
      "uniform split -> n80 = n; zero-token language -> n80 = 0") {
    import spark.implicits._
    val hundred = Seq.fill(100)("tok").mkString(" ")
    val docs =
      // "dom": one source carries 100 of 104 tokens across 5 sources
      Seq((1L, hundred, "dom", "big")) ++
        (2L to 5L).map(i => (i, "one", "dom", s"tiny${i}")) ++
        // "even": four sources, identical token mass
        (11L to 18L).map(i =>
          (i, "one two three four five", "even", s"s${(i - 11) % 4}")) ++
        // "zero": two sources, zero tokens anywhere
        Seq((21L, "", "zero", "a"), (22L, "", "zero", "b"))
    val dir = tmpDir("pareto-planted")
    docs.map { case (id, t, l, src) => (id, t, l, src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val out = TextOps.docParetoSources(spark, dir).collect()
      .map(r => r.getAs[String]("lang") -> r).toMap
    assert(out("dom").getAs[Long]("n80") == 1L)
    assert(out("dom").getAs[Boolean]("pareto"),
      "1 of 5 sources holding 96% of mass is the 80/20 shape")
    assert(out("dom").getAs[Double]("top_share") == 100.0 / 104.0)
    assert(out("even").getAs[Long]("n80") == 4L,
      "3 of 4 equal sources hold 75% < 80% -- all four are needed")
    assert(!out("even").getAs[Boolean]("pareto"))
    assert(out("even").getAs[Double]("top_share") == 0.25)
    assert(out("zero").getAs[Long]("n80") == 0L)
    assert(!out("zero").getAs[Boolean]("pareto"))
    assert(out("zero").getAs[Double]("top_share") == 0.0)
  }
}
