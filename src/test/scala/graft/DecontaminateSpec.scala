package graft

import graft.operators.TextOps

/** Pins for `doc_decontaminate`: verdict agreement with the
  * detector's ratios at sf0.001 (every doc accounted for), and a
  * planted corpus hitting all four verdict arms including exact-bar
  * equality.
  */
class DecontaminateSpec extends SparkSpec {

  test("every doc gets the verdict the detector's ratio implies at " +
      "sf0.001") {
    val det = SparkEntry.queries("text_contamination")(spark, Sf)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_hits"))).toMap
    val nDocs = spark.read.parquet(s"$Sf/documents.parquet").count()
    val got = SparkEntry.queries("doc_decontaminate")(spark, Sf)
      .collect()
    assert(got.length.toLong == nDocs,
      "enforcement must account for every doc, droppable or not")
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val v = r.getAs[String]("verdict")
      if (id < 5) assert(v == "benchmark", s"doc $id")
      else det.get(id) match {
        case Some((grams, hits)) =>
          assert(r.getAs[Long]("n_grams") == grams, s"doc $id")
          assert(r.getAs[Long]("n_hits") == hits, s"doc $id")
          assert(v == (if (hits * TextOps.DecontamBar >= grams)
            "dropped_contaminated" else "kept"), s"doc $id")
        case None =>
          assert(v == "kept_short", s"doc $id has no grams")
      }
    }
    assert(got.exists(_.getAs[String]("verdict") == "kept"))
  }

  test("planted: all four arms, with exact bar equality dropping") {
    import spark.implicits._
    val evalText = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, evalText),                               // benchmark
      // 12 tokens -> 8 distinct 5-gram windows, exactly 2 shared
      // with the benchmark -> 2*4 = 8 >= 8: the exact-bar drop
      (10L, "alpha beta gamma delta epsilon zeta one two three " +
        "four five six"),
      (11L, "totally different words that never overlap anything " +
        "in the benchmark set"),
      (12L, "tiny doc"))                            // < 5 tokens
    val dir = tmpDir("decontam")
    docs.map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val out = TextOps.docDecontaminate(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[String]("verdict") == "benchmark")
    assert(out(10L).getAs[Long]("n_hits") == 2L,
      "the two benchmark 5-grams survive inside the longer doc")
    assert(out(10L).getAs[Long]("n_grams") == 8L)
    assert(out(10L).getAs[String]("verdict") == "dropped_contaminated",
      "2 hits of 8 grams sits exactly on the 1/4 bar and must drop")
    assert(out(11L).getAs[String]("verdict") == "kept")
    assert(out(12L).getAs[String]("verdict") == "kept_short")
  }
}
