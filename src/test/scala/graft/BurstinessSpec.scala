package graft

import graft.operators.TextOps

/** Pins for `tf_burstiness`: a driver-side exact fold of counts and
  * the scaled-integer ordering at sf0.001, and a planted corpus where
  * a clumped token outranks a spread one of equal frequency.
  */
class BurstinessSpec extends SparkSpec {

  test("matches a driver-side exact fold at sf0.001") {
    val rows = spark.read.parquet(s"$Sf/documents.parquet")
      .select("doc_id", "text").collect()
      .flatMap(r => r.getString(1).split(" ").filter(_.nonEmpty)
        .map(t => (t, r.getLong(0))))
    val stats = rows.groupBy(_._1).view.mapValues { os =>
      (os.length.toLong, os.map(_._2).distinct.length.toLong)
    }.filter(_._2._1 >= TextOps.BurstMinOcc)
    val ranked = stats.toSeq
      .sortBy { case (tok, (occ, docs)) => (-((occ << 20) / docs), tok) }
      .take(TextOps.BurstTopK.toInt)
    val got = SparkEntry.queries("tf_burstiness")(spark, Sf).collect()
    assert(got.length == math.min(TextOps.BurstTopK, stats.size.toLong))
    got.zip(ranked).foreach { case (r, (tok, (occ, docs))) =>
      assert(r.getAs[String]("tok") == tok,
        s"rank ${r.getAs[Long]("rank")}")
      assert(r.getAs[Long]("n_occ") == occ, tok)
      assert(r.getAs[Long]("n_docs") == docs, tok)
      assert(r.getAs[Double]("occ_per_doc") ==
        occ.toDouble / docs.toDouble, tok)
    }
  }

  test("planted: a clumped token outranks an equally frequent " +
      "spread one") {
    import spark.implicits._
    // 'clump' occurs 60x inside 2 docs; 'spread' 60x across 60 docs
    val clumpDocs = Seq(
      (1L, Seq.fill(30)("clump").mkString(" ")),
      (2L, Seq.fill(30)("clump").mkString(" ")))
    val spreadDocs = (10L until 70L).map(i => (i, "spread filler"))
    val dir = tmpDir("burst-planted")
    (clumpDocs ++ spreadDocs)
      .map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val out = TextOps.tfBurstiness(spark, dir).collect()
      .map(r => r.getAs[String]("tok") -> r).toMap
    assert(out.contains("clump") && out.contains("spread") &&
      out.contains("filler"))
    assert(out("clump").getAs[Long]("rank") <
      out("spread").getAs[Long]("rank"),
      "equal frequency, 30x the clumping")
    assert(out("clump").getAs[Double]("occ_per_doc") == 30.0)
    assert(out("spread").getAs[Double]("occ_per_doc") == 1.0)
  }
}
