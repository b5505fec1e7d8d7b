package graft

import graft.operators.TextOps

/** Pins for `doc_length_ks`: a driver-side exact recomputation of the
  * cross-multiplied KS numerator, a planted length-shifted ingest
  * slice that must alarm, and the identical-distribution zero.
  */
class LengthKsSpec extends SparkSpec {

  private def residue(id: Long): Long = {
    var h = 0L
    id.toString.foreach(c => h = (h * 31 + c.toLong) % 2147483647L)
    h % 10
  }

  test("matches a driver-side exact KS fold at sf0.001") {
    val rows = spark.read.parquet(s"$Sf/documents.parquet")
      .select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bySource = rows.groupBy(_._2)
    val got = SparkEntry.queries("doc_length_ks")(spark, Sf).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    bySource.foreach { case (src, docs) =>
      val (slice, base) =
        docs.partition(d => residue(d._1) == TextOps.KsSliceTag)
      if (slice.isEmpty || base.isEmpty)
        assert(!got.contains(src), s"$src has an empty side")
      else {
        val r = got(src)
        val nS = slice.length.toLong
        val nB = base.length.toLong
        val lens = docs.map(_._3).distinct.sorted
        val ksNum = lens.map { l =>
          val cb = base.count(_._3 <= l).toLong
          val cs = slice.count(_._3 <= l).toLong
          math.abs(cb * nS - cs * nB)
        }.max
        assert(r.getAs[Long]("n_base") == nB, src)
        assert(r.getAs[Long]("n_slice") == nS, src)
        assert(r.getAs[Long]("ks_num") == ksNum, src)
        assert(r.getAs[Long]("ks_den") == nB * nS, src)
        assert(r.getAs[Double]("ks") ==
          ksNum.toDouble / (nB * nS).toDouble, src)
        assert(r.getAs[Boolean]("drifted") ==
          (ksNum * 1000L > TextOps.KsThreshPermille * nB * nS), src)
      }
    }
  }

  test("a length-shifted ingest slice alarms; an identical slice " +
      "stays quiet at KS = 0") {
    import spark.implicits._
    val tag = TextOps.KsSliceTag
    val sliceIds = (1L to 2000L).filter(residue(_) == tag).take(40)
    val baseIds = (1L to 2000L).filter(residue(_) != tag).take(40)
    // source "shifted": base docs ~100 chars, slice docs ~300 chars;
    // source "steady": both sides share one length value
    def doc(id: Long, src: String, len: Int) =
      (id, "x" * len, "en", src, len.toLong)
    val docs =
      baseIds.take(20).map(doc(_, "shifted", 100)) ++
        sliceIds.take(20).map(doc(_, "shifted", 300)) ++
        baseIds.drop(20).map(doc(_, "steady", 150)) ++
        sliceIds.drop(20).map(doc(_, "steady", 150))
    val dir = tmpDir("ks-planted")
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val out = TextOps.docLengthKs(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    // disjoint supports: sup|F_b - F_s| = 1 -> ks_num = n_b * n_s
    assert(out("shifted").getAs[Long]("ks_num") == 20L * 20L)
    assert(out("shifted").getAs[Double]("ks") == 1.0)
    assert(out("shifted").getAs[Boolean]("drifted"))
    assert(out("steady").getAs[Long]("ks_num") == 0L)
    assert(out("steady").getAs[Double]("ks") == 0.0)
    assert(!out("steady").getAs[Boolean]("drifted"))
  }
}
