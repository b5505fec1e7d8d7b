package graft

/** Pins for `doc_affinity_calibration`: bins recomputed in the driver
  * from the affinity relation's own numerators, doc conservation, and
  * the ranking property the selection family relies on (top bin
  * enriches the target language over the bottom bin).
  */
class AffinityCalibrationSpec extends SparkSpec {

  test("bins, conservation, and target rates match a driver fold at " +
      "sf0.001") {
    val bins = graft.operators.TextOps.AffinityCalBins
    val aff = SparkEntry.queries("doc_target_affinity")(spark, Sf)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_feat"), r.getAs[Long]("n_pos"),
        r.getAs[Long]("n_neg")))
    val langs = spark.read.parquet(s"$Sf/documents.parquet")
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = aff.groupBy { case (_, f, p, n) =>
      math.min(((p - n + f) * bins) / (2 * f), bins - 1)
    }.view.mapValues { docs =>
      (docs.length.toLong,
        docs.count(d => langs(d._1) == "en").toLong)
    }.toMap
    val got = SparkEntry.queries("doc_affinity_calibration")(spark, Sf)
      .collect().map(r => r.getAs[Long]("bin") -> r).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (b, (n, t)) =>
      val r = got(b)
      assert(b >= 0L && b < bins)
      assert(r.getAs[Long]("n_docs") == n, s"bin $b")
      assert(r.getAs[Long]("n_target") == t, s"bin $b")
      assert(r.getAs[Double]("target_rate") == t.toDouble / n.toDouble,
        s"bin $b")
      assert(r.getAs[Double]("bin_lo") ==
        (b * 2 - bins).toDouble / bins.toDouble, s"bin $b")
    }
    assert(got.values.map(_.getAs[Long]("n_docs")).sum == aff.length.toLong,
      "every scored doc lands in exactly one bin")
    // the ranking property every affinity selection depends on
    val top = got(got.keys.max).getAs[Double]("target_rate")
    val bottom = got(got.keys.min).getAs[Double]("target_rate")
    assert(top > bottom,
      s"the top affinity bin must enrich the target ($top vs $bottom) " +
        "or no threshold selection is sound")
  }
}
