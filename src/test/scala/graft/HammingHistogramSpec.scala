package graft

import graft.operators.DedupOps

/** Pins for `dedup_hamming_histogram`: the distance-0 bucket must
  * equal the pair count implied by the simhash cluster sizes (the
  * identical-fingerprint cross-check), the cumulative column must be
  * a proper CDF, and a planted twin pair lands at distance 0.
  */
class HammingHistogramSpec extends SparkSpec {

  test("distance 0 equals the simhash-cluster pair count; the " +
      "cumulative column is a CDF at sf0.001") {
    val hist = SparkEntry.queries("dedup_hamming_histogram")(spark, Sf)
      .collect()
    val clusterPairs = SparkEntry.queries("dedup_simhash_clusters")(
        spark, Sf).collect()
      .map(_.getAs[Long]("cluster_size"))
      .map(s => s * (s - 1) / 2).sum
    val zero = hist.find(_.getAs[Long]("hamming") == 0L)
      .map(_.getAs[Long]("n_pairs")).getOrElse(0L)
    assert(zero == clusterPairs,
      "identical fingerprints share every band, so no 0-distance " +
        "pair can escape the candidate join")
    // CDF shape: distances sorted within the calibration range,
    // counts positive, cum monotone to 1
    assert(hist.map(_.getAs[Long]("hamming")).toSeq ==
      hist.map(_.getAs[Long]("hamming")).sorted.toSeq)
    hist.foreach { r =>
      assert(r.getAs[Long]("n_pairs") > 0L)
      assert(r.getAs[Long]("hamming") <= DedupOps.HammingHistMax,
        "out-of-range pairs must be cut before the shuffle")
    }
    val cums = hist.map(_.getAs[Long]("cum_pairs")).toSeq
    assert(cums == hist.map(_.getAs[Long]("n_pairs"))
      .scanLeft(0L)(_ + _).tail.toSeq)
    assert(hist.last.getAs[Double]("cum_share") == 1.0)
    // distances under the band-width pigeonhole bound are EXACT: all
    // pairs at hamming < 4 are present, so the spike at 0 exists here
    assert(zero > 0L, "sf0.001 plants exact duplicates")
  }

  test("planted: a twin pair lands at hamming 0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"), // exact twin
      (3L, "zq xv wk jm pn rt"))              // far away
    val dir = tmpDir("hamming-planted")
    docs.map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val out = DedupOps.dedupHammingHistogram(spark, dir).collect()
      .map(r => r.getAs[Long]("hamming") -> r.getAs[Long]("n_pairs"))
      .toMap
    assert(out.getOrElse(0L, 0L) == 1L, "exactly the twin pair")
  }
}
