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

  test("differential: the round-16 distinct-fingerprint collapse " +
      "equals the doc-level band join it replaced") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.functions.Hashing.{hashAll, simhash32, tokens}
    // a corpus where the collapse's weights matter: exact-dup groups
    // of several sizes (same sh, multiplicities 3 and 2), near-twins
    // (cross-value pairs with weight > 1), and random chaff
    val rnd = new scala.util.Random(0x4a31)
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa", "mu", "nu")
    def doc(): String =
      (1 to 6 + rnd.nextInt(6)).map(_ => words(rnd.nextInt(words.size)))
        .mkString(" ")
    val base = (1 to 40).map(_ => doc())
    val texts = base ++ base.take(5) ++ base.take(2) ++ // dup groups
      base.take(8).map(_ + " omega")                    // near variants
    val dir = tmpDir("hamming-differential")
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // doc-level reference: the pre-round-16 shape — band self-join on
    // (doc, band, bv) with doc_id < doc_id, multiplicity recovery
    val nBands = 32 / DedupOps.SimhashBandBits
    val sh = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("thashes", hashAll(tokens(col("text"))))
      .select(col("doc_id"), simhash32(col("thashes")).as("sh"))
    val bands = sh.select(col("doc_id"), col("sh"),
        explode(array((0 until nBands).map(j =>
          struct(lit(j).as("band"),
            shiftrightunsigned(col("sh"), j * DedupOps.SimhashBandBits)
              .bitwiseAND(lit((1L << DedupOps.SimhashBandBits) - 1))
              .as("bv"))): _*)).as("b"))
      .select(col("doc_id"), col("sh"),
        col("b.band").as("band"), col("b.bv").as("bv"))
    val mExpr = (0 until nBands).map(j =>
        s"(CASE WHEN ((x.sh ^ y.sh) >> ${j * DedupOps.SimhashBandBits}) " +
          s"& ${(1L << DedupOps.SimhashBandBits) - 1} = 0 THEN 1 ELSE 0 END)")
      .mkString("CAST(", " + ", " AS BIGINT)")
    val ref = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
          col("x.doc_id") < col("y.doc_id"))
      .selectExpr("CAST(bit_count(x.sh ^ y.sh) AS BIGINT) AS hamming",
        s"$mExpr AS m")
      .filter(col("hamming") <= DedupOps.HammingHistMax)
      .groupBy(col("hamming"), col("m"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("hamming"))
      .agg(sum(expr("cnt div m")).as("n_pairs"))
      .collect()
      .map(r => r.getAs[Long]("hamming") -> r.getAs[Long]("n_pairs"))
      .toMap
    val got = DedupOps.dedupHammingHistogram(spark, dir).collect()
      .map(r => r.getAs[Long]("hamming") -> r.getAs[Long]("n_pairs"))
      .toMap
    assert(got == ref, "distinct-value collapse must be exact")
    assert(got.getOrElse(0L, 0L) >= 5L + 1L + 1L,
      "the planted dup groups (sizes >= 3,2 among the first five) " +
        "must land at hamming 0")
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
