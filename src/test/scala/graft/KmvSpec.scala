package graft

import org.apache.spark.sql.functions._

import graft.operators.SketchOps

/** KMV (k-minimum-values) sketch tier: estimator accuracy across
  * cardinality regimes, the exact-below-k contract, the shard-merge
  * lemma, and the sample-membership equivalence the overlap estimator
  * rests on. The oracle gate proves Spark ≡ DuckDB on the SAME
  * arithmetic; these tests prove the arithmetic is statistically
  * RIGHT — the class of error mirrored oracles cannot catch (the HLL
  * small-range bug of round 8 is the cautionary tale).
  */
class KmvSpec extends SparkSpec {

  import spark.implicits._

  /** A one-doc corpus whose shingle universe has exactly `n` distinct
    * shingles (n+2 content-diverse tokens → n windows, distinct by
    * the Weyl-sequence construction — same diversity rationale as the
    * HLL sweep in [[SketchSpec]]). */
  private def corpusOf(n: Int) = {
    val doc = (1 to n + 2)
      .map(i => java.lang.Long.toHexString(i * 0x9e3779b97f4a7c15L))
      .mkString(" ")
    Seq((1L, doc)).toDF("doc_id", "text")
  }

  private def estOf(n: Int): (Long, Double) = {
    val hs = SketchOps.shingleHashes(corpusOf(n))
    val r = SketchOps.kmvSummary(SketchOps.kmvSample(hs)).collect().head
    (hs.count(), r.getAs[Double]("est_distinct"))
  }

  test("below-sample-size cardinalities are estimated EXACTLY") {
    for (n <- Seq(1, 5, 100, 255)) {
      val (exact, est) = estOf(n)
      assert(exact == n.toLong, s"shingle construction broke at n=$n")
      assert(est == n.toDouble,
        s"n=$n under k=${SketchOps.KmvK} must be exact, got $est")
    }
  }

  test("estimator accuracy sweep over the sketch regime") {
    // sigma ~ n/sqrt(k-2) => 3-sigma relative envelope of 18.8%
    val tol = 3.0 / math.sqrt((SketchOps.KmvK - 2).toDouble)
    for (n <- Seq(256, 300, 1000, 5000, 20000)) {
      val (exact, est) = estOf(n)
      // the 31-bit hash space makes a stray collision possible at the
      // largest n — the estimator's target is the distinct-HASH count
      assert(exact >= n - 3L && exact <= n.toLong,
        s"shingle construction broke at n=$n (exact=$exact)")
      assert(math.abs(est - exact) / exact <= tol,
        s"n=$n est=$est rel=${math.abs(est - exact) / exact}")
    }
  }

  test("fixture estimate lands within the 3-sigma envelope") {
    val r = SketchOps.dedupKmvDistinct(spark, Sf).collect().head
    val (exact, est) =
      (r.getAs[Long]("n_exact"), r.getAs[Double]("est_distinct"))
    assert(exact > SketchOps.KmvK,
      "fixture must exceed the sample size or the sketch regime is untested")
    val tol = 3.0 / math.sqrt((SketchOps.KmvK - 2).toDouble)
    assert(math.abs(est - exact) / exact <= tol, s"est=$est exact=$exact")
  }

  test("sharded merge: k smallest of the shard samples' union IS the " +
      "global sample, rank for rank") {
    val m = SketchOps.dedupKmvMerge(spark, Sf).collect().head
    assert(m.getAs[Long]("n_shards") >= 2L,
      "fixture must actually split into multiple shards")
    assert(m.getAs[Long]("sample_identical") == 1L)
    assert(m.getAs[Double]("merged_est") == m.getAs[Double]("global_est"))
    val single = SketchOps.dedupKmvDistinct(spark, Sf).collect().head
    assert(m.getAs[Double]("merged_est") ==
      single.getAs[Double]("est_distinct"))
  }

  test("overlap estimates land near truth; estimator consistency") {
    val r = SketchOps.dedupKmvOverlap(spark, Sf).collect().head
    val (estJ, exactJ) =
      (r.getAs[Double]("est_jaccard"), r.getAs[Double]("exact_jaccard"))
    // binomial absolute envelope: 3*sqrt(rho(1-rho)/k) ~ 0.08 at
    // rho ~ 0.25, plus the union-estimate's own error folded in
    assert(math.abs(estJ - exactJ) <= 0.1, s"estJ=$estJ exactJ=$exactJ")
    val (estI, exactI) = (r.getAs[Double]("est_intersection"),
      r.getAs[Long]("exact_intersection"))
    assert(exactI > 0L, "fixture halves must genuinely overlap")
    assert(math.abs(estI - exactI) / exactI <= 0.25,
      s"estI=$estI exactI=$exactI")
    // internal consistency: est_intersection = est_jaccard*est_union
    assert(r.getAs[Double]("est_intersection") ==
      estJ * r.getAs[Double]("est_union"))
  }

  test("pairwise matrix: every source pair present, estimates land " +
      "inside the envelope of the brute-force exact jaccard") {
    val m = SketchOps.dedupKmvMatrix(spark, Sf).cache()
    val srcHs = graft.sources.Tables.documents(spark, Sf)
      .select(col("source"),
        graft.functions.Hashing.tokens(col("text")).as("tk"))
      .filter(size(col("tk")) >= 3)
      .select(col("source"), explode(graft.functions.Hashing
        .hashAll(graft.functions.Hashing.shingles(col("tk")))).as("h"))
      .distinct().cache()
    try {
      val nSrc = srcHs.select("source").distinct().count()
      assert(m.count() === nSrc * (nSrc - 1) / 2,
        "matrix must cover every unordered source pair exactly once")
      // the quadratic mirror the sketch replaces — affordable here
      val exact = srcHs.as("a").join(srcHs.as("b"), Seq("h"))
        .filter(col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("source_a"),
          col("b.source").as("source_b"))
        .agg(count(lit(1)).as("n_inter"))
      val checked = m
        .join(exact, Seq("source_a", "source_b"), "left")
        .na.fill(0L, Seq("n_inter"))
        .select(col("est_jaccard"), col("n_inter"),
          (col("n_a_exact") + col("n_b_exact") - col("n_inter"))
            .as("n_union"))
        .collect()
      assert(checked.nonEmpty)
      assert(checked.exists(_.getAs[Long]("n_inter") > 0L),
        "fixture sources must genuinely share shingles")
      for (r <- checked) {
        val exactJ = r.getAs[Long]("n_inter").toDouble /
          r.getAs[Long]("n_union").toDouble
        val estJ = r.getAs[Double]("est_jaccard")
        // binomial envelope as in the two-side overlap test, plus
        // union-estimate error folded in
        assert(math.abs(estJ - exactJ) <= 0.1,
          s"estJ=$estJ exactJ=$exactJ")
      }
      // internal consistency across every pair
      val bad = m.filter(col("est_intersection") =!=
        col("est_jaccard") * col("est_union")).count()
      assert(bad === 0L)
    } finally { m.unpersist(); srcHs.unpersist() }
  }

  test("streaming KMV monitor: the finite replay's sample summary is " +
      "bit-equal to the batch single-pass build") {
    val m = graft.operators.StreamOps.streamKmvMonitor(spark, Sf)
      .collect().head
    val b = SketchOps.kmvSummary(SketchOps.kmvSample(
      SketchOps.shingleHashes(
        graft.sources.Tables.documents(spark, Sf)))).collect().head
    assert(m.toSeq == b.toSeq, s"stream=$m batch=$b")
  }

  test("union-sample membership in a side's SAMPLE equals membership " +
      "in the side's full SET (the lemma the overlap estimate rests on)") {
    def side(g: Int) = SketchOps.shingleHashes(
      graft.sources.Tables.documents(spark, Sf)
        .filter(graft.functions.Hashing.charHash(col("source")) % 2 === g))
    val ha = side(0).cache()
    val hb = side(1).cache()
    try {
      val sa = SketchOps.kmvSample(ha)
      val sb = SketchOps.kmvSample(hb)
      val su = SketchOps.kmvSample(sa.union(sb).distinct())
      def nBothVia(a: org.apache.spark.sql.DataFrame,
          b: org.apache.spark.sql.DataFrame): Long =
        su.join(a, Seq("h"), "left_semi")
          .join(b, Seq("h"), "left_semi").count()
      assert(nBothVia(sa, sb) == nBothVia(ha, hb),
        "sample membership must coincide with set membership " +
          "inside the union sample")
    } finally { ha.unpersist(); hb.unpersist() }
  }
}
