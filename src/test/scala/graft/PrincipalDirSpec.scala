package graft

import graft.operators.SimilarityOps

/** Pins for `emb_principal_dir`: a driver-side BigInt power-iteration
  * mirror from the gated quantized lanes, the rescale bound, and a
  * planted correlated pair — in both orientations, so the
  * negative-component `div` truncation parity is exercised.
  */
class PrincipalDirSpec extends SparkSpec {

  private val S = SimilarityOps.PcaVs

  private def refIter(lanes0: Map[(Long, Long), Long], dims: Seq[Long])
      : Map[Long, BigInt] = {
    // truncated-integer per-dim mean removal, mirroring the operator
    val mu = dims.map { dm =>
      val qs = lanes0.collect { case ((_, d2), q) if d2 == dm => q }
      dm -> BigInt(qs.sum) / qs.size
    }.toMap
    val lanes = lanes0.map { case ((vid, dm), q) =>
      (vid, dm) -> (BigInt(q) - mu(dm)).toLong }
    val byVec = lanes.toSeq.groupBy(_._1._1)
    // keys materialized as a Seq: mapping products over the key SET
    // would deduplicate equal terms before summing
    val vecIds = byVec.keys.toSeq
    var v: Map[Long, BigInt] = dims.map(_ -> BigInt(S)).toMap
    for (_ <- 1 to SimilarityOps.PcaIters) {
      val dots = byVec.view.mapValues(_.map { case ((_, dm), q) =>
        BigInt(q) * v(dm) }.sum).toMap
      val raw = dims.map { dm =>
        dm -> vecIds.map(vid =>
          BigInt(lanes.getOrElse((vid, dm), 0L)) * dots(vid)).sum
      }.toMap
      val m = raw.values.map(_.abs).max
      // BigInt / truncates toward zero, matching Spark div / DuckDB //
      v = raw.view.mapValues(r =>
        if (m > 0) r / (m / S + 1) else BigInt(0)).toMap
    }
    v
  }

  test("matches the driver-side BigInt iteration bit-for-bit at " +
      "sf0.001") {
    val lanes = SparkEntry.queries("emb_quantize")(spark, Sf).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("dim")) ->
        r.getAs[Long]("q_int8")).toMap
    val dims = lanes.keys.map(_._2).toSeq.distinct.sorted
    val want = refIter(lanes, dims)
    val got = SparkEntry.queries("emb_principal_dir")(spark, Sf)
      .collect()
    assert(got.length == dims.length)
    got.foreach { r =>
      val dm = r.getAs[Long]("dim")
      assert(BigInt(r.getAs[Long]("v_scaled")) == want(dm), s"dim $dm")
      assert(r.getAs[Double]("loading") ==
        r.getAs[Long]("v_scaled").toDouble / S.toDouble)
      assert(math.abs(r.getAs[Long]("v_scaled")) <= S,
        "rescale keeps every component within the scale")
    }
    assert(got.exists(_.getAs[Long]("v_scaled") != 0L),
      "iteration must not collapse to zero on real data")
  }

  /** Planted rank-1 block: dims 0..5 perfectly correlated (dim 1
    * sign per `flip`), dims 6+ independent hashed noise. The block's
    * eigenvalue (6) sits far above the Marchenko–Pastur noise edge
    * at n=200, d=64 ((1+√(d/n))² ≈ 2.5) — a rank-2 plant at n≈d
    * would drown below the noise edge, which is itself a useful
    * fact this fixture documents. */
  private def planted(flip: Boolean): (Long, Long) = {
    import spark.implicits._
    val dims = SimilarityOps.Dims
    val vecs = (0L until 200L).map { i =>
      val x = ((i % 17).toFloat - 8.0f) / 8.0f
      (i, Array.tabulate(dims) { j =>
        if (j < 6) { if (flip && j == 1) -x else x }
        else {
          // mixed hash so noise dims are mutually UNcorrelated — a
          // shared cycle across dims would itself form a dominant
          // direction and swamp the planted block
          val h = ((i * 73856093L) ^ (j * 19349663L)) % 11L
          (h.toFloat - 5.0f) / 50.0f
        }
      }, (i % 3).toInt)
    }
    val dir = tmpDir("pca-planted")
    vecs.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val out = SimilarityOps.embPrincipalDir(spark, dir).collect()
      .map(r => r.getAs[Long]("dim") -> r.getAs[Long]("v_scaled")).toMap
    val noiseMax = out.filterKeys(_ >= 6L).values.map(math.abs).max
    (0L until 6L).foreach { j =>
      assert(math.abs(out(j)) > 2L * noiseMax,
        s"planted dim $j must dominate noise: ${out(j)} vs $noiseMax")
    }
    (out(0L), out(1L))
  }

  test("planted correlated block dominates the loading; an " +
      "anti-correlated member flips sign (negative-div parity path)") {
    val (a0, a1) = planted(flip = false)
    assert(a0.sign == a1.sign,
      s"correlated dims must load with one sign: $a0, $a1")
    val (b0, b1) = planted(flip = true)
    assert(b0.sign == -b1.sign,
      s"anti-correlated dims must load with opposite signs: $b0, $b1")
    assert(b0 < 0L || b1 < 0L,
      "the flipped fixture must actually produce a negative component")
  }
}
