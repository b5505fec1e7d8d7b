package graft

import org.apache.spark.sql.functions._

import graft.functions.Hashing
import graft.operators.SketchOps

/** Pins the structural guarantees each sketch claims in its Scaladoc:
  * Bloom has no false negatives, Count-Min never undercounts, and the
  * HLL estimate lands within the standard-error envelope of the exact
  * distinct count. Value-level parity with DuckDB is the oracle gate;
  * these are the properties that make the sketches *sketches*. */
class SketchSpec extends SparkSpec {

  test("bloom probe: no false negatives, verdict consistent") {
    val rows = SketchOps.dedupBloomProbe(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nPos = r.getAs[Long]("n_pos_hit")
      val hit = r.getAs[Long]("bloom_hit")
      val exact = r.getAs[Long]("exact_dup")
      val verdict = r.getAs[String]("verdict")
      // an exact duplicate's fingerprint set every one of its k bits
      // when the corpus was built — the filter CANNOT miss it
      if (exact == 1L) assert(hit == 1L,
        s"false negative on ${r.getAs[Any]("doc_id")}")
      assert(nPos >= 0L && nPos <= SketchOps.BloomK)
      assert(verdict == (
        if (hit == 1L && exact == 1L) "dup"
        else if (hit == 1L) "false_positive" else "new"))
    }
  }

  test("cms counts: estimates never undercount; exact for isolated rows") {
    val rows = SketchOps.tfCmsCounts(spark, Sf).collect()
    assert(rows.length == SketchOps.CmsProbeK)
    rows.foreach { r =>
      assert(r.getAs[Long]("overcount") >= 0L,
        s"CMS undercounted ${r.getAs[String]("token")}")
      assert(r.getAs[Long]("est_cnt") ==
        r.getAs[Long]("true_cnt") + r.getAs[Long]("overcount"))
    }
  }

  test("hll estimate within 3 standard errors of the exact count") {
    val r = SketchOps.tfHllDistinct(spark, Sf).collect().head
    val exact = r.getAs[Long]("n_exact").toDouble
    val est = r.getAs[Double]("est_distinct")
    // HLL standard error = 1.04/sqrt(m); allow 3 sigma. The sf0.001
    // fixture (31 distinct tokens, m=256) sits deep in the
    // linear-counting regime, where the small-range correction's
    // error is far below this envelope — the raw estimator without
    // the correction was 6.6x off and failed here.
    val sigma = 1.04 / math.sqrt(SketchOps.HllRegisters.toDouble)
    assert(exact > 0)
    assert(math.abs(est - exact) / exact <= 3 * sigma,
      s"est=$est exact=$exact rel=${math.abs(est - exact) / exact}")
  }

  test("sharded HLL merge: merged registers are bit-identical to the " +
      "global build, so the estimates agree exactly") {
    val m = SketchOps.tfHllMerge(spark, Sf).collect().head
    assert(m.getAs[Long]("n_shards") >= 2L,
      "fixture must actually split into multiple shards")
    assert(m.getAs[Long]("registers_identical") == 1L)
    assert(m.getAs[Double]("merged_est") == m.getAs[Double]("global_est"))
    // and the merged estimate IS the single-pass query's estimate
    val single = SketchOps.tfHllDistinct(spark, Sf).collect().head
    assert(m.getAs[Double]("merged_est") ==
      single.getAs[Double]("est_distinct"))
  }

  test("sharded histogram merge: per-bin addition reproduces the global " +
      "build and the merged quantiles equal the single-pass estimates") {
    val m = graft.operators.EventOps.evHistogramMerge(spark, Sf)
      .collect().head
    assert(m.getAs[Long]("n_shards") >= 2L,
      "fixture must actually split into multiple shards")
    assert(m.getAs[Long]("bins_identical") == 1L)
    // the merged-histogram quantile bins must BE the single-pass
    // query's bins — same integer-rank arithmetic over the same counts
    val single = graft.operators.EventOps
      .evHistogramQuantiles(spark, Sf).collect()
      .map(r => r.getAs[Long]("p") -> r.getAs[Long]("est_bin")).toMap
    assert(m.getAs[Long]("p50_bin") == single(50L))
    assert(m.getAs[Long]("p90_bin") == single(90L))
    assert(m.getAs[Long]("p99_bin") == single(99L))
    assert(m.getAs[Long]("n_total") > 0L)
  }

  test("per-type histogram quantiles: each estimated bin CONTAINS the " +
      "exact rank-based percentile value") {
    import org.apache.spark.sql.functions._
    val out = graft.operators.EventOps.evHistogramByType(spark, Sf)
      .collect()
    assert(out.length > 1, "fixture must have multiple event types")
    // the exact mirror: per-type sorted values, integer rank pick —
    // the plan the histogram replaces at scale
    val vals = graft.sources.Tables.events(spark, Sf)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("value"))
      .collect()
      .groupBy(_.getAs[String]("event_type"))
      .map { case (t, rs) => t -> rs.map(_.getAs[Double]("value")).sorted }
    for (r <- out; (p, binCol) <- Seq(
        50 -> "p50_bin", 90 -> "p90_bin", 99 -> "p99_bin")) {
      val sorted = vals(r.getAs[String]("event_type"))
      // smallest index i with (i+1)*100 >= p*n — the cum_n*100 >= p*N
      // rank definition both engines run
      val idx = sorted.indices
        .find(i => (i + 1L) * 100L >= p.toLong * sorted.length).get
      val exact = sorted(idx)
      val bin = r.getAs[Long](binCol)
      assert(bin * 10.0 <= exact && exact < bin * 10.0 + 10.0,
        s"type=${r.getAs[String]("event_type")} p=$p bin=$bin " +
          s"does not contain exact percentile $exact")
    }
  }

  test("hll estimator accuracy sweep: small-range correction and raw " +
      "regime both land within the error envelope across cardinalities") {
    // An indexing bug in the correction table (e.g. off-by-one in V)
    // would keep the oracle gate green — both engines share the
    // table — but not this envelope. Spans the linear-counting regime
    // (n << m), the switchover (raw_est ~ 2.5m = 640), and the raw
    // regime.
    import spark.implicits._
    for (n <- Seq(1, 5, 31, 150, 400, 700, 1500, 4000)) {
      // content-diverse tokens: sequential `tok$i` strings hash too
      // regularly through the polynomial char hash (they spread over
      // MORE registers than uniform hashing would), which violates
      // the i.i.d. assumption the error envelope is derived from —
      // a Weyl-sequence hex suffix restores hash-like diversity
      val doc = (1 to n)
        .map(i => java.lang.Long.toHexString(i * 0x9e3779b97f4a7c15L))
        .mkString(" ")
      val df = Seq((1L, doc)).toDF("doc_id", "text")
      val r = SketchOps.hllSummary(spark, SketchOps.hllRegs(df))
        .collect().head
      val est = r.getAs[Double]("est_distinct")
      // 3 sigma (sigma = 1.04/sqrt(256) = 6.5%) plus a small floor
      // for integer-granularity effects at tiny n
      val tol = 3 * 1.04 / math.sqrt(SketchOps.HllRegisters.toDouble) +
        (if (n < 10) 0.25 else 0.0)
      assert(math.abs(est - n) / n <= tol,
        s"n=$n est=$est rel=${math.abs(est - n) / n}")
    }
  }

  test("group-by HLL: every per-source estimate lands in the 3-sigma " +
      "envelope (the grouped sketch is as sound as the global one)") {
    val rows = SketchOps.tfHllBySource(spark, Sf).collect()
    assert(rows.length > 1, "fixture must have multiple sources")
    val tol = 3 * 1.04 / math.sqrt(SketchOps.HllRegisters.toDouble) + 0.05
    rows.foreach { r =>
      val (n, est) =
        (r.getAs[Long]("n_exact"), r.getAs[Double]("est_distinct"))
      assert(n > 0L)
      assert(math.abs(est - n) / n <= tol,
        s"${r.getAs[String]("source")}: n=$n est=$est " +
          s"rel=${math.abs(est - n) / n}")
    }
  }

  test("sharded CMS merge: cell-wise addition reproduces the global " +
      "matrix bit-for-bit") {
    val m = SketchOps.tfCmsMerge(spark, Sf).collect().head
    assert(m.getAs[Long]("n_shards") >= 2L,
      "fixture must actually split into multiple shards")
    assert(m.getAs[Long]("cells_identical") == 1L)
    // every token instance lands in exactly CmsDepth cells
    assert(m.getAs[Long]("sum_count") % SketchOps.CmsDepth == 0L)
  }

  test("streaming bloom gate: decisions agree with the batch probe's " +
      "bloom columns; exact duplicates always route to the exact tier") {
    val gate = SparkEntry.queries("stream_bloom_gate")(spark, Sf)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_pos_hit"), r.getAs[String]("decision"))).toMap
    val probe = SketchOps.dedupBloomProbe(spark, Sf).collect()
    assert(gate.nonEmpty && gate.size == probe.length)
    probe.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (nph, dec) = gate(id)
      assert(nph == r.getAs[Long]("n_pos_hit"), s"doc $id")
      assert(dec == (if (r.getAs[Long]("bloom_hit") == 1L)
        "route_exact_tier" else "admitted_new"), s"doc $id")
      // the no-false-negative contract, streamed: a true exact dup
      // can NEVER be admitted as new
      if (r.getAs[Long]("exact_dup") == 1L)
        assert(dec == "route_exact_tier", s"false negative on doc $id")
    }
  }

  test("streaming CMS monitor: the addition-merged matrix equals the " +
      "batch single-pass matrix cell-for-cell") {
    val stream = SparkEntry.queries("stream_cms_monitor")(spark, Sf)
      .collect()
      .map(r => (r.getAs[Int]("row"), r.getAs[Long]("bucket")) ->
        r.getAs[Long]("cnt")).toMap
    val batch = SketchOps
      .cmsMatrix(graft.sources.Tables.documents(spark, Sf))
      .collect()
      .map(r => (r.getAs[Int]("row"), r.getAs[Long]("bucket")) ->
        r.getAs[Long]("cnt")).toMap
    assert(stream.nonEmpty)
    assert(stream == batch)
  }

  test("streaming HLL monitor: the finite replay's estimate is " +
      "bit-equal to the batch single-pass build") {
    val m = SparkEntry.queries("stream_hll_monitor")(spark, Sf)
      .collect().head
    val b = SketchOps.tfHllDistinct(spark, Sf).collect().head
    for (c <- Seq("n_registers", "n_set", "sum_scaled"))
      assert(m.getAs[Long](c) == b.getAs[Long](c), c)
    assert(m.getAs[Double]("est_distinct") ==
      b.getAs[Double]("est_distinct"))
  }

  test("register relations of arbitrary corpus slices MAX-merge into " +
      "exactly the global registers (the monitor's per-batch fold)") {
    val dd = graft.sources.Tables.documents(spark, Sf)
    val slices = (0 until 3).map(i =>
      SketchOps.hllRegs(dd.filter(col("doc_id") % 3 === i)))
    val merged = slices.reduce(_ unionByName _)
      .groupBy("reg").agg(max(col("rho")).as("rho"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val global = SketchOps.hllRegs(dd)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged == global)
  }

  test("register relation is bounded by m regardless of corpus size") {
    // the scale contract: the sketch side of each query collapses to a
    // fixed-size relation before any join. Recompute the register
    // relation the query builds and check its cardinality bound.
    val hs = graft.sources.Tables.documents(spark, Sf)
      .select(explode(Hashing.tokens(col("text"))).as("token"))
      .select(Hashing.charHash(col("token")).as("h")).distinct()
    val regs = hs.groupBy((col("h") % SketchOps.HllRegisters).as("reg"))
      .count()
    assert(regs.count() <= SketchOps.HllRegisters)
  }

  test("heavy delta: an ingest-borne template wave reports emerging, " +
      "a bar-raising ingest reports the old template vanished") {
    import spark.implicits._
    val ids = spark.range(3000L)
      .select(col("id"),
        (Hashing.charHash(col("id").cast("string")) % 10 === 7).as("nw"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val corpusIds = ids.filter(!_._2).map(_._1)
    val newIds = ids.filter(_._2).map(_._1)
    val phraseA = (1 to 10).map(i => s"oldtpl$i").mkString(" ")
    val phraseB = (1 to 10).map(i => s"newtpl$i").mkString(" ")
    // base: phrase A exactly at the floor (6 repeats, bar = max(n/15000, 6) = 6)
    val base = corpusIds.take(6).map(id => (id, phraseA))
    // ingest: phrase B well past the bar, plus enough fresh volume to
    // raise the RELATIVE bar past A's count (≈105k grams -> bar 7)
    val wave = newIds.take(8).map(id => (id, phraseB))
    val bulk = newIds.slice(8, 300).zipWithIndex.map { case (id, i) =>
      (id, (1 to 408).map(j => s"bulk${i}w$j").mkString(" "))
    }
    assert(bulk.length >= 280 ,
      "hash gate yielded too few ingest ids to raise the bar")
    val dir = tmpDir("heavy-delta")
    (base ++ wave ++ bulk).toSeq
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("tf_heavy_delta")(spark, dir)
      .as[(String, String)].collect().toMap
    val aGrams = out.filter(_._1.startsWith("oldtpl")).values.toSet
    val bGrams = out.filter(_._1.startsWith("newtpl")).values.toSet
    assert(bGrams == Set("emerging"),
      s"the ingest-borne template must report emerging: $out")
    assert(aGrams == Set("vanished"),
      s"the diluted template must report vanished: $aGrams")
  }

  test("sketch-filtered heavy hitters: zero false negatives, CMS " +
      "never underestimates, candidates are a real prune") {
    import spark.implicits._
    val sf01 = "/root/testdata/sf0.01"
    // driver-side truth over the same 3-word shingle stream
    val grams = graft.sources.Tables.documents(spark, sf01)
      .select(col("text")).as[String].collect().toSeq
      .flatMap { t =>
        val toks = t.split(" ").filter(_.nonEmpty).toSeq
        if (toks.length >= 3) toks.sliding(3).map(_.mkString(" ")).toSeq
        else Seq.empty
      }
    val truth = grams.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val thr = math.max(grams.size.toLong / SketchOps.HeavyDen,
      SketchOps.HeavyMinCnt)
    val trueHeavy = truth.filter(_._2 >= thr).keySet
    assert(trueHeavy.nonEmpty, "fixture has no heavy hitters to find")
    val out = SparkEntry.queries("tf_heavy_hitters")(spark, sf01)
      .select("gram", "est_cnt", "true_cnt", "verdict").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    val gotHeavy = out.filter(_._4 == "heavy").map(_._1).toSet
    assert(gotHeavy == trueHeavy,
      "the CMS filter must admit EVERY true heavy hitter (no false " +
        "negatives by construction) and exact verification must " +
        "reject every impostor")
    out.foreach { case (g, est, tru, _) =>
      assert(tru == truth(g), s"exact tier miscounted $g")
      assert(est >= tru, s"CMS underestimated $g: $est < $tru")
    }
    // the candidate prune must be real: the exact tier sees orders
    // of magnitude fewer grams than the vocabulary (the empirical
    // failure this width guards: at the 1024-wide monitor matrix the
    // whole 16k vocabulary passed the filter)
    assert(out.length.toLong < truth.size.toLong / 10,
      s"candidate set ${out.length} is not a prune of vocabulary " +
        s"${truth.size}")
  }
}
