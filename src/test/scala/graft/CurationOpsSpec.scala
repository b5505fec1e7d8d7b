package graft

import org.apache.spark.sql.functions._

import graft.operators.{Relational, SimilarityOps, TextOps}

/** Semantic pins for the round-5 curation/compression operators
  * (value correctness vs DuckDB is the driver gate; these pin the
  * properties the oracle can't express). */
class CurationOpsSpec extends SparkSpec {

  test("doc_length_buckets partitions the corpus exactly") {
    val out = TextOps.docLengthBuckets(spark, Sf).collect()
    val nDocs = spark.read.parquet(s"$Sf/documents.parquet").count()
    assert(out.map(_.getAs[Long]("n_docs")).sum === nDocs,
      "every document must land in exactly one bucket")
    val legal = (TextOps.LengthBucketBounds :+ TextOps.LengthBucketCap).toSet
    assert(out.forall(r => legal.contains(r.getAs[Long]("bucket_max"))))
    assert(out.forall(r => r.getAs[Long]("pad_tokens") >= 0L),
      "padding to the bucket max can never be negative")
    assert(out.forall { r =>
      val p = r.getAs[Double]("pad_ratio"); p >= 0.0 && p < 1.0
    })
  }

  test("doc_quality_gate keeps at least half of every language") {
    val out = TextOps.docQualityGate(spark, Sf).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getAs[String]("lang")).foreach { case (lang, rows) =>
      val kept = rows.count(_.getAs[String]("verdict") == "keep")
      // quality >= the interpolated median holds for at least the
      // upper half (more under ties); a language can never be
      // entirely dropped by its OWN median — the point of the gate
      assert(kept >= rows.length / 2, s"$lang kept $kept/${rows.length}")
      val distinctScores =
        rows.map(_.getAs[Double]("quality")).distinct.length
      assert(kept < rows.length || distinctScores == 1,
        s"$lang dropped nothing — median gate must bite when the " +
          "language has more than one distinct quality score")
      val med = rows.head.getAs[Double]("lang_median")
      assert(rows.forall(_.getAs[Double]("lang_median") == med),
        s"$lang must see one median")
    }
  }

  test("doc_manifest is the exact conjunction of its source gates") {
    val m = graft.operators.DedupOps.docManifest(spark, Sf).collect()
    val nDocs = spark.read.parquet(s"$Sf/documents.parquet").count()
    assert(m.length === nDocs, "one manifest row per document")
    m.foreach { r =>
      val expect =
        if (r.getAs[String]("decision") == "keep" &&
          r.getAs[String]("quality_verdict") == "keep") "keep" else "drop"
      assert(r.getAs[String]("final_decision") === expect)
    }
    val kd = TextOps.docKeepDecision(spark, Sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("decision")).toMap
    assert(m.forall(r =>
      kd(r.getAs[Long]("doc_id")) == r.getAs[String]("decision")),
      "manifest decisions must match doc_keep_decision row-for-row")
  }

  test("ev_transitions rows are per-type probability distributions") {
    val out = graft.operators.EventOps.evTransitions(spark, Sf).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getAs[String]("event_type")).foreach { case (t, rows) =>
      val pSum = rows.map(_.getAs[Double]("p")).sum
      assert(math.abs(pSum - 1.0) < 1e-12, s"$t row must sum to 1, got $pSum")
      val n = rows.map(_.getAs[Long]("n")).sum
      assert(n > 0L)
    }
  }

  test("emb_outliers flags at most the upper tail of every label") {
    val out = SimilarityOps.embOutliers(spark, Sf).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getAs[Long]("label")).foreach { case (l, rows) =>
      val nOut = rows.count(_.getAs[String]("verdict") == "outlier")
      // strictly-above-p95 flags at most 5% (fewer under ties)
      assert(nOut <= math.ceil(rows.length * 0.05),
        s"label $l flagged $nOut of ${rows.length}")
      val p95 = rows.head.getAs[Double]("label_p95")
      assert(rows.forall(_.getAs[Double]("label_p95") == p95),
        s"label $l must see one threshold")
    }
    assert(out.exists(_.getAs[String]("verdict") == "outlier"),
      "a continuous distance distribution must have an upper tail")
  }

  test("doc_split_oov covers exactly the eval splits with sane rates") {
    val out = graft.operators.DedupOps.docSplitOov(spark, Sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(Set("val", "test")(r.getAs[String]("split")),
        "train rows must not appear in an OOV-vs-train report")
      val (n, oov) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_oov"))
      assert(oov >= 0L && oov <= n)
      val rate = r.getAs[Double]("oov_rate")
      assert(rate >= 0.0 && rate <= 1.0)
    }
  }

  test("emb_winsorize clips into [lo, hi] and only the tails") {
    val out = SimilarityOps.embWinsorize(spark, Sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (v, lo, hi, c) = (r.getAs[Double]("v"), r.getAs[Double]("lo"),
        r.getAs[Double]("hi"), r.getAs[Double]("v_clip"))
      assert(lo <= hi)
      assert(c >= lo && c <= hi)
      assert(if (v >= lo && v <= hi) c == v else c == lo || c == hi,
        "in-range values must pass through untouched")
    }
    val clippedFrac = out.count(r =>
      r.getAs[Double]("v_clip") != r.getAs[Double]("v")).toDouble / out.length
    assert(clippedFrac > 0.0 && clippedFrac <= 0.11,
      s"p05/p95 clipping must touch ~10% of coordinates, got $clippedFrac")
  }

  test("ev_rolling_wau: a window always covers at least its own day") {
    val out = graft.operators.EventOps.evRollingWau(spark, Sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (dau, wau) = (r.getAs[Long]("dau"), r.getAs[Long]("wau"))
      assert(wau >= dau, "7-day actives can never be fewer than daily")
      val st = r.getAs[Double]("stickiness")
      assert(st > 0.0 && st <= 1.0)
    }
  }

  test("ev_value_bands partitions matched events disjointly") {
    val out = graft.operators.EventOps.evValueBands(spark, Sf).collect()
    assert(out.length === 4, "every band must be populated at sf0.001")
    val total = spark.read.parquet(s"$Sf/events.parquet").count()
    assert(out.map(_.getAs[Long]("n")).sum <= total,
      "half-open [lo, hi) bands can never double-count an event")
  }

  test("text_remove_boilerplate keeps an ordered subsequence per doc") {
    val out = TextOps.textRemoveBoilerplate(spark, Sf).collect()
    val orig = spark.read.parquet(s"$Sf/documents.parquet").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").split("\\s+").filter(_.nonEmpty).toSeq)
      .toMap
    assert(out.length === orig.size)
    var removedSomething = false
    out.foreach { r =>
      val (n, kept, removed) = (r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_kept"), r.getAs[Long]("n_removed"))
      assert(kept + removed === n)
      val cleaned = r.getAs[String]("cleaned_text")
        .split(" ").filter(_.nonEmpty).toSeq
      assert(cleaned.length === kept)
      // subsequence check: cleaned tokens appear in the original in order
      val src = orig(r.getAs[Long]("doc_id"))
      var i = 0
      cleaned.foreach { t =>
        i = src.indexOf(t, i)
        assert(i >= 0, s"'$t' out of order vs the original document")
        i += 1
      }
      if (removed > 0) removedSomething = true
    }
    assert(removedSomething,
      "a df>=2 boilerplate set on this corpus must remove something")
  }

  test("doc_sample_temperature is a flattened probability distribution") {
    val out = TextOps.docSampleTemperature(spark, Sf).collect()
    val qSum = out.map(_.getAs[Double]("q_prob")).sum
    assert(math.abs(qSum - 1.0) < 1e-12, s"q_prob must sum to 1, got $qSum")
    // sqrt-temperature flattens: dominant langs are downweighted,
    // rare langs upweighted (strict when shares differ from uniform)
    val u = 1.0 / out.length
    out.foreach { r =>
      val share = r.getAs[Double]("share")
      val q = r.getAs[Double]("q_prob")
      if (share > u) assert(q < share, s"${r.getAs[String]("lang")}: " +
        s"dominant share $share must shrink, got q=$q")
      if (share < u) assert(q > share, s"${r.getAs[String]("lang")}: " +
        s"rare share $share must grow, got q=$q")
    }
    assert(out.map(_.getAs[Long]("target_docs")).forall(_ >= 0L))
  }

  test("text_boilerplate_ngrams respects the df threshold") {
    val out = TextOps.textBoilerplateNgrams(spark, Sf).collect()
    assert(out.nonEmpty, "the word-soup corpus must surface repeated spans")
    assert(out.forall(_.getAs[Long]("df") >= TextOps.BoilerplateMinDf))
    assert(out.forall(r =>
      r.getAs[Long]("n_occurrences") >= r.getAs[Long]("df")),
      "a gram occurs at least once in each document that contains it")
  }

  test("emb_pq_encode: per-subspace argmin beats any whole-vector centroid") {
    val pq = SimilarityOps.embPqEncode(spark, Sf)
      .select(col("vec_id"), col("c0"), col("c1"), col("c2"), col("c3"),
        col("sq_err"))
    val n = spark.read.parquet(s"$Sf/embeddings.parquet").count()
    assert(pq.count() === n, "exactly one code row per vector")
    val codes = pq.collect()
    Seq("c0", "c1", "c2", "c3").foreach { c =>
      assert(codes.forall { r =>
        val v = r.getAs[Long](c); v >= 0L && v <= 9L
      }, s"$c must be a label-codebook index")
    }
    // The PQ distortion decomposes: Σ_m min_code d_m ≤ Σ_m d_m(k) for
    // any single centroid k — in particular the k-means-assigned one,
    // whose Σ_m d_m(k) IS the full-dimension squared distance.
    val km = SimilarityOps.defs("kmeans_assign")(spark, Sf)
      .select(col("vec_id"), col("dist"))
    val joined = pq.join(km, "vec_id")
      .select(col("vec_id"), col("sq_err"), col("dist")).collect()
    joined.foreach { r =>
      assert(r.getAs[Double]("sq_err") <= r.getAs[Double]("dist") + 1e-9,
        s"vec ${r.getAs[Long]("vec_id")}: PQ reconstruction must be at " +
          "least as good as the nearest whole-vector centroid")
    }
  }

  test("ann_pq_rerank dominates raw ADC against exact-L2 truth") {
    // any true neighbor ADC ranks into the shortlist is re-ranked by
    // its exact distance, so rerank recall >= raw-ADC recall per query
    val adc = SimilarityOps.defs("ann_pq_adc")(spark, Sf)
      .select(col("query_id"), col("cand_id")).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("cand_id")).toSet).toMap
    val rr = SimilarityOps.defs("ann_pq_rerank")(spark, Sf)
      .select(col("query_id"), col("cand_id")).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("cand_id")).toSet).toMap
    // exact-L2 truth computed independently (zip_with fold), then the
    // dominance check per query
    val e = spark.read.parquet(s"$Sf/embeddings.parquet")
    e.createOrReplaceTempView("curation_emb")
    val nq = SimilarityOps.NQueries
    val k = SimilarityOps.TopK
    val exact = spark.sql(
      s"""SELECT query_id, cand_id FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
              ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                aggregate(zip_with(c.embedding, q.embedding,
                  (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))
                          * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),
                  CAST(0.0 AS DOUBLE), (a, b) -> a + b),
                c.vec_id) AS rank
            FROM curation_emb q CROSS JOIN curation_emb c
            WHERE q.vec_id < $nq AND c.vec_id >= $nq) z
          WHERE rank <= $k""").collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("cand_id")).toSet).toMap
    exact.keys.foreach { q =>
      val rrHits = (rr(q) intersect exact(q)).size
      val adcHits = (adc(q) intersect exact(q)).size
      assert(rrHits >= adcHits,
        s"query $q: rerank recall $rrHits must be >= ADC recall $adcHits")
    }
  }

  test("doc_filter_funnel stage drops equal doc_keep_decision's counts") {
    // the funnel's cumulative drops and the per-doc decision relation
    // are two views of the same rule chain — they must agree exactly
    val rows = TextOps.docFilterFunnel(spark, Sf).collect()
    val dropped = rows
      .map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_dropped"))
      .toMap
    val nTotal = rows.find(_.getAs[String]("stage") == "total").get
      .getAs[Long]("n_surviving")
    val decisions = TextOps.docKeepDecision(spark, Sf).collect()
      .groupBy(_.getAs[String]("decision"))
      .view.mapValues(_.length.toLong).toMap
    assert(dropped("exact_dedup") === decisions.getOrElse("exact_dup", 0L))
    assert(dropped("min_length") === decisions.getOrElse("too_short", 0L))
    assert(dropped("repetition") === decisions.getOrElse("repetitive", 0L))
    assert(decisions.values.sum === nTotal)
  }

  test("emb_split_assign is cluster-atomic over the semantic components") {
    import spark.implicits._
    val split = SparkEntry.queries("emb_split_assign")(spark, Sf)
      .as[(Long, Long, String)].collect()
    assert(split.nonEmpty)
    split.groupBy(_._2).values.foreach { g =>
      assert(g.map(_._3).toSet.size === 1,
        s"semantic component ${g.head._2} straddles splits: ${g.toSeq}")
    }
    // every verified near-dup pair must be co-assigned — the semantic
    // contamination guard the lexical split cannot provide
    val comp = split.map(t => t._1 -> t._2).toMap
    SimilarityOps.embNearDup(spark, Sf)
      .select(col("vec_a"), col("vec_b")).as[(Long, Long)].collect()
      .foreach { case (a, b) =>
        assert(comp(a) === comp(b),
          s"near-dup pair ($a, $b) split across components")
      }
  }

  test("dedup_keep_best keeps the best-quality member of every cluster") {
    val comp = SparkEntry.queries("dedup_components")(spark, Sf)
    val quality = TextOps.textQuality(spark, Sf)
      .select(col("doc_id"), col("quality"))
    val expected = comp.join(quality, "doc_id")
      .groupBy(col("component_id"))
      .agg(max(col("quality")).as("max_q"), count(lit(1)).as("n"))
    val best = SparkEntry.queries("dedup_keep_best")(spark, Sf)
    val joined = best.join(expected, "component_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Double]("keep_quality") === r.getAs[Double]("max_q"),
        s"component ${r.getAs[Long]("component_id")} kept a non-best member")
      assert(r.getAs[Long]("n_members") === r.getAs[Long]("n"))
    }
    // the kept doc is an actual member of its cluster
    val members = best.join(comp,
      best("component_id") === comp("component_id") &&
        best("keep_doc_id") === comp("doc_id"))
    assert(members.count() === best.count())
  }

  test("ann_ivf_pq is the full ADC search restricted to routed cells") {
    val ivf = SimilarityOps.annIvfPq(spark, Sf)
    // per query: ranks contiguous from 1, adc non-decreasing
    ivf.collect().groupBy(_.getAs[Long]("query_id")).values.foreach { g =>
      val sorted = g.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq ===
        (1L to g.length.toLong),
        "ranks must be contiguous from 1")
      val adcs = sorted.map(_.getAs[Double]("adc"))
      assert(adcs.zip(adcs.tail).forall { case (a, b) => a <= b },
        "adc must be non-decreasing with rank")
    }
    // restriction consistency: any pair the cell-routed search shares
    // with the full (unrouted) ADC search carries the IDENTICAL score
    // — routing changes WHICH codes are read, never what a read costs
    val full = SimilarityOps.annPqAdc(spark, Sf)
      .select(col("query_id"), col("cand_id"), col("adc").as("full_adc"))
    val shared = ivf.join(full, Seq("query_id", "cand_id")).collect()
    shared.foreach { r =>
      assert(r.getAs[Double]("adc") === r.getAs[Double]("full_adc"),
        s"ADC mismatch on shared pair ${r.getAs[Long]("query_id")}/" +
          s"${r.getAs[Long]("cand_id")}")
    }
  }

  test("pii_pseudonymize leaks no direct identifiers") {
    val out = Relational.piiPseudonymize(spark, Sf)
    val cols = out.columns.toSet
    assert(!cols.contains("c_name") && !cols.contains("c_acctbal"),
      "raw identifier / raw quasi-identifier must not pass through")
    val rows = out.collect()
    assert(rows.forall(r =>
      r.getAs[Double]("acct_band") % Relational.PiiAcctBand == 0.0),
      "balances must be generalized to band boundaries")
    // deterministic: same input → same tokens on a re-run
    val again = Relational.piiPseudonymize(spark, Sf).collect()
    assert(rows.map(_.getAs[Long]("name_token")).toSeq ===
      again.map(_.getAs[Long]("name_token")).toSeq)
  }

  test("doc_unigram_score agrees with a brute-force frequency rollup") {
    import graft.functions.Hashing
    val rows = SparkEntry.queries("doc_unigram_score")(spark, Sf).collect()
    val docs = graft.sources.Tables.documents(spark, Sf)
      .select(col("doc_id"), Hashing.tokens(col("text")).as("toks"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[String](1))
    val tf = docs.flatMap(_._2).groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    assert(rows.length === docs.count(_._2.nonEmpty))
    val byId = docs.toMap
    rows.foreach { r =>
      val toks = byId(r.getAs[Long]("doc_id"))
      val freqs = toks.map(tf)
      assert(r.getAs[Long]("n_tokens") === toks.length.toLong)
      assert(r.getAs[Long]("sum_tf") === freqs.sum)
      assert(r.getAs[Long]("min_tf") === freqs.min)
      assert(r.getAs[Double]("avg_tf") ===
        freqs.sum.toDouble / toks.length.toDouble)
      // rarest token = lexicographically smallest among min-tf tokens
      val expect = toks.filter(t => tf(t) == freqs.min).min
      assert(r.getAs[String]("rarest_token") === expect)
    }
  }
}
