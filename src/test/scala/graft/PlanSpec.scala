package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Physical-plan audit: the properties that make these plans survive a
  * 100× scale-up, pinned as assertions so a regression (a lost
  * pushdown, a surprise cartesian, a broadcast that silently became a
  * shuffle join) fails CI instead of melting a cluster.
  */
class PlanSpec extends SparkSpec {

  private def physical(name: String): String = {
    val qe = SparkEntry.queries(name)(spark, Sf).queryExecution
    qe.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan.toString
      case p => p.toString
    }
  }

  test("predicate pushdown: date filter reaches the lineitem scan") {
    val p = physical("q6_forecast_revenue")
    assert(p.contains("PushedFilters: ["), p.take(2000))
    assert(p.contains("l_shipdate"), "shipdate filter must be pushed")
  }

  test("column pruning: token-count scan reads only doc_id and text") {
    val p = physical("text_token_count")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("doc_id") && read.contains("text"), read)
    assert(!read.contains("lang") && !read.contains("n_tokens"),
      s"unused columns must be pruned from the scan: $read")
  }

  test("dimension joins broadcast instead of shuffling the fact side") {
    val p = physical("q2_revenue_by_nation")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("ANN probe joins on the LSH bucket — no cartesian anywhere") {
    val p = physical("ann_lsh_probe")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "probe must be an equi-join on bucket, not an all-pairs join")
  }

  test("brute-force kNN broadcasts the tiny query side") {
    val p = physical("knn_brute")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "the deliberate cross product must broadcast the 8-row query side")
  }

  test("sessionization shares one user_id shuffle between window and agg") {
    val p = physical("ev_sessionize")
    val shuffles = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(shuffles == 1, s"expected exactly 1 hash shuffle, saw $shuffles:\n" +
      p.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
  }

  test("custom hash expressions run inside whole-stage codegen") {
    import org.apache.spark.sql.functions.col
    // a projection of ONLY custom expressions (no higher-order
    // functions, which are CodegenFallback and would exclude the whole
    // operator from whole-stage codegen)
    val df = graft.sources.Tables.documents(spark, Sf)
      .select(col("text"),
        graft.functions.Hashing.charHash(col("text")).as("h"))
    val p = df.queryExecution.executedPlan.toString
    // "*(n)" is the whole-stage-codegen stage marker in plan strings
    assert(p.contains("*(1) Project"), p.take(2000))
    assert(p.contains("graft_char_hash"), p.take(2000))
    // the codegen'd Java loop must agree with an independent fold
    df.collect().foreach { r =>
      var expected = 0L
      r.getString(0).codePoints().forEach(cp =>
        expected = (expected * 31L + cp) % 2147483647L)
      assert(r.getLong(1) === expected)
    }
  }

  test("codegen'd vector expressions agree with interpreted eval") {
    import org.apache.spark.sql.functions.col
    val df = graft.sources.Tables.embeddings(spark, Sf)
      .select(col("embedding"),
        org.apache.spark.sql.GraftColumn(graft.functions.FloatDot(
          org.apache.spark.sql.GraftColumn.expr(col("embedding")),
          org.apache.spark.sql.GraftColumn.expr(col("embedding")))).as("d"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*(1) Project") && p.contains("graft_float_dot"),
      p.take(2000))
    df.collect().foreach { r =>
      val e = r.getSeq[Float](0)
      var s = 0.0
      e.foreach(x => s += x.toDouble * x.toDouble)
      assert(r.getDouble(1) === s, "sequential-fold dot must match exactly")
    }
  }

  test("hash expressions are present in the fingerprint projection") {
    val p = physical("text_fingerprint")
    assert(p.contains("graft_char_hash") && p.contains("graft_simhash32"),
      p.take(2000))
  }

  test("top-k windows run as bounded-heap WindowGroupLimit, not full sorts") {
    // rank <= k over a window must plan as WindowGroupLimit (per-key
    // bounded heap) — otherwise the kNN ranking materializes and sorts
    // every candidate pair per partition
    Seq("knn_brute", "q7_top_orders_per_customer", "text_keyterms")
      .foreach { q =>
        val p = physical(q)
        assert(p.contains("WindowGroupLimit"),
          s"$q lost the group-limit pushdown:\n${p.take(1500)}")
      }
  }

  test("quota sampling caps per-key work via WindowGroupLimit") {
    val p = physical("doc_sample_quota")
    assert(p.contains("WindowGroupLimit"),
      s"per-language cap must be a bounded heap, not a full sort:\n${p.take(1500)}")
  }

  test("hash sampling is a pure scan+filter+project — zero shuffles") {
    val p = physical("doc_sample_hash")
    // the orderBy is a rangepartitioning exchange for output only;
    // there must be no hashpartitioning (aggregate/join) shuffle
    assert(!p.contains("Exchange hashpartitioning"),
      s"hash sampling must not shuffle:\n${p.take(1500)}")
  }

  test("k-means assignment broadcasts the centroid side") {
    val p = physical("kmeans_assign")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"the 10-row centroid relation must broadcast, never shuffle the vectors:\n${p.take(1500)}")
    assert(p.contains("WindowGroupLimit"),
      "the per-vector argmin must be a bounded-heap top-1")
  }

  test("k-means training: trained-quantizer probe broadcasts centroids, " +
      "argmin is a bounded heap, never a cartesian") {
    // kmeans_train itself trains EAGERLY (localCheckpoint per round),
    // so its visible plan must be checkpoint-truncated to the
    // materialized centroid relation...
    val t = physical("kmeans_train")
    assert(t.contains("ExistingRDD"),
      s"training rounds must be checkpoint-truncated:\n${t.take(1500)}")
    // ...while the probe over the trained quantizer keeps the assign
    // step lazy: centroids broadcast, per-vector argmin a bounded
    // heap, no all-pairs join anywhere
    val p = physical("ann_ivf_trained")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"trained centroids must broadcast to the assign step:\n${p.take(1500)}")
    assert(p.contains("WindowGroupLimit"),
      "the per-vector argmin must be a bounded-heap top-1")
    assert(!p.contains("CartesianProduct"))
  }

  test("exact-distinct variants: Expand plan vs pre-deduped combinable aggs") {
    // the audit tier is Spark's single-pass plan: one Expand that
    // triples the fact rows before the shuffle; the production name
    // carries the scale-path rewrite (round-14 promotion) — no
    // Expand, each distinct key set deduped with map-side partial
    // aggregation before its own shuffle
    assert(physical("q16_distinct_counts_audit").contains("Expand"))
    val p = physical("q16_distinct_counts")
    assert(!p.contains("Expand"),
      s"production pre-dedup form must not plan an Expand:\n${p.take(1500)}")
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 4,
      "each distinct key set needs partial+final aggregate pairs")
    // q27's production plan is the same promotion: long-format
    // pre-dedup, no Expand (the one-Expand form is the audit tier)
    val q27 = physical("q27_profile")
    assert(!q27.contains("Expand"),
      s"q27 production form must not plan an Expand:\n${q27.take(1500)}")
    assert(physical("q27_profile_audit").contains("Expand"))
  }

  test("attribution forward as-of runs as a RUNNING frame, never an " +
      "UnboundedFollowing frame (Spark re-aggregates those per row — " +
      "O(rows^2) on a hot-user partition, 55x at skew1)") {
    Seq("ev_attribution_linear", "ev_attribution_position").foreach { q =>
      val p = physical(q)
      assert(!p.toUpperCase.contains("UNBOUNDED FOLLOWING"),
        s"$q must not plan a per-row-reaggregated tail frame:\n${p.take(1500)}")
    }
  }

  test("token chunking is narrow and packing needs exactly one shuffle") {
    // chunking: tokenize + per-row explode, nothing to shuffle (the
    // orderBy is a range exchange for presentation only)
    val c = physical("doc_chunk_tokens")
    assert(!c.contains("Exchange hashpartitioning"),
      s"chunking must not shuffle documents:\n${c.take(1500)}")
    // packing: ONE hash shuffle (the per-source window) — a global
    // running sum would show a single-partition window instead
    val p = physical("doc_pack_chunks")
    val shuffles = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(shuffles === 1,
      s"packing needs exactly the per-source window shuffle, saw $shuffles")
  }

  test("int8 quantization broadcasts the per-dim stats, vectors don't shuffle") {
    val p = physical("emb_quantize")
    assert(p.contains("BroadcastHashJoin"),
      s"the 64-row stats relation must broadcast:\n${p.take(1500)}")
  }

  test("payload chunking is narrow — no hash shuffle before the explode") {
    val p = physical("mm_chunk")
    assert(!p.contains("Exchange hashpartitioning"),
      s"chunking must not shuffle payloads:\n${p.take(1500)}")
  }

  test("quality gate broadcasts the per-language medians — the fact " +
      "side never shuffles for the join") {
    val p = physical("doc_quality_gate")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    // one hash shuffle total: the median window; the scored projection
    // joins by broadcast
    val shuffles = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(shuffles == 1, s"expected 1 hash shuffle, saw $shuffles")
  }

  test("curation manifest joins every gate by broadcast — no sort-merge") {
    val p = physical("doc_manifest")
    assert(!p.contains("SortMergeJoin"),
      "per-doc gate relations must broadcast-join on doc_id")
    assert(!p.contains("CartesianProduct"))
  }

  test("substring dedup + perceptual near-dup: document bytes never " +
      "reach a hash exchange — shuffles carry only digests and scalars") {
    // text_cdc_remove's final range exchange carries clean_text by
    // definition (the ordered output IS the cleaned corpus, exactly
    // like text_remove_boilerplate) — the pin is on HASH exchanges,
    // where bytes would mean a join/agg is moving documents around
    for (q <- Seq("text_cdc_dedup", "mm_near_dup", "text_cdc_remove")) {
      val qe = SparkEntry.queries(q)(spark, Sf).queryExecution
      val plan = qe.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.initialPlan
        case p => p
      }
      val exchanges = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
            if e.outputPartitioning
              .isInstanceOf[org.apache.spark.sql.catalyst.plans.physical
                .HashPartitioning] => e
      }
      assert(exchanges.nonEmpty, s"$q: expected the digest-group shuffles")
      for (e <- exchanges; a <- e.output)
        assert(a.name != "text" && a.name != "payload" &&
            a.name != "clean_text" &&
            a.name != "chunk_md5s" && a.name != "chunk_hashes",
          s"$q: hash exchange must not carry document bytes: " +
            e.output.map(_.name))
    }
  }

  test("kmv matrix: no hash exchange carries document text — the " +
      "corpus reduces to (source, hash) scan-side") {
    // the query checkpoints its sample relation, truncating the
    // lineage its own plan shows — so the sample-BUILD stage (where
    // the corpus-wide source-keyed shuffle actually happens) is
    // audited separately via the un-materialized builder
    val sampleBuild = graft.operators.SketchOps.keyedKmvSamples(
      graft.operators.SketchOps.keyedShingleHashes(
        graft.sources.Tables.documents(spark, Sf), "source"))
    val pairStage = SparkEntry.queries("dedup_kmv_matrix")(spark, Sf)
    for ((df, what) <- Seq(sampleBuild -> "sample build",
        pairStage -> "pair stage")) {
      val plan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.initialPlan
        case p => p
      }
      val exchanges = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
            if e.outputPartitioning
              .isInstanceOf[org.apache.spark.sql.catalyst.plans.physical
                .HashPartitioning] => e
      }
      assert(exchanges.nonEmpty, s"$what: expected source-keyed shuffles")
      for (e <- exchanges; a <- e.output)
        assert(a.name != "text" && a.name != "tk",
          s"$what: hash exchange must not carry document bytes: " +
            e.output.map(_.name))
    }
  }

  test("histogram quantiles: the fact table folds through ONE " +
      "combinable aggregation — partial agg before the shuffle") {
    val p = physical("ev_histogram_quantiles")
    assert(p.contains("partial_count") || p.contains("Partial"),
      "histogram bins must partially aggregate map-side:\n" + p.take(2000))
    // the fact table is shuffled exactly once (by bin); everything
    // downstream operates on |bins| rows
    val factShuffles = p.linesIterator
      .count(_.contains("Exchange hashpartitioning(bin"))
    assert(factShuffles <= 1, p.linesIterator
      .filter(_.contains("Exchange")).mkString("\n"))
  }

  test("snapshot diff: both snapshots are reduced to digests before " +
      "the full-outer join — no exchange carries document bytes") {
    val qe = SparkEntry.queries("doc_snapshot_diff")(spark, Sf).queryExecution
    val plan = qe.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.nonEmpty, "expected the diff-join shuffles")
    for (e <- exchanges; a <- e.output)
      assert(a.name != "text",
        s"diff exchange must not carry document text: " +
          e.output.map(_.name))
  }

  test("curation gates: the exact-dup canon is fingerprint-keyed — no " +
      "hash exchange carries the text column") {
    // round 6 keyed the canon on the text itself, moving the whole
    // corpus through the exchange twice per gate (the #1 and #2 most
    // expensive bench queries); the canon now groups and joins on a
    // 16-byte md5 fingerprint, so document bytes stay in the scan
    for (q <- Seq("doc_keep_decision", "doc_filter_funnel", "doc_manifest")) {
      val qe = SparkEntry.queries(q)(spark, Sf).queryExecution
      val plan = qe.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.initialPlan
        case p => p
      }
      val exchanges = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
            if e.outputPartitioning
              .isInstanceOf[org.apache.spark.sql.catalyst.plans.physical
                .HashPartitioning] => e
      }
      assert(exchanges.nonEmpty, s"$q: expected the canon shuffles")
      for (e <- exchanges; a <- e.output)
        assert(a.name != "text",
          s"$q: hash exchange must not carry document text: " +
            e.output.map(_.name))
    }
  }

  test("hybrid RRF recalls by bucket equi-join and bounds lexical " +
      "scoring to probe candidates — no cartesian, no corpus text scan " +
      "into a wide join") {
    val p = physical("hybrid_rrf")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "candidate recall must be the bucket equi-join, not all-pairs")
    assert(p.contains("BroadcastHashJoin"),
      "the 8-row query side must broadcast")
  }

  test("recall gates broadcast the query side — never a cartesian") {
    // the exact-truth side is a DELIBERATE brute-force over the
    // NQueries-row query set; the pin is that the tiny side is
    // broadcast (BroadcastNestedLoopJoin), never CartesianProductExec
    for (q <- Seq("ann_pq_recall", "ann_ivf_pq_recall")) {
      val p = physical(q)
      assert(!p.contains("CartesianProduct"),
        s"$q: query side must broadcast:\n" + p.take(2000))
    }
  }

  test("ANN upsert probes by bucket equi-join with the batch broadcast") {
    val p = physical("ann_index_upsert")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "the probe must be a bucket equi-join, not all-pairs")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("event transitions shuffle the fact table exactly once (by user)") {
    val p = physical("ev_transitions")
    val shuffles = p.linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    // user window + (type, next) agg + tiny row-normalizer window
    assert(shuffles <= 3, s"saw $shuffles hash shuffles")
    assert(p.contains("user_id"), "sequence window must partition by user")
  }

  test("BPE pair counting aggregates partially before the shuffle") {
    val p = physical("tf_bpe_pairs")
    assert(p.contains("partial_sum") || p.contains("Partial"),
      "freq-weighted pair counts must map-side combine:\n" + p.take(2000))
  }

  test("windowed conversion runs as an equi semi join, never all-pairs") {
    val p = physical("ev_conversion_window")
    assert(p.contains("LeftSemi"), p.take(2000))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "the user equi-key must carry the join; the time range is a " +
        "post-join condition, not an all-pairs scan")
  }

  test("rolling WAU never builds a cartesian — windows come from explode") {
    val p = physical("ev_rolling_wau")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("Generate explode") || p.contains("Generate"),
      "the 7-window expansion must be a generate, not a join:\n" +
        p.take(1500))
  }

  test("partition pruning: a filter on the partition column skips files") {
    import org.apache.spark.sql.functions.{col, count, lit}
    val dir = tmpDir("plan-partitioned")
    val events = graft.sources.Tables.events(spark, Sf)
    events.write.partitionBy("event_type").mode("overwrite").parquet(dir)
    val filtered = spark.read.parquet(dir)
      .filter(col("event_type") === "click")
    val plan = filtered.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters"))
      .getOrElse("")
    assert(pf.contains("event_type"),
      s"partition filter must prune directories, not scan-then-filter: $pf")
    assert(filtered.count() ===
      events.filter(col("event_type") === "click").count())
  }

  test("dynamic partition pruning: a dim-side filter prunes fact " +
      "partitions at runtime") {
    import org.apache.spark.sql.functions.col
    val dir = tmpDir("plan-dpp")
    val orders = graft.sources.Tables.orders(spark, Sf)
    orders.write.partitionBy("o_orderpriority").mode("overwrite").parquet(dir)
    val fact = spark.read.parquet(dir)
    import spark.implicits._
    // star shape: the dim filter is on an ATTRIBUTE (rank), the join
    // on the KEY (p) — so no literal constraint can propagate and the
    // only way to prune the fact scan is a runtime (dynamic) filter.
    // (With filter and join on the same column, constraint propagation
    // plants a STATIC partition filter instead — strictly better, and
    // pinned implicitly by this test's harder case.)
    val dimDir = tmpDir("plan-dpp-dim")
    Seq(("1-URGENT", 1), ("2-HIGH", 2), ("3-MEDIUM", 3),
      ("4-NOT SPECIFIED", 4), ("5-LOW", 5))
      .toDF("p", "rank").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter(col("rank") === 1)
    val joined = fact.join(dim, fact("o_orderpriority") === dim("p"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"the dim filter must reach the fact scan as a runtime partition " +
        s"filter — at 100 TB this is the difference between reading one " +
        s"partition and all of them:\n${plan.take(2000)}")
    assert(joined.count() ===
      orders.filter(col("o_orderpriority") === "1-URGENT").count())
  }

  test("runtime bloom filter: a selective dim filter reaches the fact " +
      "scan of a shuffle join as a row-level filter") {
    import org.apache.spark.sql.functions.col
    // the DPP pin covers PARTITIONED facts; this is the complement for
    // unpartitioned ones — Spark's InjectRuntimeFilter builds a bloom
    // filter from the filtered dim keys and applies it to the fact
    // side BEFORE the join shuffle, so at 100 TB the exchange carries
    // only rows that can match. Thresholds are scaled to the fixture
    // (the application-side default is 10 GB); broadcast is disabled
    // because a broadcast-able dim needs no runtime filter.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      .map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter" +
        ".applicationSideScanSizeThreshold", "0")
      val factDir = tmpDir("plan-bloom-fact")
      val dimDir = tmpDir("plan-bloom-dim")
      val lineitem = graft.sources.Tables.lineitem(spark, Sf)
      val orders = graft.sources.Tables.orders(spark, Sf)
      lineitem.select("l_orderkey", "l_quantity")
        .write.mode("overwrite").parquet(factDir)
      orders.select("o_orderkey", "o_orderpriority")
        .write.mode("overwrite").parquet(dimDir)
      val fact = spark.read.parquet(factDir)
      val dim = spark.read.parquet(dimDir)
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = fact.join(dim,
        fact("l_orderkey") === dim("o_orderkey"))
      val opt = joined.queryExecution.optimizedPlan.toString
      assert(opt.contains("might_contain") &&
          opt.contains("bloom_filter_agg"),
        s"the dim filter must reach the fact side as a runtime bloom " +
          s"filter — without it the shuffle carries every fact row:\n" +
          opt.take(2000))
      val expected = lineitem.join(
        orders.filter(col("o_orderpriority") === "1-URGENT"),
        lineitem("l_orderkey") === orders("o_orderkey")).count()
      assert(joined.count() === expected)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("exact dedup aggregates partially before the shuffle") {
    val p = physical("dedup_exact")
    // two HashAggregates (partial + final) around one exchange =
    // map-side combine is in effect
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2, p.take(2000))
  }

  test("q15 max-revenue threshold broadcasts — no single-partition window") {
    val p = physical("q15_top_supplier")
    assert(!p.contains("Window"),
      s"the scalar max must be an aggregate + broadcast, not an " +
        s"empty-partition WindowExec funneling all suppliers into one task:\n${p.take(1500)}")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      p.take(1500))
  }

  test("ADC search broadcasts the lookup table and bounds the top-k heap") {
    val p = physical("ann_pq_adc")
    assert(p.contains("BroadcastHashJoin"),
      s"the |q|·subspaces·k LUT must broadcast onto the code tuples:\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct"),
      "ADC is an equi-join on (sub, code), never all-pairs")
    assert(p.contains("WindowGroupLimit"),
      "per-query top-k must be a bounded heap")
  }

  test("boilerplate n-grams use stacked combinable aggs, not an Expand") {
    val p = physical("text_boilerplate_ngrams")
    assert(!p.contains("Expand"),
      s"df must come from pre-collapsed (doc, gram) rows, not COUNT(DISTINCT):\n${p.take(1500)}")
    // partial + final pairs for both stacked aggregates
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 4, p.take(2000))
  }

  test("PII pseudonymization is a pure scan+project — zero shuffles") {
    val p = physical("pii_pseudonymize")
    assert(!p.contains("Exchange hashpartitioning"),
      s"the compliance pass must not shuffle:\n${p.take(1500)}")
  }

  test("filter funnel computes every stage count in one aggregate pass") {
    val p = physical("doc_filter_funnel")
    // one partial+final pair for the flag sums (plus the canon
    // groupBy's pair) — and never one scan per funnel stage
    val scans = p.linesIterator.count(_.contains("Scan parquet"))
    assert(scans <= 2,
      s"stage counts must come from one documents pass plus the canon pass, saw $scans scans:\n${p.take(1500)}")
  }

  test("heavy hitters: the CMS matrix broadcasts onto the probe and " +
      "the exact tier is candidate-pruned, never a full-vocab count") {
    val p = physical("tf_heavy_hitters")
    assert(p.contains("BroadcastHashJoin"),
      s"the bounded d×w matrix must broadcast onto the distinct-gram " +
        s"probe:\n${p.take(1500)}")
    assert(p.linesIterator.exists(l =>
        l.contains("BroadcastHashJoin") && l.contains("LeftSemi")),
      s"the exact count must consume the SEMI-JOINED gram stream — a " +
        s"full-vocabulary exact aggregate defeats the sketch:\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct"))
  }

  test("containment: intersection is an equi-join over candidate " +
      "pairs — no cartesian, no all-pairs") {
    val p = physical("dedup_containment")
    assert(!p.contains("CartesianProduct"),
      s"containment must verify candidates, never enumerate " +
        s"all pairs:\n${p.take(1500)}")
    // the candidate union is checkpoint-materialized so the LSH/CDC
    // generators run once, not once per downstream consumer
    assert(p.contains("ExistingRDD"),
      s"candidate pairs must be checkpoint-truncated:\n${p.take(1500)}")
  }
}
