package graft

/** The engine's exactness contract, tested empirically: results of
  * oracle-gated aggregates must be BIT-IDENTICAL regardless of how
  * the data is partitioned — i.e. regardless of aggregation order.
  * This is the property the decimal-quantization routes
  * ([[graft.functions.Exact]]) exist to provide (raw double sums
  * re-associate differently per partitioning and would flicker
  * against any fixed oracle). A partition-count change is exactly
  * what a cluster resize does at 100 TB, so a query whose answer
  * depends on it is broken even if it happens to match the oracle
  * once.
  */
class ExactnessSpec extends SparkSpec {

  private val Queries =
    Seq("q1_pricing_summary", "emb_centroids", "emb_label_stats",
      "ev_hourly", "text_keyterms",
      // round 5: the lang-ordered normalizer fold must not depend on
      // which partition delivers which language first
      "doc_sample_temperature",
      // round 5: PQ distortion sums four broadcast-join distances in
      // fixed subspace order — must survive any corpus partitioning
      "emb_pq_encode",
      // round 5 late additions: the window-rank median/p95 lerp must
      // pick the same ranked values under any partitioning (ties
      // carry equal values), and the BPE argmax/transition counts are
      // integer aggs whose ties break on ordered keys
      "doc_quality_gate", "emb_outliers", "tf_bpe_train",
      "ev_transitions", "emb_winsorize",
      // late round 5: ntile bucket membership under ties, the
      // three-ratio lift tree, and the window-exploded rolling
      // distinct are all fixed by ordered keys / integer aggs
      "q28_ntile", "tf_bigram_lift", "ev_rolling_wau",
      // decimal-exact integer moments are this query's whole point
      "corpus_correlations",
      // round 7: the three index merges — the appended side's DOUBLE
      // norms (ann) and the per-(doc,digest) integer rollups must not
      // depend on how corpus and delta rows land in partitions
      "dedup_index_merge", "ann_index_merge", "mm_cdc_store_merge")

  Queries.foreach { name =>
    test(s"$name is bit-identical under different shuffle partitionings") {
      val a = spark.newSession()
      a.conf.set("spark.sql.shuffle.partitions", "3")
      val b = spark.newSession()
      b.conf.set("spark.sql.shuffle.partitions", "17")
      val ra = SparkEntry.queries(name)(a, Sf).collect().toSeq
      val rb = SparkEntry.queries(name)(b, Sf).collect().toSeq
      assert(ra === rb,
        s"$name changed results when the partition count changed")
      assert(ra.nonEmpty)
    }
  }
}
