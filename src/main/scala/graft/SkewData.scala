package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-ADVERSARIAL variant generator for local scale probes: where
  * [[ScaleData]] deliberately PRESERVES the original workload's dup
  * rates and join fan-outs (disjoint id spaces — honest linear
  * scaling), this generator deliberately BREAKS them, planting the
  * hot-key shapes a 100 TB crawl actually produces so the engine's
  * caps and salting can be MEASURED under stress instead of assumed:
  *
  *   sbt "runMain graft.SkewData /root/testdata/sf0.1 benchdata/skew0.1"
  *
  * Each adversarial feature lives on its OWN disjoint hash slice of
  * the ids, so a probe regression is attributable to one feature:
  *
  *  - HOT LSH CLUSTER (`charHash(doc_id) % 50 == HotDupTag`, 2% of
  *    docs): text replaced by one fixed ~120-token template plus a
  *    per-doc unique tail token. The template dominates every shingle
  *    set, so the whole slice collapses into the SAME (band, bucket)
  *    cells — the degenerate mirror/template cluster that makes naive
  *    all-pairs LSH candidate generation quadratic. What the probe
  *    watches: `dedup_bucket_histogram` (the monitor must surface the
  *    hot bucket), the candidate-pair joins (`dedup_lsh_pairs`,
  *    `dedup_jaccard`), and CC (`dedup_components`).
  *  - OVER-CAP CHUNK DIGEST (`% 10 == HotChunkTag`, 10% of docs): a
  *    fixed ~600-byte boilerplate paragraph appended, long enough to
  *    contain CDC chunk boundaries of its own, so ONE digest reaches
  *    df ≈ N/10 ≫ MaxChunkDf. The df cap must keep the substring
  *    tier's candidate counts bounded (`text_cdc_dedup`,
  *    `stream_cdc_strip`'s batch engine) — this is the cap working,
  *    not an accident of gentle data.
  *  - DOMINANT LANGUAGE (90% of docs re-labeled `en`): every
  *    language-keyed groupBy/window (`doc_sample_quota`'s per-lang
  *    quota rank, `doc_source_stats`) sees one group carrying 90% of
  *    the corpus.
  *  - HOT EVENT USER (`% 5 == HotUserTag` of events, 20%, re-keyed to
  *    user_id = HotUserId): the skewed-aggregation shape
  *    `ev_top_users_salted`'s two-stage salted agg exists for,
  *    measured against the unsalted `ev_top_users` on the same data.
  *  - DUPLICATED EMBEDDING (`% 10 == HotVecTag`, 10% of vectors
  *    replaced by one fixed base vector): one ANN bucket holds 10% of
  *    the corpus — the bucket equi-joins (`ann_lsh_probe`,
  *    `emb_near_dup`) and the index lifecycle run against a
  *    pathological occupancy histogram.
  *
  * Schemas, row counts, and untouched slices are byte-identical to
  * the source, so any probe delta vs the uniform dataset is the skew
  * itself, not a size change. Bench-only: this variant is NOT
  * oracle-gated (the gate's corpus stays the driver's testdata).
  */
object SkewData {
  val HotDupTag = 11L // % 50 → 2% of docs: one near-dup mega-cluster
  val HotChunkTag = 3L // % 10 → 10% of docs share one boilerplate chunk
  val HotUserTag = 2L // % 5 → 20% of events re-keyed to one user
  val HotUserId = 424242L
  val HotVecTag = 4L // % 10 → 10% of vectors byte-identical

  /** Deterministic ~120-token template for the hot near-dup cluster
    * (content arbitrary; what matters is that it dominates the
    * shingle set of every slice member). */
  private def template: String =
    (0 until 120).map(i => s"tmpl${i % 40}w${(i * 7) % 13}").mkString(" ")

  /** Deterministic ~600-byte boilerplate paragraph — long enough that
    * CDC places interior chunk boundaries inside it, minting a shared
    * over-cap digest (not just shifting every doc's final chunk). */
  private def boilerplate: String =
    (0 until 100).map(i => s"bp${i % 17}x${(i * 11) % 23}").mkString(" ")

  def main(args: Array[String]): Unit = {
    val Array(src, dst) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.Hashing.charHash

    def tag(c: org.apache.spark.sql.Column, mod: Int) =
      charHash(c.cast("string")) % mod

    // unmodified tables: plain copy so the probe dirs are complete
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem"))
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")

    val docs = spark.read.parquet(s"$src/documents.parquet")
    docs
      .withColumn("text",
        when(tag(col("doc_id"), 50) === HotDupTag,
          concat(lit(template), lit(" uniq"), col("doc_id").cast("string")))
          .when(tag(col("doc_id"), 10) === HotChunkTag,
            concat(col("text"), lit(" "), lit(boilerplate)))
          .otherwise(col("text")))
      .withColumn("lang",
        when(tag(col("doc_id"), 10) =!= 6L, lit("en"))
          .otherwise(col("lang")))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")
    println("[skew] documents: hot-dup 2%, hot-chunk 10%, lang-en 90%")

    spark.read.parquet(s"$src/events.parquet")
      .withColumn("user_id",
        when(tag(col("event_id"), 5) === HotUserTag, lit(HotUserId))
          .otherwise(col("user_id")))
      .write.mode("overwrite").parquet(s"$dst/events.parquet")
    println("[skew] events: 20% re-keyed to one hot user")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val base = emb.orderBy("vec_id").limit(1)
      .select(col("embedding").as("base_emb"))
    emb.crossJoin(broadcast(base))
      .withColumn("embedding",
        when(tag(col("vec_id"), 10) === HotVecTag, col("base_emb"))
          .otherwise(col("embedding")))
      .drop("base_emb")
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
    println("[skew] embeddings: 10% collapsed onto one vector")

    spark.stop()
  }
}
