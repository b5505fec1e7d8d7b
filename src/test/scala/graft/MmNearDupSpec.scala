package graft

import org.apache.spark.sql.functions._

/** Recall + robustness pins for the perceptual media near-dup tier
  * (`mm_near_dup`), gated against the shared-chunk ground truth that
  * `mm_cdc_dedup`'s chunk relation defines: per-doc CDC chunk-digest
  * sets and their exact Jaccard.
  */
class MmNearDupSpec extends SparkSpec {
  import graft.operators.MultimodalOps

  /** Brute-force shared-chunk ground truth: exact chunk-set Jaccard
    * for every pair sharing at least one chunk digest. */
  private def truePairs(dir: String) = {
    import spark.implicits._
    val pd = MultimodalOps.mmCdcDedup(spark, dir) // forces same machinery
    assert(pd.count() > 0)
    val docs = graft.sources.Tables.documents(spark, dir)
    val chunks = MultimodalOps.withPayload(docs)
      .withColumn("byte_len", length(col("payload")).cast("long"))
      .filter(col("byte_len") > 0)
      .withColumn("bs", org.apache.spark.sql.GraftColumn(
        graft.functions.CdcBoundaries(
          org.apache.spark.sql.GraftColumn.expr(col("payload")))))
      .withColumn("starts", concat(array(lit(0L)), col("bs")))
      .withColumn("ends", concat(col("bs"), array(col("byte_len"))))
      .select(col("doc_id"),
        explode(array_distinct(expr(
          "transform(arrays_zip(starts, ends), se -> " +
            "md5(substring(payload, CAST(se.starts + 1 AS INT), " +
            "CAST(se.ends - se.starts AS INT))))"))).as("ch"))
    val sizes = chunks.groupBy("doc_id").agg(count(lit(1)).as("n"))
    chunks.as("a").join(chunks.as("b"),
        col("a.ch") === col("b.ch") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
      .join(sizes.as("za"), col("doc_a") === col("za.doc_id"))
      .join(sizes.as("zb"), col("doc_b") === col("zb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        (col("n_inter").cast("double") /
          (col("za.n") + col("zb.n") - col("n_inter")).cast("double"))
          .as("jaccard"))
      .as[(Long, Long, Double)].collect()
  }

  test("high shared-chunk pairs are recovered against the CDC-chunk " +
      "ground truth (recall@jaccard>=0.8)") {
    import spark.implicits._
    val truth = truePairs(Sf)
    val found = SparkEntry.queries("mm_near_dup")(spark, Sf)
      .select(col("doc_a"), col("doc_b"), col("chunk_jaccard"),
        col("hamming"))
      .as[(Long, Long, Double, Long)].collect()
    val foundPairs = found.map(r => (r._1, r._2)).toSet

    val high = truth.filter(_._3 >= 0.7).map(t => (t._1, t._2))
    val recovered = high.count(foundPairs)
    // 4 bands x 4 rows: P(collide | j=0.7) ~ 0.67 per pair in
    // expectation, but the signature constants are fixed, so this
    // recall is DETERMINISTIC for the fixed corpus (observed 15/16)
    // — a drop means the pipeline changed, not bad luck
    assert(high.nonEmpty && recovered.toDouble / high.size >= 0.8,
      s"recall@jaccard>=0.7 too low: $recovered/${high.size}")

    // every reported pair's verification jaccard must agree with the
    // brute-force ground truth (same sets, same arithmetic)
    val truthMap = truth.map(t => (t._1, t._2) -> t._3).toMap
    for ((a, b, j, _) <- found) {
      assert(truthMap.getOrElse((a, b), 0.0) === j,
        s"pair ($a,$b) verification jaccard $j disagrees with truth")
    }
  }

  test("a shifted payload (insertion at the front) still pairs — CDC " +
      "re-synchronizes where fixed-range chunking would not") {
    import spark.implicits._
    def junk(seed: Long, n: Int): String = {
      val r = new scala.util.Random(seed)
      (1 to n).map(_ => ('a' + r.nextInt(26)).toChar).mkString
    }
    val body = junk(11L, 1500)
    val dir = tmpDir("mm-neardup")
    val other = junk(13L, 1500)
    Seq(
      (1L, body, "en", "synthetic", body.length.toLong),
      (2L, junk(12L, 23) + body, "en", "synthetic", (23 + body.length).toLong),
      (3L, other, "en", "synthetic", 1500L),
      (4L, junk(14L, 1500), "en", "synthetic", 1500L),
      // 5 is byte-identical to 3: identical signature => every band
      // collides — the deterministic LSH guarantee for exact dups
      (5L, other, "en", "synthetic", 1500L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("mm_near_dup")(spark, dir)
      .select(col("doc_a"), col("doc_b"), col("chunk_jaccard"),
        col("hamming"))
      .as[(Long, Long, Double, Long)].collect()
    val pairs = out.map(r => (r._1, r._2)).toSet
    assert(pairs.contains((1L, 2L)),
      s"shifted payload must re-synchronize and pair, got $pairs")
    assert(pairs.contains((3L, 5L)),
      s"exact dup is a deterministic LSH guarantee, got $pairs")
    assert(!pairs.exists(p => Set(4L).contains(p._1) || p._2 == 4L),
      s"unrelated payload must not pair: $pairs")
    val (_, _, j, h) = out.find(r => r._1 == 1L && r._2 == 2L).get
    assert(j >= 0.5, s"shared chunk fraction too low after shift: $j")
    assert(h <= 8, s"perceptual distance too high for a near-dup: $h")
    val (_, _, je, he) = out.find(r => r._1 == 3L && r._2 == 5L).get
    assert(je == 1.0 && he == 0L, s"exact dup scored j=$je h=$he")
  }
}
