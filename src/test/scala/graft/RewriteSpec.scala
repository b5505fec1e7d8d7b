package graft

import org.apache.spark.sql.functions._

import graft.functions.Hashing.charHash
import graft.operators.DedupOps

/** The physical-rewrite contract of `dedup_index_rewrite`: reclaiming
  * a tombstone-heavy index must (a) read ONLY the index's existing
  * cached blocks — never the corpus parquet (reclaim ∝ |index|, not
  * |corpus|), (b) materialize exactly one new persisted relation (the
  * survivors' checkpoint) while leaving the corpus-index cache entry
  * untouched, and (c) be indistinguishable from both the logical
  * delete (`dedup_index_compact`) and a from-scratch rebuild over
  * corpus ∖ tombstones.
  */
class RewriteSpec extends SparkSpec {

  test("rewrite materializes only the survivors and never re-reads " +
      "the corpus parquet") {
    DedupOps.invalidateIndexes()
    // warm the corpus index through an ordinary consumer
    assert(SparkEntry.queries("dedup_lsh_pairs")(spark, Sf).count() >= 0)
    val keysBefore = DedupOps.cacheKeys.filter(_._2 == Sf)
    assert(keysBefore.nonEmpty, "corpus index must be cached before rewrite")
    val before = spark.sparkContext.getPersistentRDDs.keySet

    val out = SparkEntry.queries("dedup_index_rewrite")(spark, Sf)
    assert(out.count() > 0)

    // exactly ONE new persisted relation: the survivors' checkpoint
    val added = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.size === 1,
      s"rewrite must materialize exactly the survivors, saw new: $added")
    assert(DedupOps.cacheKeys.filter(_._2 == Sf) === keysBefore,
      "the corpus index cache entry must be untouched by the rewrite")
    assert(DedupOps.rewriteCacheKeys.exists(_._2 == Sf),
      "the rewritten relation must be published through the cache")

    // lineage is CUT: the consumer plan scans the checkpointed RDD —
    // no file scan of any parquet survives in the rewritten index
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("FileScan") && !plan.contains("Scan parquet"),
      "rewritten index must have no recompute path to the corpus:\n" +
        plan.linesIterator.filter(_.contains("Scan")).mkString("\n"))
  }

  test("rewritten index equals the logical delete and a from-scratch " +
      "rebuild over corpus ∖ tombstones") {
    def triples(name: String) =
      SparkEntry.queries(name)(spark, Sf).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("band"),
          r.getAs[Long]("bucket"))).sorted.toSeq
    val rewritten = triples("dedup_index_rewrite")
    assert(rewritten === triples("dedup_index_compact"),
      "physical rewrite must equal the logical delete")
    val rebuild = DedupOps.bucketRows(
      graft.sources.Tables.documents(spark, Sf)
        .filter(charHash(col("doc_id").cast("string")) % 10
          =!= DedupOps.TombTag)
        .select(col("doc_id"), col("text")))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("band"),
        r.getAs[Long]("bucket"))).sorted.toSeq
    assert(rewritten === rebuild,
      "physical rewrite must equal a full rebuild over corpus ∖ tombstones")
  }

  test("a second rewrite call reuses the published relation — no new " +
      "materialization") {
    // (depends on the first test having populated the cache; re-warm
    // defensively so the test is order-independent)
    assert(SparkEntry.queries("dedup_index_rewrite")(spark, Sf).count() > 0)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    assert(SparkEntry.queries("dedup_index_rewrite")(spark, Sf).count() > 0)
    val added = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.isEmpty,
      s"repeat rewrite must reuse the cached relation, saw new: $added")
  }
}
