package graft

import org.apache.spark.sql.functions._

import graft.functions.Hashing.charHash
import graft.operators.DedupOps

/** The incremental-clustering contract of `dedup_components_delta`:
  * the coarsened-graph pass (existing components collapsed to single
  * buckets + only delta-touched LSH cells re-materialized) must be
  * indistinguishable from label propagation over the FULL
  * corpus ∪ delta candidate graph — including min-id labels when a
  * delta doc merges existing components — while reusing the cached
  * corpus component relation instead of re-propagating the corpus.
  */
class ComponentsDeltaSpec extends SparkSpec {

  test("incremental components equal full propagation over " +
      "corpus ∪ delta") {
    val inc = SparkEntry.queries("dedup_components_delta")(spark, Sf)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("component_id"))
      .toMap

    // independent full rebuild: bucket rows over corpus ∪ delta, one
    // propagation from scratch, isolated docs as singletons
    val docs = graft.sources.Tables.documents(spark, Sf)
      .select(col("doc_id"), col("text"))
    val delta = docs
      .filter(charHash(col("doc_id").cast("string")) % 10
        === DedupOps.DeltaTag)
      .select((col("doc_id") + DedupOps.DeltaIdOffset).as("doc_id"),
        concat(lit("UPDATE: "), col("text")).as("text"))
    val all = docs.unionByName(delta)
    val labels = DedupOps.propagateMinLabels(
      DedupOps.bucketRows(all).localCheckpoint())
    val labeled = labels.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("comp")).toMap
    val full = all.select("doc_id").collect().map(_.getLong(0))
      .map(id => id -> labeled.getOrElse(id, id)).toMap

    assert(inc.size === full.size,
      s"row counts differ: ${inc.size} vs ${full.size}")
    val bad = full.collect { case (id, c) if inc(id) != c => (id, inc(id), c) }
    assert(bad.isEmpty, s"label mismatches (first 5): ${bad.take(5)}")

    // the delta really participates: every delta doc is labeled, and
    // at least one delta doc joined an existing (corpus-min) component
    val deltaIds = full.keys.filter(_ >= DedupOps.DeltaIdOffset)
    assert(deltaIds.nonEmpty)
    assert(deltaIds.exists(id => inc(id) < DedupOps.DeltaIdOffset),
      "some delta doc must merge into an existing corpus component " +
        "(the UPDATE re-crawl is a near-dup of its original)")
  }
}
