package graft

import graft.operators.{DedupOps, SimilarityOps}

/** The day-2 narrative, end to end: the SAME derived delta batch flows
  * through the probe (recognize re-crawls against yesterday's index)
  * and the merges (land the batch in the persisted indexes) — and the
  * two must tell one consistent story. Each piece is oracle-gated
  * individually; this spec pins the CROSS-query invariants a daily
  * pipeline relies on.
  */
class IncrementalDaySpec extends SparkSpec {

  test("probe verdicts agree with the merged lexical index: a " +
      "'recognized' delta doc shares a bucket with its original there, " +
      "an unrecognized one does not") {
    val probe = SparkEntry.queries("dedup_delta_probe")(spark, Sf).collect()
    assert(probe.nonEmpty)
    val merged = DedupOps.mergedBuckets(spark, Sf).collect()
      .map(r => (r.getAs[Long]("doc_id"),
        (r.getAs[Long]("band"), r.getAs[Long]("bucket"))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    probe.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val orig = r.getAs[Long]("orig_id")
      // a <3-token delta doc has no signature → absent from the index
      val shared = merged.getOrElse(id, Set.empty)
        .intersect(merged.getOrElse(orig, Set.empty))
      if (r.getAs[Long]("self_hit") == 1L)
        assert(shared.nonEmpty,
          s"recognized $id must share a bucket with $orig in the merged index")
      else
        assert(shared.isEmpty,
          s"unrecognized $id must not share a bucket with $orig")
    }
  }

  test("the merged indexes contain exactly corpus ∪ delta") {
    // lexical: merged ids = indexed corpus ids ∪ probed delta ids
    val probeIds = SparkEntry.queries("dedup_delta_probe")(spark, Sf)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val mergedIds = DedupOps.mergedBuckets(spark, Sf).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val corpusIds = mergedIds.filter(_ < DedupOps.DeltaIdOffset)
    // delta docs under 3 tokens have no signature on EITHER side; the
    // ones that are indexed must be exactly the probed ids that had one
    assert((mergedIds -- corpusIds).subsetOf(probeIds))
    assert(mergedIds.exists(_ >= DedupOps.DeltaIdOffset),
      "the merge must actually land delta rows")

    // ANN: the delta batch is an identity re-embed, so each landed
    // vector carries ITS ORIGINAL's bucket and bit-identical norm
    val ann = SimilarityOps.mergedAnnIndex(spark, Sf).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("bucket"), r.getAs[Double]("norm"))).toMap
    val annDelta = ann.keySet.filter(_ >= DedupOps.DeltaIdOffset)
    assert(annDelta.nonEmpty)
    annDelta.foreach { id =>
      assert(ann(id) === ann(id - DedupOps.DeltaIdOffset),
        s"re-embedded $id must land with its original's bucket and norm")
    }
  }
}
