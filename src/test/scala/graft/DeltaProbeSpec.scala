package graft

import graft.operators.DedupOps

/** The daily-ingest contract of `dedup_delta_probe`: a NEW batch is
  * probed against the PERSISTED corpus bucket index — the old index
  * must be scanned, never rebuilt, re-persisted, or extended, so a
  * daily run costs O(delta) rather than O(corpus).
  */
class DeltaProbeSpec extends SparkSpec {
  test("delta probe scans the cached index — zero new persisted " +
      "relations, same cache entry") {
    // warm the index through an ordinary consumer
    assert(SparkEntry.queries("dedup_lsh_pairs")(spark, Sf).count() >= 0)
    val keysBefore = DedupOps.cacheKeys.filter(_._2 == Sf)
    assert(keysBefore.nonEmpty, "index must be cached before the probe")
    val before = spark.sparkContext.getPersistentRDDs.keySet

    val out = SparkEntry.queries("dedup_delta_probe")(spark, Sf).collect()
    assert(out.nonEmpty)

    // compare IDs, not counts (unpersist is async — see LshRecallSpec):
    // only NEW persisted RDDs would indicate a rebuild/re-persist
    val added = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.isEmpty,
      s"the delta probe must probe the cached index, not rebuild: $added")
    assert(DedupOps.cacheKeys.filter(_._2 == Sf) === keysBefore,
      "the probe must not touch the index cache entry")
  }

  test("delta semantics: ids offset, originals linked, verdicts " +
      "consistent with candidate counts") {
    val rows = SparkEntry.queries("dedup_delta_probe")(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val orig = r.getAs[Long]("orig_id")
      assert(id === orig + DedupOps.DeltaIdOffset)
      val n = r.getAs[Long]("n_near_cands")
      val self = r.getAs[Long]("self_hit")
      val v = r.getAs[String]("verdict")
      if (self == 1L) assert(v === "recognized" && n >= 1L)
      else if (n > 0L) assert(v === "near")
      else assert(v === "new")
    }
    // the point of the probe: a prefix edit must not defeat the
    // index — most re-crawled docs are recognized as their original
    val recognized = rows.count(_.getAs[String]("verdict") == "recognized")
    assert(recognized.toDouble / rows.length >= 0.5,
      s"self-recognition too low: $recognized/${rows.length}")
  }
}
