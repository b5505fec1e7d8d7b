package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persisted-index cache keyed by (session, dataset dir, source file
  * mtime), shared by [[DedupOps]] (LSH buckets) and [[SimilarityOps]]
  * (ANN bucket+norm index).
  *
  * The mtime in the key makes an in-place overwrite of the source
  * parquet rebuild transparently; [[getOrBuild]] additionally EVICTS
  * the superseded entry (unpersist + remove) the moment a new mtime is
  * seen for the same (session, dir) — round 2 left stale relations
  * pinned in executor storage until a manual invalidate. Entries whose
  * session has been stopped are evicted on the same sweep (a stopped
  * session's persisted blocks are gone anyway; keeping the entry just
  * pins the dead session object).
  *
  * A FAILED mtime stat (`None`) is a no-op, not an eviction: the
  * caller gets whatever live entry exists for (session, dir) — round
  * 3 keyed stat failures as 0L, so one transient IOException evicted
  * and rebuilt a healthy index and then left the 0-keyed orphan
  * persisted until the next successful stat.
  */
private[graft] final class IndexCache {
  private val m = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, Long), DataFrame]

  def getOrBuild(s: SparkSession, d: String, mtime: Option[Long])
      (build: => DataFrame): DataFrame = {
    m.keys.foreach { k =>
      val superseded =
        mtime.exists(mt => k._1 == s && k._2 == d && k._3 != mt)
      if (superseded || k._1.sparkContext.isStopped)
        m.remove(k).foreach(df => scala.util.Try(df.unpersist()))
    }
    val key = mtime match {
      case Some(mt) => (s, d, mt)
      case None =>
        // stat failed: reuse the live entry for (s, d) if one exists;
        // only when nothing is cached do we build under a 0 key (the
        // next successful stat sweeps it as superseded)
        m.keys.find(k => k._1 == s && k._2 == d).getOrElse((s, d, 0L))
    }
    m.get(key) match {
      case Some(df) => df
      case None =>
        // build OUTSIDE the map, publish with putIfAbsent: TrieMap's
        // getOrElseUpdate can run `build` in two racing threads, and
        // the loser's persisted relation would leak executor storage
        val built = build
        m.putIfAbsent(key, built) match {
          case Some(winner) =>
            scala.util.Try(built.unpersist())
            winner
          case None => built
        }
    }
  }

  /** Drop every cached relation (releases executor storage).
    * Exception-safe: a dead entry can't block the clear. */
  def invalidate(): Unit = {
    m.values.foreach(df => scala.util.Try(df.unpersist()))
    m.clear()
  }

  /** Test hook: live cache keys. */
  private[graft] def keys: Set[(SparkSession, String, Long)] = m.keySet.toSet
}
