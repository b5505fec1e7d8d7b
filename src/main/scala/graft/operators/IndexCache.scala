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
  */
private[graft] final class IndexCache {
  private val m = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, Long), DataFrame]

  def getOrBuild(s: SparkSession, d: String, mtime: Long)
      (build: => DataFrame): DataFrame = {
    m.keys.foreach { k =>
      val superseded = k._1 == s && k._2 == d && k._3 != mtime
      if (superseded || k._1.sparkContext.isStopped)
        m.remove(k).foreach(df => scala.util.Try(df.unpersist()))
    }
    m.getOrElseUpdate((s, d, mtime), build)
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
