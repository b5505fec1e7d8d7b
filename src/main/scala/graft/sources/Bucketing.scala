package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-table support — the write-side half of the 100 TB join
  * story. Bucketing pre-shuffles a table ONCE at write time: rows are
  * hash-partitioned into `n` buckets by `key` and each bucket is
  * sorted, so every future equi-join or aggregation on `key` between
  * co-bucketed tables (same key, same bucket count) runs with ZERO
  * exchange — the scan itself satisfies the join's distribution
  * requirement. BucketedJoinSpec pins the shuffle-free plan.
  */
object Bucketing {
  /** Write `df` as external bucketed table `name` at `path`,
    * hash-bucketed and sorted by `key` into `n` buckets. */
  def writeBucketed(df: DataFrame, name: String, path: String,
      key: String, n: Int): Unit =
    df.write
      .bucketBy(n, key)
      .sortBy(key)
      .option("path", path)
      .mode("overwrite")
      .saveAsTable(name)
}
