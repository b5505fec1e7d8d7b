package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.DataFrame

import graft.operators.IndexCache

/** The cache's concurrency contract, forced deterministically: two
  * threads that BOTH enter `build` for the same key (a latch holds
  * them inside) must converge on one published relation, and the
  * losing thread's persisted build must be freed — the round-3
  * `getOrElseUpdate` version let the loser's relation leak executor
  * storage until session end. */
class IndexCacheSpec extends SparkSpec {

  test("racing builds publish one relation and free the loser's storage") {
    val cache = new IndexCache
    val inBuild = new CountDownLatch(2)
    val go = new CountDownLatch(1)
    val builds = new AtomicInteger(0)
    val before = spark.sparkContext.getPersistentRDDs.keySet

    def build(): DataFrame = {
      builds.incrementAndGet()
      inBuild.countDown()
      go.await(20, TimeUnit.SECONDS)
      val df = spark.range(100).toDF("v").persist()
      df.count()
      df
    }

    val pool = Executors.newFixedThreadPool(2)
    try {
      val fa = pool.submit(() => cache.getOrBuild(spark, "race-dir", Some(1L))(build()))
      val fb = pool.submit(() => cache.getOrBuild(spark, "race-dir", Some(1L))(build()))
      // both threads are inside build() -> the race is real, not timing luck
      assert(inBuild.await(20, TimeUnit.SECONDS), "both builds must start")
      go.countDown()
      val (a, b) = (fa.get(20, TimeUnit.SECONDS), fb.get(20, TimeUnit.SECONDS))
      assert(builds.get() === 2, "latch must have forced two builds")
      assert(a eq b, "both callers must get the one published relation")
      assert(cache.keys.count(_._2 == "race-dir") === 1)
      // both builds persisted the SAME deterministic plan, which the
      // CacheManager dedupes into ONE shared entry — the loser cleanup
      // must NOT evict it (a Dataset.unpersist on the loser would: the
      // entry is keyed by plan, not by Dataset identity)
      val added = spark.sparkContext.getPersistentRDDs.keySet -- before
      assert(added.size === 1,
        s"the single shared cache entry must survive loser cleanup: $added")
    } finally {
      pool.shutdownNow()
      cache.invalidate()
    }
  }

  test("racing CHECKPOINT builds free the loser's private blocks, " +
      "winner's stay intact") {
    val cache = new IndexCache
    val inBuild = new CountDownLatch(2)
    val go = new CountDownLatch(1)
    val before = spark.sparkContext.getPersistentRDDs.keySet

    // each localCheckpoint materializes its OWN RDD even for identical
    // plans — the distinct-storage case where a leaked loser really
    // does double the footprint
    def build(): DataFrame = {
      inBuild.countDown()
      go.await(20, TimeUnit.SECONDS)
      spark.range(100).toDF("v").localCheckpoint()
    }

    val pool = Executors.newFixedThreadPool(2)
    try {
      val fa = pool.submit(() => cache.getOrBuild(spark, "ckpt-dir", Some(1L))(build()))
      val fb = pool.submit(() => cache.getOrBuild(spark, "ckpt-dir", Some(1L))(build()))
      assert(inBuild.await(20, TimeUnit.SECONDS), "both builds must start")
      go.countDown()
      val (a, b) = (fa.get(20, TimeUnit.SECONDS), fb.get(20, TimeUnit.SECONDS))
      assert(a eq b)
      // loser's checkpoint freed (async -> poll); winner's remains and
      // is still queryable
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      def added = spark.sparkContext.getPersistentRDDs.keySet -- before
      while (added.size > 1 && System.nanoTime() < deadline)
        Thread.sleep(100)
      assert(added.size === 1, s"loser's checkpoint must be freed: $added")
      assert(a.count() === 100L)
    } finally {
      pool.shutdownNow()
      cache.invalidate()
    }
  }

  test("a failed mtime stat reuses the live entry instead of rebuilding") {
    val cache = new IndexCache
    try {
      val built = new AtomicInteger(0)
      def build(): DataFrame = {
        built.incrementAndGet()
        spark.range(10).toDF("v")
      }
      val first = cache.getOrBuild(spark, "stat-dir", Some(42L))(build())
      // transient stat failure: None must be a no-op lookup, not an
      // eviction-and-rebuild (round 3 keyed failures as 0L and evicted
      // the healthy entry)
      val second = cache.getOrBuild(spark, "stat-dir", None)(build())
      assert(second eq first)
      assert(built.get() === 1)
      assert(cache.keys.count(_._2 == "stat-dir") === 1)
      // recovery: the next successful stat with a NEW mtime still evicts
      val third = cache.getOrBuild(spark, "stat-dir", Some(43L))(build())
      assert(!(third eq first))
      assert(built.get() === 2)
      assert(cache.keys.filter(_._2 == "stat-dir").map(_._3) === Set(43L))
    } finally cache.invalidate()
  }
}
