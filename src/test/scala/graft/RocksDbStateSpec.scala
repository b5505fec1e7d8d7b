package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The disk-backed state store the 100 TB streaming path needs:
  * RocksDB keeps streaming state out of executor heap (bounded memory
  * regardless of key cardinality), where the default HDFS-backed
  * in-memory map dies once dedup/session state outgrows the JVM. This
  * spec proves the engine's stateful operators run unchanged on the
  * RocksDB provider. */
class RocksDbStateSpec extends SparkSpec {
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  test("the event-time-timeout sessionizer runs on the RocksDB provider") {
    import graft.operators.StreamOps
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[(Timestamp, Long, Long)]
    val events = in.toDF().toDF("ts", "user_id", "event_id")
      .withWatermark("ts", "10 minutes")
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("tsec"), col("ts"))
      .as[StreamOps.SessEvent]
    val q = StreamOps.sessionize(events).toDF()
      .writeStream.format("memory").queryName("rocks_sess")
      .outputMode("append").start()
    try {
      val t0 = 1699999800000L
      def ts(min: Int) = new Timestamp(t0 + min * 60000L)
      // user 1's session closed by gap; user 2's flushed by timeout
      in.addData((ts(0), 1L, 1L), (ts(5), 1L, 2L), (ts(3), 2L, 3L))
      q.processAllAvailable()
      in.addData((ts(120), 1L, 4L)) // gap-closes user 1; wm -> 110
      q.processAllAvailable()
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      while (spark.table("rocks_sess").count() < 2 &&
        System.nanoTime() < deadline) Thread.sleep(100)
      val rows = spark.table("rocks_sess").as[(Long, Long, Long, Long)]
        .collect().toSet
      assert(rows === Set(
        (1L, 2L, ts(0).getTime / 1000, ts(5).getTime / 1000),
        (2L, 1L, ts(3).getTime / 1000, ts(3).getTime / 1000)),
        s"custom-state semantics identical on RocksDB: $rows")
    } finally {
      q.stop()
      prev match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("watermarked dedup runs on the RocksDB state store provider") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[(Timestamp, String)]
    val q = in.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("k")
      .writeStream.format("memory").queryName("rocks_dedup")
      .outputMode("append").start()
    try {
      val t0 = 1699999800000L
      in.addData((new Timestamp(t0), "a"), (new Timestamp(t0 + 1000), "a"),
        (new Timestamp(t0 + 2000), "b"))
      q.processAllAvailable()
      val ks = spark.table("rocks_dedup").as[(Timestamp, String)]
        .collect().map(_._2).sorted.toSeq
      assert(ks === Seq("a", "b"), "dedup semantics identical on RocksDB")
    } finally {
      q.stop()
      prev match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
