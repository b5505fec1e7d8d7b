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
