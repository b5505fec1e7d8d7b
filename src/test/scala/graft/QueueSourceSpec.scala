package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.EnrichmentPipeline

/** The S4 ack/nack contract on a QUEUE-shaped source. The reference's
  * input is RabbitMQ (README.md:7): an unbounded broker queue where
  * messages accumulate while the consumer is down and an ack is what
  * releases them. The file-source PipelineSpec proves the contract on
  * replayable files; this spec proves the SAME pipeline
  * (enrich → retry → DLQ → checkpoint ack) over a `MemoryStream` — the
  * closest public-API stand-in for a broker queue without adding a
  * Kafka dependency: unbounded, push-fed, offset-consumed — including
  * a MID-STREAM restart with messages arriving while the consumer is
  * down.
  *
  * Claims pinned (README.md:13-17):
  *  - no message lost across stop/restart (offsets resume from the
  *    checkpoint = ack boundary);
  *  - messages enqueued while the consumer is DOWN are delivered on
  *    restart, exactly once;
  *  - a dead-lettered message is acked (DLQ-then-ack): the restart
  *    does NOT redeliver it to either sink.
  */
class QueueSourceSpec extends SparkSpec {
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  /** Deterministic unrecoverable failure on ids ending in 7 (the
    * scripted Services.scala:100-111 `sometimes`). */
  private val svc: String => String = { s =>
    val id = s.split(": ").last.toLong
    if (id % 10 == 7) throw new IllegalArgumentException(s"invalid $id")
    s"stored $id"
  }

  test("queue-shaped source: no-loss + exactly-once + DLQ-then-ack " +
      "across a mid-stream restart") {
    val in = MemoryStream[(Long, String)]
    val ok = tmpDir("q-ok"); val dlq = tmpDir("q-dlq"); val cp = tmpDir("q-cp")
    def source = in.toDF().toDF("id", "value")
    def msgs(r: Range) = r.map(i => (i.toLong, s"Input Data: $i"))

    // ---- run 1: consumer up, two deliveries arrive live ----
    val q1 = EnrichmentPipeline.start(source, ok, dlq, cp, svc,
      trigger = Trigger.ProcessingTime(100))
    try {
      in.addData(msgs(0 until 10): _*) // id 7 is poison -> DLQ
      q1.processAllAvailable()
      assert(spark.read.parquet(ok).count() === 9)
      assert(spark.read.parquet(dlq).select("id").as[Long].collect().toSeq
        === Seq(7L))

      in.addData(msgs(10 until 15): _*) // all clean
      q1.processAllAvailable()
      assert(spark.read.parquet(ok).count() === 14)
    } finally q1.stop() // mid-stream shutdown: the queue outlives us

    // ---- consumer DOWN: messages keep arriving on the queue ----
    in.addData(msgs(15 until 20): _*) // id 17 is poison

    // ---- run 2: restart on the same checkpoint ----
    val q2 = EnrichmentPipeline.start(source, ok, dlq, cp, svc,
      trigger = Trigger.ProcessingTime(100))
    try q2.processAllAvailable() finally q2.stop()

    val okIds = spark.read.parquet(ok).select("id").as[Long].collect().sorted
    val dlqIds = spark.read.parquet(dlq).select("id").as[Long].collect().sorted
    // every enqueued message is in exactly one sink exactly once:
    // nothing lost while down, nothing redelivered after its ack —
    // including the dead-lettered id 7, whose DLQ write was acked in
    // run 1 and must not reappear in either sink after restart
    assert(okIds.toSeq === (0L until 20L).filterNot(i => i % 10 == 7))
    assert(dlqIds.toSeq === Seq(7L, 17L))
  }
}
