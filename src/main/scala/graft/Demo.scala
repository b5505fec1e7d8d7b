package graft

import org.apache.spark.sql.streaming.Trigger

import graft.streaming.EnrichmentPipeline

/** `sbt run` demo (SURVEY.md §7 minimum slice): the reference's
  * scenario topology live, end-to-end — S1 interval (rate) source →
  * enrichment fan-in → fallible external stage (error-as-value) →
  * retry + DLQ dual sink with checkpoint ack — for a few seconds of
  * micro-batches, then prints what landed where.
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-demo").toString

    // every 7th row fails temporarily in the external stage -> DLQ
    val flaky: String => String =
      v => if (v.stripPrefix("Input Data: ").toLong % 7 == 0)
        throw new java.io.IOException("enrichment service unavailable")
      else v.toUpperCase

    val q = EnrichmentPipeline.start(
      EnrichmentPipeline.rateSource(spark, rowsPerSecond = 100),
      okPath = s"$out/ok", dlqPath = s"$out/dlq",
      checkpointPath = s"$out/ckpt", svc = flaky,
      trigger = Trigger.ProcessingTime(500))

    // let a few micro-batches commit, then stop
    val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
    def okCount(): Long =
      try spark.read.parquet(s"$out/ok/batchId=*").count()
      catch { case _: Throwable => 0L }
    while (okCount() < 100 && System.nanoTime() < deadline)
      Thread.sleep(250)
    q.stop()

    if (okCount() == 0) {
      System.err.println(
        "[demo] no micro-batch committed within 15s (machine overloaded?) — " +
          "rerun, or raise the deadline")
      spark.stop()
      sys.exit(1)
    }
    val ok = spark.read.parquet(s"$out/ok/batchId=*")
    val dlq = spark.read.parquet(s"$out/dlq/batchId=*")
    println(s"[demo] ok rows:  ${ok.count()}")
    println(s"[demo] dlq rows: ${dlq.count()}")
    println("[demo] sample enriched row:")
    ok.orderBy("id").limit(1).show(truncate = false)
    println("[demo] sample dead-lettered row:")
    dlq.orderBy("id").limit(1).show(truncate = false)
    val ids = ok.select($"id").as[Long].collect().toSet
    assert(!ids.exists(_ % 7 == 0), "every 7th id must be dead-lettered")
    println("[demo] OK — dual-sink routing verified")
    spark.stop()
  }
}
