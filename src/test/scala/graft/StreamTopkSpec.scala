package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.Exact._
import graft.operators.StreamOps

/** Pins for `stream_topk_value`: batch-boundary independence of the
  * append-only ledger (two manual micro-batches vs one), and the
  * end-to-end streaming run equalling the batch mirror.
  */
class StreamTopkSpec extends SparkSpec {

  private def rank(df: org.apache.spark.sql.DataFrame) = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("tv").desc, col("user_id"))
    df.groupBy(col("event_type"), col("user_id"))
      .agg(sum(col("tv")).as("tv"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= StreamOps.StreamTopkK)
      .select(col("event_type"), col("rank"), col("user_id"),
        asD(col("tv")).as("total_value"))
      .orderBy("event_type", "rank")
  }

  test("two manual micro-batches compact to the same view as one") {
    val ev = graft.sources.Tables.events(spark, Sf)
    val (a, b) = (ev.filter(col("event_id") % 2 === 0),
      ev.filter(col("event_id") % 2 === 1))
    val dirSplit = tmpDir("topk-two")
    StreamOps.topkValueBatch(a, dirSplit)
    StreamOps.topkValueBatch(b, dirSplit)
    val dirOne = tmpDir("topk-one")
    StreamOps.topkValueBatch(ev, dirOne)
    val split = rank(spark.read.parquet(dirSplit)).collect()
    val one = rank(spark.read.parquet(dirOne)).collect()
    assert(split.toSeq == one.toSeq,
      "decimal partials must re-associate identically across batches")
    assert(split.nonEmpty)
  }

  test("compaction shrinks the ledger to O(keys) and the readout is " +
      "bit-identical before and after") {
    val ev = graft.sources.Tables.events(spark, Sf)
    val dir = tmpDir("topk-compact")
    // three overlapping micro-batches -> multiple partials per key
    StreamOps.topkValueBatch(ev.filter(col("event_id") % 3 === 0), dir)
    StreamOps.topkValueBatch(ev.filter(col("event_id") % 3 === 1), dir)
    StreamOps.topkValueBatch(ev.filter(col("event_id") % 3 === 2), dir)
    val before = StreamOps.topkValueReadout(spark, dir).collect()
    val rawRows = spark.read.parquet(dir).count()
    val keys = spark.read.parquet(dir)
      .select("event_type", "user_id").distinct().count()
    assert(rawRows > keys, "the fixture must actually accumulate partials")
    val compacted = StreamOps.compactTopkLedger(spark, dir)
    assert(spark.read.parquet(compacted).count() == keys,
      "compaction must merge to exactly one partial per key")
    val after = StreamOps.topkValueReadout(spark, compacted).collect()
    assert(after.toSeq == before.toSeq)
  }

  test("an untouched (empty) state dir reads out as the correct " +
      "EMPTY relation, never a schema-inference crash") {
    // round 11's readout inferred the parquet schema and crashed
    // (UNABLE_TO_INFER_SCHEMA) exactly when the source bug delivered
    // an empty stream — masking the real failure
    val topk = StreamOps.topkValueReadout(spark, tmpDir("topk-empty"))
    assert(topk.count() == 0L)
    assert(topk.columns.toSeq ==
      Seq("event_type", "rank", "user_id", "total_value"))
    val dec = StreamOps.decayedValueReadout(spark, tmpDir("decay-empty"))
    assert(dec.count() == 0L)
    assert(dec.columns.toSeq == Seq("user_id", "n_events", "raw_cents",
      "decayed_cents", "last_age_days", "decayed_value"))
  }

  test("the streaming run equals the batch mirror bit-for-bit") {
    val got = StreamOps.streamTopkValue(spark, Sf).collect()
    val want = rank(
      graft.sources.Tables.events(spark, Sf)
        .groupBy(col("event_type"), col("user_id"))
        .agg(sum(money(col("value"))).as("tv"))).collect()
    assert(got.toSeq == want.toSeq)
    // every type emits a full (or corpus-limited) group
    val perType = got.groupBy(_.getAs[String]("event_type"))
    perType.foreach { case (t, rows) =>
      assert(rows.map(_.getAs[Long]("rank")).sorted.toSeq ==
        (1L to rows.length.toLong), s"ranks must be dense for $t")
    }
  }
}
