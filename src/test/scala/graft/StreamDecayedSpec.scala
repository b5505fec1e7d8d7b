package graft

import org.apache.spark.sql.functions._

import graft.operators.{EventOps, StreamOps}

/** Pins for `stream_decayed_value`: two manual micro-batches compact
  * to the same ledger readout as one (batch-boundary independence by
  * per-(user, day) associativity), and the day-quantized form
  * dominates the per-event batch form by the floor inequality.
  */
class StreamDecayedSpec extends SparkSpec {

  test("two micro-batches compact identically to one; day form " +
      "dominates the per-event form") {
    val ev = graft.sources.Tables.events(spark, Sf)
    val split = tmpDir("decay-2batch")
    val whole = tmpDir("decay-1batch")
    StreamOps.decayedValueBatch(ev.filter(col("event_id") % 2 === 0),
      split)
    StreamOps.decayedValueBatch(ev.filter(col("event_id") % 2 === 1),
      split)
    StreamOps.decayedValueBatch(ev, whole)
    val a = StreamOps.decayedValueReadout(spark, split).collect()
    val b = StreamOps.decayedValueReadout(spark, whole).collect()
    assert(a.toSeq == b.toSeq,
      "batch boundaries leaked into the compacted ledger")
    // day-quantized decay floors once per user-day, so it can only
    // exceed the per-event form: (sum c) >> w >= sum (c >> w)
    val perEvent = EventOps.evDecayedValue(spark, Sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        r.getAs[Long]("decayed_cents")).toMap
    assert(a.length == perEvent.size)
    var strict = 0
    a.foreach { r =>
      val u = r.getAs[Long]("user_id")
      val day = r.getAs[Long]("decayed_cents")
      assert(day >= perEvent(u), s"user $u: day form lost cents")
      assert(r.getAs[Long]("raw_cents") >= day)
      if (day > perEvent(u)) strict += 1
    }
    assert(strict > 0,
      "the floor inequality should be strict for someone at sf0.001")
  }

  test("ledger compaction merges to one partial per (user, day) with " +
      "a bit-identical readout") {
    val ev = graft.sources.Tables.events(spark, Sf)
    val dir = tmpDir("decay-compact")
    StreamOps.decayedValueBatch(ev.filter(col("event_id") % 3 === 0), dir)
    StreamOps.decayedValueBatch(ev.filter(col("event_id") % 3 === 1), dir)
    StreamOps.decayedValueBatch(ev.filter(col("event_id") % 3 === 2), dir)
    val before = StreamOps.decayedValueReadout(spark, dir).collect()
    val raw = spark.read.parquet(dir).count()
    val keys = spark.read.parquet(dir)
      .select("user_id", "day").distinct().count()
    assert(raw > keys, "the fixture must actually accumulate partials")
    val compacted = StreamOps.compactDecayLedger(spark, dir)
    assert(spark.read.parquet(compacted).count() == keys)
    val after = StreamOps.decayedValueReadout(spark, compacted).collect()
    assert(after.toSeq == before.toSeq)
  }
}
