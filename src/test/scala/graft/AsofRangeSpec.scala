package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import graft.operators.EventOps

/** The two rank-arithmetic join operators (`ev_asof_join`,
  * `ev_overlap_count`): each is pinned EQUAL to a naive theta-join
  * mirror of its definition — the mirror enumerates pairs, the
  * operator must not — and the operator's physical plan is pinned
  * free of pair-enumerating join nodes (the reason these compositions
  * exist; a regression to BroadcastNestedLoop/Cartesian is exactly
  * the failure mode that melts a 1000-executor cluster).
  */
class AsofRangeSpec extends SparkSpec {

  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan.toString
      case p => p.toString
    }

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("asof join equals the naive greatest-view-at-or-before mirror") {
    val base = graft.sources.Tables.events(spark, Sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("unix_timestamp(ts)").as("ts_sec"))
    val clicks = base.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts_sec"))
    val views = base.filter(col("event_type") === "view")
      .select(col("user_id").as("vu"), col("ts_sec").as("v_ts"))
    // the quadratic mirror: theta join on user and v_ts <= ts_sec,
    // then MAX per click — the plan the asof composition replaces
    val naive = clicks.join(views,
        col("user_id") === col("vu") && col("v_ts") <= col("ts_sec"),
        "left")
      .groupBy(col("event_id"), col("user_id"), col("ts_sec"))
      .agg(max(col("v_ts")).as("mv"))
      .select(col("event_id"), col("user_id"),
        col("ts_sec").as("click_ts_sec"),
        coalesce(col("mv"), lit(-1L)).as("view_ts_sec"),
        coalesce(col("ts_sec") - col("mv"), lit(-1L)).as("gap_sec"))
      .orderBy("event_id")
    assert(rows(EventOps.evAsofJoin(spark, Sf)) === rows(naive))
  }

  test("asof join: a click with no prior view keeps the -1 sentinel") {
    val out = EventOps.evAsofJoin(spark, Sf)
    val sentinels = out.filter(col("view_ts_sec") === -1L)
    // sf0.001 must exercise the no-match edge for the pin to mean
    // anything; if the fixture ever stops doing so, fail loudly
    assert(sentinels.count() > 0,
      "fixture no longer exercises the no-prior-view edge")
    assert(sentinels.filter(col("gap_sec") =!= -1L).count() === 0,
      "gap_sec must carry the sentinel exactly when view_ts_sec does")
  }

  test("asof join plan: one user shuffle, no pair-enumerating join") {
    val p = physical(EventOps.evAsofJoin(spark, Sf))
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "asof must be the union+window composition, not a theta join")
    assert(!p.contains("SortMergeJoin"),
      "asof must not join at all — the union carries both sides")
  }

  test("bucketed asof equals the plain asof row for row") {
    assert(rows(EventOps.evAsofBucketed(spark, Sf)) ===
      rows(EventOps.evAsofJoin(spark, Sf)))
  }

  test("bucketed asof: the carry handoff is actually exercised") {
    // at least one click must be matched to a view from an EARLIER
    // bucket (local_view_ts null, carry non-null) or the boundary
    // logic is untested by the fixture
    val base = graft.sources.Tables.events(spark, Sf)
      .select(col("user_id"), col("event_type"),
        expr("unix_timestamp(ts)").as("ts_sec"))
    val crossBucket = EventOps.evAsofBucketed(spark, Sf)
      .filter(col("view_ts_sec") =!= -1L &&
        expr(s"click_ts_sec div ${EventOps.AsofBucketSec}") =!=
          expr(s"view_ts_sec div ${EventOps.AsofBucketSec}"))
    assert(crossBucket.count() > 0,
      "fixture no longer exercises the cross-bucket carry handoff")
  }

  test("bucketed asof plan: the event-sized window partitions by " +
      "(user, bucket), never by user alone") {
    val p = physical(EventOps.evAsofBucketed(spark, Sf))
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    val eventWindows = p.linesIterator.filter(_.contains("Window ["))
      .filter(_.contains("local_view_ts")).toSeq
    assert(eventWindows.nonEmpty, p.take(2000))
    assert(eventWindows.forall(_.contains("bucket")),
      "the running scan over events must be salted by time bucket:\n" +
        eventWindows.mkString("\n"))
  }

  test("overlap count equals the naive pair-enumerating mirror") {
    val win = graft.sources.Tables.events(spark, Sf)
      .select(col("user_id"), expr("unix_timestamp(ts)").as("ts_sec"))
      .groupBy(col("user_id"), expr("ts_sec div 86400").as("day"))
      .agg(min(col("ts_sec")).as("s"), max(col("ts_sec")).as("e"))
    val naive = win.as("a").join(win.as("b"),
        col("a.day") === col("b.day") &&
          col("b.s") <= col("a.e") && col("b.e") >= col("a.s") &&
          col("b.user_id") =!= col("a.user_id"),
        "left")
      .groupBy(col("a.user_id").as("user_id"), col("a.day").as("day"),
        col("a.s").as("s"), col("a.e").as("e"))
      .agg(count(col("b.user_id")).as("n_concurrent"))
      .select(col("user_id"), (col("day") * 86400L).as("day_sec"),
        col("s"), col("e"), col("n_concurrent"))
      .orderBy("day_sec", "user_id")
    assert(rows(EventOps.evOverlapCount(spark, Sf)) === rows(naive))
  }

  test("overlap count exercises both overlap and isolation at sf0.001") {
    val out = EventOps.evOverlapCount(spark, Sf).cache()
    try {
      assert(out.filter(col("n_concurrent") > 0L).count() > 0,
        "fixture no longer produces any overlapping windows")
      assert(out.filter(col("n_concurrent") === 0L).count() > 0,
        "fixture no longer produces any isolated windows")
    } finally out.unpersist()
  }

  test("overlap count plan: no join node enumerates pairs, and both " +
      "running counts ride ONE day-partitioned window pass") {
    val p = physical(EventOps.evOverlapCount(spark, Sf))
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "overlap counting must be rank arithmetic, not a theta join")
    val windows = p.linesIterator.count(_.contains("Window ["))
    assert(windows == 1,
      s"expected the two endpoint counts to share one sorted window " +
        s"pass, saw $windows Window nodes")
  }

  test("streaming asof lookup: the finite replay equals the batch " +
      "asof join row-for-row") {
    // each click's answer depends only on the STATIC view history, so
    // the foreachBatch engine must be batch-size invariant — any
    // cross-batch dependence would diverge from the one-shot batch run
    assert(rows(graft.operators.StreamOps.streamAsof(spark, Sf)) ===
      rows(EventOps.evAsofJoin(spark, Sf)))
  }
}
