package graft

import org.apache.spark.sql.functions._

import graft.operators.EventOps

/** Round-10 scale fix for PageRank: the superseded design
  * materialized one synthetic edge per (dangling node × node) —
  * O(|dangling|·N) rows, 10¹³⁺ on a 30%-dangling domain graph. The
  * replacement folds dangling rank mass to ONE scalar per iteration
  * with the SAME per-term quantization floor, so results are
  * bit-identical (RankProjSampleSpec's driver-side reference IS the
  * old fan-out formulation, and the `ev_user_pagerank` DuckDB oracle
  * runs the fan-out CTE — both gates double as the equivalence
  * proof). This spec pins the structural side: the share relation the
  * iteration joins carries ZERO dangling rows, the user graph really
  * is ≥30% dangling, and the quantization guard fires before silent
  * mass loss could.
  */
class PrDanglingScaleSpec extends SparkSpec {

  import spark.implicits._

  /** Fixture: 4 nodes a,b,z,c — a→b, b→z real edges; z dangling with
    * in-edges; c dangling with no in-edges (same shape as
    * RankProjSampleSpec's dangling fixture, built directly as an edge
    * relation here). */
  private def fixture = {
    val nodes = Seq("a", "b", "z", "c").toDF("node")
    val edges = Seq(("a", "b", 1L), ("b", "z", 1L))
      .toDF("src", "dst", "w")
    (nodes, edges)
  }

  test("share relation has ZERO dangling rows: real edges + N " +
      "zero-share self-loops, nothing else") {
    val (nodes, edges) = fixture
    val (share, danglingSrc) = EventOps.pagerankShares(nodes, edges)
    val n = nodes.count()
    val rows = share.collect()
    assert(rows.length == edges.count() + n,
      s"share relation is ${rows.length} rows, expected |edges| + N — " +
        "a dangling fan-out crept back in")
    // every positive-share row is a REAL edge; dangling sources occur
    // only as their own zero-share self-loop
    val dang = danglingSrc.as[String].collect().toSet
    assert(dang == Set("z", "c"))
    rows.foreach { r =>
      val (src, dst, sh) = (r.getString(0), r.getString(1), r.getLong(2))
      if (dang(src))
        assert(dst == src && sh == 0L,
          s"dangling source $src has a materialized share row " +
            s"($src -> $dst, share $sh)")
    }
  }

  test("share relation size is linear in the graph, not " +
      "O(|dangling| * N) (thousands-of-nodes synthetic universe)") {
    // 5000 nodes, 60% dangling: the fan-out design would materialize
    // 3000 * 5000 = 15M share rows; the linear contract is
    // |edges| + N = 2000 + 5000
    val nodes = spark.range(5000L).select(col("id").as("node"))
    val edges = spark.range(2000L)
      .select(col("id").as("src"), ((col("id") + 1L) % 5000L).as("dst"),
        lit(1L).as("w"))
    val (share, danglingSrc) = EventOps.pagerankShares(nodes, edges)
    assert(share.count() == 2000L + 5000L)
    assert(danglingSrc.count() == 3000L)
  }

  test("pagerank on the synthetic 5000-node / 60%-dangling graph " +
      "conserves mass and ranks every node") {
    val nodes = spark.range(5000L).select(col("id").as("node"))
    val edges = spark.range(2000L)
      .select(col("id").as("src"), ((col("id") + 1L) % 5000L).as("dst"),
        lit(1L).as("w"))
    val out = EventOps.pagerankOf(nodes, edges, 5000L)
      .select(col("node").cast("long"), col("rank_scaled"))
      .as[(Long, Long)].collect()
    assert(out.length == 5000)
    assert(out.forall(_._2 > 0L), "a node lost all rank")
    val total = out.map(_._2).sum
    assert(total <= EventOps.PrScale)
    // with 60% of the mass cycling through the scalar dangling term,
    // losing it entirely (the n >> PrEdgeScale failure mode, or a
    // dropped dmass join) would floor total near 0.15*PrScale
    assert(total >= EventOps.PrScale * 95L / 100L,
      s"dangling mass is leaking: $total of ${EventOps.PrScale}")
  }

  test("ev_user_pagerank: node universe is every user and >= 30% of " +
      "nodes are dangling by the hash gate") {
    val sf01 = "/root/testdata/sf0.01"
    val out = EventOps.evUserPagerank(spark, sf01)
    val n = out.count()
    val users = graft.sources.Tables.events(spark, sf01)
      .select(col("user_id")).distinct().count()
    assert(n == users, "a user dropped out of the rank relation")
    // dangling = users that never emit an edge; the hash gate alone
    // guarantees ~30%, stream-tail users only add to it
    val engaged = graft.sources.Tables.events(spark, sf01)
      .select(col("user_id")).distinct()
      .filter(graft.functions.Hashing.charHash(
        col("user_id").cast("string")) % 10 < EventOps.PrEngagedPct)
      .count()
    assert(users - engaged >= users * 20L / 100L,
      s"hash gate drifted: only ${users - engaged} of $users lurkers")
    // the rank column is a plain rescale of rank_scaled
    val bad = out.filter(
      abs(col("rank") - col("rank_scaled").cast("double") /
        lit(EventOps.PrScale.toDouble)) > lit(0.0)).count()
    assert(bad == 0L)
  }

  test("trustrank: teleport concentrates on seeds — seeds average " +
      "strictly more rank than non-seeds, mass conserved") {
    val sf01 = "/root/testdata/sf0.01"
    val rows = EventOps.evUserTrustrank(spark, sf01)
      .select(col("rank_scaled"), col("is_seed"))
      .as[(Long, Long)].collect()
    val (seeds, rest) = rows.partition(_._2 == 1L)
    assert(seeds.nonEmpty && rest.nonEmpty,
      "hash gate degenerated: need both seeds and non-seeds")
    val seedAvg = seeds.map(_._1).sum / seeds.length
    val restAvg = rest.map(_._1).sum / rest.length
    assert(seedAvg > restAvg,
      s"seeds must hold more average rank: $seedAvg <= $restAvg")
    val total = rows.map(_._1).sum
    assert(total <= EventOps.PrScale,
      "integer floors can only LOSE mass")
    assert(rows.forall(_._1 >= 0L))
  }

  test("trustrank: a node with no referral path from any seed decays " +
      "below every seed-reachable node (synthetic two-island graph)") {
    // islands are event-type streams: seeds exist only in stream A,
    // so stream B's users receive rank ONLY via the uniform dangling
    // drip — strictly less than anything the seed teleport feeds.
    // ids chosen by hash class: seed (residue 3), engaged non-seeds
    // (residues 0-6 minus 3), lurkers (residue >= 7)
    val cls = spark.range(500L).select(col("id"),
        (graft.functions.Hashing.charHash(col("id").cast("string"))
          % 10).as("r"))
      .as[(Long, Long)].collect()
    def pick(p: Long => Boolean, n: Int): Seq[Long] =
      cls.filter(c => p(c._2)).map(_._1).take(n).toSeq
    val Seq(seed) = pick(_ == EventOps.PrSeedResidue, 1)
    val aOthers = pick(r => r < EventOps.PrEngagedPct &&
      r != EventOps.PrSeedResidue, 2)
    val bUsers = pick(r => r < EventOps.PrEngagedPct &&
      r != EventOps.PrSeedResidue, 4).drop(2)
    // stream A: seed -> a1 -> a2 ; stream B: b1 -> b2 (no seed)
    val evs = Seq(
      (1L, 1L, seed, "A"), (2L, 2L, aOthers(0), "A"),
      (3L, 3L, aOthers(1), "A"),
      (4L, 1L, bUsers(0), "B"), (5L, 2L, bUsers(1), "B"))
    val fixDir = {
      val t = tmpDir("trust-islands")
      evs.toDF("event_id", "ts_sec", "user_id", "event_type")
        .select(col("event_id"), timestamp_seconds(col("ts_sec")).as("ts"),
          col("user_id"), col("event_type"), lit(1.0).as("value"),
          lit("{}").as("props"))
        .write.mode("overwrite").parquet(s"$t/events.parquet")
      t
    }
    val got = EventOps.evUserTrustrank(spark, fixDir)
      .select(col("user_id"), col("rank_scaled"), col("is_seed"))
      .as[(Long, Long, Long)].collect().toSeq
    val byId = got.map(r => r._1 -> r._2).toMap
    val islandA = Seq(seed) ++ aOthers
    val minA = islandA.map(byId).min
    val maxB = bUsers.map(byId).max
    assert(maxB < minA,
      s"seed-unreachable island must decay below the seed island: " +
        s"B max $maxB vs A min $minA ($got)")
    assert(got.count(_._3 == 1L) == 1, "exactly one planted seed")
  }

  test("trustrank with zero seeds degrades to the empty-rank " +
      "contract, never a division by zero") {
    // a user universe whose every id falls OUTSIDE the seed residue:
    // w = 0 must take the guarded branch (rank 0 for everyone)
    val cls = spark.range(500L).select(col("id"),
        (graft.functions.Hashing.charHash(col("id").cast("string"))
          % 10).as("r"))
      .as[(Long, Long)].collect()
    val noSeeds = cls.filter(_._2 != EventOps.PrSeedResidue)
      .map(_._1).take(4).toSeq
    val dir = tmpDir("trust-noseeds")
    noSeeds.zipWithIndex.map { case (u, i) =>
      (i.toLong + 1L, i.toLong + 1L, u, "A")
    }.toDF("event_id", "ts_sec", "user_id", "event_type")
      .select(col("event_id"), timestamp_seconds(col("ts_sec")).as("ts"),
        col("user_id"), col("event_type"), lit(1.0).as("value"),
        lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventOps.evUserTrustrank(spark, dir)
      .select(col("user_id"), col("rank_scaled"), col("is_seed"))
      .as[(Long, Long, Long)].collect()
    assert(got.length == noSeeds.length)
    assert(got.forall(r => r._2 == 0L && r._3 == 0L),
      s"zero seeds must yield zero rank for every node: ${got.toSeq}")
  }

  test("quantization guard: n >= PrEdgeScale is rejected, not " +
      "silently floored to zero dangling share") {
    val nodes = spark.range(3L).select(col("id").as("node"))
    val edges = Seq((0L, 1L, 1L)).toDF("src", "dst", "w")
    val e = intercept[IllegalArgumentException] {
      EventOps.pagerankOf(nodes, edges, EventOps.PrEdgeScale)
    }
    assert(e.getMessage.contains("PrEdgeScale"))
  }
}
