package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning

import graft.operators.TextOps

/** `doc_target_affinity` — sign-test DSIR importance scoring: exact
  * agreement with an independent driver-side recomputation, the
  * selection signal (target language scores above every other), and
  * the deployment plan shape (tiny model broadcast; document text
  * never transits a hash exchange).
  */
class DsirSpec extends SparkSpec {
  private def bigramBuckets(text: String): Seq[Long] =
    refBigramBuckets(text)

  test("affinity counters match an independent driver-side " +
      "recomputation") {
    val docs = graft.sources.Tables.documents(spark, Sf)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val all = docs.toSeq.flatMap { case (_, _, t) => bigramBuckets(t) }
    val cntR = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tgtF = docs.toSeq.filter(_._2 == "en")
      .flatMap { case (_, _, t) => bigramBuckets(t) }
    val cntT = tgtF.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (nR, nT) = (all.size.toLong, tgtF.size.toLong)
    val expected = docs.toSeq.map { case (id, _, t) =>
      val bs = bigramBuckets(t)
      id -> ((bs.size.toLong,
        bs.count(b => cntT.getOrElse(b, 0L) * nR > cntR(b) * nT).toLong,
        bs.count(b => cntT.getOrElse(b, 0L) * nR < cntR(b) * nT).toLong))
    }.filter(_._2._1 > 0).toMap
    val got = SparkEntry.queries("doc_target_affinity")(spark, Sf)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_feat"), r.getAs[Long]("n_pos"),
          r.getAs[Long]("n_neg")))).toMap
    assert(got === expected,
      "per-doc (n_feat, n_pos, n_neg) must match the reference fold")
  }

  test("planted corpus: target-mimicking doc scores positive, " +
      "novel-vocabulary doc negative") {
    import spark.implicits._
    // target slice: 10 en docs sharing one vocabulary; the mimic
    // reuses exactly their bigrams (every feature over-represented in
    // the target), the outsider uses bigrams the target never emits
    // (cnt_t = 0 on every feature → strictly negative evidence)
    val enText = "the cat sat on the mat and the dog ran off"
    val docs =
      (0 until 10).map(i => (i.toLong, enText, "en", "s0", enText.length)) ++
      Seq((100L, enText, "xx", "s1", enText.length),
        (101L, "zq wv qk jx vv zz pq xw", "xx", "s1", 24))
    val dir = tmpDir("dsir-planted")
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val aff = SparkEntry.queries("doc_target_affinity")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("affinity")).toMap
    assert(aff(100L) > 0.0,
      s"target-mimicking doc must score positive, got ${aff(100L)}")
    assert(aff(101L) < 0.0,
      s"novel-vocabulary doc must score negative, got ${aff(101L)}")
    assert(aff(100L) > aff(101L) + 0.5,
      "the separation is the selection signal")
  }

  test("the target language scores strictly above every other") {
    val byLang = SparkEntry.queries("doc_target_affinity")(spark, Sf)
      .join(graft.sources.Tables.documents(spark, Sf)
        .select(col("doc_id"), col("lang")), "doc_id")
      .groupBy("lang").agg(avg(col("affinity")).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val en = byLang("en")
    for ((l, m) <- byLang if l != "en")
      assert(en > m, s"target slice must outscore $l ($en vs $m) — " +
        "the selection signal is the point of the operator")
  }

  test("selection keeps exactly the per-source budget, in " +
      "(affinity, doc_id) order") {
    val rows = SparkEntry.queries("doc_affinity_select")(spark, Sf)
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Double]("affinity"), r.getAs[Long]("rk"),
        r.getAs[Long]("n_src"), r.getAs[Long]("selected")))
    rows.groupBy(_._1).foreach { case (src, g) =>
      val n = g.length.toLong
      assert(g.forall(_._5 === n), s"$src: n_src must be the group size")
      val budget = g.count(_._6 === 1L).toLong
      assert(budget === n * TextOps.AffKeepNum / TextOps.AffKeepDen,
        s"$src: selected count must be floor(n·Num/Den)")
      // selected = the first `budget` rows of the (affinity DESC,
      // doc_id) order — ranking and flag must agree
      val ordered = g.sortBy(r => (-r._3, r._2))
      ordered.zipWithIndex.foreach { case (r, i) =>
        assert(r._4 === i + 1L, s"$src: rank mismatch at ${r._2}")
        assert(r._6 === (if (i < budget) 1L else 0L),
          s"$src: selection flag disagrees with the order at ${r._2}")
      }
    }
  }

  test("threshold-form selection keeps the EXACT set the rank form " +
      "keeps (real corpus + planted boundary ties)") {
    // real corpus: affinities are mostly distinct, exercising the
    // pure-filter path
    def selectedSet(name: String, dir: String): Set[Long] =
      SparkEntry.queries(name)(spark, dir)
        .filter(col("selected") === 1L)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(selectedSet("doc_affinity_select_threshold", Sf) ==
      selectedSet("doc_affinity_select", Sf))
    // planted fixture: 7 of 10 docs share one text (one affinity tie
    // group) so the budget cut of floor(10·2/5)=4 lands INSIDE the
    // tie group — the boundary doc_id-rank path must fire and split
    // the ties exactly as the rank form does
    import spark.implicits._
    val dir = tmpDir("aff-threshold")
    val docs = (1L to 10L).map { i =>
      val t = if (i <= 7) "the quick brown fox jumps high today"
      else s"unique text body number $i with extra tokens $i"
      (i, t, if (i % 2 == 0) "en" else "de", "src0", t.length.toLong)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rankRows = SparkEntry.queries("doc_affinity_select")(spark, dir)
      .select("doc_id", "selected").as[(Long, Long)].collect().toMap
    val thrRows = SparkEntry
      .queries("doc_affinity_select_threshold")(spark, dir)
      .select("doc_id", "selected").as[(Long, Long)].collect().toMap
    assert(thrRows == rankRows)
    assert(thrRows.values.count(_ == 1L) == 4,
      "fixture budget must be floor(10*2/5)=4")
    // the tie group's selected members must be its smallest doc_ids —
    // proof the boundary rank path split ties deterministically
    val tieSel = (1L to 7L).filter(i => thrRows(i) == 1L)
    assert(tieSel == tieSel.sorted &&
      tieSel == (1L to tieSel.length.toLong))
  }

  test("threshold-form plan: no doc-level window buffers a source " +
      "partition — source-only windows see the histogram, doc_id " +
      "rides only the (source, affinity) tie window") {
    import org.apache.spark.sql.execution.window.WindowExec
    val qe = SparkEntry
      .queries("doc_affinity_select_threshold")(spark, Sf)
      .queryExecution
    val plan = qe.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    val windows = plan.collect { case w: WindowExec => w }
    assert(windows.nonEmpty, "expected the histogram + tie windows")
    windows.foreach { w =>
      val parts = w.partitionSpec.map(_.references.map(_.name).mkString)
      if (!parts.exists(_.contains("affinity")))
        assert(!w.child.output.exists(_.name == "doc_id"),
          "a source-partitioned window is buffering doc rows — the " +
            s"full-partition shape is back: ${w.child.output.map(_.name)}")
    }
  }

  test("model broadcasts; document text never transits a hash " +
      "exchange") {
    val qe = SparkEntry.queries("doc_target_affinity")(spark, Sf)
      .queryExecution
    val plan = qe.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    assert(plan.toString.contains("BroadcastHashJoin"),
      "the ≤FeatBuckets-row model must broadcast onto the scoring pass")
    val exchanges = plan.collect {
      case e: ShuffleExchangeExec
          if e.outputPartitioning.isInstanceOf[HashPartitioning] => e
    }
    assert(exchanges.nonEmpty, "expected the model-count shuffles")
    for (e <- exchanges; a <- e.output)
      assert(a.name != "text" && a.name != "bigram",
        "hash exchange must not carry document bytes: " +
          e.output.map(_.name))
  }
}
