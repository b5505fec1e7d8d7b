package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{EventOps, SimilarityOps, TextOps}

/** The round-9 closing trio: integer fixed-point PageRank
  * (`ev_type_pagerank`), priority weighted sampling
  * (`doc_sample_weighted`), and the JL sign projection
  * (`emb_rand_proj`). The oracle gate proves Spark ≡ DuckDB on the
  * same arithmetic; these tests prove the arithmetic does what the
  * operator claims — full driver-side reference recomputations for
  * all three (the DsirSpec convention), plus the statistical /
  * structural properties mirrored arithmetic cannot check.
  */
class RankProjSampleSpec extends SparkSpec {

  import spark.implicits._

  // ------------------------------------------------------------------
  // ev_type_pagerank
  // ------------------------------------------------------------------

  /** Full driver-side reference of the integer fixed-point power
    * iteration, from raw (user, event_id, ts_sec, type) rows — every
    * operation mirrors the engine's integer formula exactly. */
  private def refPagerank(
      rows: Seq[(Long, Long, Long, String)]): Map[String, Long] = {
    val E = EventOps.PrEdgeScale
    val edges = collection.mutable.Map[(String, String), Long]()
      .withDefaultValue(0L)
    rows.groupBy(_._1).values.foreach { es =>
      es.sortBy(e => (e._3, e._2)).map(_._4).sliding(2).foreach {
        case Seq(a, b) => edges((a, b)) += 1L
        case _         =>
      }
    }
    val nodes = rows.map(_._4).distinct.sorted
    val n = nodes.size.toLong
    val tw = edges.groupBy(_._1._1)
      .map { case (src, m) => src -> m.values.sum }
    // share rows: quantized real edges + uniform dangling fan-out
    // (disjoint by construction — a dangling source has no real edge)
    val share = collection.mutable.ArrayBuffer[(String, String, Long)]()
    edges.foreach { case ((u, v), w) => share += ((u, v, w * E / tw(u))) }
    nodes.filterNot(tw.contains)
      .foreach(u => nodes.foreach(v => share += ((u, v, E / n))))
    val init = EventOps.PrScale / n
    val base = (EventOps.PrScale * 15L / 100L) / n
    var rank = nodes.map(_ -> init).toMap
    for (_ <- 1 to EventOps.PrIters) {
      val sums = collection.mutable.Map[String, Long]().withDefaultValue(0L)
      share.foreach { case (u, v, sh) => sums(v) += rank(u) * sh / E }
      rank = nodes.map(v =>
        v -> (base + EventOps.PrDampNum * sums(v) / 100L)).toMap
    }
    rank
  }

  private def eventRows(sfDir: String): Seq[(Long, Long, Long, String)] =
    graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"),
        expr("unix_timestamp(ts)").as("ts_sec"), col("event_type"))
      .as[(Long, Long, Long, String)].collect().toSeq

  test("pagerank matches the driver-side integer reference bit-for-bit") {
    val got = EventOps.evTypePagerank(spark, Sf)
      .select(col("event_type"), col("rank_scaled"))
      .as[(String, Long)].collect().toMap
    val want = refPagerank(eventRows(Sf))
    assert(got == want)
  }

  test("pagerank conserves rank mass up to quantization floors") {
    val total = EventOps.evTypePagerank(spark, Sf)
      .agg(sum(col("rank_scaled"))).as[Long].collect().head
    assert(total <= EventOps.PrScale,
      "integer floors can only LOSE mass; a surplus means the " +
        "arithmetic drifted from the 0.15/0.85 split")
    assert(total >= EventOps.PrScale * 99L / 100L,
      s"lost more than 1% of rank mass to quantization: $total")
  }

  test("dangling and in-edge-free nodes survive the iteration " +
      "(synthetic fixture)") {
    val dir = tmpDir("pr-dangling")
    // u1: a→b, u2: b→z; type z never transitions out (dangling), type
    // c occurs once with no transitions at all (dangling AND no
    // in-edges), type a has out-edges but no in-edges
    val rows = Seq(
      (1L, 10L, 1L, "a"), (2L, 20L, 1L, "b"),
      (3L, 10L, 2L, "b"), (4L, 20L, 2L, "z"),
      (5L, 10L, 3L, "c"))
    rows.toDF("event_id", "ts_sec", "user_id", "event_type")
      .select(col("event_id"), timestamp_seconds(col("ts_sec")).as("ts"),
        col("user_id"), col("event_type"), lit(1.0).as("value"),
        lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val fixtureRows = rows.map(r => (r._3, r._1, r._2, r._4))
    val tw = Set("a", "b") // sources with real out-edges
    assert(fixtureRows.map(_._4).distinct.count(t => !tw.contains(t)) == 2,
      "fixture no longer exercises the dangling-node path")
    val got = EventOps.evTypePagerank(spark, dir)
      .select(col("event_type"), col("rank_scaled"))
      .as[(String, Long)].collect().toMap
    assert(got == refPagerank(fixtureRows))
    assert(got.keySet == Set("a", "b", "c", "z"),
      "a node dropped out of the rank relation")
    // 'a' and 'c' have no in-edges: a receives base + dangling-share
    // only, and both must still hold positive rank
    assert(got.values.forall(_ > 0L))
  }

  // ------------------------------------------------------------------
  // doc_sample_weighted
  // ------------------------------------------------------------------

  test("weighted sample equals the window-rank mirror and splits " +
      "exactly at the priority threshold") {
    val sf01 = "/root/testdata/sf0.01"
    val all = graft.sources.Tables.documents(spark, sf01)
      .select(col("doc_id"),
        (graft.functions.Hashing.charHash(col("doc_id").cast("string"))
          .cast("double") / col("n_chars").cast("double")).as("priority"))
    val mirror = all
      .withColumn("rk", row_number().over(
        Window.orderBy(col("priority"), col("doc_id"))))
      .filter(col("rk") <= TextOps.WeightedSampleK)
      .select(col("doc_id"), col("priority"))
    val got = TextOps.docSampleWeighted(spark, sf01)
      .select(col("doc_id"), col("priority"))
    assert(got.collect().toSet === mirror.collect().toSet)
    val maxSel = got.agg(max(col("priority"))).as[Double].collect().head
    val minUnsel = all.join(got.select("doc_id"), Seq("doc_id"), "left_anti")
      .agg(min(col("priority"))).as[Double].collect().head
    assert(maxSel <= minUnsel,
      "a selected doc has higher priority than an unselected one")
  }

  test("weighted sample is the whole corpus when k >= n") {
    val dir = tmpDir("weighted-small")
    (1L to 30L).map(i => (i, "t", "en", "s", 100L + i))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(TextOps.docSampleWeighted(spark, dir).count() == 30L)
  }

  test("a zero-weight doc is excluded by contract, never ranked by " +
      "IEEE +Inf/NaN priority") {
    val dir = tmpDir("weighted-zero")
    ((1L to 30L).map(i => (i, "t", "en", "s", 100L + i)) :+
        ((99L, "", "en", "s", 0L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val ids = TextOps.docSampleWeighted(spark, dir)
      .select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(99L),
      "a weight-0 doc entered the weighted draw")
    assert(ids == (1L to 30L).toSet)
    val quotaIds = TextOps.docSampleWeightedQuota(spark, dir)
      .select("doc_id").as[Long].collect().toSet
    assert(!quotaIds.contains(99L))
  }

  test("selection probability is proportional to weight " +
      "(synthetic two-tier fixture)") {
    val dir = tmpDir("weighted-fixture")
    // 1000 docs: even ids weight 10000, odd ids weight 100 — a 100:1
    // weight ratio means the k=100 sample should be nearly all heavy
    val docs = (1L to 1000L).map { i =>
      val w = if (i % 2 == 0) 10000L else 100L
      (i, "t", "en", "s", w)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val sel = TextOps.docSampleWeighted(spark, dir)
      .select(col("doc_id")).as[Long].collect()
    assert(sel.length == TextOps.WeightedSampleK)
    val heavy = sel.count(_ % 2 == 0)
    assert(heavy >= 90,
      s"only $heavy/100 heavy docs drawn under a 100:1 weight ratio — " +
        "priority sampling is not weighting")
  }

  test("streaming weighted reservoir equals the batch sample " +
      "bit-for-bit") {
    val sf01 = "/root/testdata/sf0.01"
    val batch = TextOps.docSampleWeighted(spark, sf01).collect().toSeq
    val stream = graft.operators.StreamOps
      .streamSampleWeighted(spark, sf01).collect().toSeq
    assert(stream == batch)
  }

  test("STRATIFIED streaming reservoir equals the batch per-language " +
      "quota bit-for-bit") {
    val sf01 = "/root/testdata/sf0.01"
    val batch = TextOps.docSampleWeightedQuota(spark, sf01)
      .collect().toSeq
    val stream = graft.operators.StreamOps
      .streamSampleWeightedQuota(spark, sf01).collect().toSeq
    assert(stream == batch)
  }

  test("weighted sample plan is TakeOrderedAndProject over a pruned " +
      "scan — never a global sort") {
    val plan = TextOps.docSampleWeighted(spark, "/root/testdata/sf0.01")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
    assert(!plan.contains("Exchange"),
      "the top-k must ride per-partition bounded heaps, not a shuffle")
  }

  test("stratified weighted quota: per-language budgets respected, " +
      "plan rides WindowGroupLimit") {
    val sf01 = "/root/testdata/sf0.01"
    val df = TextOps.docSampleWeightedQuota(spark, sf01)
    val perLang = df.groupBy("lang").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val langSizes = graft.sources.Tables.documents(spark, sf01)
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(perLang.keySet == langSizes.keySet,
      "a language dropped out of the stratified draw")
    perLang.foreach { case (lang, n) =>
      assert(n == math.min(TextOps.WeightedQuotaK.toLong, langSizes(lang)),
        s"$lang drew $n of budget ${TextOps.WeightedQuotaK}")
    }
    // every drawn doc outranks (by priority) every undrawn same-lang doc
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      "the per-lang cap must ride a bounded per-key heap")
  }

  // ------------------------------------------------------------------
  // emb_rand_proj
  // ------------------------------------------------------------------

  private def projected(sfDir: String): Map[Long, Array[Double]] =
    SimilarityOps.embRandProj(spark, sfDir).collect().map { r =>
      r.getLong(0) -> (1 to SimilarityOps.ProjDims)
        .map(j => r.getDouble(j)).toArray
    }.toMap

  private def embeddings(sfDir: String): Map[Long, Array[Float]] =
    graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toMap

  test("projection equals the driver-side signed-sum fold bit-for-bit") {
    val vecs = embeddings(Sf)
    val got = projected(Sf)
    assert(got.keySet == vecs.keySet)
    got.foreach { case (id, p) =>
      val x = vecs(id)
      (0 until SimilarityOps.ProjDims).foreach { j =>
        var s = 0.0
        var i = 0
        while (i < x.length) {
          s += x(i).toDouble * SimilarityOps.ProjSigns(j)(i).toDouble
          i += 1
        }
        assert(p(j) == s, s"vec $id dim $j: ${p(j)} != $s")
      }
    }
  }

  test("JL fidelity: projected inner products correlate with the " +
      "original-space inner products") {
    val vecs = embeddings(Sf)
    val proj = projected(Sf)
    val ids = vecs.keySet.toSeq.sorted.take(40)
    def dotD(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    val pairs = for {
      ai <- ids.indices; bi <- (ai + 1) until ids.size
    } yield {
      val (a, b) = (ids(ai), ids(bi))
      val orig = vecs(a).zip(vecs(b))
        .map { case (x, y) => x.toDouble * y.toDouble }.sum
      val est = dotD(proj(a), proj(b)) / SimilarityOps.ProjDims
      (orig, est)
    }
    val n = pairs.size.toDouble
    val (mx, my) = (pairs.map(_._1).sum / n, pairs.map(_._2).sum / n)
    val cov = pairs.map { case (x, y) => (x - mx) * (y - my) }.sum
    val vx = pairs.map(p => (p._1 - mx) * (p._1 - mx)).sum
    val vy = pairs.map(p => (p._2 - my) * (p._2 - my)).sum
    val corr = cov / math.sqrt(vx * vy)
    // measured 0.304 on the sf0.001 fixture (8 dims from 64 — JL
    // variance 1/8 dominates near-orthogonal pairs); deterministic,
    // pinned with margin
    assert(corr > 0.2,
      s"projection no longer preserves inner products: corr=$corr")
  }

  test("projected rerank = driver-side shortlist-then-rerank " +
      "reference, bit-for-bit") {
    val vecs = embeddings(Sf)
    val proj = projected(Sf)
    val nq = SimilarityOps.NQueries.toLong
    val queries = vecs.keySet.filter(_ < nq).toSeq.sorted
    val cands = vecs.keySet.filter(_ >= nq).toSeq.sorted
    def chain(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0
      (0 until SimilarityOps.ProjDims).foreach(j => s = s + a(j) * b(j))
      s
    }
    def fdot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0
      a.indices.foreach(i => s += a(i).toDouble * b(i).toDouble)
      s
    }
    val want = queries.flatMap { q =>
      val short = cands
        .filter(c => chain(proj(c), proj(c)) > 0.0)
        .map { c =>
          val pc = chain(proj(q), proj(c)) /
            (math.sqrt(chain(proj(q), proj(q))) *
              math.sqrt(chain(proj(c), proj(c))))
          (c, pc)
        }
        .sortBy { case (c, pc) => (-pc, c) }
        .take(SimilarityOps.ProjShortlist)
      short
        .map { case (c, _) =>
          val cos = fdot(vecs(q), vecs(c)) /
            (math.sqrt(fdot(vecs(q), vecs(q))) *
              math.sqrt(fdot(vecs(c), vecs(c))))
          (c, cos)
        }
        .sortBy { case (c, cos) => (-cos, c) }
        .take(SimilarityOps.TopK)
        .zipWithIndex
        .map { case ((c, cos), i) => (q, (i + 1).toLong, c, cos) }
    }
    val got = SimilarityOps.annProjRerank(spark, Sf)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == want)
  }

  test("projected-search recall floor holds on the gate fixture") {
    val mean = SimilarityOps.annProjRecall(spark, "/root/testdata/sf0.01")
      .agg(avg(col("recall"))).as[Double].collect().head
    // measured 0.15 — mid-family on this near-random corpus (LSH
    // 0.0, IVFADC 0.05, PQ 0.075, IVF 0.25); the gate exists to
    // MEASURE the loss, the pin catches a silent collapse to zero
    assert(mean >= 0.1, s"projected-search recall collapsed: $mean")
  }

  test("a zero-norm candidate never squats a shortlist slot " +
      "(planted zero embedding)") {
    // a zero vector projects to 8 zeros -> pcos NaN -> NaN sorts
    // LARGEST under DESC; without the guard it would enter EVERY
    // query's shortlist
    val dir = tmpDir("proj-zero")
    val n = SimilarityOps.NQueries + 20
    val rows = (0L until n.toLong).map { i =>
      val v =
        if (i == SimilarityOps.NQueries.toLong + 3L)
          Array.fill(SimilarityOps.Dims)(0.0f)
        else Array.tabulate(SimilarityOps.Dims)(j =>
          math.sin(i * 31.0 + j).toFloat)
      (i, v, (i % 3).toInt)
    }
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r =>
        org.apache.spark.sql.Row(r._1, r._2.toSeq, r._3))), schema)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val zeroId = SimilarityOps.NQueries.toLong + 3L
    val out = SimilarityOps.annProjRerank(spark, dir)
      .select(col("cand_id")).as[Long].collect()
    assert(!out.contains(zeroId),
      "the zero-norm candidate reached the rerank output")
    assert(out.nonEmpty)
  }

  test("a zero-norm QUERY emits no shortlist rows instead of a " +
      "NaN-ranked cand_id-ordered one (planted zero query embedding)") {
    // round-10 advisory symmetry closure: a zero-projection query
    // makes pcos NaN for EVERY candidate — deterministic but
    // meaningless; the defined fallback excludes the query from the
    // projected tier entirely
    val dir = tmpDir("proj-zero-query")
    val zeroQ = 2L
    val n = SimilarityOps.NQueries + 20
    val rows = (0L until n.toLong).map { i =>
      val v =
        if (i == zeroQ) Array.fill(SimilarityOps.Dims)(0.0f)
        else Array.tabulate(SimilarityOps.Dims)(j =>
          math.sin(i * 31.0 + j).toFloat)
      (i, v, (i % 3).toInt)
    }
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r =>
        org.apache.spark.sql.Row(r._1, r._2.toSeq, r._3))), schema)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SimilarityOps.annProjRerank(spark, dir)
      .select(col("query_id")).as[Long].collect()
    assert(!out.contains(zeroQ),
      "the zero-projection query must emit no projected-tier rows")
    assert(out.nonEmpty,
      "healthy queries must still be served")
  }

  test("projection plan is scan+project; the only exchange is the " +
      "gate output's presentation sort") {
    val plan = SimilarityOps.embRandProj(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_float_dot"))
    assert(!plan.contains("Join"), "a pure projection must not join")
    assert(plan.split("Exchange").length - 1 <= 1,
      "more than the single presentation-sort exchange")
  }
}
