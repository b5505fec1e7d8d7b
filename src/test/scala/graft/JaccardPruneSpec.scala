package graft

import org.apache.spark.sql.functions._

/** Pins for the Jaccard verify tier's exact size-ratio prune (round
  * 15): the bound J ≤ min(|A|,|B|)/max(|A|,|B|) itself (set-math
  * fuzz), a PLANTED LSH candidate pair whose shingle-set sizes break
  * the 2·min ≥ max bound and which the registered query elides, a
  * planted candidate at the EXACT bound (2·|A| = |B|, A ⊆ B) whose
  * jaccard lands on [[graft.operators.DedupOps.JaccardFloor]] on the
  * nose and survives, the prune-sizing audit over the same corpus,
  * and the live-corpus identity registered ≡ full-scorer ∘ predicate.
  *
  * Planting an LSH candidate with a hopeless size ratio is the hard
  * part — minhash banding makes dissimilar pairs collide rarely, which
  * is the point of LSH — so the fixtures are SEARCHED: both planted
  * docs share an 8-word head, and the test scans deterministic tails
  * with the engine's own bucket projection until one collides with
  * the head doc in some band. No hash constants are duplicated here;
  * if the hashing ever changes, the search re-finds a colliding tail.
  */
class JaccardPruneSpec extends SparkSpec {
  import graft.operators.DedupOps

  private val Head = "alpha bravo charlie delta echo foxtrot golf hotel"

  /** First tail (out of `tries`) of `n` distinct filler words whose
    * doc `head + tail` shares an LSH (band, bucket) with `head`. */
  private def findCollidingTail(head: String, n: Int,
      tries: Int): Option[String] = {
    import spark.implicits._
    val tails = (1 to tries).map(i =>
      i.toLong -> (1 to n).map(j => s"t${i}x$j").mkString(" "))
    val df = ((0L, head) +: tails.map { case (i, t) => (i, s"$head $t") })
      .toDF("doc_id", "text")
    val bk = DedupOps.bucketRows(df).select("doc_id", "band", "bucket")
    val hits = bk.as("a").join(bk.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") === 0L && col("b.doc_id") > 0L)
      .select(col("b.doc_id")).distinct().orderBy("doc_id")
      .collect().map(_.getLong(0))
    hits.headOption.map(i => tails(i.toInt - 1)._2)
  }

  test("the floor is the calibration grid's bottom — frozen together") {
    assert(DedupOps.JaccardFloor == DedupOps.SweepThresholds.head)
    assert(DedupOps.JaccardFloor == 0.5)
  }

  test("set-math fuzz: J <= min/max on arbitrary finite sets, so a " +
      "2*min < max pair can never reach the 0.5 floor") {
    val rnd = new scala.util.Random(150)
    (1 to 5000).foreach { _ =>
      val a = Set.fill(1 + rnd.nextInt(40))(rnd.nextInt(60))
      val b = Set.fill(1 + rnd.nextInt(40))(rnd.nextInt(60))
      val j = (a & b).size.toDouble / (a | b).size.toDouble
      val bound = math.min(a.size, b.size).toDouble /
        math.max(a.size, b.size).toDouble
      assert(j <= bound + 1e-15, s"J $j breaks bound $bound: $a vs $b")
      if (2 * math.min(a.size, b.size) < math.max(a.size, b.size))
        assert(j < 0.5, s"prunable pair scored $j")
    }
  }

  test("planted LSH candidates: the hopeless-size pair is elided " +
      "before the intersection; the exact-bound pair scores 0.5 on " +
      "the nose and survives; the audit proves the prune safe") {
    import spark.implicits._
    // hopeless: tail of 9 words -> 15 shingles vs the head's 6
    // (2*6 < 15, max possible J = 6/15 = 0.4)
    val hopelessTail = findCollidingTail(Head, 9, 400)
      .getOrElse(fail("no colliding 9-word tail in 400 tries — " +
        "statistically ~1e-40; did the band geometry change?"))
    // exact bound: a 10-word head (8 shingles) + 8-word tail -> 16
    // shingles, A ⊆ B, J = 8/16 — searched on ITS OWN head so the
    // collision is by construction, not luck
    val Head2 = s"india juliet $Head"
    val boundTail = findCollidingTail(Head2, 8, 400)
      .getOrElse(fail("no colliding 8-word tail in 400 tries"))
    val docs = Seq(
      (1L, Head),
      (2L, s"$Head $hopelessTail"),
      (10L, Head2),
      (11L, s"$Head2 $boundTail")) ++
      (20L to 25L).map(i => (i,
        (1 to 12).map(j => s"filler$i$j word$i$j").mkString(" ")))
    val dir = tmpDir("jaccard-prune")
    docs.map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")

    val cand = SparkEntry.queries("dedup_lsh_pairs")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((1L, 2L)),
      "searched hopeless pair must be an LSH candidate")
    assert(cand.contains((10L, 11L)),
      "searched exact-bound pair must be an LSH candidate")

    val scored = SparkEntry.queries("dedup_jaccard")(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r)
      .toMap
    assert(!scored.contains((1L, 2L)),
      "the hopeless-size candidate must be elided before the join")
    val kept = scored.get((10L, 11L))
      .getOrElse(fail("the exact-bound pair must survive the prune"))
    assert(kept.getAs[Double]("jaccard") == DedupOps.JaccardFloor,
      "A ⊆ B at 2|A| = |B| lands exactly on the floor — the kept edge")

    // ground truth: the full scorer shows the elided pair was sub-bar
    val full = DedupOps.jaccardScoredAll(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Double]("jaccard")).toMap
    assert(full((1L, 2L)) < DedupOps.JaccardFloor)

    // audit: buckets partition the candidate set, pruned max bound
    // sits under the floor, shares conserve
    val audit = SparkEntry.queries("dedup_jaccard_prune_audit")(spark, dir)
      .collect()
      .map(r => r.getAs[String]("tag") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Double]("max_j_bound"),
          r.getAs[Double]("share"))).toMap
    assert(audit.values.map(_._1).sum == cand.size,
      "kept + pruned must partition the candidate pair set exactly")
    assert(audit("pruned")._2 < DedupOps.JaccardFloor,
      "the pruned bucket's max theoretical J must sit under the floor " +
        "— this line IS the corpus-local safety proof")
    assert(math.abs(audit.values.map(_._3).sum - 1.0) < 1e-12)
    assert(audit("kept")._1 ==
      SparkEntry.queries("dedup_jaccard")(spark, dir).count(),
      "kept pairs are exactly the rows the verify tier emits")
  }

  test("live corpus: the registered tier is exactly the full scorer " +
      "restricted to size-feasible pairs — elision is the predicate, " +
      "nothing else") {
    val full = DedupOps.jaccardScoredAll(spark, Sf).collect()
      .map(r => ((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")),
        (r.getAs[Long]("n_inter"), r.getAs[Long]("n_union"),
          r.getAs[Double]("jaccard")))).toMap
    // recover each pair's set sizes from (n_inter, n_union): the
    // registered row set must equal the feasible subset of the full
    // scorer, with identical scores
    val sizesByDoc = {
      import org.apache.spark.sql.functions._
      graft.sources.Tables.documents(spark, Sf)
        .withColumn("toks", graft.functions.Hashing.tokens(col("text")))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"), explode(array_distinct(
          graft.functions.Hashing.shingles(col("toks")))).as("sh"))
        .groupBy("doc_id").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val expectKept = full.filter { case ((a, b), _) =>
      val (na, nb) = (sizesByDoc(a), sizesByDoc(b))
      2 * math.min(na, nb) >= math.max(na, nb)
    }
    val got = SparkEntry.queries("dedup_jaccard")(spark, Sf).collect()
      .map(r => ((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")),
        (r.getAs[Long]("n_inter"), r.getAs[Long]("n_union"),
          r.getAs[Double]("jaccard")))).toMap
    assert(got == expectKept)
  }
}
