package graft

import org.apache.spark.sql.functions._

/** Pins for `dedup_sorted_neighborhood`: the linear candidate-count
  * law (w·n − w(w+1)/2 pairs — the property that makes SN the
  * standard entity-resolution blocking), an exact driver mirror of
  * the window pairing, and the verdict routing.
  */
class SortedNeighborhoodSpec extends SparkSpec {

  test("pair set matches a driver mirror of the sorted window with " +
      "the length-ratio prune; generator law w*n - w(w+1)/2 holds " +
      "pre-prune and the prune bites") {
    val rows = SparkEntry.queries("dedup_sorted_neighborhood")(spark, Sf)
      .collect()
    assert(rows.nonEmpty)
    val w = graft.operators.DedupOps.SnWindow
    val keyed = graft.sources.Tables.documents(spark, Sf)
      .filter(length(col("text")) <= graft.operators.DedupOps.EditMaxLen)
      .select(col("doc_id"),
        substring(lower(regexp_replace(col("text"), "[^a-zA-Z0-9]", "")),
          1, graft.operators.DedupOps.SnKeyLen).as("skey"),
        octet_length(col("text")).as("blen"))
      .collect()
      .map(r => (r.getAs[String]("skey"), r.getAs[Long]("doc_id"),
        r.getAs[Int]("blen").toLong))
      .sortBy(t => (t._1, t._2))
    val n = keyed.length
    val generated = (for {
      i <- keyed.indices
      k <- 1 to w
      if i + k < n
    } yield (keyed(i), keyed(i + k)))
    assert(generated.size == w * n - w * (w + 1) / 2,
      "every doc pairs with its w successors; only the tail closes short")
    // the verify tier elides pairs the byte-length bound proves
    // sub-bar (jw <= 0.8 + 0.2*min/max < 0.9 when 2*min < max)
    val expected = generated
      .filter { case (a, b) =>
        2 * math.min(a._3, b._3) >= math.max(a._3, b._3) }
      .map { case (a, b) => (a._2, b._2) }.toSet
    assert(expected.size < generated.size,
      "the prune must drop at least one pair on this corpus, or the " +
        "test no longer exercises it")
    val got = rows
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(got == expected,
      "window pairing + length-ratio prune mirrors the sort exactly")
  }

  test("planted typo-dense twin: scattered one-char edits destroy " +
      "every shingle (LSH blind) but SN pairs it and JW verifies — " +
      "the recall case the operator exists for") {
    import spark.implicits._
    val words = (1 to 40).map(i => f"word$i%02dbodypart")
    val clean = words.mkString(" ")
    // every THIRD word (from the fourth on, keeping the sort-key head
    // intact) gets one inner char swapped: every 3 consecutive words
    // contain an edit, so every shingle but the head triple dies
    // (set Jaccard ~0.01, far under the LSH S-curve), while the
    // strings stay ~97% char-identical (JW 0.906, DuckDB-probed)
    val typoed = words.zipWithIndex.map { case (w, i) =>
      if (i >= 3 && i % 3 == 0) w.updated(6, 'x') else w
    }.mkString(" ")
    val docs = Seq((1L, clean), (2L, typoed)) ++
      (10L to 15L).map(i => (i,
        (1 to 15).map(j => s"filler$i$j unrelated$i$j").mkString(" ")))
    val dir = tmpDir("sn-planted")
    docs.map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val sn = SparkEntry.queries("dedup_sorted_neighborhood")(spark, dir)
      .collect()
    val pair = sn.find(r => r.getAs[Long]("doc_a") == 1L &&
      r.getAs[Long]("doc_b") == 2L)
    assert(pair.isDefined, "the shared head key makes them neighbors")
    assert(pair.get.getAs[Double]("jw") >= 0.9, "JW sees the twin")
    assert(pair.get.getAs[String]("verdict") == "dup")
    val lsh = SparkEntry.queries("dedup_lsh_pairs")(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    assert(!lsh.contains((1L, 2L)),
      "shingle MinHash cannot see a typo-dense twin")
    val overlap = SparkEntry.queries("dedup_blocking_overlap")(spark, dir)
      .collect()
      .find(_.getAs[String]("tag") == "sn_only")
    assert(overlap.isDefined && overlap.get.getAs[Long]("n_dup") >= 1L,
      "the audit reports the recall LSH left on the table")
  }

  test("planted shard-boundary pairs: the registered range-sharded " +
      "plan finds pairs its partitioned window alone cannot see, " +
      "including a hop OVER a one-row shard, and equals the global " +
      "audit form exactly") {
    import spark.implicits._
    // five docs whose normalized sort keys land in three different
    // 2-char prefix shards: aa{1,2} | ab{3} | ac{4,5}. With w = 3 the
    // global pairing must produce (2,3) and (3,4) across adjacent
    // boundaries and (2,4)/(2,5) hopping over the ONE-ROW shard ab —
    // pairs a shard-partitioned window can never emit, so their
    // presence proves the w-row boundary overlap, and set equality
    // with the audit (global-window) form proves the decomposition.
    val docs = Seq(
      (1L, "aaa alpha body text"),
      (2L, "aab beta body text"),
      (3L, "abc gamma body text"),
      (4L, "aca delta body text"),
      (5L, "acb epsilon body text"))
    val dir = tmpDir("sn-boundary")
    docs.map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    def pairsOf(name: String) =
      SparkEntry.queries(name)(spark, dir).collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
        .toSeq
    val sharded = pairsOf("dedup_sorted_neighborhood")
    val audit = pairsOf("dedup_sorted_neighborhood_audit")
    assert(sharded == audit, "range-sharded == global window, rows and order")
    val expected = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (2L, 5L), (3L, 4L), (3L, 5L), (4L, 5L))
    assert(sharded.sorted == expected,
      "w*n - w(w+1)/2 pairs over the planted key order")
    assert(sharded.contains((2L, 4L)) && sharded.contains((2L, 5L)),
      "pairs hopping over the one-row shard 'ab' must survive")
  }

  test("multi-pass: a planted edited-head/stable-tail twin is " +
      "invisible to the head-key pass, paired by the tail-key pass, " +
      "tagged tail_only, and verified — plus per-pass partition laws") {
    import spark.implicits._
    // the dual of the typo-dense-twin recall case: the FIRST word is
    // rewritten (destroying the head sort key and the Winkler prefix
    // boost) while the tail is untouched. The tail is DISTINCT-char
    // on purpose: Jaro's greedy matcher scrambles repeated characters
    // into transpositions (a 1-char head edit on a 40-word repetitive
    // tail scores only ~0.83, DuckDB-probed), while an all-distinct
    // tail matches in order — jw 0.95 here, above the dup bar with
    // the boost gone
    val tail = "0123456789 bcdefghijklmnopqrstuvwxyz"
    val a = s"aaa $tail"
    val b = s"zzz $tail"
    val docs = Seq((1L, a), (2L, b)) ++
      (10L to 15L).map(i => (i,
        (1 to 15).map(j => s"filler$i$j unrelated$i$j").mkString(" ")))
    val dir = tmpDir("sn-multipass")
    docs.map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val single = SparkEntry.queries("dedup_sorted_neighborhood")(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(!single.contains((1L, 2L)) && !single.contains((2L, 1L)),
      "the head-key pass must NOT see the edited-head twin (else " +
        "this corpus no longer tests the second pass)")
    val multi = SparkEntry.queries("dedup_sn_multipass")(spark, dir)
      .collect()
    val pair = multi.find(r => r.getAs[Long]("doc_a") == 1L &&
      r.getAs[Long]("doc_b") == 2L)
    assert(pair.isDefined, "the reversed-key pass must pair the twin")
    assert(pair.get.getAs[String]("passes") == "tail_only")
    assert(pair.get.getAs[Double]("jw") >= 0.9)
    assert(pair.get.getAs[String]("verdict") == "dup")
    // partition laws: head_only + both = the single-pass pair set
    val headTagged = multi.filter(r =>
      r.getAs[String]("passes") != "tail_only")
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val singleNorm = single.map { case (x, y) =>
      (math.min(x, y), math.max(x, y)) }
    assert(headTagged == singleNorm,
      "head_only ∪ both must equal the single-pass pair set exactly")
  }

  test("jw in [0,1]; verdict routes on the 0.9 threshold") {
    SparkEntry.queries("dedup_sorted_neighborhood")(spark, Sf)
      .collect().foreach { r =>
        val jw = r.getAs[Double]("jw")
        assert(jw >= 0.0 && jw <= 1.0)
        assert(r.getAs[String]("verdict") ==
          (if (jw >= 0.9) "dup" else "distinct"))
      }
  }
}
