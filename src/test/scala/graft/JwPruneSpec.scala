package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Pins for the SN verify tier's exact length-ratio prune (round
  * 14): the bound jw ≤ 0.8 + 0.2·(min_bytes/max_bytes) itself, a
  * planted hopeless-ratio pair whose direct-kernel score lands under
  * the 0.9 dup bar and which the production query elides, a planted
  * pair at the EXACT bound (2·min = max) that scores 0.9 on the nose
  * and survives as a dup, and a seeded fuzz confirming no prunable
  * pair ever reaches the bar.
  */
class JwPruneSpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    graft.functions.EditExprs.jaroWinkler(
      UTF8String.fromString(a), UTF8String.fromString(b))

  // shared 12-char normalized sort-key head so SN makes the planted
  // docs window neighbors regardless of their tails
  private val Head = "aaaheadkey00"

  test("planted pairs: hopeless ratio is sub-bar and elided; the " +
      "exact 2*min = max bound scores 0.9 on the nose and survives") {
    import spark.implicits._
    // hopeless: b extends a past the 2x byte bound (2*20 < 41)
    val hopelessA = Head + "bcdefghi" // 20 bytes
    val hopelessB = hopelessA + "jklmnopqrstuvwxyz0123" // 41 bytes
    assert(2 * hopelessA.length < hopelessB.length)
    assert(jw(hopelessA, hopelessB) < 0.9,
      "the bound promises a 2*min < max pair cannot reach the bar")
    // exact bound: d = c plus a distinct-char tail to exactly 2x
    // bytes — m = min, t = 0, jaro = (1 + 1/2 + 1)/3, full 4-byte
    // Winkler boost → jw = 0.9 exactly (the kept edge of the prune)
    val boundC = Head + "bcdefghi" // 20 bytes
    val boundD = boundC + "jklmnopqrstuvwxyz012" // 40 bytes
    assert(2 * boundC.length == boundD.length)
    assert(math.abs(jw(boundC, boundD) - 0.9) < 1e-12,
      s"exact-bound pair must score 0.9, got ${jw(boundC, boundD)}")
    val docs = Seq((1L, hopelessA), (2L, hopelessB),
      (3L, "bbb" + boundC), (4L, "bbb" + boundD)) ++
      (10L to 15L).map(i => (i,
        (1 to 15).map(j => s"filler$i$j unrelated$i$j").mkString(" ")))
    val dir = tmpDir("jw-prune")
    docs.map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("dedup_sorted_neighborhood")(spark, dir)
      .collect()
    val pairs = rows
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(!pairs.contains((1L, 2L)) && !pairs.contains((2L, 1L)),
      "the hopeless-ratio neighbor pair must be elided before the kernel")
    val kept = rows.find(r => r.getAs[Long]("doc_a") == 3L &&
      r.getAs[Long]("doc_b") == 4L)
    assert(kept.isDefined, "the exact-bound pair must survive the prune")
    assert(kept.get.getAs[Double]("jw") >= 0.9 &&
      kept.get.getAs[String]("verdict") == "dup",
      "…and it is exactly the pair the bound exists to keep")
    // the multipass consumer shares the tier: same elision, same keep
    val multi = SparkEntry.queries("dedup_sn_multipass")(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(!multi.contains((1L, 2L)))
    assert(multi.contains((3L, 4L)))
  }

  test("prune-sizing audit: buckets partition the generator's pair " +
      "set, the pruned bucket's max bound sits under the dup bar, " +
      "shares conserve") {
    val rows = SparkEntry.queries("dedup_sn_prune_audit")(spark, Sf)
      .collect()
      .map(r => r.getAs[String]("tag") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Double]("max_jw_bound"),
          r.getAs[Double]("share"))).toMap
    val generated =
      graft.operators.DedupOps.snPairsSharded(spark, Sf).count()
    assert(rows.values.map(_._1).sum == generated,
      "kept + pruned must partition the generated pair set exactly")
    assert(rows.contains("pruned"),
      "the gate corpus must exercise the prune, or this audit is vacuous")
    assert(rows("pruned")._2 < 0.9,
      "the pruned bucket's max theoretical jw must sit under the bar " +
        "— this line IS the corpus-local safety proof")
    assert(math.abs(rows.values.map(_._3).sum - 1.0) < 1e-12)
    // the kept bucket equals the registered query's row count
    val kept = SparkEntry.queries("dedup_sorted_neighborhood")(spark, Sf)
      .count()
    assert(rows("kept")._1 == kept,
      "kept pairs are exactly the rows the verify tier emits")
  }

  test("fuzz: jw <= 0.8 + 0.2*min/max on arbitrary byte pairs, so " +
      "no prunable pair reaches 0.9") {
    val rnd = new scala.util.Random(140)
    // small alphabet + shared prefixes push jaro HIGH — the regime
    // where a too-tight bound would be caught
    val alpha = "abcd"
    def mk(n: Int): String =
      (1 to n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    (1 to 2000).foreach { _ =>
      val base = mk(1 + rnd.nextInt(60))
      val other =
        if (rnd.nextBoolean()) base.take(1 + rnd.nextInt(base.length)) +
          mk(rnd.nextInt(80))
        else mk(1 + rnd.nextInt(80))
      val (la, lb) = (base.length.toDouble, other.length.toDouble)
      val bound = 0.8 + 0.2 * (math.min(la, lb) / math.max(la, lb))
      val v = jw(base, other)
      assert(v <= bound + 1e-12,
        s"jw $v breaks bound $bound for '$base' vs '$other'")
      if (2 * math.min(la, lb) < math.max(la, lb))
        assert(v < 0.9, s"prunable pair scored $v: '$base' vs '$other'")
    }
  }
}
