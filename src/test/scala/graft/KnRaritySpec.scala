package graft

import org.apache.spark.sql.functions._

/** Pins for `doc_kn_rarity` — the bigram-LM (perplexity-filter
  * analog) document gate: a planted corpus where BOTH decision arms
  * fire (the gated corpus is clean — max rare_rate 10% at sf0.1
  * against the 25% bar — so without this plant the quarantine arm
  * would be dead code), plus the conservation and absence laws.
  */
class KnRaritySpec extends SparkSpec {

  test("planted word salad quarantines; fluent docs on the same " +
      "vocabulary are admitted") {
    import spark.implicits._
    // 40 fluent docs hammer the same transitions, making 'the' a
    // heavy left context (c_w1 large) and its continuations common;
    // the salad doc reuses the SAME common head word before unique
    // junk tails, so every salad bigram is a singleton continuation
    // of a heavy context: p_kn ~ 0.25/c_w1 + eps, far under the
    // 2^-10 bar exactly like real nonsense-order text under a real
    // corpus LM
    val fluent = (1L to 40L).map(i =>
      (i, ("the cat sat on the mat and " * 8).trim))
    val salad = (100L, (1 to 30).map(j => s"the qzx$j").mkString(" "))
    val short = (200L, "loneword")
    val docs = fluent :+ salad :+ short
    val dir = tmpDir("kn-rarity")
    docs.map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("doc_kn_rarity")(spark, dir).collect()
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(100L).getAs[String]("decision") == "quarantined_rare",
      s"salad rare_rate ${byId(100L).getAs[Double]("rare_rate")} must " +
        "cross the 25% bar")
    assert(fluent.forall { case (id, _) =>
      byId(id).getAs[String]("decision") == "admitted" })
    assert(!byId.contains(200L),
      "a doc with < 2 tokens has no bigrams and must be absent")
    // conservation: n_rare <= n_bigrams; rate = n_rare/n_bigrams
    rows.foreach { r =>
      val (nb, nr) = (r.getAs[Long]("n_bigrams"), r.getAs[Long]("n_rare"))
      assert(nr >= 0L && nr <= nb)
      assert(math.abs(r.getAs[Double]("rare_rate") -
        nr.toDouble / nb.toDouble) < 1e-15)
    }
  }

  test("per-doc bigram counts conserve against the corpus rollup " +
      "at sf0.001") {
    val perDoc = SparkEntry.queries("doc_kn_rarity")(spark, Sf)
      .agg(sum(col("n_bigrams"))).collect().head.getLong(0)
    // total bigram occurrences = sum over docs of (n_tokens - 1) for
    // docs with >= 2 tokens (the LIMIT-50 tf_kn_prob report cannot
    // serve as the rollup witness)
    val toks = graft.sources.Tables.documents(spark, Sf)
      .select(size(graft.functions.Hashing.tokens(col("text")))
        .cast("long").as("n"))
      .filter(col("n") >= 2L)
      .agg(sum(col("n") - 1L)).collect().head.getLong(0)
    assert(perDoc == toks,
      "every bigram occurrence lands in exactly one doc's count")
  }
}
