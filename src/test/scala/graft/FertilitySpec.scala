package graft

/** Pins for `tf_fertility`: the cross-query conservation law against
  * `tf_bpe_encode` (the same trained tokenizer priced two ways must
  * count the same tokens), corpus word conservation, and the
  * fertility ≥ 1 invariant (a word is never fewer than one symbol).
  */
class FertilitySpec extends SparkSpec {

  test("per-language totals conserve the corpus: sum over langs of " +
      "(words, bpe tokens) equals the encode report's freq-weighted sums") {
    val fert = SparkEntry.queries("tf_fertility")(spark, Sf).collect()
    assert(fert.nonEmpty)
    val enc = SparkEntry.queries("tf_bpe_encode")(spark, Sf).collect()
    val encWords = enc.map(r => r.getAs[Long]("freq")).sum
    val encSymbols =
      enc.map(r => r.getAs[Long]("freq") * r.getAs[Long]("n_symbols")).sum
    assert(fert.map(_.getAs[Long]("n_words")).sum == encWords)
    assert(fert.map(_.getAs[Long]("n_bpe_tokens")).sum == encSymbols)
  }

  test("fertility >= 1 (a word is at least one symbol) and the ratio " +
      "columns are the exact division of the integer sums") {
    SparkEntry.queries("tf_fertility")(spark, Sf).collect().foreach { r =>
      val w = r.getAs[Long]("n_words")
      val t = r.getAs[Long]("n_bpe_tokens")
      val b = r.getAs[Long]("n_word_bytes")
      assert(t >= w, "every word is >= 1 BPE symbol")
      assert(r.getAs[Double]("fertility") == t.toDouble / w.toDouble)
      assert(r.getAs[Double]("bytes_per_bpe") == b.toDouble / t.toDouble)
    }
  }
}
