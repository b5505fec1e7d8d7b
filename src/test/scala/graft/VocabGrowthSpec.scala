package graft

import org.apache.spark.sql.functions._

/** Pins for `tf_vocab_growth`: the decile curve must land exactly on
  * the corpus totals (cumulative vocab = distinct words, cumulative
  * tokens = all tokens), stay monotone, and code each word to its
  * FIRST decile.
  */
class VocabGrowthSpec extends SparkSpec {

  test("curve ends on the corpus totals and is monotone") {
    val rows = SparkEntry.queries("tf_vocab_growth")(spark, Sf)
      .orderBy("decade").collect()
    assert(rows.length == 10, "ten deciles")
    val docs = graft.sources.Tables.documents(spark, Sf)
    val toks = graft.functions.Hashing.tokens(col("text"))
    val direct = docs.select(explode(toks).as("w"))
      .agg(count(lit(1)), countDistinct(col("w"))).collect().head
    val last = rows.last
    assert(last.getAs[Long]("cum_tokens") == direct.getLong(0),
      "all tokens accounted for")
    assert(last.getAs[Long]("cum_vocab") == direct.getLong(1),
      "all distinct words accounted for")
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("cum_vocab") >= a.getAs[Long]("cum_vocab"))
      assert(b.getAs[Long]("cum_tokens") > a.getAs[Long]("cum_tokens"))
      assert(b.getAs[Double]("ttr") <= a.getAs[Double]("ttr") ||
        b.getAs[Long]("new_words") * a.getAs[Long]("cum_tokens") >
          a.getAs[Long]("cum_vocab") * (b.getAs[Long]("cum_tokens") -
            a.getAs[Long]("cum_tokens")),
        "ttr falls unless new-type flow outpaces token flow")
    }
    assert(rows.head.getAs[Long]("new_words") ==
      rows.head.getAs[Long]("cum_vocab"))
    val sumNew = rows.map(_.getAs[Long]("new_words")).sum
    assert(sumNew == last.getAs[Long]("cum_vocab"),
      "each word is new in exactly one decile")
  }
}
