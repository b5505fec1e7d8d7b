package graft

import graft.operators.TextOps

/** Pins for `tf_ngram_novelty`: hand-computed fractions on a planted
  * re-spin chain, the exact-duplicate zero, and the corpus-level
  * conservation law (every distinct shingle is novel exactly once).
  */
class NgramNoveltySpec extends SparkSpec {

  private def fixture(): String = {
    val docs = Seq(
      (1L, "a b c d"),       // shingles {abc, bcd} — both novel
      (2L, "a b c e"),       // {abc seen, bce novel} — novelty 1/2
      (3L, "a b c d"),       // exact re-spin — novelty 0
      (4L, "x y"))           // under 3 tokens — absent from output
      .map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
    val dir = tmpDir("novelty-planted")
    import spark.implicits._
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  test("planted re-spin chain scores exactly") {
    val got = TextOps.tfNgramNovelty(spark, fixture()).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("n_novel"),
          r.getAs[Double]("novelty")))).toMap
    assert(got == Map(
      1L -> ((2L, 2L, 1.0)),
      2L -> ((2L, 1L, 0.5)),
      3L -> ((2L, 0L, 0.0))), s"got $got")
  }

  test("novelty gate: a planted re-spin routes to derivative, fresh " +
      "content admits") {
    def tag(id: Long): Long = {
      var h = 0L
      id.toString.foreach(c => h = (h * 31 + c.toLong) % 2147483647L)
      h % 10
    }
    val addIds = (0L to 5000L)
      .filter(tag(_) == graft.operators.DedupOps.AddTag)
    val corpusIds = (0L to 5000L).filter(tag(_) == 0L)
    val template = (1 to 20).map(j => s"base$j").mkString(" ")
    // re-spin: 19 of 20 words shared with the template -> 2 novel
    // shingles of 18 -> novelty 1/9 < 1/4; fresh: all-novel words
    val respin = ((1 to 19).map(j => s"base$j") :+ "twist").mkString(" ")
    val fresh = (1 to 20).map(j => s"novel$j").mkString(" ")
    val docs = Seq(
      (corpusIds(0), template),
      (addIds(0), respin),
      (addIds(1), fresh))
      .map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
    val raw = tmpDir("novelty-gate-raw")
    val dir = tmpDir("novelty-gate")
    import spark.implicits._
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(raw)
    val part = new java.io.File(raw).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(s"$dir/documents.parquet"))
    val got = SparkEntry.queries("stream_novelty_gate")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("decision"))
      .toMap
    val off = graft.operators.DedupOps.DeltaIdOffset
    assert(got == Map(addIds(0) + off -> "derivative",
      addIds(1) + off -> "admitted"), s"got $got")
  }

  test("corpus conservation: every distinct shingle is novel once, " +
      "and the first doc is wholly novel") {
    val rows = TextOps.tfNgramNovelty(spark, Sf).collect()
    assert(rows.nonEmpty)
    val first = rows.minBy(_.getAs[Long]("doc_id"))
    assert(first.getAs[Double]("novelty") == 1.0,
      "the earliest doc can only contain first occurrences")
    rows.foreach(r =>
      assert(r.getAs[Long]("n_novel") <= r.getAs[Long]("n_grams")))
    val totalNovel = rows.map(_.getAs[Long]("n_novel")).sum
    val distinctGrams = graft.sources.Tables.documents(spark, Sf)
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.array_distinct(
          graft.functions.Hashing.hashAll(graft.functions.Hashing.shingles(
            graft.functions.Hashing.tokens(
              org.apache.spark.sql.functions.col("text")))))).as("gh"))
      .distinct().count()
    assert(totalNovel == distinctGrams,
      "first-occurrence attribution partitions the distinct gram set")
  }
}
