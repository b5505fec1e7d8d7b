package graft

import org.apache.spark.sql.functions._

import graft.operators.DedupOps

/** The [[DedupOps.EditMaxLen]] guard on the quadratic edit-distance
  * tier: one multi-MB candidate pair would otherwise run a
  * O(len_a·len_b) DP for hours inside one task. The guard drops the
  * pair from `dedup_edit_distance` only — the banded O(len·k) tier
  * still verifies it, so nothing leaves the dedup pipeline.
  */
class EditGuardSpec extends SparkSpec {

  import spark.implicits._

  /** 3 docs, one source: 1 and 2 are an under-ceiling near-dup pair;
    * 3 and 4 are byte-identical OVER-ceiling texts (identical ⇒ same
    * shingles ⇒ same LSH buckets ⇒ guaranteed candidate pair). */
  private lazy val fixtureDir: String = {
    val dir = tmpDir("edit-guard")
    val small =
      ("alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3).trim
    val smallB = small.replace("kappa", "lambda")
    val big = ("lorem ipsum dolor sit amet consectetur adipiscing elit " *
      (DedupOps.EditMaxLen / 50 + 10)).trim
    assert(big.length > DedupOps.EditMaxLen)
    Seq((1L, small), (2L, smallB), (3L, big), (4L, big))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("an over-ceiling candidate pair is excluded from the " +
      "quadratic tier; under-ceiling pairs are untouched") {
    val cands = DedupOps.lshCandidatePairs(spark, fixtureDir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(cands.contains((3L, 4L)),
      "fixture broke: the over-ceiling twins must be LSH candidates " +
        "for the guard to have anything to exclude")
    val quad = SparkEntry.queries("dedup_edit_distance")(spark, fixtureDir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(!quad.contains((3L, 4L)),
      "the quadratic tier ran a pair over the EditMaxLen ceiling")
    assert(quad == cands.filter(p => p._1 <= 2L && p._2 <= 2L),
      "an under-ceiling candidate pair went missing from the " +
        "quadratic tier")
  }

  test("the banded tier still verifies the over-ceiling pair — the " +
      "guard narrows the calibration report, not the pipeline") {
    val banded = SparkEntry.queries("dedup_edit_banded")(spark, fixtureDir)
      .select(col("doc_a"), col("doc_b"), col("verdict"))
      .as[(Long, Long, String)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(banded.get((3L, 4L)).contains("near"),
      "identical over-ceiling twins must verify as near in the " +
        "banded tier")
  }

  test("oracle mirrors the guard with the same constant — both " +
      "engines share one exclusion contract") {
    val sql = SparkEntry.oracleSql("dedup_edit_distance")
    assert(sql.contains(s"length(da.text) <= ${DedupOps.EditMaxLen}"))
    assert(sql.contains(s"length(db.text) <= ${DedupOps.EditMaxLen}"))
  }
}
