package graft

import org.apache.spark.sql.functions._

/** Pins for `dedup_blocking_overlap`: the tag buckets must partition
  * BOTH generators' pair sets exactly (both + lsh_only = eligible LSH
  * pairs; both + sn_only = SN pairs), and the rate is the exact
  * division.
  */
class BlockingOverlapSpec extends SparkSpec {

  test("tag buckets partition both generators' candidate sets") {
    val rows = SparkEntry.queries("dedup_blocking_overlap")(spark, Sf)
      .collect()
      .map(r => r.getAs[String]("tag") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_dup"))).toMap
    def n(t: String) = rows.get(t).map(_._1).getOrElse(0L)
    val eligible = graft.sources.Tables.documents(spark, Sf)
      .filter(length(col("text")) <= graft.operators.DedupOps.EditMaxLen)
      .select(col("doc_id"))
    val lshEligible = SparkEntry.queries("dedup_lsh_pairs")(spark, Sf)
      .join(eligible.withColumnRenamed("doc_id", "doc_a"), Seq("doc_a"),
        "left_semi")
      .join(eligible.withColumnRenamed("doc_id", "doc_b"), Seq("doc_b"),
        "left_semi")
      .count()
    // the overlap audit counts every GENERATED pair (its prune is
    // aggregate-internal — sub-bar pairs stay in n_pairs, only the
    // kernel is skipped), so the SN conservation law compares against
    // the pair generator, NOT the registered SN query whose verify
    // tier elides length-ratio-hopeless rows (round 14)
    val snPairs = graft.operators.DedupOps.snPairsSharded(spark, Sf)
      .count()
    val snVerifiedRows =
      SparkEntry.queries("dedup_sorted_neighborhood")(spark, Sf).count()
    assert(snVerifiedRows <= snPairs,
      "the verified output is the prune-surviving subset of the generator")
    assert(n("both") + n("lsh_only") == lshEligible,
      "LSH side conserved")
    assert(n("both") + n("sn_only") == snPairs, "SN side conserved")
    rows.foreach { case (t, (np, nd)) =>
      assert(Set("both", "lsh_only", "sn_only")(t))
      assert(nd >= 0L && nd <= np)
    }
    val df = SparkEntry.queries("dedup_blocking_overlap")(spark, Sf)
      .collect()
    df.foreach { r =>
      assert(r.getAs[Double]("dup_rate") ==
        r.getAs[Long]("n_dup").toDouble / r.getAs[Long]("n_pairs").toDouble)
    }
  }
}
