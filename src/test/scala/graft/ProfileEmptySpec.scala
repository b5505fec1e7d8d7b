package graft

/** Pins q27_profile's degenerate-corpus contract (round-15 ADVICE):
  * on an EMPTY fact the long-format explode produces nothing to
  * group, so the production plan left-joins the static ProfileCols
  * list — one row per profiled column with the oracle's own
  * degenerate values (COUNT(DISTINCT) over nothing = 0, SUM over
  * nothing = NULL). The audit tier (one always-one-row aggregate)
  * never had the divergence; both tiers must now agree on empty.
  */
class ProfileEmptySpec extends SparkSpec {

  test("q27 production profiles every column on an empty fact, " +
      "matching the audit tier (and the oracle's SUM/COUNT-DISTINCT " +
      "degenerate values) row for row") {
    val dir = tmpDir("q27-empty")
    spark.read.parquet(s"$Sf/lineitem.parquet").limit(0)
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    def rows(q: String) =
      SparkEntry.queries(q)(spark, dir).collect()
        .map(r => (r.getAs[String]("col_name"),
          Option(r.getAs[java.lang.Long]("n_nulls")),
          Option(r.getAs[java.lang.Long]("n_distinct")))).toSeq
    val prod = rows("q27_profile")
    assert(prod == graft.operators.Relational.ProfileCols.sorted
      .map(c => (c, None, Some(0L: java.lang.Long))),
      "every profiled column must keep its degenerate row on an " +
        "empty corpus: n_nulls NULL (empty SUM), n_distinct 0")
    assert(prod == rows("q27_profile_audit"),
      "production and audit tiers must agree on the degenerate corpus")
  }
}
