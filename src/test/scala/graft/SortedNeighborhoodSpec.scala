package graft

import org.apache.spark.sql.functions._

/** Pins for `dedup_sorted_neighborhood`: the linear candidate-count
  * law (w·n − w(w+1)/2 pairs — the property that makes SN the
  * standard entity-resolution blocking), an exact driver mirror of
  * the window pairing, and the verdict routing.
  */
class SortedNeighborhoodSpec extends SparkSpec {

  test("pair set matches a driver mirror of the sorted window; " +
      "count is exactly w*n - w(w+1)/2") {
    val rows = SparkEntry.queries("dedup_sorted_neighborhood")(spark, Sf)
      .collect()
    assert(rows.nonEmpty)
    val w = graft.operators.DedupOps.SnWindow
    val keyed = graft.sources.Tables.documents(spark, Sf)
      .filter(length(col("text")) <= graft.operators.DedupOps.EditMaxLen)
      .select(col("doc_id"),
        substring(lower(regexp_replace(col("text"), "[^a-zA-Z0-9]", "")),
          1, graft.operators.DedupOps.SnKeyLen).as("skey"))
      .collect()
      .map(r => (r.getAs[String]("skey"), r.getAs[Long]("doc_id")))
      .sorted
    val n = keyed.length
    assert(rows.length == w * n - w * (w + 1) / 2,
      "every doc pairs with its w successors; only the tail closes short")
    val expected = (for {
      i <- keyed.indices
      k <- 1 to w
      if i + k < n
    } yield (keyed(i)._2, keyed(i + k)._2)).toSet
    val got = rows
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(got == expected, "window pairing mirrors the sort exactly")
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
