package graft

import org.apache.spark.sql.functions._

/** Pins for `q45_quartile_mobility`: customer conservation (every
  * ordering customer lands in exactly one matrix cell), NTILE balance
  * per half (bucket sizes differ by at most one), and the absent
  * codings (no (0,0) cell; 0 appears only as a margin).
  */
class QuartileMobilitySpec extends SparkSpec {

  test("matrix cells partition the ordering customers; no (0,0) cell") {
    val rows = SparkEntry.queries("q45_quartile_mobility")(spark, Sf)
      .collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n_customers")).sum
    val nCust = graft.sources.Tables.orders(spark, Sf)
      .select(countDistinct(col("o_custkey"))).collect().head.getLong(0)
    assert(total == nCust,
      "every customer with any order appears in exactly one cell")
    assert(!rows.exists(r => r.getAs[Long]("q_first") == 0L &&
      r.getAs[Long]("q_second") == 0L),
      "a customer absent from both halves has no orders at all")
    rows.foreach { r =>
      assert(r.getAs[Long]("q_first") >= 0L && r.getAs[Long]("q_first") <= 4L)
      assert(r.getAs[Long]("q_second") >= 0L && r.getAs[Long]("q_second") <= 4L)
    }
  }

  test("NTILE balance: within each half, quartile sizes differ by <= 1") {
    val rows = SparkEntry.queries("q45_quartile_mobility")(spark, Sf)
      .collect()
    def sizes(margin: String): Seq[Long] =
      (1L to 4L).map(q => rows.filter(_.getAs[Long](margin) == q)
        .map(_.getAs[Long]("n_customers")).sum)
    Seq("q_first", "q_second").foreach { m =>
      val sz = sizes(m).filter(_ > 0)
      assert(sz.nonEmpty && sz.max - sz.min <= 1,
        s"$m quartiles must be NTILE-balanced, got $sz")
    }
  }
}
