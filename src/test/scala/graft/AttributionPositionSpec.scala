package graft

import org.apache.spark.sql.functions._

/** Pins for `ev_attribution_position`: exact conservation (the three
  * credit models must allocate the IDENTICAL total cents — only the
  * split differs), identical touch/purchase counts with the linear
  * sibling, and the U-split arithmetic on planted (k, rnk, pcents)
  * paths.
  */
class AttributionPositionSpec extends SparkSpec {

  private val splitExpr =
    """case
         when k = 1 then pcents
         when k = 2 then case when rnk = 1
           then pcents - pcents div 2 else pcents div 2 end
         when rnk = 1 or rnk = k then (pcents * 40) div 100
         else (pcents - 2 * ((pcents * 40) div 100)) div (k - 2)
           + (case when rnk - 1 <=
               (pcents - 2 * ((pcents * 40) div 100)) % (k - 2)
             then 1 else 0 end)
       end"""

  test("U-split on planted paths: 40/20/40, endpoints floor, " +
      "remainder to earliest interior ranks, exact conservation") {
    import spark.implicits._
    // every (k, pcents) pair's full path
    val paths = for {
      (k, pcents) <- Seq((1, 999L), (2, 999L), (3, 1000L), (5, 1000L),
        (4, 7L), (6, 101L))
      rnk <- 1 to k
    } yield (k.toLong, rnk.toLong, pcents)
    val credited = paths.toDF("k", "rnk", "pcents")
      .withColumn("credit_c", expr(splitExpr))
      .collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("rnk"),
        r.getAs[Long]("pcents"), r.getAs[Long]("credit_c")))
    // conservation per path, exactly
    credited.groupBy(c => (c._1, c._3)).foreach { case ((k, p), rows) =>
      assert(rows.map(_._4).sum == p, s"k=$k pcents=$p must conserve")
    }
    val get = credited.map(c => (c._1, c._2) -> c._4).toMap
    // k=5, pcents=1000: 400 / 67 / 67 / 66 / 400
    assert(get((5L, 1L)) == 400L && get((5L, 5L)) == 400L)
    assert(get((5L, 2L)) == 67L && get((5L, 3L)) == 67L &&
      get((5L, 4L)) == 66L, "pool remainder lands on the EARLIEST mids")
    // k=1 takes everything; k=2 splits with the odd cent first
    assert(get((1L, 1L)) == 999L)
    assert(get((2L, 1L)) == 500L && get((2L, 2L)) == 499L)
  }

  test("total credit equals the linear model's total (same attributed " +
      "purchases, different split); touch counts identical") {
    val pos = SparkEntry.queries("ev_attribution_position")(spark, Sf)
      .collect()
    val lin = SparkEntry.queries("ev_attribution_linear")(spark, Sf)
      .collect()
    assert(pos.nonEmpty)
    assert(pos.map(_.getAs[Long]("credit_cents")).sum ==
      lin.map(_.getAs[Long]("credit_cents")).sum,
      "a credit model reallocates, never mints or burns")
    val pk = pos.map(r => r.getAs[Long]("click_hour") ->
      r.getAs[Long]("n_touches")).toMap
    lin.foreach { r =>
      assert(pk(r.getAs[Long]("click_hour")) == r.getAs[Long]("n_touches"))
    }
  }
}
