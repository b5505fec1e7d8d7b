package graft

import org.apache.spark.sql.functions._

import graft.operators.EventOps

/** Pins for `ev_cohort_ltv`: a driver-side exact fold of the triangle
  * at sf0.001 plus its structural invariants (every cohort has an
  * age-0 cell; cohort sizes partition the purchaser set; column mass
  * ties out to total revenue).
  */
class CohortLtvSpec extends SparkSpec {

  test("matches a driver-side exact fold at sf0.001 with the " +
      "triangle invariants") {
    val p = graft.sources.Tables.events(spark, Sf)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"),
        expr("unix_timestamp(ts) div 604800").as("week"),
        (graft.functions.Exact.money(col("value")) * 100).cast("long")
          .as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val cohort = p.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val cells = p.groupBy(e => (cohort(e._1), e._2 - cohort(e._1)))
      .view.mapValues(es => (es.length.toLong, es.map(_._3).sum)).toMap
    val sizes = cohort.values.groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val got = SparkEntry.queries("ev_cohort_ltv")(spark, Sf).collect()
    assert(got.length == cells.size)
    got.foreach { r =>
      val key = (r.getAs[Long]("cohort_week"), r.getAs[Long]("age_week"))
      val (n, cents) = cells(key)
      assert(r.getAs[Long]("n_purchases") == n, s"cell $key")
      assert(r.getAs[Long]("revenue_cents") == cents, s"cell $key")
      assert(r.getAs[Long]("cohort_users") == sizes(key._1), s"cell $key")
      assert(r.getAs[Double]("revenue_per_user") ==
        cents.toDouble / (sizes(key._1) * 100L).toDouble, s"cell $key")
      assert(key._2 >= 0L, "age cannot precede the cohort")
    }
    // every cohort's first column exists (the cohorting event itself)
    sizes.keys.foreach { cw =>
      assert(cells.contains((cw, 0L)), s"cohort $cw missing age 0")
    }
    assert(sizes.values.sum == cohort.size.toLong,
      "cohort sizes partition the purchaser set")
    assert(got.map(_.getAs[Long]("revenue_cents")).sum ==
      p.map(_._3).sum, "triangle mass is total purchase revenue")
  }
}
