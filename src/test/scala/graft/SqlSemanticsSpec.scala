package graft

import graft.operators.Relational

/** Pins for the ANSI-semantics trio: the NOT IN / NOT EXISTS
  * asymmetry under a planted NULL (`q38_null_semantics`), the
  * rank-distribution ratios (`q39_cume_dist`), and IGNORE NULLS
  * forward-fill (`q40_ignore_nulls`).
  */
class SqlSemanticsSpec extends SparkSpec {

  test("q38: IN and EXISTS agree; NOT IN is annihilated by the " +
      "planted NULL; NOT EXISTS counts normally") {
    val got = SparkEntry.queries("q38_null_semantics")(spark, Sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nat = spark.read.parquet(s"$Sf/customer.parquet")
      .select("c_custkey", "c_nationkey").collect()
      .map(r => r.getAs[Number](1).longValue())
    val supKeys = spark.read.parquet(s"$Sf/supplier.parquet")
      .select("s_nationkey").collect()
      .map(_.getAs[Number](0).longValue()).toSet
    val probeNonNull = supKeys - 3L
    assert(got("in") == got("exists"),
      "positive membership is unaffected by the NULL")
    assert(got("in") == nat.count(probeNonNull.contains).toLong)
    assert(supKeys.contains(3L),
      "the fixture must actually plant a NULL or the pin is vacuous")
    assert(got("not_in") == 0L,
      "x <> NULL is UNKNOWN for every x, so NOT IN never holds")
    assert(got("not_exists") ==
      nat.count(k => !probeNonNull.contains(k)).toLong)
    assert(got("not_exists") > 0L)
    // the dedicated operator: Spark compiles the NOT IN subquery to a
    // (null-aware) anti join, not a filter
    val plan = Relational.q38NullSemantics(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Anti"), s"expected an anti join:\n${plan.take(2000)}")
  }

  test("q39: percent_rank and cume_dist match the ANSI ratios, with " +
      "tie plateaus") {
    val rows = SparkEntry.queries("q39_cume_dist")(spark, Sf).collect()
    rows.groupBy(_.getAs[Long]("c_nationkey")).foreach { case (_, rs) =>
      val n = rs.length
      val bals = rs.map(_.getAs[Double]("acctbal")).sorted
      rs.foreach { r =>
        val b = r.getAs[Double]("acctbal")
        val below = bals.count(_ < b)
        val atOrBelow = bals.count(_ <= b)
        assert(r.getAs[Double]("pct_rank") ==
          below.toDouble / (n - 1).toDouble)
        assert(r.getAs[Double]("cume") == atOrBelow.toDouble / n.toDouble)
      }
    }
  }

  test("q40: forward-fill carries the last observation; rows before " +
      "the first stay NULL") {
    val rows = SparkEntry.queries("q40_ignore_nulls")(spark, Sf)
      .collect()
    rows.groupBy(_.getAs[Long]("c_nationkey")).foreach { case (_, rs) =>
      var last: Option[Double] = None
      rs.sortBy(_.getAs[Long]("c_custkey")).foreach { r =>
        if (!r.isNullAt(r.fieldIndex("observed")))
          last = Some(r.getAs[Double]("observed"))
        if (last.isEmpty)
          assert(r.isNullAt(r.fieldIndex("filled")))
        else
          assert(r.getAs[Double]("filled") == last.get)
      }
    }
    assert(rows.exists(r => r.isNullAt(r.fieldIndex("filled"))),
      "someone must precede their nation's first observation")
    assert(rows.exists(r => !r.isNullAt(r.fieldIndex("observed"))))
  }
}
