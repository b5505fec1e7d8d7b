package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Pins for `q35_basket_lift`: a planted basket fixture where the
  * a-priori item prune bites (an under-support item never reaches the
  * pair join) and the surviving pair's lift is hand-computed, plus a
  * driver-side brute-force fold of the sf0.001 baskets against the
  * full registered query.
  */
class BasketLiftSpec extends SparkSpec {
  import spark.implicits._

  private def writeLineitem(rows: Seq[(Long, Long)], dir: String): Unit =
    rows.zipWithIndex.map { case ((o, p), i) =>
      (o, p, 1L, i + 1, 1.0, 100.0, 0.0, 0.0, "N", "O")
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus")
      .select(col("*"),
        lit("2001-01-01").cast("timestamp").as("l_shipdate"))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")

  test("planted baskets: prune bites, surviving pair's lift exact") {
    val dir = tmpDir("basket")
    // baskets: o1{1,2,4} o2{1,2} o3{1,2} o4{3,4} o5{3} o6{4}
    // item support: p1=3 p2=3 p4=3, p3=2 (pruned below 3)
    // frequent pairs: (1,2) support 3; (1,4),(2,4) support 1 (dropped)
    writeLineitem(Seq(
      (1L, 1L), (1L, 2L), (1L, 4L), (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 2L), (4L, 3L), (4L, 4L), (5L, 3L), (6L, 4L)),
      dir)
    val got = Relational.q35BasketLift(spark, dir).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("part_a") == 1L)
    assert(r.getAs[Long]("part_b") == 2L)
    assert(r.getAs[Long]("n_ab") == 3L)
    assert(r.getAs[Long]("n_a") == 3L)
    assert(r.getAs[Long]("n_b") == 3L)
    assert(r.getAs[Long]("n_orders") == 6L)
    assert(r.getAs[Double]("lift") == 2.0, "6*3 / (3*3)")
  }

  test("duplicate lineitem rows for the same (order, part) count once") {
    val dir = tmpDir("basket-dup")
    // (1,1) appears twice in o1 — the distinct projection collapses it
    writeLineitem(Seq(
      (1L, 1L), (1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 2L)), dir)
    val got = Relational.q35BasketLift(spark, dir).collect()
    assert(got.length == 1)
    assert(got.head.getAs[Long]("n_a") == 3L,
      "support is orders-containing, not lineitem rows")
    assert(got.head.getAs[Long]("n_ab") == 3L)
  }

  test("matches a driver-side brute-force fold at sf0.001") {
    val baskets = graft.sources.Tables.lineitem(spark, Sf)
      .select(col("l_orderkey"), col("l_partkey"))
      .distinct().as[(Long, Long)].collect()
    val support = baskets.groupBy(_._2).map { case (p, xs) =>
      p -> xs.length.toLong
    }
    val byOrder = baskets.groupBy(_._1)
    val pairCounts = scala.collection.mutable.Map.empty[(Long, Long), Long]
    byOrder.values.foreach { rows =>
      val ps = rows.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        pairCounts((ps(i), ps(j))) =
          pairCounts.getOrElse((ps(i), ps(j)), 0L) + 1L
    }
    val n = byOrder.size.toLong
    val want = pairCounts.filter(_._2 >= Relational.MinPairSupport)
      .map { case ((a, b), nab) =>
        (a, b) -> ((nab, support(a), support(b),
          (n * nab).toDouble / (support(a) * support(b)).toDouble))
      }
    val got = SparkEntry.queries("q35_basket_lift")(spark, Sf).collect()
    assert(got.map(r => (r.getAs[Long]("part_a"),
      r.getAs[Long]("part_b"))).toSet == want.keySet)
    got.foreach { r =>
      val (nab, na, nb, lift) =
        want((r.getAs[Long]("part_a"), r.getAs[Long]("part_b")))
      assert(r.getAs[Long]("n_ab") == nab)
      assert(r.getAs[Long]("n_a") == na)
      assert(r.getAs[Long]("n_b") == nb)
      assert(r.getAs[Long]("n_orders") == n)
      assert(r.getAs[Double]("lift") == lift)
    }
  }
}
