package graft

import graft.operators.Relational

/** Pins for `q34_join_skew`: conservation invariants against the raw
  * tables, a driver-side bucket fold, and a planted hot key whose
  * bucket must flag.
  */
class JoinSkewSpec extends SparkSpec {
  import spark.implicits._

  private def charHash(s: String): Long = {
    var h = 0L
    s.foreach(c => h = (h * 31 + c.toLong) % 2147483647L)
    h
  }

  test("bucket rollup conserves inputs and join cardinality at " +
      "sf0.001") {
    val rows = SparkEntry.queries("q34_join_skew")(spark, Sf).collect()
    assert(rows.length <= Relational.SkewBuckets.toInt)
    val nOrders = spark.read.parquet(s"$Sf/orders.parquet").count()
    val nLi = spark.read.parquet(s"$Sf/lineitem.parquet").count()
    val nJoin = spark.read.parquet(s"$Sf/orders.parquet")
      .join(spark.read.parquet(s"$Sf/lineitem.parquet"),
        $"o_orderkey" === $"l_orderkey").count()
    assert(rows.map(_.getAs[Long]("rows_a")).sum == nOrders)
    assert(rows.map(_.getAs[Long]("rows_b")).sum == nLi)
    assert(rows.map(_.getAs[Long]("join_rows")).sum == nJoin,
      "sum of f_a*f_b must equal the real join cardinality")
    val total = rows.map(_.getAs[Long]("join_rows")).sum
    rows.foreach { r =>
      val jr = r.getAs[Long]("join_rows")
      assert(r.getAs[Double]("load_multiple") ==
        jr.toDouble * Relational.SkewBuckets.toDouble / total.toDouble)
      assert(r.getAs[Boolean]("hot") ==
        (jr * Relational.SkewBuckets >
          Relational.SkewHotMultiple * total))
    }
  }

  test("matches a driver-side per-key fold at sf0.001") {
    val fa = spark.read.parquet(s"$Sf/orders.parquet")
      .groupBy($"o_orderkey").count().as[(Long, Long)].collect().toMap
    val fb = spark.read.parquet(s"$Sf/lineitem.parquet")
      .groupBy($"l_orderkey").count().as[(Long, Long)].collect().toMap
    val want = (fa.keySet ++ fb.keySet).toSeq
      .map { k =>
        (charHash(k.toString) % Relational.SkewBuckets,
          fa.getOrElse(k, 0L), fb.getOrElse(k, 0L))
      }
      .groupBy(_._1).view.mapValues { ks =>
        (ks.length.toLong, ks.map(_._2).sum, ks.map(_._3).sum,
          ks.map(t => t._2 * t._3).sum)
      }.toMap
    val got = SparkEntry.queries("q34_join_skew")(spark, Sf).collect()
    assert(got.map(_.getAs[Long]("bucket")).toSet == want.keySet)
    got.foreach { r =>
      val (nk, ra, rb, jr) = want(r.getAs[Long]("bucket"))
      assert(r.getAs[Long]("n_keys") == nk)
      assert(r.getAs[Long]("rows_a") == ra)
      assert(r.getAs[Long]("rows_b") == rb)
      assert(r.getAs[Long]("join_rows") == jr)
    }
  }

  test("a planted hot key flags its bucket and nothing else") {
    val dir = tmpDir("join-skew")
    // key 7 fans out 900 lineitems against 1 order; 30 quiet keys
    // carry 1x1 each
    val orders = (1L to 31L).map(k =>
      (k, k, "O", 10.0, "2001-01-01", "1-URGENT"))
    orders.toDF("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val li = (1L to 31L).flatMap { k =>
      val n = if (k == 7L) 900 else 1
      (1 to n).map(i => (k, i.toLong, 1.0, 1.0, 0.0, "N", "O",
        "2001-01-01"))
    }
    li.toDF("l_orderkey", "l_linenumber", "l_quantity",
      "l_extendedprice", "l_discount", "l_returnflag", "l_linestatus",
      "l_shipdate")
      .select($"l_orderkey", $"l_linenumber", $"l_quantity",
        $"l_extendedprice", $"l_discount", $"l_returnflag",
        $"l_linestatus", $"l_shipdate".cast("timestamp").as("l_shipdate"))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val rows = Relational.q34JoinSkew(spark, dir).collect()
    val hotBucket = charHash("7") % Relational.SkewBuckets
    rows.foreach { r =>
      val isHotBucket = r.getAs[Long]("bucket") == hotBucket
      assert(r.getAs[Boolean]("hot") == isHotBucket,
        s"bucket ${r.getAs[Long]("bucket")}")
      if (isHotBucket)
        assert(r.getAs[Double]("load_multiple") > 20.0,
          "900 of ~930 join rows in one of 32 buckets")
    }
  }
}
