package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Pins for `q36_rfm`: a planted orders history with one customer per
  * segment corner (hand-computed recency/frequency/monetary and
  * scores, exercising every threshold), plus corpus invariants at
  * sf0.001 (one row per ordering customer, segment derived from the
  * scores, scores in range).
  */
class RfmSpec extends SparkSpec {
  import spark.implicits._

  test("planted history: scores and segments hit every threshold arm") {
    val dir = tmpDir("rfm")
    // max order date = 2001-08-01 (c1's last order)
    // c1: 12 orders of 300k ending at maxd -> r3 f3 m3 (segment 333)
    // c2: 2 orders of 50k, last 400 days old -> r1 f1 m1 (111)
    // c3: 7 orders summing 2.5M, last 180 days old -> r2 f2 m2 (222)
    val rows =
      (1 to 12).map(i => (100L + i, 1L, 300000.0, "2001-08-01")) ++
      Seq((201L, 2L, 50000.0, "2000-06-27"),
        (202L, 2L, 50000.0, "2000-01-01")) ++
      (1 to 7).map(i => (300L + i, 3L, 357142.86, "2001-02-02"))
    rows.toDF("o_orderkey", "o_custkey", "o_totalprice", "dt")
      .select(col("o_orderkey"), col("o_custkey"),
        lit("O").as("o_orderstatus"), col("o_totalprice"),
        col("dt").cast("timestamp").as("o_orderdate"),
        lit("3-MEDIUM").as("o_orderpriority"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Relational.q36Rfm(spark, dir).collect()
      .map(r => r.getAs[Long]("c_custkey") -> r).toMap
    assert(got.keySet == Set(1L, 2L, 3L))

    val c1 = got(1L)
    assert(c1.getAs[Long]("recency_days") == 0L)
    assert(c1.getAs[Long]("frequency") == 12L)
    assert(c1.getAs[Double]("monetary") == 3600000.0)
    assert(c1.getAs[Int]("segment") == 333)

    val c2 = got(2L)
    assert(c2.getAs[Long]("recency_days") == 400L)
    assert(c2.getAs[Long]("frequency") == 2L)
    assert(c2.getAs[Double]("monetary") == 100000.0)
    assert(c2.getAs[Int]("segment") == 111)

    val c3 = got(3L)
    assert(c3.getAs[Long]("recency_days") == 180L)
    assert(c3.getAs[Long]("frequency") == 7L)
    assert(c3.getAs[Double]("monetary") == 2500000.02)
    assert(c3.getAs[Int]("r_score") == 2)
    assert(c3.getAs[Int]("f_score") == 2)
    assert(c3.getAs[Int]("m_score") == 2)
    assert(c3.getAs[Int]("segment") == 222)
  }

  test("sf0.001 invariants: one row per ordering customer, segment " +
      "consistent with its scores") {
    val orders = graft.sources.Tables.orders(spark, Sf)
    val nCust = orders.select(countDistinct(col("o_custkey")))
      .as[Long].head()
    val got = SparkEntry.queries("q36_rfm")(spark, Sf).collect()
    assert(got.length == nCust)
    got.foreach { r =>
      val (rs, fs, ms) = (r.getAs[Int]("r_score"),
        r.getAs[Int]("f_score"), r.getAs[Int]("m_score"))
      assert(rs >= 1 && rs <= 3 && fs >= 1 && fs <= 3 &&
        ms >= 1 && ms <= 3)
      assert(r.getAs[Int]("segment") == rs * 100 + fs * 10 + ms)
      assert(r.getAs[Long]("recency_days") >= 0L)
      assert(r.getAs[Long]("frequency") >= 1L)
    }
  }
}
