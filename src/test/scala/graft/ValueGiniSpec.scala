package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.EventOps

/** Pins for `ev_value_gini`: a driver-side exact rank-form fold at
  * sf0.001 (cents from the engine's own decimal cast), and the two
  * analytic extremes — perfect equality at 0, one-holds-all at
  * (n−1)/n with a saturated top decile.
  */
class ValueGiniSpec extends SparkSpec {

  test("matches a driver-side exact rank-form fold at sf0.001") {
    val cents = graft.sources.Tables.events(spark, Sf)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(sum((graft.functions.Exact.money(col("value")) * 100)
        .cast("long")).as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sorted = cents.sortBy { case (u, c) => (c, u) }.map(_._2)
    val n = sorted.length.toLong
    val total = sorted.map(BigInt(_)).sum
    val src = sorted.zipWithIndex
      .map { case (c, i) => BigInt(i + 1) * BigInt(c) }.sum
    val gini = (BigInt(2) * src - BigInt(n + 1) * total).toDouble /
      (n * total.toLong).toDouble
    val k = (n + 9) / 10
    val top = sorted.takeRight(k.toInt).map(BigInt(_)).sum
    val r = SparkEntry.queries("ev_value_gini")(spark, Sf)
      .collect().head
    assert(r.getAs[Long]("n_users") == n)
    assert(r.getAs[Long]("total_cents") == total.toLong)
    assert(r.getAs[Double]("gini") == gini)
    assert(r.getAs[Double]("top_decile_share") ==
      top.toDouble / total.toLong.toDouble)
    assert(gini >= 0.0 && gini < 1.0)
  }

  test("planted: equal spenders pin 0; one whale among four pins " +
      "(n-1)/n and a saturated decile") {
    import spark.implicits._
    def t(i: Int) = Timestamp.valueOf(f"2024-01-01 00:00:0$i")
    def run(values: Seq[(Long, Double)]) = {
      val dir = tmpDir("gini-planted")
      values.zipWithIndex.map { case ((u, v), i) =>
        (i.toLong, t(i % 10), u, "purchase", v, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$dir/events.parquet")
      EventOps.evValueGini(spark, dir).collect().head
    }
    val equal = run(Seq((1L, 5.0), (2L, 5.0), (3L, 5.0), (4L, 5.0)))
    assert(equal.getAs[Double]("gini") == 0.0)
    val whale = run(Seq((1L, 0.0), (2L, 0.0), (3L, 0.0), (4L, 100.0)))
    assert(whale.getAs[Double]("gini") == 0.75,
      "one-holds-all over n = 4 users is (n-1)/n")
    assert(whale.getAs[Double]("top_decile_share") == 1.0,
      "ceil(4/10) = 1 user holds everything")
  }
}
