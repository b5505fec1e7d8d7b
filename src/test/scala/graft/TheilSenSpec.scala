package graft

import org.apache.spark.sql.functions._

/** Pins for `ev_theilsen_trend`: a driver-side mirror (dense grid,
  * every pairwise slope, the identical total-order ranking and
  * mid-pair average) must match bit-exactly for every type, and the
  * pair count must be the triangular number of the grid span.
  */
class TheilSenSpec extends SparkSpec {

  test("median pairwise slope matches an independent driver mirror " +
      "bit-exactly; n_pairs = D(D-1)/2 on the dense grid") {
    val rows = SparkEntry.queries("ev_theilsen_trend")(spark, Sf)
      .collect()
    assert(rows.nonEmpty)
    val daily = graft.sources.Tables.events(spark, Sf)
      .select(col("event_type"),
        expr("unix_timestamp(ts) div 86400").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("n"))
      .collect()
      .groupBy(_.getAs[String]("event_type"))
      .map { case (t, rs) =>
        t -> rs.map(r => r.getAs[Long]("day") -> r.getAs[Long]("n")).toMap
      }
    val allDays = daily.values.flatMap(_.keys)
    val (d0, d1) = (allDays.min, allDays.max)
    val dDays = (d1 - d0 + 1).toInt
    val expPairs = dDays.toLong * (dDays - 1) / 2
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      assert(r.getAs[Long]("n_pairs") == expPairs)
      val xs = (d0 to d1).map(dd => dd -> daily(t).getOrElse(dd, 0L))
      val pairs = for {
        i <- xs.indices; j <- (i + 1) until xs.length
      } yield {
        val num = xs(j)._2 - xs(i)._2
        val den = xs(j)._1 - xs(i)._1
        (num.toDouble / den.toDouble, num, den, xs(i)._1, xs(j)._1)
      }
      val sorted = pairs.sortBy(p => (p._1, p._2, p._3, p._4, p._5))
      val cnt = sorted.length
      val lo = (cnt + 1) / 2
      val hi = (cnt + 2) / 2
      val mids = Seq(lo, hi).distinct.map(k => sorted(k - 1)._1)
      val expected = mids.sum / mids.length.toDouble
      assert(r.getAs[Double]("median_slope") == expected,
        s"type $t: bit-exact mirror")
    }
  }
}
