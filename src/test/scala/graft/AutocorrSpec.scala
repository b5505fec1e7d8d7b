package graft

import org.apache.spark.sql.functions._

/** Pins for `ev_autocorr_daily`: r in [-1, 1], the dense grid gives
  * every type the same pair count, and one type's r matches an
  * independent driver-side Pearson over its daily counts.
  */
class AutocorrSpec extends SparkSpec {

  test("r in [-1,1]; dense grid: identical n_pairs for every type; " +
      "r matches an independent mirror") {
    val rows = SparkEntry.queries("ev_autocorr_daily")(spark, Sf)
      .collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n_pairs")).distinct.length == 1,
      "every type spans the same calendar grid")
    rows.foreach { r =>
      val v = r.getAs[Double]("r_lag1")
      assert(v >= -1.0 && v <= 1.0, s"$v out of range")
    }
    // independent mirror for the first type: BigInt moments over the
    // dense daily series, textbook Pearson on the lag-1 pairs
    val typ = rows.head.getAs[String]("event_type")
    val daily = graft.sources.Tables.events(spark, Sf)
      .select(col("event_type"),
        expr("unix_timestamp(ts) div 86400").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("n"))
    val bounds = daily.agg(min("day"), max("day")).collect().head
    val (d0, d1) = (bounds.getLong(0), bounds.getLong(1))
    val byDay = daily.filter(col("event_type") === typ)
      .collect().map(r => r.getAs[Long]("day") -> r.getAs[Long]("n")).toMap
    val xs = (d0 to d1).map(d => BigInt(byDay.getOrElse(d, 0L)))
    val pairs = xs.zip(xs.tail)
    val np = BigInt(pairs.length)
    val sx = pairs.map(_._1).sum
    val sy = pairs.map(_._2).sum
    val sxx = pairs.map(p => p._1 * p._1).sum
    val syy = pairs.map(p => p._2 * p._2).sum
    val sxy = pairs.map(p => p._1 * p._2).sum
    val n = np.toDouble
    val expected = (n * sxy.toDouble - sx.toDouble * sy.toDouble) /
      (math.sqrt(n * sxx.toDouble - sx.toDouble * sx.toDouble) *
        math.sqrt(n * syy.toDouble - sy.toDouble * sy.toDouble))
    val got = rows.find(_.getAs[String]("event_type") == typ).get
    assert(got.getAs[Long]("n_pairs") == pairs.length)
    assert(got.getAs[Double]("r_lag1") == expected,
      "bit-identical to the independent mirror")
  }
}
