package graft

import graft.operators.Relational

/** Pins for `pii_t_closeness`: a driver-side exact fold of the
  * variational-distance arithmetic at sf0.001 (quasi-identifier
  * projection taken from the engine so the pin targets the EMD
  * accounting, including absent-segment cells), and a planted release
  * with a distribution-matching class (t = 0), a homogeneous class
  * (t = 0.5, flagged), and a mildly skewed class under the bar.
  */
class TClosenessSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("matches a driver-side exact fold at sf0.001, counting " +
      "absent segments") {
    val base = graft.sources.Tables.customer(spark, Sf)
      .select(col("c_nationkey").cast("long"),
        (floor(col("c_acctbal") / Relational.PiiAcctBand) *
          Relational.PiiAcctBand).as("band"),
        col("c_mktsegment"))
      .collect()
      .map(r => ((r.getLong(0), r.getDouble(1)), r.getString(2)))
    val global = base.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nn = base.length.toLong
    val got = SparkEntry.queries("pii_t_closeness")(spark, Sf).collect()
      .map(r => (r.getAs[Long]("c_nationkey"),
        r.getAs[Double]("acct_band")) -> r).toMap
    val classes = base.groupBy(_._1)
    assert(got.size == classes.size)
    classes.foreach { case (k, rows) =>
      val n = rows.length.toLong
      val cn = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      // every GLOBAL segment contributes, present in the class or not
      val tNum = global.map { case (seg, gn) =>
        (cn.getOrElse(seg, 0L) * nn - gn * n).abs
      }.sum
      val r = got(k)
      assert(r.getAs[Long]("n") == n, s"class $k")
      assert(r.getAs[Long]("t_num") == tNum, s"class $k")
      assert(r.getAs[Double]("t_dist") ==
        tNum.toDouble / (n * nn * 2L).toDouble, s"class $k")
      assert(r.getAs[String]("risk") ==
        (if (tNum * Relational.PiiTClose5 > n * nn * 2L)
          "distribution_skew_risk" else "t_close"), s"class $k")
    }
  }

  test("planted: a class mirroring the global mix scores t = 0; a " +
      "homogeneous class scores 0.5 and flags; mild skew stays under " +
      "the 1/5 bar") {
    import spark.implicits._
    def c(id: Long, nation: Long, seg: String) =
      (id, s"Customer$id", 0.0, seg, nation)
    val rows =
      // nation 1: 2 AUTO + 2 BLDG = the global 50/50 mix exactly
      Seq(c(1, 1, "AUTO"), c(2, 1, "AUTO"), c(3, 1, "BLDG"),
        c(4, 1, "BLDG")) ++
        // nation 2: 4 AUTO, no BLDG -> homogeneous
        Seq(c(5, 2, "AUTO"), c(6, 2, "AUTO"), c(7, 2, "AUTO"),
          c(8, 2, "AUTO")) ++
        // nation 3: 4 AUTO + 8 BLDG -> t = 80/480 = 1/6 < 1/5
        ((9L to 12L).map(i => c(i, 3, "AUTO")) ++
          (13L to 20L).map(i => c(i, 3, "BLDG")))
    val dir = tmpDir("tclose-planted")
    rows.toDF("c_custkey", "c_name", "c_acctbal", "c_mktsegment",
        "c_nationkey")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/customer.parquet")
    val out = Relational.piiTCloseness(spark, dir).collect()
      .map(r => r.getAs[Long]("c_nationkey") -> r).toMap
    assert(out(1L).getAs[Long]("t_num") == 0L)
    assert(out(1L).getAs[Double]("t_dist") == 0.0)
    assert(out(1L).getAs[String]("risk") == "t_close")
    assert(out(2L).getAs[Double]("t_dist") == 0.5,
      "all-AUTO against a 50/50 world is variational distance 0.5")
    assert(out(2L).getAs[String]("risk") == "distribution_skew_risk")
    assert(out(3L).getAs[Double]("t_dist") == 80.0 / 480.0)
    assert(out(3L).getAs[String]("risk") == "t_close",
      "1/6 sits under the 1/5 bar")
  }
}
