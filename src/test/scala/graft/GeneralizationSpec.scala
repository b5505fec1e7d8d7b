package graft

import graft.operators.Relational

/** Pins for `pii_generalization`: a driver-side recompute of the
  * whole ladder at sf0.001, the coarsening monotonicity laws, and a
  * planted corpus where the singleton group L0 flags is healed by
  * the band merge at L1.
  */
class GeneralizationSpec extends SparkSpec {

  private def ladder(rows: Seq[(String, Long, Double)],
      nationToRegion: Map[Long, Long]): Seq[(Long, Long, Long, Long)] = {
    // (level -> (n_groups, min_n, n_risky_groups, n_risky_rows))
    def stats(groups: Map[_, Long]): (Long, Long, Long, Long) = {
      val ns = groups.values.toSeq
      (ns.size.toLong, ns.min,
        ns.count(_ < Relational.PiiKAnon).toLong,
        ns.filter(_ < Relational.PiiKAnon).sum)
    }
    val band = Relational.PiiAcctBand
    def b1(x: Double) = math.floor(x / band) * band
    def b5(x: Double) = math.floor(b1(x) / (5 * band)) * (5 * band)
    val l0 = rows.groupBy(r => (r._1, r._2, b1(r._3)))
      .map { case (k, v) => k -> v.size.toLong }
    val l1 = rows.groupBy(r => (r._1, r._2, b5(r._3)))
      .map { case (k, v) => k -> v.size.toLong }
    val l2 = rows.groupBy(r => (r._1, nationToRegion(r._2), b5(r._3)))
      .map { case (k, v) => k -> v.size.toLong }
    val l3 = rows.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    Seq(stats(l0), stats(l1), stats(l2), stats(l3))
  }

  test("matches a driver-side recompute of the ladder at sf0.001 and " +
      "obeys the coarsening monotonicity laws") {
    import org.apache.spark.sql.functions._
    val rows = graft.sources.Tables.customer(spark, Sf)
      .select(col("c_mktsegment"), col("c_nationkey").cast("long"),
        col("c_acctbal").cast("double"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val n2r = graft.sources.Tables.nation(spark, Sf)
      .select(col("n_nationkey").cast("long"),
        col("n_regionkey").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = ladder(rows, n2r)
    val got = SparkEntry.queries("pii_generalization")(spark, Sf)
      .collect()
    assert(got.length == 4)
    got.zip(want).foreach { case (r, (ng, mn, nrg, nrr)) =>
      val lvl = r.getAs[Long]("level")
      assert(r.getAs[Long]("n_groups") == ng, s"level $lvl n_groups")
      assert(r.getAs[Long]("min_n") == mn, s"level $lvl min_n")
      assert(r.getAs[Long]("n_risky_groups") == nrg, s"level $lvl")
      assert(r.getAs[Long]("n_risky_rows") == nrr, s"level $lvl")
      assert(r.getAs[String]("verdict") ==
        (if (nrr == 0) "releasable" else "needs_suppression"))
    }
    // each level coarsens the previous: min group sizes can only
    // grow, risky row mass can only shrink
    val minN = got.map(_.getAs[Long]("min_n"))
    val risky = got.map(_.getAs[Long]("n_risky_rows"))
    assert(minN.zip(minN.tail).forall { case (a, b) => a <= b })
    assert(risky.zip(risky.tail).forall { case (a, b) => a >= b })
  }

  test("planted: a singleton L0 group heals under the L1 band merge") {
    import spark.implicits._
    val dir = tmpDir("gen-planted")
    // 6 customers, one segment, one nation: five in band [0, 1000),
    // one alone in band [1000, 2000) -> L0 has a singleton; the 5x
    // band at L1 merges all six into one group of 6 >= k
    (1 to 6).map(i => (i.toLong, s"Customer#$i",
        if (i == 6) 1500.0 else 100.0 * i, "BUILDING", 7L))
      .toDF("c_custkey", "c_name", "c_acctbal", "c_mktsegment",
        "c_nationkey")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/customer.parquet")
    Seq((7L, "GERMANY", 3L)).toDF("n_nationkey", "n_name", "n_regionkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/nation.parquet")
    val out = Relational.piiGeneralization(spark, dir).collect()
      .map(r => r.getAs[Long]("level") -> r).toMap
    assert(out(0L).getAs[Long]("n_risky_rows") == 1L)
    assert(out(0L).getAs[String]("verdict") == "needs_suppression")
    assert(out(1L).getAs[Long]("n_groups") == 1L)
    assert(out(1L).getAs[Long]("min_n") == 6L)
    assert(out(1L).getAs[String]("verdict") == "releasable")
    assert(out(3L).getAs[String]("verdict") == "releasable")
  }
}
