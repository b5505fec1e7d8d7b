package graft

/** The `spark.sql` front door: a user can register the tables as views
  * and run whole queries as SQL strings — including the engine's
  * custom functions — and get exactly what the Column API computes. */
class SqlSurfaceSpec extends SparkSpec {

  private def registerViews(): Unit =
    graft.sources.Tables.all.foreach { t =>
      graft.sources.Tables.load(spark, Sf, t).createOrReplaceTempView(t)
    }

  test("a TPC-H-style query runs as one SQL string, equal to the Column API") {
    registerViews()
    val viaSql = spark.sql(
      """SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(8,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS count_order
         FROM lineitem
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""").collect()
    val viaCol = SparkEntry.queries("q1_pricing_summary")(spark, Sf)
      .select("l_returnflag", "l_linestatus", "sum_qty", "count_order")
      .collect()
    assert(viaSql.toSeq === viaCol.toSeq)
  }

  test("custom functions compose with joins and aggregation in SQL") {
    registerViews()
    val r = spark.sql(
      """SELECT graft_lsh_bucket(embedding) AS bucket, COUNT(*) AS n
         FROM embeddings GROUP BY bucket ORDER BY bucket""").collect()
    val expected = SparkEntry.queries("ann_lsh_buckets")(spark, Sf)
      .select("bucket", "n").collect()
    assert(r.toSeq === expected.toSeq)
  }
}
