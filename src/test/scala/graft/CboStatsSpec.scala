package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Cost-based-optimizer wiring: table statistics must actually reach
  * the planner. On a 100 TB warehouse the difference between "the
  * planner knows nation has 25 rows" and "the planner assumes it is
  * huge" is a broadcast join vs a full shuffle of the fact table —
  * this spec pins that ANALYZE TABLE statistics flow into plan
  * selection through the catalog.
  */
class CboStatsSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan.toString
      case p => p.toString
    }

  test("ANALYZE TABLE statistics drive broadcast selection through " +
      "the catalog") {
    val wh = tmpDir("cbo-wh")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS cbo LOCATION '$wh'")
    try {
      spark.read.parquet(s"$Sf/nation.parquet")
        .write.mode("overwrite").saveAsTable("cbo.nation_t")
      spark.read.parquet(s"$Sf/customer.parquet")
        .select("c_custkey", "c_nationkey")
        .write.mode("overwrite").saveAsTable("cbo.customer_t")
      spark.sql("ANALYZE TABLE cbo.nation_t COMPUTE STATISTICS")
      spark.sql("ANALYZE TABLE cbo.customer_t COMPUTE STATISTICS")
      // the catalog now knows nation is 25 rows
      val stats = spark.sql("DESC EXTENDED cbo.nation_t").collect()
        .map(r => (r.getString(0), r.getString(1))).toMap
      assert(stats.get("Statistics").exists(_.contains("rows")),
        s"ANALYZE must persist row counts, got: ${stats.get("Statistics")}")
      val joined = spark.sql(
        """SELECT n.n_name, COUNT(*) AS n
           FROM cbo.customer_t c JOIN cbo.nation_t n
             ON c.c_nationkey = n.n_nationkey
           GROUP BY n.n_name""")
      assert(plan(joined).contains("BroadcastHashJoin"),
        "a 25-row analyzed dimension must broadcast: " +
          plan(joined).take(1500))
      // and the answer matches the plain parquet join
      val viaParquet = spark.read.parquet(s"$Sf/customer.parquet")
        .join(spark.read.parquet(s"$Sf/nation.parquet"),
          org.apache.spark.sql.functions.col("c_nationkey") ===
            org.apache.spark.sql.functions.col("n_nationkey"))
        .groupBy("n_name").count().orderBy("n_name").collect()
      val viaTable = joined.orderBy("n_name").collect()
      assert(viaTable.map(r => (r.getString(0), r.getLong(1))).toSeq ==
        viaParquet.map(r => (r.getString(0), r.getLong(1))).toSeq)
    } finally {
      spark.sql("DROP DATABASE IF EXISTS cbo CASCADE")
    }
  }
}
