package graft

import org.apache.spark.sql.SparkSession

/** Plan inspector: prints the formatted physical plan of each named
  * query at a scale dir (every query when none named) — the
  * `.explain("formatted")` discipline as a one-liner:
  *
  *   sbt "runMain graft.Explain /root/testdata/sf0.01 q1_pricing_summary"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sel = if (names.isEmpty) SparkEntry.queries.keys.toSeq.sorted
              else names
    sel.foreach { n =>
      println(s"===== $n =====")
      try SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"error: ${e.getMessage}") }
    }
    spark.stop()
  }
}
