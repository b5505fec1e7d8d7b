package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard configuration.
  *
  * Tuned for the driver's local[N] harness but the same settings are
  * the right defaults on a real cluster: AQE on (runtime re-plan,
  * skew-join splitting, dynamic coalescing), shuffle partitions sized
  * to the parallelism actually available instead of the 200 default,
  * UTC session time, and the nanos-parquet compatibility flag needed
  * by the `events` table (see [[graft.sources.Tables.events]]).
  */
object GraftSession {
  def configure(b: SparkSession.Builder, cpus: Int): SparkSession.Builder =
    b.withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.ui.enabled", "false")

  def local(cpus: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
      : SparkSession = {
    val s = configure(SparkSession.builder().master(s"local[$cpus]")
      .appName("graft"), cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
