package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional: extra args = only these query names (local iteration)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // only stop the session on exit if this main created it — when a
    // test suite invokes Verify.main in-process, getOrCreate returns
    // the suite's shared session, which must survive
    val ownsSession = SparkSession.getDefaultSession.isEmpty
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Hard determinism guarantee for the gate: no persisted index /
    // chunk-store relation from a prior in-process caller (a test
    // suite driving Verify.main, a previous sf dir) can leak into this
    // run — every mtime-keyed cache rebuilds fresh from the parquet
    // this run reads. Costs one extra build per index on a cold JVM
    // (where the caches are empty anyway).
    operators.DedupOps.invalidateIndexes()
    operators.SimilarityOps.invalidateIndexes()
    operators.TextOps.invalidateIndexes()
    operators.MultimodalOps.invalidateIndexes()
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    if (ownsSession) spark.stop()
  }
}
