package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{DedupOps, EnrichOps, EventOps, MultimodalOps,
  Relational, SimilarityOps, SketchOps, StreamOps, TextOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator from SURVEY.md §2
  * to a `(SparkSession, sfDir) => DataFrame`; `oracleSql` pairs each
  * with equivalent ANSI SQL that DuckDB runs on the same parquet
  * tables. Column names and arithmetic follow the parity rules in
  * [[graft.functions.Exact]].
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.defs ++ EventOps.defs ++ EnrichOps.defs ++ TextOps.defs ++
      DedupOps.defs ++ SimilarityOps.defs ++ MultimodalOps.defs ++
      StreamOps.defs ++ SketchOps.defs

  def oracleSql: Map[String, String] =
    Relational.oracle ++ EventOps.oracle ++ EnrichOps.oracle ++
      TextOps.oracle ++ DedupOps.oracle ++ SimilarityOps.oracle ++
      MultimodalOps.oracle ++ StreamOps.oracle ++ SketchOps.oracle
}
