package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Enrichment._
import graft.sources.Tables

/** The reference pipeline's operator semantics (SURVEY.md §2.3-§2.6)
  * exercised as oracle-checkable batch queries over `documents`
  * (doc_id/text standing in for the reference's Data(id, value)).
  *
  * The streaming form of the same topology lives in
  * [[graft.streaming.EnrichmentPipeline]]; these batch queries pin the
  * *scalar semantics* (char-for-char) against DuckDB, which the
  * streaming tests then reuse.
  */
object EnrichOps {
  type Q = (SparkSession, String) => DataFrame

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  /** P1-P3 + P4 tag, fan-in collapsed to one projection (J1). */
  val enrichPipeline: Q = (s, d) =>
    docs(s, d)
      .select(col("doc_id"),
        reverseValue(col("text")).as("reversed"),
        upperValue(col("text")).as("uppered"),
        sortedChars(col("text")).as("sorted_chars"),
        transformedTag(col("doc_id")).as("additional"))
      .orderBy("doc_id")

  /** Error-as-value + DLQ routing (E2/E6/E8): a deterministic
    * classifier routes each row to ok / retry / dlq, mirroring
    * temporary-vs-unrecoverable classification
    * (AkkaEnrichmentPipeline.scala:170). The fault pattern is seeded
    * by doc_id so the oracle can reproduce it. */
  val dlqRouting: Q = (s, d) =>
    docs(s, d)
      .select(col("doc_id"),
        when(col("doc_id") % 10 === 7, lit("unrecoverable"))
          .when(col("doc_id") % 10 === 3, lit("temporary"))
          .otherwise(lit(null).cast("string")).as("error_class"))
      .withColumn("route",
        when(col("error_class").isNull, "ok")
          .when(col("error_class") === "temporary", "retry")
          .otherwise("dlq"))
      .orderBy("doc_id")

  val defs: Map[String, Q] = Map(
    "enrich_pipeline" -> enrichPipeline,
    "enrich_dlq_routing" -> dlqRouting)

  // lazy: oracle strings interpolate constants from SIBLING operator
  // objects (TextOps -> SimilarityOps.Dims, SimilarityOps -> DedupOps
  // delta constants, DedupOps -> TextOps.oracle), so eager init here
  // would make the map's value depend on which object the JVM
  // happened to initialize first (a mid-cycle read sees null). Lazy
  // defers interpolation past every clinit.
  lazy val oracle: Map[String, String] = Map(
    "enrich_pipeline" ->
      s"""SELECT doc_id, reverse(text) AS reversed, upper(text) AS uppered,
          ${sqlSortedChars("text")} AS sorted_chars,
          ${sqlTransformedTag("doc_id")} AS additional
          FROM documents ORDER BY doc_id""",
    "enrich_dlq_routing" ->
      """SELECT doc_id,
           CASE WHEN doc_id % 10 = 7 THEN 'unrecoverable'
                WHEN doc_id % 10 = 3 THEN 'temporary'
                ELSE NULL END AS error_class,
           CASE WHEN doc_id % 10 = 3 THEN 'retry'
                WHEN doc_id % 10 = 7 THEN 'dlq'
                ELSE 'ok' END AS route
         FROM documents ORDER BY doc_id""")
}
