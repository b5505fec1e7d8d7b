package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet testdata (TESTDATA.md).
  *
  * All tables are read straight from parquet so Catalyst gets native
  * vectorized scans with predicate pushdown and column pruning; at
  * cluster scale the same call works on a directory of many files.
  * Dimension tables (region/nation/supplier/part) are small enough to
  * broadcast at any scale factor — query code marks them with
  * `broadcast(...)` at the join site rather than here, so the hint sits
  * next to the join it affects.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `events.ts` is TIMESTAMP(NANOS) in-file, which Spark's parquet
    * reader rejects outright. Sessions must set
    * `spark.sql.legacy.parquet.nanosAsLong=true` (see
    * [[graft.GraftSession]]); the raw nanos are then converted to a
    * proper microsecond timestamp with *integer* division — `/` on
    * Columns is double division and int64 nanos (~1.7e18) exceed
    * double's 2^53 exact range. */
  def events(s: SparkSession, d: String): DataFrame =
    load(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
