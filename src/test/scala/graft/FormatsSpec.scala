package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Source-format coverage: the engine reads the same relation from
  * parquet, JSON-lines and CSV identically (explicit schema +
  * microsecond timestamp format for the text formats — schema
  * inference on text is banned at scale: one pass to infer is one
  * full extra read of 100 TB). */
class FormatsSpec extends SparkSpec {
  import spark.implicits._

  private val TsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"

  test("events round-trip through ORC losslessly") {
    val dir = tmpDir("fmt-orc")
    val events = Tables.events(spark, Sf)
    events.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema === events.schema)
    val a = events.orderBy("event_id").collect()
    val b = back.orderBy("event_id").collect()
    assert(a.sameElements(b), "ORC round-trip must be lossless")
  }

  test("schema evolution: mergeSchema unions old and new parquet layouts") {
    // the 100 TB lake reality: yesterday's files lack today's column.
    // mergeSchema must read both generations as one relation, with the
    // missing column null for old files — no rewrite of history
    val dir = tmpDir("fmt-evolve")
    val docs = Tables.documents(spark, Sf)
    docs.select(col("doc_id"), col("lang"))
      .write.parquet(s"$dir/gen=1")
    docs.select(col("doc_id"), col("lang"), col("n_chars"))
      .write.parquet(s"$dir/gen=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet === Set("doc_id", "lang", "n_chars", "gen"))
    assert(merged.count() === docs.count() * 2)
    assert(merged.filter(col("gen") === 1 && col("n_chars").isNull).count()
      === docs.count(), "old-generation rows surface the new column as null")
    assert(merged.filter(col("gen") === 2 && col("n_chars").isNotNull).count()
      === docs.count())
  }

  test("events round-trip through JSON lines with explicit schema") {
    val dir = tmpDir("fmt-json")
    val events = Tables.events(spark, Sf)
    events.write.mode("overwrite")
      .option("timestampFormat", TsFmt).json(dir)
    val back = spark.read
      .schema(events.schema)
      .option("timestampFormat", TsFmt).json(dir)
    assert(back.count() === events.count())
    val a = events.orderBy("event_id").collect()
    val b = back.orderBy("event_id").collect()
    assert(a.sameElements(b), "JSON round-trip must be lossless")
  }

  test("events round-trip through CSV with explicit schema") {
    val dir = tmpDir("fmt-csv")
    // props holds JSON (quotes + commas) — exactly what CSV quoting
    // must survive
    val events = Tables.events(spark, Sf)
    events.write.mode("overwrite")
      .option("header", "true").option("timestampFormat", TsFmt).csv(dir)
    val back = spark.read
      .schema(events.schema)
      .option("header", "true").option("timestampFormat", TsFmt).csv(dir)
    val a = events.orderBy("event_id").collect()
    val b = back.orderBy("event_id").collect()
    assert(a.sameElements(b), "CSV round-trip must be lossless")
  }

  test("csv/json relations run the same query as parquet") {
    val dir = tmpDir("fmt-q")
    val events = Tables.events(spark, Sf)
    events.write.mode("overwrite")
      .option("timestampFormat", TsFmt).json(dir)
    val viaJson = spark.read.schema(events.schema)
      .option("timestampFormat", TsFmt).json(dir)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .orderBy("event_type").as[(String, Long)].collect().toSeq
    val viaParquet = events
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .orderBy("event_type").as[(String, Long)].collect().toSeq
    assert(viaJson === viaParquet)
  }
}
