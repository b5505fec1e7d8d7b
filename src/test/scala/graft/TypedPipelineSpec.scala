package graft

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.col

import graft.model.{Data, EnrichedData, OutputData, Widget}
import graft.streaming.EnrichmentPipeline

/** The typed `Dataset[T]` surface promised by SURVEY §1.2: the
  * reference's exact case-class model (Data → EnrichedData →
  * OutputData, Services.scala:26-35) flows through plain Scala
  * functions, and the result is identical to the engine's
  * column-projection enrichment — the same nested-struct schema, the
  * same values, interchangeable surfaces. */
class TypedPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val input = (0L until 50L).map(i => Data(i, s"Input Data: $i"))

  test("typed map over the reference model equals the column projection") {
    val typed: Dataset[OutputData] = input.toDS().map { d =>
      OutputData(
        EnrichedData(d, d.value.reverse, d.value.toUpperCase,
          Widget(d.value.sorted)),
        s"transformed ${d.id}")
    }
    val viaColumns: Dataset[OutputData] =
      EnrichmentPipeline.enrich(input.toDF("id", "value"))
        .select(col("out.*")).as[OutputData]
    assert(typed.collect().sortBy(_.data.input.id).toSeq ===
      viaColumns.collect().sortBy(_.data.input.id).toSeq)
  }

  test("nested struct schema round-trips through the typed encoder") {
    val df = EnrichmentPipeline.enrich(input.toDF("id", "value"))
      .select(col("out.*"))
    // encoder-derived schema and projection schema agree field-for-field
    assert(df.as[OutputData].schema === df.schema)
    // P7 nested field access works on both surfaces
    val typedIds = df.as[OutputData].map(_.data.input.id).collect().sorted
    val colIds = df.select(col("data.input.id")).as[Long].collect().sorted
    assert(typedIds.toSeq === colIds.toSeq)
  }
}
