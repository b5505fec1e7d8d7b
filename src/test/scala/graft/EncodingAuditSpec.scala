package graft

import org.apache.spark.sql.functions._

/** Pins for `text_encoding_audit`: the detectors proven on injected
  * dirty strings (replacement char counted, C0 controls counted with
  * tab/newline/CR exempt), and conservation of the per-source char
  * totals against a direct scan.
  */
class EncodingAuditSpec extends SparkSpec {

  test("detectors: U+FFFD and C0 controls counted, tab/newline " +
      "exempt, ascii strip keeps ascii only") {
    // SOH () is in the counted class; tab and newline are not
    val dirty = "ab�c�d\te\nf"
    import spark.implicits._
    val r = Seq(dirty).toDF("t")
      .select(
        regexp_count(col("t"), lit("�")).cast("long").as("nr"),
        regexp_count(col("t"),
          lit("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]")).cast("long").as("nc"),
        length(regexp_replace(lit("aé漢b"), "[^\\x00-\\x7F]", ""))
          .cast("long").as("na"))
      .collect().head
    assert(r.getAs[Long]("nr") == 2L, "two replacement chars")
    assert(r.getAs[Long]("nc") == 1L, "SOH counts; tab and newline exempt")
    assert(r.getAs[Long]("na") == 2L, "'a' and 'b' survive the strip")
  }

  test("per-source totals conserve the corpus; ratios exact") {
    val rows = SparkEntry.queries("text_encoding_audit")(spark, Sf)
      .collect()
    assert(rows.nonEmpty)
    val direct = graft.sources.Tables.documents(spark, Sf)
      .agg(count(lit(1)), sum(length(col("text")).cast("long")))
      .collect().head
    assert(rows.map(_.getAs[Long]("n_docs")).sum == direct.getLong(0))
    assert(rows.map(_.getAs[Long]("n_chars")).sum == direct.getLong(1))
    rows.foreach { r =>
      val a = r.getAs[Long]("n_ascii_chars")
      val c = r.getAs[Long]("n_chars")
      assert(a <= c)
      assert(r.getAs[Double]("ascii_ratio") == a.toDouble / c.toDouble)
      assert(r.getAs[Long]("docs_with_replacement") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("docs_with_control") <= r.getAs[Long]("n_docs"))
    }
  }
}
