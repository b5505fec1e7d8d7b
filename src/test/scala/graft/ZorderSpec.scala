package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Pins for the Z-order layout audit (`q30_zorder_layout`): the
  * Morton interleave itself, the bounded-span property that makes
  * footer min/max pruning work on BOTH dimensions, and the
  * predicate-touch advantage over a row-order layout. */
class ZorderSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side Morton reference. */
  private def refZ(x: Long, y: Long): Long =
    (0 until Relational.ZBits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("column interleave matches the driver-side Morton reference " +
      "on a bucket-id grid") {
    val pairs = for (x <- 0L until 256L by 17L; y <- 0L until 256L by 23L)
      yield (x, y)
    val got = pairs.toDF("x", "y")
      .select(col("x"), col("y"),
        Relational.zInterleave(col("x"), col("y")).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap
    pairs.foreach { case (x, y) =>
      assert(got((x, y)) == refZ(x, y),
        s"interleave($x,$y) = ${got((x, y))}, expected ${refZ(x, y)}")
    }
  }

  test("every z-prefix bucket spans <= 64 of 256 bucket units in " +
      "BOTH dimensions (the footer-pruning property)") {
    val out = Relational.q30ZorderLayout(spark, Sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (zb, sx, sp) = (r.getLong(0),
        r.getLong(3) - r.getLong(2), r.getLong(5) - r.getLong(4))
      assert(sx <= 63L && sp <= 63L,
        s"z-bucket $zb spans $sx x $sp bucket units — a Morton " +
          "prefix of 4 bits must fix 2 top bits of each dimension")
    }
  }

  test("a one-quarter-range predicate on one dimension touches <= 4 " +
      "of 16 z-buckets; the row-order layout touches nearly all") {
    // z layout: buckets whose bx range intersects [0, 63]
    val zTouched = Relational.q30ZorderLayout(spark, Sf)
      .filter(col("min_bx") <= 63L).count()
    assert(zTouched <= 4L,
      s"bx in [0,63] must touch <= 4 z-buckets, touched $zTouched")
    // row-order layout: same rows chunked by natural scan order
    val side = 1L << Relational.ZBits
    val rows = spark.read.parquet(s"$Sf/lineitem.parquet")
      .select(col("l_orderkey").cast("long").as("ok"),
        col("l_linenumber").cast("long").as("ln"),
        col("l_suppkey").cast("long").as("sk"))
    val msk = rows.agg(max(col("sk"))).as[Long].head()
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("ok"), col("ln"))
    val naiveTouched = rows
      .withColumn("chunk", ntile(16).over(w))
      .withColumn("bx", expr(s"sk * $side div ($msk + 1)"))
      .groupBy(col("chunk")).agg(min(col("bx")).as("min_bx"))
      .filter(col("min_bx") <= 63L).count()
    assert(naiveTouched >= 14L,
      s"row-order chunks should nearly all contain low suppkeys " +
        s"(uncorrelated layout), touched only $naiveTouched of 16")
  }
}
