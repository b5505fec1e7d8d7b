package graft

import org.apache.spark.sql.functions._

import graft.operators.SimilarityOps

/** Pins for `ann_probe_cost`: exact agreement with a driver-side
  * Σn² fold over the gated cell relations, the Cauchy-Schwarz lower
  * bound (a perfectly balanced layout reads N/cells per probe —
  * nothing reads less), and the degenerate one-cell corpus paying
  * the full scan. */
class ProbeCostSpec extends SparkSpec {

  test("both layouts match a driver-side fold of their gated cells") {
    val lsh = SimilarityOps.annLshBuckets(spark, Sf)
      .select("n").collect().map(_.getLong(0))
    val ivf = SimilarityOps.kmeansAssign(spark, Sf)
      .groupBy("assigned").count()
      .select("count").collect().map(_.getLong(0))
    def want(ns: Seq[Long]) =
      (ns.size.toLong, ns.sum, ns.max, ns.map(n => n * n).sum,
        ns.map(n => n * n).sum.toDouble / ns.sum.toDouble)
    val got = SparkEntry.queries("ann_probe_cost")(spark, Sf)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got("lsh") == want(lsh.toSeq))
    assert(got("ivf") == want(ivf.toSeq))
  }

  test("expected scan is bounded below by the balanced layout") {
    SparkEntry.queries("ann_probe_cost")(spark, Sf).collect()
      .foreach { r =>
        val (cells, n, scan) =
          (r.getLong(1), r.getLong(2), r.getDouble(5))
        assert(scan >= n.toDouble / cells.toDouble - 1e-9,
          s"${r.getString(0)}: Σn²/N >= N/cells by Cauchy-Schwarz")
        assert(scan <= n.toDouble, "one probe never exceeds the corpus")
      }
  }

  test("a one-cell degenerate corpus pays the full scan per probe") {
    import spark.implicits._
    val dims = SimilarityOps.Dims
    val rows = (0L to 11L).map(i => (i, Array.fill(dims)(0.5f), 0))
    val dir = tmpDir("probecost-planted")
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val lsh = SimilarityOps.annProbeCost(spark, dir).collect()
      .find(_.getString(0) == "lsh").get
    assert(lsh.getLong(1) == 1L, "identical vectors share one bucket")
    assert(lsh.getDouble(5) == 12.0, "every probe scans everything")
  }
}
