package graft

import org.apache.spark.sql.functions._

import graft.operators.SimilarityOps

/** Pins for `emb_centroid_drift`: exact agreement with a driver-side
  * BigDecimal recomputation (the same string→decimal sum the query
  * rides), a planted single-dim drift localized to exactly that dim,
  * and the untouched-label zero (old set == new set → shift exactly
  * 0.0, no epsilon).
  */
class CentroidDriftSpec extends SparkSpec {

  private def refMeans(rows: Seq[(Long, Array[Float])])
      : Map[Int, Double] = {
    val byDim = rows.flatMap { case (_, e) => e.zipWithIndex }
      .groupBy(_._2)
    byDim.map { case (dim, vs) =>
      val sum = vs.map(v => BigDecimal(v._1.toString)).sum
      dim -> (sum.toDouble / vs.size.toDouble)
    }
  }

  test("agrees with a driver-side BigDecimal recomputation") {
    val all = spark.read.parquet(s"$Sf/embeddings.parquet")
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray,
        r.getInt(2).toLong))
    val want = all.groupBy(_._3).map { case (label, rs) =>
      val newM = refMeans(rs.toSeq.map(r => (r._1, r._2)))
      val oldM = refMeans(rs.toSeq
        .filter(_._1 % 10 != SimilarityOps.DriftTag)
        .map(r => (r._1, r._2)))
      val shifts = newM.keys.map(d => math.abs(newM(d) - oldM(d))).toSeq
      label -> ((shifts.size.toLong, shifts.max, shifts.min,
        shifts.count(_ > SimilarityOps.DriftEps).toLong))
    }
    val got = SparkEntry.queries("emb_centroid_drift")(spark, Sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4)))).toMap
    assert(got == want)
  }

  test("a planted single-dim ingest shift drifts exactly that dim; " +
      "an untouched label reads exactly zero") {
    import spark.implicits._
    val dims = SimilarityOps.Dims
    def base: Array[Float] = Array.fill(dims)(0.5f)
    // label 0: ids 0..18 (residues 0..9 present); the tag-9 rows get
    // +1.0 on dim 0 only.  label 1: no tag-9 ids at all.
    val l0 = (0L to 18L).map { i =>
      val e = base
      if (i % 10 == SimilarityOps.DriftTag) e(0) += 1.0f
      (i, e, 0)
    }
    val l1 = Seq(20L, 21L, 22L, 23L).map(i => (i, base, 1))
    val dir = tmpDir("drift-planted")
    (l0 ++ l1).toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val got = SparkEntry.queries("emb_centroid_drift")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4)))).toMap
    val (nDims0, max0, min0, drifted0) = got(0L)
    assert(nDims0 == dims.toLong)
    assert(drifted0 == 1L, s"only dim 0 drifts, got $got")
    assert(max0 > 0.05 && min0 == 0.0)
    assert(got(1L) == ((dims.toLong, 0.0, 0.0, 0L)),
      "an untouched label must read exactly zero drift")
  }
}
