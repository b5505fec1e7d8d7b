package graft

import graft.operators.SimilarityOps

/** Pins for `emb_class_separation`: a driver-side exact mirror of the
  * quantized scatter/centroid-distance arithmetic at sf0.001, and a
  * planted three-cluster fixture hitting the separated, the bleeding,
  * and the nearest-neighbor-argmin arms.
  */
class ClassSeparationSpec extends SparkSpec {

  /** Driver mirror of quantizedLong + the class-separation moments. */
  private def mirror(vecs: Seq[(Long, Array[Float], Long)])
      : Map[Long, (Long, Double, Long, Double)] = {
    val dims = vecs.head._2.length
    val lanes = (0 until dims).map { dim =>
      val vs = vecs.map(_._2(dim).toDouble)
      (vs.min, vs.max)
    }
    def q(v: Double, dim: Int): Long = {
      val (lo, hi) = lanes(dim)
      (if (hi > lo) math.min(math.floor((v - lo) * 255.0 / (hi - lo)), 255.0)
       else 0.0).toLong - 128L
    }
    val byLabel = vecs.groupBy(_._3)
    val perDim: Map[Long, Array[(Long, Long, Long)]] =
      byLabel.view.mapValues { vs =>
        (0 until dims).map { dim =>
          val qs = vs.map(v => q(v._2(dim).toDouble, dim))
          (qs.sum, qs.map(x => x * x).sum, qs.size.toLong)
        }.toArray
      }.toMap
    perDim.map { case (label, moms) =>
      val n = moms.head._3
      val w = moms.map { case (sq, q2, nn) =>
        BigInt(nn) * BigInt(q2) - BigInt(sq) * BigInt(sq) }.sum
      val intra = w.toDouble / (n * n).toDouble
      val others = perDim.keys.filter(_ != label).toSeq.sorted.map { lb =>
        val mb = perDim(lb)
        val nb = mb.head._3
        val dnum = moms.zip(mb).map { case ((sa, _, na), (sb, _, _)) =>
          val diff = BigInt(sa) * BigInt(nb) - BigInt(sb) * BigInt(na)
          diff * diff
        }.sum
        lb -> (dnum.toDouble /
          (BigInt(n * nb) * BigInt(n * nb)).toDouble)
      }
      val (nl, nd) = others.minBy { case (lb, d2) => (d2, lb) }
      label -> ((n, intra, nl, nd))
    }
  }

  test("matches a driver-side exact mirror at sf0.001") {
    val vecs = spark.read.parquet(s"$Sf/embeddings.parquet")
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray,
        r.getAs[Number](2).longValue()))
    val exp = mirror(vecs.toSeq)
    val got = SparkEntry.queries("emb_class_separation")(spark, Sf)
      .collect().map(r => r.getAs[Long]("label") -> r).toMap
    assert(got.size == exp.size)
    exp.foreach { case (label, (n, intra, nl, nd)) =>
      val r = got(label)
      assert(r.getAs[Long]("n") == n, s"label $label")
      assert(r.getAs[Double]("intra_ms") == intra, s"label $label")
      assert(r.getAs[Long]("nearest_label") == nl, s"label $label")
      assert(r.getAs[Double]("nearest_d2") == nd, s"label $label")
      assert(r.getAs[Double]("sep_ratio") ==
        (if (intra > 0.0) nd / intra else 0.0), s"label $label")
      assert(r.getAs[Boolean]("separated") == (nd > intra * 4.0),
        s"label $label")
    }
  }

  test("planted: tight far-apart clusters separate; a diffuse middle " +
      "cluster bleeds; nearest is the argmin with label tie-break") {
    import spark.implicits._
    def v(x: Float, y: Float) = Array(x, y)
    val rows =
      // label 0: tight cluster at the low corner
      Seq((1L, v(0f, 0f), 0L), (2L, v(0.2f, 0f), 0L),
        (3L, v(0f, 0.2f), 0L), (4L, v(0.2f, 0.2f), 0L)) ++
        // label 1: tight cluster at the high corner
        Seq((11L, v(10f, 10f), 1L), (12L, v(10.2f, 10f), 1L),
          (13L, v(10f, 10.2f), 1L), (14L, v(10.2f, 10.2f), 1L)) ++
        // label 2: diffuse, centered nearer label 0
        Seq((21L, v(1f, 1f), 2L), (22L, v(6f, 6f), 2L),
          (23L, v(1f, 6f), 2L), (24L, v(6f, 1f), 2L))
    val dir = tmpDir("classsep-planted")
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val out = SimilarityOps.embClassSeparation(spark, dir).collect()
      .map(r => r.getAs[Long]("label") -> r).toMap
    assert(out.size == 3)
    assert(out(0L).getAs[Boolean]("separated"),
      "a tight cluster far from everything must separate")
    assert(out(0L).getAs[Double]("sep_ratio") > 4.0)
    assert(out(1L).getAs[Boolean]("separated"))
    assert(!out(2L).getAs[Boolean]("separated"),
      "a diffuse cluster spanning the space bleeds into its neighbors")
    assert(out(2L).getAs[Long]("nearest_label") == 0L,
      "label 2's centroid sits nearer label 0 by construction")
    // the mirror agrees on the planted corpus too
    val exp = mirror(rows)
    out.foreach { case (l, r) =>
      assert(r.getAs[Double]("intra_ms") == exp(l)._2, s"label $l")
      assert(r.getAs[Double]("nearest_d2") == exp(l)._4, s"label $l")
    }
  }
}
