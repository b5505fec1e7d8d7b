package graft

import graft.operators.TextOps

/** Pins for `tf_kn_prob`: a driver-side recompute of the interpolated
  * Kneser-Ney estimate at sf0.001 with the identical double tree, and
  * the planted "Francisco" shape — a word frequent only inside one
  * collocation gets a LOWER smoothed share than raw MLE gives it.
  */
class KnProbSpec extends SparkSpec {

  private def bigrams(text: String): Seq[(String, String)] = {
    val t = text.split(" ").filter(_.nonEmpty).toSeq
    t.zip(t.drop(1))
  }

  test("matches a driver-side recompute at sf0.001") {
    import org.apache.spark.sql.functions._
    val texts = spark.read.parquet(s"$Sf/documents.parquet")
      .select(col("text")).collect().map(_.getString(0)).toSeq
    val all = texts.flatMap(bigrams)
    val cBig = all.groupBy(identity).map { case (k, v) =>
      k -> v.size.toLong
    }
    val cW1 = cBig.groupBy(_._1._1).map { case (w1, m) =>
      w1 -> m.values.sum
    }
    val rTypes = cBig.groupBy(_._1._1).map { case (w1, m) =>
      w1 -> m.size.toLong
    }
    val lTypes = cBig.groupBy(_._1._2).map { case (w2, m) =>
      w2 -> m.size.toLong
    }
    val n = cBig.size.toLong
    val d = TextOps.KnDiscount
    val got = SparkEntry.queries("tf_kn_prob")(spark, Sf).collect()
    assert(got.length == 50)
    got.foreach { r =>
      val (w1, w2) = (r.getAs[String]("w1"), r.getAs[String]("w2"))
      val cb = cBig((w1, w2))
      assert(r.getAs[Long]("c_bigram") == cb, s"($w1,$w2)")
      assert(r.getAs[Long]("c_w1") == cW1(w1))
      assert(r.getAs[Long]("right_types") == rTypes(w1))
      assert(r.getAs[Long]("left_types") == lTypes(w2))
      assert(r.getAs[Long]("n_distinct_bigrams") == n)
      val want = ((cb.toDouble - d) / cW1(w1).toDouble) +
        (d * rTypes(w1).toDouble / cW1(w1).toDouble) *
          (lTypes(w2).toDouble / n.toDouble)
      assert(r.getAs[Double]("p_kn") == want, s"($w1,$w2)")
    }
    // smoothing must actually move mass somewhere in the top 50
    assert(got.exists { r =>
      val mle = r.getAs[Long]("c_bigram").toDouble /
        r.getAs[Long]("c_w1").toDouble
      math.abs(r.getAs[Double]("p_kn") - mle) > 1e-9
    })
  }

  test("planted Francisco: one-collocation words are discounted " +
      "below their raw MLE share") {
    import spark.implicits._
    val dir = tmpDir("kn-planted")
    // 'francisco' appears 20x, ALWAYS after 'san' (left_types = 1);
    // 'road' appears 8x after 8 different words (left_types = 8)
    val docs =
      (1 to 20).map(i => s"san francisco trip $i") ++
        Seq("main road", "old road", "new road", "long road",
          "short road", "wide road", "busy road", "quiet road")
    docs.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, "en", "web", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val out = TextOps.tfKnProb(spark, dir).collect()
      .map(r => (r.getAs[String]("w1"), r.getAs[String]("w2")) -> r)
      .toMap
    val sf = out(("san", "francisco"))
    // raw MLE of (san -> francisco) is 1.0; KN discounts it because
    // francisco continues only one context
    val mle = sf.getAs[Long]("c_bigram").toDouble /
      sf.getAs[Long]("c_w1").toDouble
    assert(mle == 1.0)
    assert(sf.getAs[Double]("p_kn") < 1.0)
    assert(sf.getAs[Long]("left_types") == 1L)
    // every 'road' bigram keeps more of its (identical) MLE share
    // than the discount takes from francisco in relative terms:
    // road's continuation prob (8/N) exceeds francisco's (1/N)
    val rd = out(("main", "road"))
    assert(rd.getAs[Long]("left_types") == 8L)
  }
}
