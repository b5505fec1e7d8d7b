package graft

import graft.operators.SimilarityOps

/** Pins for `kmeans_stability`: the Rand identity recomputed in the
  * driver from the engine's own contingency counts, its analytic
  * bounds, and the planted extremes — identical partitions at exactly
  * 1.0, and a deliberately shattered pairing far below it.
  */
class KmeansStabilitySpec extends SparkSpec {

  /** Rand index from a labeled pairing. */
  private def rand(pairs: Seq[(Long, Long)]): (Long, Long, Double) = {
    def c2(x: Long) = x * (x - 1) / 2
    val n = pairs.size.toLong
    val sAb = pairs.groupBy(identity).values
      .map(g => c2(g.size.toLong)).sum
    val sA = pairs.groupBy(_._1).values.map(g => c2(g.size.toLong)).sum
    val sB = pairs.groupBy(_._2).values.map(g => c2(g.size.toLong)).sum
    val agree = c2(n) + 2 * sAb - sA - sB
    (c2(n), agree, agree.toDouble / c2(n).toDouble)
  }

  test("the engine's Rand index satisfies the identity and bounds " +
      "at sf0.001") {
    val r = SparkEntry.queries("kmeans_stability")(spark, Sf)
      .collect().head
    val n = r.getAs[Long]("n_vecs")
    val total = r.getAs[Long]("pairs_total")
    val agree = r.getAs[Long]("pairs_agree")
    assert(n == spark.read.parquet(s"$Sf/embeddings.parquet").count())
    assert(total == n * (n - 1) / 2)
    assert(agree >= 0L && agree <= total,
      "the Rand numerator is a pair count")
    assert(r.getAs[Double]("rand_index") ==
      agree.toDouble / total.toDouble)
    assert(r.getAs[Long]("n_clusters_a") >= 1L &&
      r.getAs[Long]("n_clusters_a") <= 10L)
    assert(r.getAs[Long]("n_clusters_b") >= 1L &&
      r.getAs[Long]("n_clusters_b") <= 10L)
  }

  test("the driver Rand identity pins the extremes the index must " +
      "separate") {
    // identical partitions agree on every pair
    val same = (1L to 12L).map(i => (i % 3, i % 3))
    assert(rand(same)._3 == 1.0)
    // a maximally crossed pairing agrees on far fewer
    val crossed = (1L to 12L).map(i => (i % 3, i % 4))
    assert(rand(crossed)._3 < 0.8)
    // and the engine's own number sits in (0, 1]
    val engine = SparkEntry.queries("kmeans_stability")(spark, Sf)
      .collect().head.getAs[Double]("rand_index")
    assert(engine > 0.0 && engine <= 1.0)
  }
}
