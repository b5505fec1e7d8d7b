package graft

/** Pins for `tf_good_turing`: the Good–Turing conservation identity
  * Σ_r N_r·r* = N − N₁ (the discounted mass equals the corpus minus
  * the hapax class — what gets reserved for unseen types), agreement
  * with `tf_freq_of_freq`, and the exactness of the divisions.
  */
class GoodTuringSpec extends SparkSpec {

  test("conservation: sum of (r+1)*N_{r+1} = mass of classes whose " +
      "predecessor class is nonempty; classes agree with tf_freq_of_freq") {
    val rows = SparkEntry.queries("tf_good_turing")(spark, Sf).collect()
    assert(rows.nonEmpty)
    val n = rows.head.getAs[Long]("n_total")
    val fof = SparkEntry.queries("tf_freq_of_freq")(spark, Sf).collect()
      .map(r => r.getAs[Long]("occurrences") -> r.getAs[Long]("n_tokens"))
      .toMap
    // integer identity (gap-aware: real corpora have non-contiguous
    // count classes): Σ_r (r+1)·N_{r+1} over observed r equals
    // Σ s·N_s over classes s whose predecessor class s-1 is observed
    val lhs = rows.map(r => BigInt(r.getAs[Long]("occurrences") + 1) *
      BigInt(r.getAs[Long]("n_types_next"))).sum
    val rhs = fof.collect {
      case (s, ns) if fof.contains(s - 1) => BigInt(s) * BigInt(ns)
    }.sum
    assert(lhs == rhs, "discounted mass accounts exactly for every " +
      "class reachable from an observed predecessor")
    // corpus total off the same relation
    assert(BigInt(n) ==
      fof.map { case (r, nr) => BigInt(r) * BigInt(nr) }.sum)
    rows.foreach { r =>
      assert(fof(r.getAs[Long]("occurrences")) == r.getAs[Long]("n_types"))
      val exp = ((r.getAs[Long]("occurrences") + 1) *
        r.getAs[Long]("n_types_next")).toDouble /
        r.getAs[Long]("n_types").toDouble
      assert(r.getAs[Double]("r_star") == exp)
      assert(r.getAs[Double]("gt_prob") == exp / n.toDouble)
    }
    // the largest observed class has no successor: r_star = 0 there
    val top = rows.maxBy(_.getAs[Long]("occurrences"))
    assert(top.getAs[Long]("n_types_next") == 0L &&
      top.getAs[Double]("r_star") == 0.0)
  }
}
