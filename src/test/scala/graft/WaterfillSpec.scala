package graft

import graft.operators.TextOps

/** Pins for `doc_budget_waterfill`: the closed-form allocation equals
  * the hand-computed water-filling on a planted skew, the integer
  * remainder lands deterministically, and the max-min-fair invariants
  * hold on the real corpus (budget exhausted exactly, nobody
  * over-allocated, unfunded sources within one token of each other).
  */
class WaterfillSpec extends SparkSpec {

  /** One doc per source with exactly `n` whitespace tokens. */
  private def fixture(tokens: Map[String, Int]): String = {
    val docs = tokens.toSeq.zipWithIndex.map { case ((src, n), i) =>
      val text = Seq.fill(n)("t").mkString(" ")
      (i.toLong, text, "en", src, text.length.toLong)
    }
    val dir = tmpDir("waterfill-planted")
    import spark.implicits._
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  private def run(dir: String): Map[String, (Long, Long, Long)] =
    TextOps.docBudgetWaterfill(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("tokens"), r.getAs[Long]("funded"),
          r.getAs[Long]("alloc")))).toMap

  test("planted skew matches the hand-computed water level") {
    // total 1650, budget 825; a(100) and b(150) fit under the level,
    // remainder 575 over {c, d}: base 287, one leftover token goes to
    // the smaller source name
    val got = run(fixture(Map("a" -> 100, "b" -> 150, "c" -> 400,
      "d" -> 1000)))
    assert(got("a") == ((100L, 1L, 100L)))
    assert(got("b") == ((150L, 1L, 150L)))
    assert(got("c") == ((400L, 0L, 288L)), "c takes the +1 remainder")
    assert(got("d") == ((1000L, 0L, 287L)))
    assert(got.values.map(_._3).sum == 825L, "budget exhausted exactly")
  }

  test("uniform sources split the budget evenly") {
    val got = run(fixture(Map("a" -> 300, "b" -> 300, "c" -> 300,
      "d" -> 300)))
    // budget 600 over four equal unfunded sources
    assert(got.values.forall(v => v._2 == 0L && v._3 == 150L))
  }

  test("corpus run: max-min-fair invariants hold") {
    val got = run(Sf)
    val total = got.values.map(_._1).sum
    val budget = total / 2
    got.values.foreach { case (tokens, funded, alloc) =>
      assert(alloc <= tokens, "never allocate beyond a source's supply")
      if (funded == 1L) assert(alloc == tokens)
    }
    val unfunded = got.values.filter(_._2 == 0L).map(_._3)
    if (unfunded.nonEmpty) {
      assert(got.values.map(_._3).sum == budget,
        "with any unfunded source the budget is exhausted exactly")
      assert(unfunded.max - unfunded.min <= 1L,
        "water level: unfunded allocations differ by at most one token")
      val fundedTok = got.values.filter(_._2 == 1L).map(_._1)
      if (fundedTok.nonEmpty)
        assert(fundedTok.max <= unfunded.min,
          "funded supplies sit at or below the water level")
    } else {
      assert(got.values.map(_._3).sum == total)
    }
  }
}
