package graft

import org.apache.spark.unsafe.types.UTF8String

import graft.functions.EditExprs

/** Pins for the Damerau–Levenshtein kernel and `dedup_damerau`: the
  * unrestricted-variant fingerprint cases, an independent
  * exponential-recursion mirror on short fuzz strings, the DL ≤ Lev
  * invariant on the real candidate pairs, and the SQL registration.
  */
class DamerauSpec extends SparkSpec {

  private def dl(a: String, b: String): Long =
    EditExprs.damerau(UTF8String.fromString(a), UTF8String.fromString(b))

  /** Independent mirror: naive recursive unrestricted DL with
    * memoization over (suffix, suffix) — exponential transposition
    * branch included, usable only on short strings. */
  private def refDl(a: String, b: String): Long = {
    val memo = scala.collection.mutable.Map.empty[(String, String), Long]
    def go(x: String, y: String): Long = memo.getOrElseUpdate((x, y), {
      if (x.isEmpty) y.length.toLong
      else if (y.isEmpty) x.length.toLong
      else {
        var best = go(x.tail, y.tail) +
          (if (x.head == y.head) 0L else 1L)
        best = best.min(go(x.tail, y) + 1L).min(go(x, y.tail) + 1L)
        // unrestricted transposition: swap x's first occurrence of
        // y.head into front position via adjacent swaps
        val i = x.indexOf(y.head)
        val j = y.indexOf(x.head)
        if (i > 0 && j > 0)
          best = best.min(go(x.substring(i + 1), y.substring(j + 1)) +
            (i - 1) + 1L + (j - 1))
        best
      }
    })
    go(a, b)
  }

  test("kernel: the unrestricted-variant fingerprints and classics") {
    assert(dl("CA", "ABC") == 2L,
      "restricted OSA says 3; Lowrance-Wagner (and DuckDB) say 2")
    assert(dl("ab", "ba") == 1L)
    assert(dl("abcd", "acbd") == 1L)
    assert(dl("kitten", "sitting") == 3L)
    assert(dl("", "abc") == 3L && dl("abc", "") == 3L)
    assert(dl("same", "same") == 0L)
  }

  test("kernel matches an independent recursive mirror on a " +
      "deterministic fuzz set") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val a = Seq.fill(rnd.nextInt(7))(('a' + rnd.nextInt(3)).toChar)
        .mkString
      val b = Seq.fill(rnd.nextInt(7))(('a' + rnd.nextInt(3)).toChar)
        .mkString
      assert(dl(a, b) == refDl(a, b), s"'$a' vs '$b'")
      assert(dl(a, b) == dl(b, a), s"symmetry: '$a' vs '$b'")
    }
  }

  test("affix trim is invisible: forced shared prefixes/suffixes " +
      "over a 2-char alphabet still match the mirror (the " +
      "transposition-anchor-across-the-trim-boundary corner)") {
    val rnd = new scala.util.Random(1414)
    def mk(n: Int, k: Int) =
      Seq.fill(n)(('a' + rnd.nextInt(k)).toChar).mkString
    (1 to 600).foreach { _ =>
      // alphabet size 2: maximal chance a trimmed prefix/suffix char
      // could anchor a cross-boundary transposition if the trim were
      // unsound — lengths small enough for the exponential mirror
      val p = mk(rnd.nextInt(4), 2)
      val s = mk(rnd.nextInt(4), 2)
      val a = p + mk(rnd.nextInt(5), 2) + s
      val b = p + mk(rnd.nextInt(5), 2) + s
      assert(dl(a, b) == refDl(a, b), s"'$a' vs '$b'")
    }
  }

  test("query: DL never exceeds Levenshtein on the real candidates; " +
      "the gain column is their exact difference") {
    val rows = SparkEntry.queries("dedup_damerau")(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val dlD = r.getAs[Long]("dl_dist")
      val lev = r.getAs[Long]("lev_dist")
      assert(dlD <= lev, "a transposition can only help")
      assert(r.getAs[Long]("transposition_gain") == lev - dlD)
    }
  }

  test("the SQL front door serves graft_damerau") {
    val r = spark.sql("SELECT graft_damerau('CA', 'ABC') AS d")
      .collect().head
    assert(r.getLong(0) == 2L)
  }
}
