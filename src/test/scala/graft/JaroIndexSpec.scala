package graft

import org.apache.spark.unsafe.types.UTF8String

import scala.util.Random

/** Differential pin for the round-15 Jaro match-phase rewrite: the
  * kernel now serves long strings from a counting-sort byte-position
  * index (O(la + lb + 256) per pair) instead of the textbook
  * O(la·window) scan, with the scan retained below
  * `JaroIndexCutoff`. Both paths must realize the IDENTICAL
  * first-fit match set — this spec holds the textbook scan as an
  * independent reference (re-implemented here, not shared with the
  * kernel) and fuzzes the production function against it across both
  * regimes, the cutoff boundary, multibyte text, and adversarial
  * repeated-byte strings where the per-value pointer does the most
  * work. Bit-equality (==), not tolerance: the final double tree is
  * the same expression over the same integers or it is a bug.
  */
class JaroIndexSpec extends org.scalatest.funsuite.AnyFunSuite {

  /** Textbook reference: first-fit scan for ALL lengths — the
    * pre-round-15 kernel verbatim (and the published Jaro
    * convention: window floor(max/2)−1, left-to-right first fit,
    * half-transpositions). */
  private def jaroRef(sa: String, sb: String): Double = {
    val a = UTF8String.fromString(sa).getBytes
    val b = UTF8String.fromString(sb).getBytes
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    if (java.util.Arrays.equals(a, b)) return 1.0
    var window = (if (la > lb) la else lb) / 2 - 1
    if (window < 0) window = 0
    val ma = new Array[Boolean](la)
    val mb = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      var j = if (i > window) i - window else 0
      val hi = if (i + window < lb - 1) i + window else lb - 1
      var found = false
      while (!found && j <= hi) {
        if (!mb(j) && a(i) == b(j)) {
          ma(i) = true; mb(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mb(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    (m.toDouble / la + m.toDouble / lb + (m - t).toDouble / m) / 3.0
  }

  private def jaro(a: String, b: String): Double =
    graft.functions.EditExprs.jaro(
      UTF8String.fromString(a), UTF8String.fromString(b))

  private def check(a: String, b: String): Unit = {
    val got = jaro(a, b)
    val want = jaroRef(a, b)
    assert(got == want,
      s"jaro mismatch: got $got want $want for lengths " +
        s"(${a.length}, ${b.length}) a=${a.take(40)} b=${b.take(40)}")
    // symmetry of the mismatch check, not of jaro itself (first-fit
    // is argument-order-dependent only in the matched SET, never in
    // its size — but pin the swapped call against the reference too)
    assert(jaro(b, a) == jaroRef(b, a))
  }

  private def randString(r: Random, len: Int, alphabet: String): String =
    (0 until len).map(_ => alphabet(r.nextInt(alphabet.length))).mkString

  test("fuzz: indexed long-string path == textbook scan (ASCII, " +
      "near-dup and unrelated, 300-800 bytes — the gate-document regime)") {
    val r = new Random(0x915L)
    val alpha = "abcdefghijklmnopqrstuvwxyz 0123456789"
    for (_ <- 1 to 400) {
      val la = 300 + r.nextInt(500)
      val a = randString(r, la, alpha)
      // near-dup: mutate ~5% of positions; unrelated: fresh draw
      val b =
        if (r.nextBoolean()) a.map(c =>
          if (r.nextInt(20) == 0) alpha(r.nextInt(alpha.length)) else c)
          .mkString + randString(r, r.nextInt(40), alpha)
        else randString(r, 300 + r.nextInt(500), alpha)
      check(a, b)
    }
  }

  test("fuzz: cutoff boundary — lengths chosen so la*(2w+1) straddles " +
      "4096 and both paths run on near-identical inputs") {
    val r = new Random(4096)
    val alpha = "abcde"
    for (_ <- 1 to 400) {
      val la = 55 + r.nextInt(30) // window ~ la/2: cost ~ la^2 ~ 3k-7k
      val a = randString(r, la, alpha)
      val b = randString(r, 55 + r.nextInt(30), alpha)
      check(a, b)
    }
  }

  test("fuzz: adversarial repeated-byte strings (tiny alphabet, long " +
      "runs) — maximal per-value pointer traffic") {
    val r = new Random(7)
    for (_ <- 1 to 200) {
      val a = randString(r, 200 + r.nextInt(400), "ab")
      val b = randString(r, 200 + r.nextInt(400), "ab")
      check(a, b)
      val runs = "a" * (100 + r.nextInt(200)) + "b" * r.nextInt(100)
      check(a, runs)
    }
  }

  test("fuzz: multibyte text walks bytes identically on both paths") {
    val r = new Random(42)
    val alpha = "δοκιμήテスト試験пробаabc今日 "
    for (_ <- 1 to 200) {
      val a = randString(r, 100 + r.nextInt(300), alpha)
      val b =
        if (r.nextBoolean())
          a.map(c => if (r.nextInt(15) == 0) alpha(r.nextInt(alpha.length))
                     else c).mkString
        else randString(r, 100 + r.nextInt(300), alpha)
      check(a, b)
    }
  }

  test("edges: empty, single byte, equal, disjoint alphabets, and " +
      "one long side driving the window past the short side") {
    check("", "")
    check("", "a" * 500)
    check("a", "a" * 500)
    check("x" * 400, "x" * 400) // equal fast path
    check("a" * 400, "b" * 400) // m == 0 on the indexed path
    check("ab" * 200, "ba" * 200)
    check("a" * 10, "a" * 10 + "b" * 900) // window >> short side
  }

  test("jaroWinkler shares the rewritten kernel: DuckDB-pinned " +
      "convention values are unchanged on a long-string pair") {
    val a = "prefix__" + "the quick brown fox jumps over the lazy dog " * 12
    val b = "prefix__" + "the quick brown fox jumped over a lazy dog! " * 12
    val j = jaroRef(a, b)
    val exp = if (j <= 0.7) j else {
      val ab = UTF8String.fromString(a).getBytes
      val bb = UTF8String.fromString(b).getBytes
      var l = 0
      while (l < 4 && ab(l) == bb(l)) l += 1
      j + l * 0.1 * (1.0 - j)
    }
    val got = graft.functions.EditExprs.jaroWinkler(
      UTF8String.fromString(a), UTF8String.fromString(b))
    assert(got == exp)
  }
}
