package graft

import org.apache.spark.unsafe.types.UTF8String

import scala.util.Random

/** Differential pin for the round-16 affix-trimmed Levenshtein
  * kernels: `EditExprs.levenshtein` must be bit-identical to Spark's
  * builtin (`UTF8String.levenshteinDistance`) and
  * `EditExprs.levenshteinCapped` to the builtin's thresholded form
  * (`levenshteinDistance(other, k)`: distance when <= k, −1
  * otherwise) — the two references are the EXACT functions
  * `dedup_edit_distance` / `dedup_damerau` / `dedup_edit_banded`
  * computed before the swap, so equality here plus the unchanged
  * DuckDB oracles is the whole correctness argument. The fuzz
  * emphasizes the shapes the trim must not break: forced long shared
  * prefixes/suffixes (the trim's own regime), full-overlap strings
  * (prefix walk consuming everything), edits at the trim boundary,
  * supplementary-plane codepoints (the codepoint-vs-UTF-16 walk),
  * and band-edge distances around the capped kernel's threshold. */
class LevTrimSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def ref(a: String, b: String): Long =
    UTF8String.fromString(a)
      .levenshteinDistance(UTF8String.fromString(b)).toLong

  private def refCap(a: String, b: String, k: Int): Long =
    UTF8String.fromString(a)
      .levenshteinDistance(UTF8String.fromString(b), k).toLong

  private def got(a: String, b: String): Long =
    graft.functions.EditExprs.levenshtein(
      UTF8String.fromString(a), UTF8String.fromString(b))

  private def gotCap(a: String, b: String, k: Int): Long =
    graft.functions.EditExprs.levenshteinCapped(
      UTF8String.fromString(a), UTF8String.fromString(b), k)

  private def check(a: String, b: String): Unit = {
    assert(got(a, b) == ref(a, b),
      s"levenshtein mismatch on a=${a.take(60)} b=${b.take(60)}")
    for (k <- Seq(0, 1, 2, 3, 8, 64)) {
      assert(gotCap(a, b, k) == refCap(a, b, k),
        s"capped($k) mismatch on a=${a.take(60)} b=${b.take(60)}")
    }
  }

  test("hand cases: empties, equals, affix-only differences") {
    check("", "")
    check("", "abc")
    check("abc", "")
    check("same", "same")
    check("kitten", "sitting")
    check("prefix-common-X-suffix", "prefix-common-Y-suffix")
    // full prefix overlap: one string is a prefix of the other
    check("abcdef", "abc")
    check("abc", "abcdef")
    // full suffix overlap
    check("xyzabc", "abc")
    // edit exactly at the trim boundary
    check("aaXbb", "aaYbb")
    check("aaXbb", "aabb")
  }

  test("supplementary-plane codepoints walk as one unit") {
    val g = new String(Character.toChars(0x1F600)) // 😀: 2 UTF-16 units
    check(s"a${g}b", s"a${g}b")
    check(s"a${g}b", "aXb") // substitute a supplementary cp: 1 edit
    check(s"${g}${g}", s"${g}")
    check(s"pre${g}post", "prepost")
  }

  test("fuzz: random strings with forced shared affixes, both regimes") {
    val rnd = new Random(0xED17)
    val alphabets = Seq("ab", "abcde", "abcdefghij é中",
      "a" + new String(Character.toChars(0x1F4A9)) + "bc")
    for (_ <- 1 to 4000) {
      val alpha = alphabets(rnd.nextInt(alphabets.size))
      def rs(n: Int): String =
        (1 to n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      val pre = rs(rnd.nextInt(30))
      val suf = rs(rnd.nextInt(30))
      val a = pre + rs(rnd.nextInt(20)) + suf
      val b = pre + rs(rnd.nextInt(20)) + suf
      check(a, b)
    }
  }

  test("fuzz: near-dup shapes — long shared text with few edits") {
    val rnd = new Random(0x7514)
    for (_ <- 1 to 300) {
      val base = (1 to 200 + rnd.nextInt(400))
        .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      val sb = new StringBuilder(base)
      val edits = rnd.nextInt(6)
      for (_ <- 1 to edits) {
        val p = rnd.nextInt(sb.length)
        rnd.nextInt(3) match {
          case 0 => sb.setCharAt(p, ('a' + rnd.nextInt(26)).toChar)
          case 1 => sb.deleteCharAt(p)
          case 2 => sb.insert(p, ('a' + rnd.nextInt(26)).toChar)
        }
      }
      check(base, sb.toString)
      // band edges: thresholds straddling the true distance
      val d = ref(base, sb.toString).toInt
      for (k <- Seq(math.max(0, d - 1), d, d + 1)) {
        assert(gotCap(base, sb.toString, k) == refCap(base, sb.toString, k),
          s"capped band-edge mismatch at k=$k d=$d")
      }
    }
  }
}
