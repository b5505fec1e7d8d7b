package graft.functions

import org.apache.spark.sql.{Column, GraftColumn}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Unrestricted Damerau–Levenshtein distance for the dedup verifier
  * tier.
  *
  * Plain Levenshtein charges an adjacent transposition two edits, so
  * the two commonest real-world duplicate generators — typos and
  * column-swapping OCR — look twice as far away as they are.
  * Spark ships `levenshtein` but nothing transposition-aware, so this
  * is a custom codegen'd expression (preference order (b) of the
  * build brief), NOT a UDF: the generated code calls one static
  * kernel, stays inside whole-stage codegen, and ships no closures —
  * the same pattern as [[NfcNormalize]].
  *
  * The kernel is Lowrance–Wagner (1975): the full unrestricted
  * distance where a transposed pair may be edited again later —
  * matching DuckDB's `damerau_levenshtein` (probed:
  * DL('CA','ABC') = 2, not the restricted OSA's 3), so the oracle
  * mirrors the engine exactly. Cost is O(len_a·len_b) time and
  * O(len_a·len_b) ints — the caller gates lengths exactly like the
  * Levenshtein tier ([[graft.operators.DedupOps.EditMaxLen]]).
  *
  * Unit parity note: the kernel walks Java chars (UTF-16 units) and
  * DuckDB walks codepoints — identical on BMP text (all testdata);
  * supplementary-plane text would need a codepoint walk here.
  */
object EditExprs {
  /** Static target for the generated code: Lowrance–Wagner
    * unrestricted Damerau–Levenshtein over UTF-16 units.
    *
    * Common prefix/suffix TRIM (round 14): the O(n·m) DP (and its
    * (n+2)·(m+2)-int matrix) runs only over the differing core —
    * dl(p·x·s, p·y·s) = dl(x, y). Near-dup candidates share long
    * affixes, so on `dedup_damerau`'s LSH pairs this removes most of
    * the quadratic work and allocation while leaving every distance
    * bit-identical: the unchanged DuckDB oracle gates it at both SFs,
    * and DamerauSpec's recursive-mirror fuzz covers forced-affix
    * shapes (the transposition-anchor-across-the-boundary corner a
    * wrong trim would break). */
  def damerau(ua: UTF8String, ub: UTF8String): Long = {
    val a0 = ua.toString
    val b0 = ub.toString
    var lo = 0
    val maxLo = if (a0.length < b0.length) a0.length else b0.length
    while (lo < maxLo && a0.charAt(lo) == b0.charAt(lo)) lo += 1
    var hiA = a0.length
    var hiB = b0.length
    while (hiA > lo && hiB > lo && a0.charAt(hiA - 1) == b0.charAt(hiB - 1)) {
      hiA -= 1; hiB -= 1
    }
    val a = a0.substring(lo, hiA)
    val b = b0.substring(lo, hiB)
    val n = a.length
    val m = b.length
    if (n == 0) return m.toLong
    if (m == 0) return n.toLong
    val inf = n + m
    // d is (n+2) x (m+2), row-major
    val w = m + 2
    val d = new Array[Int]((n + 2) * w)
    d(0) = inf
    var i = 0
    while (i <= n) { d((i + 1) * w) = inf; d((i + 1) * w + 1) = i; i += 1 }
    var j = 0
    while (j <= m) { d(j + 1) = inf; d(w + j + 1) = j; j += 1 }
    val da = new java.util.HashMap[Character, Integer]()
    i = 1
    while (i <= n) {
      var db = 0
      j = 1
      while (j <= m) {
        val k: Int = {
          val v = da.get(b.charAt(j - 1)); if (v == null) 0 else v.intValue()
        }
        val l = db
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) { db = j; 0 } else 1
        val sub = d(i * w + j) + cost
        val ins = d((i + 1) * w + j) + 1
        val del = d(i * w + j + 1) + 1
        val trans = d(k * w + l) + (i - 1 - k) + 1 + (j - 1 - l)
        var best = sub
        if (ins < best) best = ins
        if (del < best) best = del
        if (trans < best) best = trans
        d((i + 1) * w + j + 1) = best
        j += 1
      }
      da.put(a.charAt(i - 1), i)
      i += 1
    }
    d((n + 1) * w + m + 1).toLong
  }

  /** `damerauLevenshtein(a, b) -> long` as a Column. */
  def damerauLevenshtein(a: Column, b: Column): Column =
    GraftColumn(DamerauLevenshtein(GraftColumn.expr(a), GraftColumn.expr(b)))

  /** Codepoint array of a string — the walk unit of BOTH reference
    * implementations (Spark's `UTF8String.levenshteinDistance` and
    * DuckDB's `levenshtein` count codepoints, not UTF-16 units), so
    * the trimmed kernels below are exact on ALL text including
    * supplementary planes, not just BMP. */
  private def codepoints(s: String): Array[Int] = {
    val out = new Array[Int](s.codePointCount(0, s.length))
    var i = 0
    var k = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      out(k) = cp
      k += 1
      i += Character.charCount(cp)
    }
    out
  }

  /** Plain Levenshtein with the round-14 affix TRIM ported from
    * [[damerau]] (round-16): `lev(p·x·s, p·y·s) = lev(x, y)` — the
    * longest common prefix and suffix contribute zero edits under any
    * optimal alignment, so the O(n·m) DP runs only over the differing
    * core. LSH near-dup candidates share long affixes, so on
    * `dedup_edit_distance`'s pairs this removes most of the quadratic
    * work while leaving every distance BIT-IDENTICAL to Spark's
    * builtin `levenshtein` (LevTrimSpec fuzzes equality against
    * `UTF8String.levenshteinDistance` itself, including forced-affix
    * and supplementary-plane shapes; the unchanged DuckDB oracle
    * gates the query at both SFs). Two-row DP, codepoint walk. */
  def levenshtein(ua: UTF8String, ub: UTF8String): Long = {
    val a = codepoints(ua.toString)
    val b = codepoints(ub.toString)
    var lo = 0
    val maxLo = if (a.length < b.length) a.length else b.length
    while (lo < maxLo && a(lo) == b(lo)) lo += 1
    var hiA = a.length
    var hiB = b.length
    while (hiA > lo && hiB > lo && a(hiA - 1) == b(hiB - 1)) {
      hiA -= 1; hiB -= 1
    }
    val n = hiA - lo
    val m = hiB - lo
    if (n == 0) return m.toLong
    if (m == 0) return n.toLong
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= n) {
      cur(0) = i
      val ai = a(lo + i - 1)
      j = 1
      while (j <= m) {
        var best = prev(j - 1) + (if (ai == b(lo + j - 1)) 0 else 1)
        val del = prev(j) + 1
        if (del < best) best = del
        val ins = cur(j - 1) + 1
        if (ins < best) best = ins
        cur(j) = best
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m).toLong
  }

  /** Thresholded Levenshtein with the affix trim: the exact value of
    * Spark's builtin `levenshtein(a, b, k)` — the distance when it is
    * <= k, −1 otherwise. After the trim, the banded DP touches only
    * the 2k+1 cells around the diagonal per row (cost O(core·k), like
    * the builtin) and exits early when a whole band row exceeds k;
    * cells outside the band are unreachable under distance <= k
    * because every path to them already costs > k. The RESULT
    * (capped distance or −1) is uniquely defined, so builtin parity
    * is testable by value (LevTrimSpec fuzzes both regimes). */
  def levenshteinCapped(ua: UTF8String, ub: UTF8String, k: Int): Long = {
    val a0 = codepoints(ua.toString)
    val b0 = codepoints(ub.toString)
    var lo = 0
    val maxLo = if (a0.length < b0.length) a0.length else b0.length
    while (lo < maxLo && a0(lo) == b0(lo)) lo += 1
    var hiA = a0.length
    var hiB = b0.length
    while (hiA > lo && hiB > lo && a0(hiA - 1) == b0(hiB - 1)) {
      hiA -= 1; hiB -= 1
    }
    val n = hiA - lo
    val m = hiB - lo
    if (n - m > k || m - n > k) return -1L
    if (n == 0) return m.toLong // m <= k by the gap check above
    if (m == 0) return n.toLong
    val inf = k + 1 // any cell >= inf can never recover to <= k
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { prev(j) = if (j <= k) j else inf; j += 1 }
    var i = 1
    while (i <= n) {
      val jLo = if (i - k > 1) i - k else 1
      val jHi = if (i + k < m) i + k else m
      cur(0) = if (i <= k) i else inf
      if (jLo > 1) cur(jLo - 1) = inf
      val ai = a0(lo + i - 1)
      var rowMin = cur(0)
      j = jLo
      while (j <= jHi) {
        var best = prev(j - 1) + (if (ai == b0(lo + j - 1)) 0 else 1)
        val del = prev(j) + 1
        if (del < best) best = del
        val ins = cur(j - 1) + 1
        if (ins < best) best = ins
        val c = if (best > inf) inf else best
        cur(j) = c
        if (c < rowMin) rowMin = c
        j += 1
      }
      if (jHi < m) cur(jHi + 1) = inf
      if (rowMin >= inf) return -1L
      val t = prev; prev = cur; cur = t
      i += 1
    }
    if (prev(m) <= k) prev(m).toLong else -1L
  }

  /** `levenshteinDistance(a, b) -> long` as a Column — the trimmed
    * exact kernel (bit-identical to Spark's builtin). */
  def levenshteinDistance(a: Column, b: Column): Column =
    GraftColumn(GraftLevenshtein(GraftColumn.expr(a), GraftColumn.expr(b)))

  /** `levenshteinCapped(a, b, k) -> long` as a Column — the trimmed
    * thresholded kernel (builtin `levenshtein(a, b, k)` parity:
    * distance when <= k, −1 otherwise). */
  def levenshteinCapped(a: Column, b: Column, k: Int): Column =
    GraftColumn(GraftLevenshteinCapped(
      GraftColumn.expr(a), GraftColumn.expr(b), k))

  /** Jaro similarity over UTF-8 BYTES — the record-linkage verifier
    * for SHORT near-identical strings (names, titles, URLs) where
    * edit distance over-prices out-of-order matches. Byte walk, not
    * codepoint walk, deliberately: DuckDB's `jaro_similarity` walks
    * bytes (probed: 'ea' vs a 13-byte multibyte string scores with
    * lb=13, not the 9 codepoints), and the oracle must be the SAME
    * function of the data. Textbook convention otherwise, pinned
    * bit-for-bit against DuckDB on 30k random multibyte pairs:
    * match window floor(max/2)-1, first-fit matching left-to-right,
    * half-transpositions, empty input scores 0.0, and the final
    * double tree is exactly `(m/la + m/lb + (m-t)/m) / 3.0`. */
  def jaro(ua: UTF8String, ub: UTF8String): Double =
    jaroBytes(ua.getBytes, ub.getBytes)

  /** Match-phase strategy cutoff: below this many scanned cells the
    * textbook O(la·window) scan beats building the byte-position
    * index (short record-linkage strings — names, titles); above it
    * the indexed first-fit match is O(la + lb + 256) and wins by the
    * cell/byte ratio (~60x on the 300-byte gate documents). BOTH
    * paths produce the identical match set — the cutoff is purely a
    * constant-factor choice, fuzzed either side in JaroIndexSpec. */
  private val JaroIndexCutoff = 4096L

  /** [[jaro]] over the raw UTF-8 byte arrays — extracted once per
    * pair and shared with [[jaroWinkler]]'s prefix walk (getBytes may
    * copy). */
  private def jaroBytes(a: Array[Byte], b: Array[Byte]): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    if (java.util.Arrays.equals(a, b)) return 1.0
    var window = (if (la > lb) la else lb) / 2 - 1
    if (window < 0) window = 0
    val ma = new Array[Boolean](la)
    val mb = new Array[Boolean](lb)
    var m = 0
    if (la.toLong * (2L * window + 1L) <= JaroIndexCutoff) {
      // textbook first-fit scan (the original kernel, kept verbatim
      // for the short-string regime where it is cheapest)
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
    } else {
      // Indexed first-fit: counting-sort b's positions by byte value,
      // then serve each a(i) from a per-value monotone pointer.
      // Identical to the scan by construction: the scan picks the
      // SMALLEST unmatched j in [lo, hi] with b(j) == a(i); only
      // same-value rows consume a value's positions, and they consume
      // them in ascending order, while positions that fall below lo
      // are dead for every later i too (lo = i - window is
      // nondecreasing in i) — so "smallest unmatched >= lo" is always
      // exactly where the pointer stopped. O(la + lb + 256) instead
      // of O(la·window) scanned cells.
      val starts = new Array[Int](257)
      var j = 0
      while (j < lb) { starts((b(j) & 0xff) + 1) += 1; j += 1 }
      var v = 0
      while (v < 256) { starts(v + 1) += starts(v); v += 1 }
      val pos = new Array[Int](lb)
      val ptr = new Array[Int](256)
      System.arraycopy(starts, 0, ptr, 0, 256)
      j = 0
      while (j < lb) { val w = b(j) & 0xff; pos(ptr(w)) = j; ptr(w) += 1; j += 1 }
      System.arraycopy(starts, 0, ptr, 0, 256)
      var i = 0
      while (i < la) {
        val lo = if (i > window) i - window else 0
        val hi = if (i + window < lb - 1) i + window else lb - 1
        val w = a(i) & 0xff
        var p = ptr(w)
        val end = starts(w + 1)
        while (p < end && pos(p) < lo) p += 1
        if (p < end && pos(p) <= hi) {
          ma(i) = true; mb(pos(p)) = true; m += 1
          ptr(w) = p + 1
        } else ptr(w) = p
        i += 1
      }
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    var i = 0
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

  /** Jaro–Winkler: [[jaro]] plus the common-prefix boost
    * `l · 0.1 · (1 − jaro)` (prefix capped at 4 BYTES), applied only
    * when jaro > 0.7 — both conventions probed against DuckDB's
    * `jaro_winkler_similarity` (a 4-byte shared prefix at jaro 2/3
    * gets NO boost; a 9-byte prefix boosts as 4). */
  def jaroWinkler(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.getBytes
    val b = ub.getBytes
    val j = jaroBytes(a, b)
    if (j <= 0.7) return j
    val max = {
      val mn = if (a.length < b.length) a.length else b.length
      if (mn < 4) mn else 4
    }
    var l = 0
    while (l < max && a(l) == b(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }

  /** `jaroSimilarity(a, b) -> double` as a Column. */
  def jaroSimilarity(a: Column, b: Column): Column =
    GraftColumn(JaroSimilarity(GraftColumn.expr(a), GraftColumn.expr(b)))

  /** `jaroWinklerSimilarity(a, b) -> double` as a Column. */
  def jaroWinklerSimilarity(a: Column, b: Column): Column =
    GraftColumn(JaroWinklerSimilarity(GraftColumn.expr(a), GraftColumn.expr(b)))
}

/** `graft_damerau(a, b) -> bigint`: unrestricted Damerau–Levenshtein
  * distance (Lowrance–Wagner), transposition-aware. */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_damerau"

  override def checkInputDataTypes(): TypeCheckResult =
    HashExprs.requireTypes(prettyName,
      (left, HashExprs.isString, "STRING"),
      (right, HashExprs.isString, "STRING"))

  protected override def nullSafeEval(a: Any, b: Any): Any =
    EditExprs.damerau(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.EditExprs.damerau($a, $b)")

  protected override def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `graft_levenshtein(a, b) -> bigint`: plain Levenshtein distance,
  * affix-trimmed — bit-identical to Spark's builtin `levenshtein`
  * (see [[EditExprs.levenshtein]]). */
case class GraftLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_levenshtein"

  override def checkInputDataTypes(): TypeCheckResult =
    HashExprs.requireTypes(prettyName,
      (left, HashExprs.isString, "STRING"),
      (right, HashExprs.isString, "STRING"))

  protected override def nullSafeEval(a: Any, b: Any): Any =
    EditExprs.levenshtein(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.EditExprs.levenshtein($a, $b)")

  protected override def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `graft_levenshtein_capped(a, b, k) -> bigint`: thresholded
  * Levenshtein, affix-trimmed — bit-identical to Spark's builtin
  * `levenshtein(a, b, k)` (distance when <= k, −1 otherwise; see
  * [[EditExprs.levenshteinCapped]]). The threshold is a plan-time
  * constant of the verifier tier, not a data column. */
case class GraftLevenshteinCapped(left: Expression, right: Expression,
    threshold: Int) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_levenshtein_capped"

  override def checkInputDataTypes(): TypeCheckResult =
    HashExprs.requireTypes(prettyName,
      (left, HashExprs.isString, "STRING"),
      (right, HashExprs.isString, "STRING"))

  protected override def nullSafeEval(a: Any, b: Any): Any =
    EditExprs.levenshteinCapped(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String], threshold)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.EditExprs.levenshteinCapped($a, $b, $threshold)")

  protected override def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `graft_jaro(a, b) -> double`: Jaro similarity over UTF-8 bytes
  * (DuckDB-parity convention — see [[EditExprs.jaro]]). */
case class JaroSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro"

  override def checkInputDataTypes(): TypeCheckResult =
    HashExprs.requireTypes(prettyName,
      (left, HashExprs.isString, "STRING"),
      (right, HashExprs.isString, "STRING"))

  protected override def nullSafeEval(a: Any, b: Any): Any =
    EditExprs.jaro(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.EditExprs.jaro($a, $b)")

  protected override def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `graft_jaro_winkler(a, b) -> double`: Jaro–Winkler similarity
  * (prefix boost l·0.1·(1−jaro), cap 4, threshold 0.7 — see
  * [[EditExprs.jaroWinkler]]). */
case class JaroWinklerSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    HashExprs.requireTypes(prettyName,
      (left, HashExprs.isString, "STRING"),
      (right, HashExprs.isString, "STRING"))

  protected override def nullSafeEval(a: Any, b: Any): Any =
    EditExprs.jaroWinkler(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.EditExprs.jaroWinkler($a, $b)")

  protected override def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
