package graft.functions

import org.apache.spark.sql.{Column, GraftColumn}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hashing primitives for the dedup /
  * fingerprint / LSH operators (SURVEY.md §2.8).
  *
  * Spark's built-in `hash`/`xxhash64` and DuckDB's `hash` use
  * different algorithms, so oracle-checked operators need hashes both
  * engines can compute *identically*. The Spark side runs the
  * codegen'd expressions in [[HashExprs]] (tight Java loops inside
  * whole-stage codegen — round 1's interpreted `transform`/`aggregate`
  * folds were the top bench cost); the DuckDB mirror is
  * `list_transform`/`list_reduce` SQL generated from the SAME Scala
  * constants, so the two sides cannot drift.
  *
  * The polynomial char hash is the classic `h = h*31 + code (mod
  * 2^31-1)` rolling hash; min-hash uses k=[[K]] independent affine
  * permutations `(a_i*h + b_i) mod P` over 3-word shingles, banded
  * [[Bands]]×[[RowsPerBand]] for LSH bucketing.
  *
  * Scale note: every column here is a pure per-row projection —
  * no shuffle, fully parallel, and the band/bucket construction gives
  * the O(n) LSH candidate generation that replaces the O(n²) all-pairs
  * comparison at 100 TB.
  */
object Hashing {
  /** Modulus: 2^31-1 (Mersenne prime). Products a_i*h stay < 2^62. */
  val P = 2147483647L

  /** Second polynomial base for the ~62-bit wide char hash
    * ([[hashAllWide]]) — fixed forever, like [[A]]/[[B]]. */
  val Base2 = 37L

  /** MinHash signature length and banding layout (4 bands × 4 rows). */
  val K = 16
  val Bands = 4
  val RowsPerBand: Int = K / Bands

  /** Affine permutation constants — odd multipliers, fixed forever
    * (changing them silently changes every signature). */
  val A: Seq[Long] = Seq(
    1299721L, 15485863L, 32452843L, 49979687L,
    67867967L, 86028121L, 104395301L, 122949823L,
    141650939L, 160481183L, 179424673L, 198491317L,
    217645177L, 236887691L, 256203161L, 275604541L)
  val B: Seq[Long] = Seq(
    7L, 104729L, 1299709L, 15485867L,
    32452867L, 49979693L, 67867979L, 86028157L,
    104395303L, 122949829L, 141650963L, 160481219L,
    179424691L, 198491329L, 217645199L, 236887711L)

  // ------------------------------------------------------------------
  // Spark side
  // ------------------------------------------------------------------

  /** Polynomial rolling hash of a string's characters (init 0).
    * Codegen'd — see [[PolyCharHash]]. */
  def charHash(c: Column): Column =
    GraftColumn(PolyCharHash(GraftColumn.expr(c)))

  /** Whitespace tokens with empties dropped (trailing-space safe).
    * Codegen'd single pass — see [[WhitespaceTokens]]. */
  def tokens(c: Column): Column =
    GraftColumn(WhitespaceTokens(GraftColumn.expr(c)))

  /** 3-word shingles over a token array (needs >= 3 tokens).
    * Codegen'd single pass — see [[WordNgrams]]. */
  def shingles(toks: Column): Column =
    GraftColumn(WordNgrams(GraftColumn.expr(toks), 3))

  /** Space-joined n-grams of adjacent tokens ([[WordNgrams]]). */
  def ngrams(toks: Column, n: Int): Column =
    GraftColumn(WordNgrams(GraftColumn.expr(toks), n))

  /** Hash every element of a string array in one codegen'd pass —
    * see [[PolyCharHashArray]]. */
  def hashAll(arr: Column): Column =
    GraftColumn(PolyCharHashArray(GraftColumn.expr(arr)))

  /** ~62-bit dual-base char hash of every element in one codegen'd
    * pass (`h31 * P + h37` — [[PolyCharHashWideArray]]). Use when the
    * hash stands in for string EQUALITY over >10^5 values, where the
    * single 31-bit hash would mint birthday-collision false dups. */
  def hashAllWide(arr: Column): Column =
    GraftColumn(PolyCharHashWideArray(GraftColumn.expr(arr)))

  /** Hashes of every n-code-point character window in ONE pass over
    * the string ([[CharNgramHashes]]) — the O(len) replacement for
    * `hashAll(transform(..., substr))`, which rescans the string per
    * window. */
  def charNgramHashes(c: Column, n: Int): Column =
    GraftColumn(CharNgramHashes(GraftColumn.expr(c), n))

  /** All K min-hash lanes over an array of element hashes, as one
    * ARRAY<BIGINT> column computed in a single pass ([[MinHashSig]] —
    * round 1 traversed the hashes K times). */
  def minhashSig(hashes: Column): Column =
    GraftColumn(MinHashSig(GraftColumn.expr(hashes)))

  /** LSH bucket id for band `b` over signature columns named
    * `mh0..mh{K-1}`: rolling-hash the band's rows with the band index
    * seeding the fold so buckets never collide across bands. */
  def bandBucket(b: Int): Column =
    (0 until RowsPerBand).foldLeft(lit((b + 1).toLong): Column) {
      (acc, r) => (acc * 31 + col(s"mh${b * RowsPerBand + r}")) % P
    }

  /** 32-bit SimHash over an ARRAY<BIGINT> of element hashes: per-bit
    * ±1 votes summed across elements; bit set iff the vote is
    * positive. Codegen'd — see [[SimHash32]]. */
  def simhash32(hashes: Column): Column =
    GraftColumn(SimHash32(GraftColumn.expr(hashes)))

  // ------------------------------------------------------------------
  // DuckDB side (generated from the same constants)
  // ------------------------------------------------------------------

  def sqlCharHash(e: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
        list_transform(string_split($e, ''), c -> CAST(ascii(c) AS BIGINT))),
        (h, c) -> (h * 31 + c) % $P)"""

  /** Mirror of [[hashAllWide]]'s per-element hash: two folds (bases
    * 31 and [[Base2]]) packed as `h31 * P + h37`. The oracle pays the
    * second pass over the string; the Spark side fuses both folds in
    * one code-point loop. */
  def sqlCharHashWide(e: String): String = {
    val fold31 = sqlCharHash(e)
    val fold37 =
      s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(string_split($e, ''), c -> CAST(ascii(c) AS BIGINT))),
          (h, c) -> (h * $Base2 + c) % $P)"""
    s"(($fold31) * $P + ($fold37))"
  }

  def sqlTokens(e: String): String =
    s"list_filter(string_split($e, ' '), t -> length(t) > 0)"

  def sqlNgrams(toksExpr: String, n: Int): String = {
    val parts = (0 until n).map(j => s"$toksExpr[i+$j]").mkString(" || ' ' || ")
    s"list_transform(range(1, length($toksExpr) - ${n - 2}), i -> $parts)"
  }

  def sqlShingles(toksExpr: String): String = sqlNgrams(toksExpr, 3)

  def sqlHashAll(arrExpr: String): String =
    s"list_transform($arrExpr, s -> ${sqlCharHash("s")})"

  def sqlMinhash(hashesExpr: String, i: Int): String =
    s"list_min(list_transform($hashesExpr, h -> (h * ${A(i)} + ${B(i)}) % $P))"

  def sqlBandBucket(b: Int, sigPrefix: String = "mh"): String =
    (0 until RowsPerBand).foldLeft(s"CAST(${b + 1} AS BIGINT)") {
      (acc, r) => s"(($acc) * 31 + $sigPrefix${b * RowsPerBand + r}) % $P"
    }

  def sqlSimhash32(hashesExpr: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
        list_transform(range(0, 32), j ->
          CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform($hashesExpr,
              h -> CASE WHEN (h // (CAST(1 AS BIGINT) << j)) % 2 = 1
                   THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END)),
            (a, b) -> a + b) > 0
          THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END)),
        (a, b) -> a + b)"""
}
