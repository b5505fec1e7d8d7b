package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** `SparkSessionExtensions` installer: exposes the engine's codegen
  * expressions ([[graft.functions.HashExprs]]) to the SQL surface, so
  * `spark.sql("SELECT graft_char_hash(text) ...")` works exactly like
  * the Column API. Activate via
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.GraftExtensions` on a cluster.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    def register(name: String, usage: String, arity: Int)(
        builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name), info(name, usage),
        (es: Seq[Expression]) => {
          // explicit arity check: a typo'd extra argument must fail
          // analysis loudly, not be silently dropped
          require(es.length == arity,
            s"$name expects $arity argument(s), got ${es.length}; usage: $usage")
          builder(es)
        }))

    register("graft_char_hash",
      "graft_char_hash(str) - polynomial rolling hash mod 2^31-1", 1)(
      es => PolyCharHash(es.head))
    register("graft_char_hash_all",
      "graft_char_hash_all(arr) - char hash of every string element", 1)(
      es => PolyCharHashArray(es.head))
    register("graft_char_hash_wide_all",
      "graft_char_hash_wide_all(arr) - ~62-bit dual-base char hash " +
        "of every string element (h31 * P + h37)", 1)(
      es => PolyCharHashWideArray(es.head))
    register("graft_minhash_sig",
      "graft_minhash_sig(hashes) - all 16 minhash lanes in one pass", 1)(
      es => MinHashSig(es.head))
    register("graft_simhash32",
      "graft_simhash32(hashes) - 32-bit simhash of element hashes", 1)(
      es => SimHash32(es.head))
    register("graft_lsh_bucket",
      "graft_lsh_bucket(emb) - 8-plane signed-projection LSH bucket", 1)(
      es => LshBucket(es.head, graft.operators.SimilarityOps.Planes,
        graft.operators.SimilarityOps.Dims))
    register("graft_damerau",
      "graft_damerau(a, b) - unrestricted Damerau-Levenshtein " +
        "(Lowrance-Wagner, transposition-aware)", 2)(
      es => DamerauLevenshtein(es(0), es(1)))
    register("graft_jaro",
      "graft_jaro(a, b) - Jaro similarity over UTF-8 bytes " +
        "(DuckDB-parity convention)", 2)(
      es => JaroSimilarity(es(0), es(1)))
    register("graft_jaro_winkler",
      "graft_jaro_winkler(a, b) - Jaro-Winkler similarity (prefix " +
        "boost cap 4, threshold 0.7)", 2)(
      es => JaroWinklerSimilarity(es(0), es(1)))
    register("graft_float_dot",
      "graft_float_dot(a, b) - sequential-fold dot product in double", 2)(
      es => FloatDot(es(0), es(1)))
    register("graft_sq_dist",
      "graft_sq_dist(emb, centroid) - sequential-fold squared distance", 2)(
      es => ArraySqDist(es(0), es(1)))
    register("graft_shingles",
      "graft_shingles(tokens) - space-joined 3-word shingles", 1)(
      es => WordNgrams(es.head, 3))
    register("graft_bigrams",
      "graft_bigrams(tokens) - space-joined adjacent pairs (BPE pair " +
        "counting, bigram stats)", 1)(
      es => WordNgrams(es.head, 2))
    register("graft_tokens",
      "graft_tokens(str) - single-space tokens, empties dropped", 1)(
      es => WhitespaceTokens(es.head))
    register("graft_char_ngram_hashes",
      "graft_char_ngram_hashes(str, n) - hashes of every n-char " +
        "window in one pass (n must be a positive integer literal)", 2)(
      es => {
        val n = es(1) match {
          case org.apache.spark.sql.catalyst.expressions
              .Literal(v: Int, org.apache.spark.sql.types.IntegerType)
              if v >= 1 => v
          case other => throw new IllegalArgumentException(
            s"graft_char_ngram_hashes: n must be a positive INT literal, " +
              s"got $other")
        }
        CharNgramHashes(es.head, n)
      })
    register("graft_cdc_boundaries",
      "graft_cdc_boundaries(bin) - content-defined chunk boundaries " +
        "(rolling-hash, shift-robust)", 1)(
      es => CdcBoundaries(es.head))
  }
}
