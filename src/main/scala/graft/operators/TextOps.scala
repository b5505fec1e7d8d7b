package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Hashing
import graft.sources.Tables

/** Text-analysis operators over `documents` (SURVEY.md §2.8 [EXT]):
  * token statistics, quality scoring, heuristic language ID, document
  * fingerprinting, term/bigram frequency.
  *
  * Everything is a per-row projection or a single explode+groupBy —
  * no UDFs, all Catalyst higher-order functions, so the hot path
  * stays in native expressions and scales linearly. Ratio outputs are
  * single IEEE divisions of exact integer counts (engine-parity rules
  * in [[graft.functions.Exact]]).
  */
object TextOps {
  type Q = (SparkSession, String) => DataFrame

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  /** Stopword list for quality/langid heuristics — fixed forever. */
  val Stopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "for")

  private val toks = Hashing.tokens(col("text"))

  private def ratio(n: Column, d: Column): Column =
    n.cast("double") / d.cast("double")

  /** Per-document token statistics. */
  val textStats: Q = (s, d) =>
    docs(s, d)
      .select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars_actual"),
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_distinct_tokens"),
        ratio(
          aggregate(toks, lit(0L), (acc, t) => acc + length(t)),
          size(toks)).as("avg_token_len"))
      .orderBy("doc_id")

  /** Quality scoring: stopword ratio, alpha-char ratio, lexical
    * diversity, composed into one deterministic score. */
  val textQuality: Q = (s, d) => {
    val nTokens = size(toks).cast("long")
    val nStop = size(filter(toks, t => t.isInCollection(Stopwords)))
      .cast("long")
    val nAlpha = length(regexp_replace(col("text"), "[^a-zA-Z]", ""))
      .cast("long")
    val nDistinct = size(array_distinct(toks)).cast("long")
    val stopRatio = ratio(nStop, nTokens)
    val alphaRatio = ratio(nAlpha, length(col("text")).cast("long"))
    val diversity = ratio(nDistinct, nTokens)
    docs(s, d)
      .select(col("doc_id"),
        stopRatio.as("stop_ratio"),
        alphaRatio.as("alpha_ratio"),
        diversity.as("diversity"),
        (stopRatio * lit(0.2) + alphaRatio * lit(0.4) + diversity * lit(0.4))
          .as("quality"))
      .orderBy("doc_id")
  }

  /** Heuristic language ID: CJK chars → zh; accented latin → non-en
    * romance bucket; english stopwords present → en; else unknown.
    * (The testdata's `lang` column is a synthetic label over English
    * word soup — the heuristic classifies the *text*, and the oracle
    * applies the same rules, so parity is what's checked.) */
  val textLangid: Q = (s, d) => {
    val nStop = size(filter(toks, t => t.isInCollection(Stopwords)))
    docs(s, d)
      .select(col("doc_id"), col("lang").as("labeled_lang"),
        when(col("text").rlike("[\\x{4e00}-\\x{9fff}]"), "zh")
          .when(col("text").rlike("[àâçéèêëîïôùûüáíóúñ]"), "romance")
          .when(nStop > 0, "en")
          .otherwise("unknown").as("heur_lang"))
      .orderBy("doc_id")
  }

  /** Script-mix audit (`text_script_mix`) — the homoglyph/spam
    * detector: per document, character counts by script class (ASCII
    * alphanumeric, CJK, accented Latin, space, other) and a
    * mixed-script flag when two or more letter scripts co-occur.
    * Mixed-script text is how spam evades keyword filters and how
    * mojibake enters a corpus; a curation pipeline routes flagged
    * docs to transliteration or drop. Counts are pure
    * `length − length(regexp_replace(class, ''))` arithmetic — one
    * codegen'd projection, no explode — using only character classes
    * whose semantics agree between Java regex and RE2 (the
    * [[BpePattern]] discipline; counts are UTF-16 units on the Spark
    * side and codepoints in DuckDB, identical for the BMP scripts
    * counted here). All integer; no doubles at all. */
  val textScriptMix: Q = (s, d) => {
    def cnt(re: String) =
      (length(col("text")) -
        length(regexp_replace(col("text"), re, ""))).cast("long")
    val ascii = cnt("[A-Za-z0-9]")
    val cjk = cnt("[\\x{4e00}-\\x{9fff}]")
    val accent = cnt("[àâçéèêëîïôùûüáíóúñ]")
    val space = cnt("[ ]")
    docs(s, d)
      .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"),
        ascii.as("n_ascii_alnum"), cjk.as("n_cjk"),
        accent.as("n_accent"), space.as("n_space"),
        (length(col("text")).cast("long") - ascii - cjk - accent - space)
          .as("n_other"),
        ((ascii > 0L).cast("int") + (cjk > 0L).cast("int") +
          (accent > 0L).cast("int") >= 2).as("mixed_script"))
      .orderBy("doc_id")
  }

  /** Readability scoring (`text_readability`) — the Flesch reading
    * ease over exact integer counts: sentences (runs of [.!?];
    * floor 1 so fragments score as one sentence), whitespace words,
    * and a vowel-group syllable proxy (runs of [aeiouy] — the
    * standard cheap estimator). Reading ease feeds the quality gate
    * the same way stopword ratio does, but on the COMPLEXITY axis: a
    * corpus stuffed with SEO keyword lists scores unreadably high
    * syllable density, OCR soup scores absurd sentence lengths.
    * Exactness: the three counts are integers from Java≡RE2 regex
    * classes; the score is ONE fixed double-expression tree (both
    * engines parse identical literals to identical doubles); the band
    * thresholds compare those identical doubles. */
  val textReadability: Q = (s, d) => {
    val nSent = greatest(
      size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0)))
        .cast("long"), lit(1L))
    val nWords = size(toks).cast("long")
    val nSyl = size(regexp_extract_all(col("text"),
      lit("[aeiouyAEIOUY]+"), lit(0))).cast("long")
    val flesch = lit(206.835) -
      lit(1.015) * (col("n_words").cast("double") /
        col("n_sentences").cast("double")) -
      lit(84.6) * (col("n_syllables").cast("double") /
        col("n_words").cast("double"))
    docs(s, d)
      .select(col("doc_id"), nSent.as("n_sentences"),
        nWords.as("n_words"), nSyl.as("n_syllables"))
      .filter(col("n_words") > 0L)
      .withColumn("flesch", flesch)
      .withColumn("band",
        when(col("flesch") >= 60.0, "easy")
          .when(col("flesch") >= 30.0, "medium").otherwise("hard"))
      .orderBy("doc_id")
  }

  /** Document fingerprints: rolling char hash + 32-bit SimHash. */
  val textFingerprint: Q = (s, d) =>
    docs(s, d)
      .withColumn("thashes", Hashing.hashAll(toks))
      .select(col("doc_id"),
        Hashing.charHash(col("text")).as("fingerprint"),
        Hashing.simhash32(col("thashes")).as("simhash"))
      .orderBy("doc_id")

  /** BPE-ish subword pattern: letter runs, single digits, single
    * punctuation marks — the shape of GPT-2-style pre-tokenization,
    * restricted to constructs whose semantics are identical in Java
    * regex (Spark) and RE2 (DuckDB). */
  val BpePattern = "[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]"

  /** Token counting: whitespace tokens vs BPE-ish regex tokens per
    * document, plus the subword expansion ratio — the standard
    * "how many LLM tokens is this corpus" estimator, as one codegen'd
    * projection (no UDF, no shuffle). */
  val textTokenCount: Q = (s, d) => {
    val nWs = size(toks).cast("long")
    val nBpe = size(regexp_extract_all(col("text"), lit(BpePattern), lit(0)))
      .cast("long")
    docs(s, d)
      .select(col("doc_id"),
        nWs.as("n_ws_tokens"),
        nBpe.as("n_bpe_tokens"),
        ratio(nBpe, nWs).as("bpe_per_ws"))
      .orderBy("doc_id")
  }

  /** Tokenizer compression ratio by (heuristic) language — how many
    * UTF-8 bytes one BPE-ish token buys per language, the report that
    * allocates tokenizer-vocabulary budget across languages before a
    * training run (multi-byte scripts price honestly via octets, not
    * chars). One codegen'd projection + one combinable groupBy over
    * O(langs) groups; ratios are single IEEE divisions of exact
    * integer sums ([[graft.functions.Exact]] rules). Language cells
    * are [[textLangid]]'s classifier verbatim. */
  val tfCompressionRatio: Q = (s, d) => {
    val nStop = size(filter(toks, t => t.isInCollection(Stopwords)))
    val heur = when(col("text").rlike("[\\x{4e00}-\\x{9fff}]"), "zh")
      .when(col("text").rlike("[àâçéèêëîïôùûüáíóúñ]"), "romance")
      .when(nStop > 0, "en")
      .otherwise("unknown")
    val nBpe = size(regexp_extract_all(col("text"), lit(BpePattern), lit(0)))
      .cast("long")
    docs(s, d)
      .select(heur.as("heur_lang"),
        octet_length(col("text")).cast("long").as("bytes"),
        nBpe.as("n_bpe"))
      .groupBy(col("heur_lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("bytes")).as("total_bytes"),
        sum(col("n_bpe")).as("total_bpe_tokens"),
        ratio(sum(col("bytes")), sum(col("n_bpe"))).as("bytes_per_token"))
      .orderBy("heur_lang")
  }

  /** Buffer/result for [[LongestDoc]]: best (longest, then lowest
    * doc_id) document seen so far. */
  final case class ArgMax(len: Long, doc_id: Long)

  /** SURVEY §2.7's custom typed aggregate: `Aggregator[IN, BUF, OUT]`
    * computing an argmax with a deterministic tie-break. The buffer is
    * partial-merge-able, so the shuffle carries one 16-byte buffer per
    * (map partition, key) instead of the rows — the right typed-agg
    * shape at 100 TB. */
  object LongestDoc
      extends org.apache.spark.sql.expressions.Aggregator[
        (String, Long, Long), ArgMax, ArgMax] {
    private def better(a: ArgMax, b: ArgMax): ArgMax =
      if (a.len > b.len || (a.len == b.len && a.doc_id < b.doc_id)) a else b
    def zero: ArgMax = ArgMax(-1L, Long.MaxValue)
    def reduce(b: ArgMax, in: (String, Long, Long)): ArgMax =
      better(b, ArgMax(in._3, in._2))
    def merge(x: ArgMax, y: ArgMax): ArgMax = better(x, y)
    def finish(b: ArgMax): ArgMax = b
    def bufferEncoder: org.apache.spark.sql.Encoder[ArgMax] =
      org.apache.spark.sql.Encoders.product[ArgMax]
    def outputEncoder: org.apache.spark.sql.Encoder[ArgMax] =
      org.apache.spark.sql.Encoders.product[ArgMax]
  }

  /** Longest document per language (ties → lowest doc_id) via the
    * typed [[LongestDoc]] Aggregator over a groupByKey. */
  val textLongestDoc: Q = (s, d) => {
    import s.implicits._
    docs(s, d)
      .select(col("lang"), col("doc_id"),
        length(col("text")).cast("long").as("len"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .agg(LongestDoc.toColumn.name("r"))
      .toDF("lang", "r")
      .select(col("lang"), col("r.doc_id").as("doc_id"),
        col("r.len").as("len"))
      .orderBy("lang")
  }

  /** TF-IDF-style keyterm extraction: top-3 tokens per document by
    * `tf × (N - df + 0.5)/(df + 0.5)` — BM25's idf odds-ratio WITHOUT
    * the log. Deliberate: `ln` is not required to be correctly rounded
    * by IEEE, so Spark's and DuckDB's libm could disagree in the last
    * ulp and break the bit-exact oracle; the rational odds preserve
    * the exact same ranking for fixed N. All inputs are integers below
    * 2^53, so every +,-,×,÷ here is exactly rounded and
    * engine-identical.
    *
    * Scale shape: explode → two key-partitioned aggregates (tf by
    * (doc,token), df by token) → broadcast of the 1-row corpus count →
    * token-keyed join → per-doc top-k window. No all-pairs anything. */
  val textKeyterms: Q = (s, d) => {
    val tok = docs(s, d).select(col("doc_id"), explode(toks).as("token"))
    val tf = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dfreq = tok.distinct().groupBy("token").agg(count(lit(1)).as("df"))
    val total = docs(s, d).agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("token"))
    tf.join(dfreq, "token")
      .crossJoin(broadcast(total))
      .withColumn("score",
        col("tf").cast("double") *
          ((col("n_docs").cast("double") - col("df").cast("double") + lit(0.5))
            / (col("df").cast("double") + lit(0.5))))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("rank"), col("token"), col("tf"),
        col("df"), col("score"))
      .orderBy("doc_id", "rank")
  }

  /** Benchmark decontamination: per-document fraction of its distinct
    * 5-gram hashes that also appear in a "benchmark" set (here: the
    * five lowest doc_ids stand in for a held-out eval set). The
    * standard pre-training contamination check, shaped for scale: both
    * sides reduce to DISTINCT (doc, gram-hash) pairs, the benchmark
    * side is tiny and broadcast, and the overlap is one equi-join on
    * the hash — never a document × benchmark text comparison. */
  val textContamination: Q = (s, d) => {
    val grams = docs(s, d)
      .withColumn("toks", Hashing.tokens(col("text")))
      .filter(size(col("toks")) >= 5)
      .select(col("doc_id"),
        explode(array_distinct(
          Hashing.hashAll(Hashing.ngrams(col("toks"), 5)))).as("gh"))
    val bench = grams.filter(col("doc_id") < 5)
      .select(col("gh")).distinct()
    val corpus = grams.filter(col("doc_id") >= 5)
    val totals = corpus.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
    val hits = corpus.join(broadcast(bench), "gh")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
    totals.join(hits, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_hits"))
      .select(col("doc_id"), col("n_grams"), col("n_hits"),
        (col("n_hits").cast("double") / col("n_grams").cast("double"))
          .as("contamination"))
      .orderBy("doc_id")
  }

  /** Decontamination drop bar: a doc sharing ≥ 1/[[DecontamBar]] of
    * its distinct 5-grams with the benchmark set is dropped
    * (`n_hits·DecontamBar ≥ n_grams`, integer cross-multiplied). */
  val DecontamBar = 4L

  /** Decontamination ENFORCEMENT (`doc_decontaminate`) — the action
    * [[textContamination]]'s detector feeds, completing the
    * detect→enforce pairs (`pii_k_anonymity`→`pii_release_suppressed`,
    * `dedup_substring_spans`→`dedup_spans_remove`): every corpus doc
    * gets a VERDICT — `benchmark` (the eval material itself, never
    * trainable), `dropped_contaminated` (≥ 25% distinct-5-gram
    * overlap with the benchmark — memorized-eval leakage), `kept`
    * (below the bar), or `kept_short` (< 5 tokens, no grams to
    * judge, kept with zero evidence rather than silently dropped).
    * Same broadcast-benchmark equi-join as the detector; the verdict
    * is integer cross-multiplication; output is the O(docs) manifest
    * a training run consumes. */
  val docDecontaminate: Q = (s, d) => {
    val grams = docs(s, d)
      .withColumn("toks", Hashing.tokens(col("text")))
      .filter(size(col("toks")) >= 5)
      .select(col("doc_id"),
        explode(array_distinct(
          Hashing.hashAll(Hashing.ngrams(col("toks"), 5)))).as("gh"))
    val bench = grams.filter(col("doc_id") < 5)
      .select(col("gh")).distinct()
    val corpus = grams.filter(col("doc_id") >= 5)
    val totals = corpus.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
    val hits = corpus.join(broadcast(bench), "gh")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
    docs(s, d).select(col("doc_id"))
      .join(totals, Seq("doc_id"), "left")
      .join(hits, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_grams", "n_hits"))
      .select(col("doc_id"), col("n_grams"), col("n_hits"),
        when(col("doc_id") < 5, "benchmark")
          .when(col("n_grams") === 0L, "kept_short")
          .when(col("n_hits") * DecontamBar >= col("n_grams"),
            "dropped_contaminated")
          .otherwise("kept").as("verdict"))
      .orderBy("doc_id")
  }

  /** Repetition scoring: fraction of a document's word 3-grams that
    * are duplicates — the standard "excessive repetition" pre-training
    * quality filter (high ratio ⇒ boilerplate/spam/generated loops).
    * One codegen'd projection per row (n-gram construction + two array
    * sizes), no shuffle; the ratio is one exact division of integer
    * counts. Documents with <3 tokens have no 3-grams and are
    * excluded. */
  val textRepetition: Q = (s, d) =>
    docs(s, d)
      .withColumn("toks", Hashing.tokens(col("text")))
      .filter(size(col("toks")) >= 3)
      .withColumn("grams", Hashing.ngrams(col("toks"), 3))
      .select(col("doc_id"),
        size(col("grams")).cast("long").as("n_grams"),
        size(array_distinct(col("grams"))).cast("long").as("n_distinct"))
      .withColumn("dup_ratio",
        (col("n_grams") - col("n_distinct")).cast("double") /
          col("n_grams").cast("double"))
      .orderBy("doc_id")

  /** Vocabulary frequency-of-frequencies: how many distinct tokens
    * occur exactly k times in the corpus — the Zipf/vocab-growth curve
    * that sizes a tokenizer's vocabulary and estimates the hapax tail
    * (Good-Turing mass). Two map-side-combinable aggregates back to
    * back; the second one's input is already tiny (one row per
    * distinct token). */
  val tfFreqOfFreq: Q = (s, d) =>
    docs(s, d)
      .select(explode(toks).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("occurrences"))
      .groupBy("occurrences")
      .agg(count(lit(1)).as("n_tokens"))
      .orderBy("occurrences")

  /** Good–Turing adjusted counts (`tf_good_turing`) — the smoothing
    * the frequency-of-frequencies table exists FOR (the same
    * completion move as `tf_kn_prob` over the continuation counts):
    * for each observed count r, the adjusted count
    * r* = (r+1)·N_{r+1}/N_r and the per-type probability r* / N — the
    * estimate that discounts observed types to reserve N_1/N (the
    * r = 1 row's mass) for unseen types. N_{r+1} comes from a self
    * equi-join of the O(distinct counts) table on r+1 (0 when the
    * next count class is empty — r* = 0, the textbook gap case), and
    * N = Σ r·N_r off the same relation, so the corpus is scanned
    * exactly once. Every numerator is an exact integer product;
    * r_star and gt_prob are the mirrored divisions. */
  val tfGoodTuring: Q = (s, d) => {
    val fof = docs(s, d)
      .select(explode(toks).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("occurrences"))
      .groupBy("occurrences")
      .agg(count(lit(1)).as("n_types"))
    val total = fof.agg(
      sum(col("occurrences") * col("n_types")).as("n_total"))
    fof.as("a")
      .join(fof.as("b").select(col("occurrences").as("next_occ"),
          col("n_types").as("n_types_next")),
        col("occurrences") + 1 === col("next_occ"), "left")
      .na.fill(0L, Seq("n_types_next"))
      .crossJoin(broadcast(total))
      .select(col("occurrences"), col("n_types"), col("n_types_next"),
        col("n_total"),
        (((col("occurrences") + 1L) * col("n_types_next")).cast("double") /
          col("n_types").cast("double")).as("r_star"))
      .withColumn("gt_prob", col("r_star") / col("n_total").cast("double"))
      .orderBy("occurrences")
  }

  /** Output shards for [[docTrainOrder]]. */
  val TrainShards = 8

  /** Deterministic training order: every doc gets a (shard, pos) —
    * the reproducible global shuffle a training run consumes (same
    * inputs ⇒ identical epoch order on any cluster, which is what
    * makes a loss curve re-runnable). Shard = salted hash of the
    * doc id; position = rank by a SECOND salted hash within the
    * shard, so co-sharded docs are also randomly ordered.
    *
    * Scale shape: the rank window partitions BY SHARD — there is no
    * global row_number (a no-partition window collapses to one task;
    * per-shard ranks keep all [[TrainShards]]×parallel and a consumer
    * reads shards independently anyway). */
  val docTrainOrder: Q = (s, d) => {
    val shard = Hashing.charHash(
      concat(col("doc_id").cast("string"), lit("#shard"))) % TrainShards
    val okey = Hashing.charHash(
      concat(col("doc_id").cast("string"), lit("#order")))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("okey"), col("doc_id"))
    docs(s, d)
      .select(col("doc_id"), shard.as("shard"), okey.as("okey"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy("shard", "pos")
  }

  /** Keep-decision thresholds for [[docKeepDecision]] (set against
    * the observed sf distributions: ~15% of docs are under 25 tokens,
    * ~10% over 0.10 duplicate-3-gram ratio). */
  val KeepMinTokens = 25L
  val KeepMaxDupRatio = 0.10

  /** The composed curation gate: one materialized keep/drop decision
    * per document with the FIRST failing rule as the reason — exact
    * duplicate (non-canonical copy), too short, repetitive, else keep.
    * Real pipelines persist exactly this relation (the audit trail of
    * why a doc was dropped); downstream stages filter
    * `decision = 'keep'`.
    *
    * Scale shape: the per-doc scores are one codegen'd projection; the
    * only shuffle is the exact-dup canonical groupBy — keyed on a
    * 128-bit md5 TEXT FINGERPRINT, never the text itself, so both the
    * groupBy and the canon join move 16 bytes per row where round 6
    * moved the whole corpus through the exchange twice (the repo's own
    * `mm_payload_dedup` discipline, now applied here; PlanSpec pins
    * that no hash exchange carries `text`). An md5 collision would
    * need ~2^64 distinct docs to reach even birthday odds — at any
    * realizable corpus size the fingerprint equality IS text equality,
    * so the result is bit-identical to the text-keyed oracle. Rule
    * order is fixed, so the decision is deterministic however the
    * stages are fused. */
  val docKeepDecision: Q = (s, d) => {
    val fp = md5(col("text").cast("binary"))
    val canon = docs(s, d)
      .select(col("doc_id"), fp.as("fp"))
      .groupBy(col("fp")).agg(min(col("doc_id")).as("canonical_id"))
    val nTok = size(toks).cast("long")
    val grams = Hashing.ngrams(toks, 3)
    val dupRatio = when(nTok >= 3,
      (size(grams) - size(array_distinct(grams))).cast("double") /
        size(grams).cast("double")).otherwise(0.0)
    docs(s, d)
      .select(col("doc_id"), fp.as("fp"), nTok.as("n_tokens"),
        dupRatio.as("dup_ratio"))
      .join(canon, "fp")
      .select(col("doc_id"), col("n_tokens"), col("dup_ratio"),
        when(col("doc_id") =!= col("canonical_id"), "exact_dup")
          .when(col("n_tokens") < KeepMinTokens, "too_short")
          .when(col("dup_ratio") > KeepMaxDupRatio, "repetitive")
          .otherwise("keep").as("decision"))
      .orderBy("doc_id")
  }

  /** Curation-funnel report: how many documents survive each
    * [[docKeepDecision]] rule CUMULATIVELY, in the same fixed rule
    * order — the pipeline-yield number a data team watches per corpus
    * snapshot (a stage that suddenly eats 40% is a bug or a corpus
    * shift). One scan + one combinable aggregate produce every stage
    * count (conjunction flags summed in a single pass — not one scan
    * per stage); the 4-row reshape is a `stack` on the 1-row result.
    * All-integer until the exact survival divisions. */
  val docFilterFunnel: Q = (s, d) => {
    // same 16-byte md5 fingerprint keying as [[docKeepDecision]]: the
    // canon groupBy + join shuffle digests and scalars, never the text
    val fp = md5(col("text").cast("binary"))
    val canon = docs(s, d)
      .select(col("doc_id"), fp.as("fp"))
      .groupBy(col("fp")).agg(min(col("doc_id")).as("canonical_id"))
    val nTok = size(toks).cast("long")
    val grams = Hashing.ngrams(toks, 3)
    val dupRatio = when(nTok >= 3,
      (size(grams) - size(array_distinct(grams))).cast("double") /
        size(grams).cast("double")).otherwise(0.0)
    val surviveDedup = col("doc_id") === col("canonical_id")
    val surviveLen = surviveDedup && col("nt") >= KeepMinTokens
    val surviveRep = surviveLen && col("dr") <= KeepMaxDupRatio
    def hits(c: Column): Column = sum(when(c, 1L).otherwise(0L))
    docs(s, d)
      .select(col("doc_id"), fp.as("fp"), nTok.as("nt"),
        dupRatio.as("dr"))
      .join(canon, "fp")
      .agg(count(lit(1)).as("n0"), hits(surviveDedup).as("n1"),
        hits(surviveLen).as("n2"), hits(surviveRep).as("n3"))
      .select(expr(
        """stack(4,
             0L, 'total',       n0, CAST(0 AS BIGINT),
             1L, 'exact_dedup', n1, n0 - n1,
             2L, 'min_length',  n2, n1 - n2,
             3L, 'repetition',  n3, n2 - n3)
           AS (stage_id, stage, n_surviving, n_dropped)"""),
        col("n0"))
      .select(col("stage_id"), col("stage"), col("n_surviving"),
        col("n_dropped"),
        // NULL-guarded: an EMPTY corpus snapshot (a pruned partition,
        // a new tenant) has no defined survival rate; oracle mirrors
        when(col("n0") === 0L, lit(null))
          .otherwise(col("n_surviving").cast("double") /
            col("n0").cast("double")).as("survival"))
      .orderBy("stage_id")
  }

  /** Per-language sampling rates (percent) for [[docSampleHash]] —
    * downweight the dominant language, keep the rest. */
  val SampleRates: Map[String, Int] = Map("en" -> 10)
  val DefaultSampleRate = 25

  /** Deterministic stratified sampling: keep a doc iff the polynomial
    * hash of its id's decimal string lands under its language's rate.
    * Hash-gated sampling (vs `rand()`) is reproducible run-to-run and
    * machine-to-machine — the only acceptable kind in a training-data
    * pipeline, where the sample IS the dataset lineage. Pure per-row
    * projection + filter: no shuffle, fully pushable. */
  val docSampleHash: Q = (s, d) => {
    val bucket = Hashing.charHash(col("doc_id").cast("string")) % 100
    val rate = SampleRates.foldLeft(lit(DefaultSampleRate)) {
      case (acc, (lang, r)) => when(col("lang") === lang, r).otherwise(acc)
    }
    docs(s, d)
      .select(col("doc_id"), col("lang"), bucket.as("bucket"),
        rate.as("rate"))
      .filter(col("bucket") < col("rate"))
      .orderBy("doc_id")
  }

  /** Quota (balance) sampling: at most K docs per language, chosen by
    * hash order — "cap the dominant language" corpus balancing. The
    * rank window rewrites to WindowGroupLimit (bounded per-key heap,
    * the same top-k plan PlanSpec pins for knn), so the cap never
    * buffers a whole language's partition. */
  val QuotaPerLang = 120
  /** UNIGRAM-FREQUENCY quality score — the exact-arithmetic stand-in
    * for perplexity filtering (the pass that drops OCR soup and
    * gibberish whose tokens the corpus has barely seen): per document,
    * the corpus-wide frequency of its tokens — total, mean (the single
    * double division), the rarest token's count, and the rarest token
    * itself as the audit trail. Low `avg_tf` or `min_tf` = 1 marks
    * token-soup / heavy-OOV docs; a real-LM perplexity variant swaps
    * the count relation for a broadcast logprob table but keeps this
    * exact plan shape. All accounting is integer (token-wise counts
    * summed as BIGINT); the mean is one division both engines compute
    * from the same two BIGINTs — no float accumulation order to
    * diverge on. At 100 TB: the token-count relation is the only
    * combinable shuffle; the per-doc rollup joins exploded tokens
    * against the count table — broadcast when the vocab is small,
    * (token, count) pairs otherwise, never document text. */
  val docUnigramScore: Q = (s, d) => {
    val tf = docs(s, d)
      .select(explode(toks).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("tf"))
    val dt = docs(s, d)
      .select(col("doc_id"), explode(toks).as("token"))
    dt.join(tf, "token")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("tf")).as("sum_tf"),
        min(col("tf")).as("min_tf"),
        min(struct(col("tf"), col("token"))).as("rare"))
      .select(col("doc_id"), col("n_tokens"), col("sum_tf"),
        (col("sum_tf").cast("double") / col("n_tokens").cast("double"))
          .as("avg_tf"),
        col("min_tf"), col("rare.token").as("rarest_token"))
      .orderBy("doc_id")
  }

  /** Hashed-feature space for [[docTargetAffinity]] — bigrams hashed
    * into this many buckets (DSIR's hashed n-gram features). Fixed
    * forever: changing it silently changes every affinity. */
  val FeatBuckets = 256

  /** Importance scoring against a TARGET distribution (DSIR — Xie et
    * al. 2023, arXiv:2302.03169): score every document by how much
    * its hashed-bigram features look drawn from the target slice
    * (here: the `lang = 'en'` documents, standing in for "a trusted
    * high-quality corpus") rather than the raw corpus. DSIR's
    * log-likelihood-ratio sum is replaced by its SIGN-test form —
    * per feature, +1 if the target's relative frequency exceeds the
    * raw corpus's, −1 if below, compared by integer
    * cross-multiplication (`cnt_t·N_r <=> cnt_r·N_t`) so the score
    * is exact integer arithmetic and cannot drift across engines
    * (`ln` is libm-dependent; the weighted-log sum drops in where
    * ulp drift is tolerable). Counts fit long far beyond these SFs;
    * at extreme scale pre-divide the two 256-row relations once.
    *
    * Plan shape at 100 TB: the importance model is TWO ≤[[FeatBuckets]]-row
    * count relations (map-side-combinable aggs), joined and BROADCAST
    * onto the exploded-feature pass — documents are scored map-side,
    * the only per-doc shuffle is the final combinable rollup. This is
    * DSIR's deployment shape: fit the tiny hashed model once,
    * score petabytes embarrassingly parallel. */
  /** Hashed-bigram feature rows of `df` — the affinity family's
    * shared feature extraction (batch scorer, selection, and
    * [[graft.operators.StreamOps]]'s ingest gate, so the three paths
    * cannot drift). */
  private[graft] def affinityFeats(df: DataFrame, keep: Column*): DataFrame =
    df.select(keep :+ explode(
        Hashing.ngrams(Hashing.tokens(col("text")), 2)).as("g"): _*)
      .select(keep :+
        (Hashing.charHash(col("g")) % FeatBuckets).as("b"): _*)

  /** The sign-test importance model over feature rows carrying
    * `lang`: ≤[[FeatBuckets]] rows of (b, cnt_r, cnt_t, n_r, n_t) in
    * ONE conditional-aggregation pass — no second corpus explode for
    * the target slice, no raw⋈target join. */
  private[graft] def affinityModel(feats: DataFrame): DataFrame = {
    val counts = feats.groupBy("b").agg(
      count(lit(1)).as("cnt_r"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("cnt_t"))
    counts.crossJoin(broadcast(counts.agg(
      sum(col("cnt_r")).as("n_r"), sum(col("cnt_t")).as("n_t"))))
  }

  /** Per-group (n_feat, n_pos, n_neg) counters of doc feature rows
    * against the broadcast model. A left join admits rows whose
    * bucket the model never saw — the null comparison lands them in
    * neither counter (the streaming gate's case; the batch scorer's
    * inner join is equivalent there because every bucket it probes is
    * in its own model). */
  private[graft] def affinityCounters(docFeats: DataFrame,
      model: DataFrame, joinType: String,
      groupCols: Seq[String]): DataFrame =
    docFeats.join(broadcast(model), Seq("b"), joinType)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_feat"),
        sum(when(col("cnt_t") * col("n_r") > col("cnt_r") * col("n_t"),
          1L).otherwise(0L)).as("n_pos"),
        sum(when(col("cnt_t") * col("n_r") < col("cnt_r") * col("n_t"),
          1L).otherwise(0L)).as("n_neg"))

  private def affinityCol: Column =
    (col("n_pos") - col("n_neg")).cast("double") /
      col("n_feat").cast("double")

  val docTargetAffinity: Q = (s, d) => {
    val feats = affinityFeats(docs(s, d), col("doc_id"), col("lang"))
    affinityCounters(feats, affinityModel(feats), "inner", Seq("doc_id"))
      .select(col("doc_id"), col("n_feat"), col("n_pos"), col("n_neg"),
        affinityCol.as("affinity"))
      .orderBy("doc_id")
  }

  /** Calibration bins for [[docAffinityCalibration]] over the
    * affinity range [−1, 1]. */
  val AffinityCalBins = 10L

  /** Affinity-classifier calibration (`doc_affinity_calibration`) —
    * the evidence behind trusting the DSIR affinity score as a
    * selection key: per fixed-width affinity bin, how often is the
    * document actually target-language? A monotone target-rate curve
    * says the score RANKS correctly (all any threshold/rank selection
    * needs); a flat or folded curve says the hashed-bigram model is
    * saturated or confused and no threshold is safe. Binning is
    * exact-integer off the score's own numerators
    * (`(n_pos − n_neg + n_feat)·BINS div (2·n_feat)`, top edge
    * clipped) — no double is ever bucketed; target rate is one
    * division. Runs on the O(docs) affinity relation; output is
    * O(bins). */
  val docAffinityCalibration: Q = (s, d) => {
    val aff = docTargetAffinity(s, d)
      .select(col("doc_id"), col("n_feat"), col("n_pos"), col("n_neg"))
    val target = docs(s, d).select(col("doc_id"),
      (col("lang") === "en").cast("long").as("is_target"))
    aff.join(target, "doc_id")
      .select(least(expr(
        s"((n_pos - n_neg + n_feat) * $AffinityCalBins) div (2 * n_feat)"),
        lit(AffinityCalBins - 1)).as("bin"), col("is_target"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("is_target")).as("n_target"))
      .select(col("bin"),
        ((col("bin") * 2 - AffinityCalBins).cast("double") /
          AffinityCalBins.toDouble).as("bin_lo"),
        col("n_docs"), col("n_target"),
        (col("n_target").cast("double") / col("n_docs").cast("double"))
          .as("target_rate"))
      .orderBy("bin")
  }

  /** Selection budget for [[docAffinitySelect]]: keep the top
    * [[AffKeepNum]]/[[AffKeepDen]] of each source by affinity. */
  val AffKeepNum = 2
  val AffKeepDen = 5

  /** DSIR's SELECTION step — the resampling that follows
    * [[docTargetAffinity]]'s scoring: within each source, keep the
    * top [[AffKeepNum]]/[[AffKeepDen]] of documents by (affinity
    * DESC, doc_id). Stratifying by source keeps the budget
    * comparison integer (`rk·Den <= n_src·Num`, no division) AND
    * keeps the rank window parallel — a GLOBAL top-fraction sort is
    * a single-partition window at 100 TB, while per-source ranking
    * partitions by the natural distribution key (in production,
    * usually also the policy: selection quotas are negotiated per
    * source). Emits every scored doc with its rank and the selected
    * flag, so the downstream mix sees both kept and dropped. */
  val docAffinitySelect: Q = (s, d) => {
    // source rides through the scoring rollup (functionally dependent
    // on doc_id) — no second documents scan, no doc_id join
    val feats = affinityFeats(docs(s, d),
      col("doc_id"), col("lang"), col("source"))
    val j = affinityCounters(feats, affinityModel(feats), "inner",
        Seq("doc_id", "source"))
      .select(col("doc_id"), col("source"), affinityCol.as("affinity"))
    val wRank = Window.partitionBy(col("source"))
      .orderBy(col("affinity").desc, col("doc_id"))
    val wSrc = Window.partitionBy(col("source"))
    j.withColumn("rk", row_number().over(wRank).cast("long"))
      .withColumn("n_src", count(lit(1)).over(wSrc))
      .select(col("doc_id"), col("source"), col("affinity"),
        col("rk"), col("n_src"),
        (col("rk") * AffKeepDen <= col("n_src") * AffKeepNum)
          .cast("long").as("selected"))
      .orderBy("doc_id")
  }

  /** THRESHOLD form of [[docAffinitySelect]] — identical kept set,
    * billion-doc plan shape. The rank form must sort and buffer each
    * source's FULL partition to emit per-doc ranks (fine as the
    * audit query, wrong as the production selection at 100 TB). This
    * form never ranks the corpus:
    *
    *   1. per-(source, affinity) histogram — one combinable agg;
    *   2. cumulative counts ordered affinity DESC over the HISTOGRAM
    *      (partition size = distinct affinity values per source, not
    *      docs; affinity = (n_pos−n_neg)/n_feat takes O(n_feat²)
    *      distinct values at most, thousands not billions);
    *   3. per-source budget k = ⌊n_src·[[AffKeepNum]]/[[AffKeepDen]]⌋
    *      (the exact integer the rank form's `rk·Den ≤ n_src·Num`
    *      test implies) and per-affinity-group quota k − cum_prev;
    *   4. groups wholly inside / outside the budget become a PURE
    *      FILTER (quota ≥ c / quota ≤ 0); only the ONE straddling
    *      tie-group per source ranks by doc_id — a window whose
    *      partition is the boundary ties, typically a handful of
    *      rows, never a source partition (PlanSpec-pinned).
    *
    * Exact, not approximate: selected set is bit-identical to the
    * rank form (spec-pinned), because the cumulative histogram + the
    * boundary tie-break by doc_id reconstruct exactly the rank
    * form's (affinity DESC, doc_id) order. `approx_percentile` would
    * avoid step 2's histogram shuffle but trades exactness — this
    * form keeps both. */
  val docAffinitySelectThreshold: Q = (s, d) => {
    val feats = affinityFeats(docs(s, d),
      col("doc_id"), col("lang"), col("source"))
    // scored once; checkpointed because both the histogram and the
    // final join consume it (otherwise the feature explosion runs
    // twice)
    val j = affinityCounters(feats, affinityModel(feats), "inner",
        Seq("doc_id", "source"))
      .select(col("doc_id"), col("source"), affinityCol.as("affinity"))
      .transform(graft.Checkpointing.cut)
    val hist = j.groupBy(col("source"), col("affinity"))
      .agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy(col("source"))
      .orderBy(col("affinity").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wSrc = Window.partitionBy(col("source"))
    val cut = hist
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n_src", sum(col("c")).over(wSrc))
      .withColumn("k", expr(s"(n_src * $AffKeepNum) div $AffKeepDen"))
      .select(col("source"), col("affinity"), col("c"),
        (col("k") - (col("cum") - col("c"))).as("quota"))
    val marked = j.join(cut, Seq("source", "affinity"))
    val decided = marked.filter(col("quota") >= col("c") ||
        col("quota") <= lit(0L))
      .select(col("doc_id"), col("source"), col("affinity"),
        (col("quota") >= col("c")).cast("long").as("selected"))
    // the lone straddling tie-group per source: rank by doc_id inside
    // (source, affinity) — the only doc-level window, sized by the
    // boundary ties
    val wTie = Window.partitionBy(col("source"), col("affinity"))
      .orderBy(col("doc_id"))
    val boundary = marked
      .filter(col("quota") > lit(0L) && col("quota") < col("c"))
      .select(col("doc_id"), col("source"), col("affinity"),
        (row_number().over(wTie) <= col("quota"))
          .cast("long").as("selected"))
    decided.unionByName(boundary)
      .orderBy("doc_id")
  }

  val docSampleQuota: Q = (s, d) => {
    val w = Window.partitionBy(col("lang"))
      .orderBy(Hashing.charHash(col("doc_id").cast("string")), col("doc_id"))
    docs(s, d)
      .select(col("doc_id"), col("lang"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= QuotaPerLang)
      .orderBy("lang", "rk")
  }

  /** Epoch (duplication) factors per language for [[docMixEpochs]] —
    * upsample everything but the dominant language. */
  val MixEpochs: Map[String, Int] = Map("en" -> 1)
  val DefaultMixEpochs = 3

  /** Data mixing by epoch duplication: each doc is emitted
    * `epochs(lang)` times with a copy index — the standard way a
    * training pipeline upsamples low-resource slices (a source seen
    * for 3 epochs = 3 copies in the shuffled mix). Deterministic,
    * explode-shaped (output ∝ Σ epochs), no shuffle before the
    * presentation sort. */
  val docMixEpochs: Q = (s, d) => {
    val epochs = MixEpochs.foldLeft(lit(DefaultMixEpochs)) {
      case (acc, (l, e)) => when(col("lang") === l, e).otherwise(acc)
    }
    docs(s, d)
      .select(col("doc_id"), col("lang"), epochs.as("epochs"))
      .withColumn("copy", explode(sequence(lit(0), col("epochs") - 1)))
      .select(col("doc_id"), col("lang"), col("copy").cast("long").as("copy_idx"))
      .orderBy("doc_id", "copy_idx")
  }

  /** Per-source corpus triage: the numbers behind a "which sources are
    * worth keeping" data-mixing decision — volume, size, language
    * spread, and how much of the source is an exact duplicate of
    * something in the corpus. All integer arithmetic; the dup flag is
    * one hash-partitioned count over text (map-side combinable)
    * joined back, never a self cross join. */
  val docSourceStats: Q = (s, d) => {
    val copies = docs(s, d).groupBy(col("text"))
      .agg(count(lit(1)).as("n_copies"))
    docs(s, d)
      .join(copies, "text")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        size(collect_set(col("lang"))).cast("long").as("n_langs"),
        sum(when(col("n_copies") > 1, 1L).otherwise(0L)).as("n_dup_docs"))
      .orderBy("source")
  }

  /** Global top-20 tokens by frequency (explode → count → top-k). */
  val tfTopTokens: Q = (s, d) =>
    docs(s, d)
      .select(explode(toks).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(20)

  /** Top-20 word bigrams (codegen'd one-pass n-gram construction). */
  val tfTopBigrams: Q = (s, d) =>
    docs(s, d)
      .select(explode(Hashing.ngrams(toks, 2)).as("bigram"))
      .groupBy("bigram")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(20)

  /** Kneser-Ney continuation counts (`tf_continuation_counts`): per
    * token, the number of DISTINCT left contexts (the KN continuation
    * numerator — "in how many novel contexts does this word appear")
    * and distinct right contexts, with the corpus distinct-bigram
    * total as the shared denominator and the continuation probability
    * as one exact division. The counts a KN-smoothed LM actually
    * interpolates with — raw frequency over-weights words that are
    * frequent only inside one collocation ("Francisco"). Top 50 by
    * (left types DESC, token); one bigram explode + distinct + two
    * combinable groupBys, no pairwise work. */
  val tfContinuationCounts: Q = (s, d) => {
    val pairs = docs(s, d)
      .select(explode(Hashing.ngrams(toks, 2)).as("bigram"))
      .select(split_part(col("bigram"), lit(" "), lit(1)).as("w1"),
        split_part(col("bigram"), lit(" "), lit(2)).as("w2"))
      .distinct()
      .transform(graft.Checkpointing.cut)
    val total = pairs.select(count(lit(1)).as("n_distinct_bigrams"))
    val left = pairs.groupBy(col("w2").as("token"))
      .agg(count(lit(1)).as("left_types"))
    val right = pairs.groupBy(col("w1").as("token"))
      .agg(count(lit(1)).as("right_types"))
    left.join(right, Seq("token"), "full_outer")
      .na.fill(0L, Seq("left_types", "right_types"))
      .crossJoin(broadcast(total))
      .select(col("token"), col("left_types"), col("right_types"),
        col("n_distinct_bigrams"),
        (col("left_types").cast("double") /
          col("n_distinct_bigrams").cast("double")).as("p_continuation"))
      .orderBy(col("left_types").desc, col("token"))
      .limit(50)
  }

  /** Gopher-rule constants ([[docGopherRules]]). Fixed forever. */
  val GopherMinTokens = 25L
  val GopherMaxTokens = 100000L
  val GopherMinStops = 2L

  /** Gopher quality-filter rules (`doc_gopher_rules`) — the
    * Rae et al. 2112.11446 repetition-free subset applicable to a
    * plain-text corpus, each rule shipped as its own bit (the
    * `doc_keep_decision` auditability discipline — a pipeline review
    * needs to know WHICH rule dropped a document, not just that one
    * did): word count in [[[GopherMinTokens]], [[GopherMaxTokens]]],
    * mean word length in [3, 10] (cross-multiplied:
    * `3·n_tokens ≤ Σlen ≤ 10·n_tokens` — no division), ≥
    * [[GopherMinStops]] DISTINCT required stopwords (the "is this
    * prose at all" test), and ≥ 80% purely-alphabetic tokens
    * (`5·n_alpha ≥ 4·n_tokens`). ALL integer; keep iff every rule
    * passes. One codegen'd projection per doc — zero shuffle at any
    * scale. */
  val docGopherRules: Q = (s, d) => {
    val nTokens = size(toks).cast("long")
    val sumLen = length(concat_ws("", toks)).cast("long")
    val nStops = size(array_intersect(array_distinct(toks),
      array(Stopwords.map(lit): _*))).cast("long")
    val nAlpha = size(filter(toks, t => t.rlike("^[a-zA-Z]+$")))
      .cast("long")
    docs(s, d)
      .select(col("doc_id"), nTokens.as("n_tokens"),
        sumLen.as("sum_token_chars"), nStops.as("n_distinct_stops"),
        nAlpha.as("n_alpha_tokens"))
      .select(col("doc_id"), col("n_tokens"), col("sum_token_chars"),
        col("n_distinct_stops"), col("n_alpha_tokens"),
        (col("n_tokens") >= GopherMinTokens &&
          col("n_tokens") <= GopherMaxTokens).cast("long").as("wc_ok"),
        (col("sum_token_chars") >= col("n_tokens") * 3L &&
          col("sum_token_chars") <= col("n_tokens") * 10L)
          .cast("long").as("mwl_ok"),
        (col("n_distinct_stops") >= GopherMinStops).cast("long")
          .as("stop_ok"),
        (col("n_alpha_tokens") * 5L >= col("n_tokens") * 4L)
          .cast("long").as("alpha_ok"))
      .withColumn("verdict",
        when(col("wc_ok") + col("mwl_ok") + col("stop_ok") +
          col("alpha_ok") === 4L, "keep").otherwise("drop"))
      .orderBy("doc_id")
  }

  /** Absolute discount for [[tfKnProb]] — Kneser-Ney's standard 0.75
    * (exact in binary, so both engines' doubles agree bit-for-bit).
    * Fixed forever. */
  val KnDiscount = 0.75

  /** Interpolated Kneser-Ney bigram probability (`tf_kn_prob`) — the
    * smoothed estimate the continuation counts exist FOR, completing
    * that family into the quantity an LM pipeline actually consumes:
    *
    *   P_KN(w2|w1) = (c(w1,w2) − d)/c(w1·)
    *               + d·N1+(w1·)/c(w1·) · N1+(·w2)/|bigram types|
    *
    * (observed bigrams only, so the max(·,0) of the textbook form
    * never binds). Every count is integer off ONE bigram-type rollup
    * — left marginal + continuation types are O(types) aggregates of
    * the rollup, never a second corpus pass — and p_kn is one fixed
    * double tree over exactly-representable integers (d = 0.75 is an
    * exact binary double), mirrored textually in the oracle. Top 50
    * by (count DESC, bigram) for the gate. */
  /** The full bigram KN-probability relation (one row per bigram
    * TYPE with counts, marginals and `p_kn`) — shared by the
    * [[tfKnProb]] report and the [[docKnRarity]] filter so the
    * smoothing arithmetic cannot drift between them. */
  private def knBigramRel(s: SparkSession, d: String): DataFrame = {
    val big = docs(s, d)
      .select(explode(Hashing.ngrams(toks, 2)).as("bigram"))
      .select(split_part(col("bigram"), lit(" "), lit(1)).as("w1"),
        split_part(col("bigram"), lit(" "), lit(2)).as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c_bigram"))
      // one corpus pass; marginals/types/total all read this rollup
      .transform(graft.Checkpointing.cut)
    val leftMarg = big.groupBy("w1")
      .agg(sum(col("c_bigram")).as("c_w1"),
        count(lit(1)).as("right_types"))
    val contLeft = big.groupBy("w2")
      .agg(count(lit(1)).as("left_types"))
    val total = big.agg(count(lit(1)).as("n_distinct_bigrams"))
    big.join(leftMarg, Seq("w1"))
      .join(contLeft, Seq("w2"))
      .crossJoin(broadcast(total))
      .select(col("w1"), col("w2"), col("c_bigram"), col("c_w1"),
        col("right_types"), col("left_types"), col("n_distinct_bigrams"),
        (((col("c_bigram").cast("double") - lit(KnDiscount)) /
          col("c_w1").cast("double")) +
          (lit(KnDiscount) * col("right_types").cast("double") /
            col("c_w1").cast("double")) *
          (col("left_types").cast("double") /
            col("n_distinct_bigrams").cast("double"))).as("p_kn"))
  }

  val tfKnProb: Q = (s, d) =>
    knBigramRel(s, d)
      .orderBy(col("c_bigram").desc, col("w1"), col("w2"))
      .limit(50)

  /** Rarity bar for [[docKnRarity]]: 2⁻¹⁰, exact in binary, so the
    * `p_kn < bar` comparison is deterministic given the pinned
    * double tree. Fixed forever. */
  val KnRareThreshold = 0.0009765625

  /** KN-rarity document filter (`doc_kn_rarity`) — the
    * perplexity-filter analog a pipeline without a neural LM runs:
    * score each document by the fraction of its bigram OCCURRENCES
    * whose corpus-wide interpolated Kneser–Ney probability
    * ([[knBigramRel]], the `tf_kn_prob` arithmetic verbatim) falls
    * below [[KnRareThreshold]] — a document made of improbable
    * transitions (mojibake, word salad, boilerplate navigation soup)
    * is exactly a document a bigram LM assigns low probability. The
    * context-sensitivity `doc_unigram_score` cannot have: a doc of
    * individually-common words in nonsense ORDER scores rare here.
    * The keep decision is one integer cross-multiplication
    * (quarantine iff 4·n_rare > n_bigrams, i.e. >25% rare
    * transitions); the only doubles are the per-bigram `p_kn < bar`
    * tests on the pinned tree. Docs with < 2 tokens have no bigrams
    * and are absent by construction (mirrored in the oracle).
    *
    * Scale shape: the corpus-scale side is one (doc_id, w1, w2)
    * explode equi-joined to the O(bigram-types) p_kn rollup — a
    * plain shuffle hash join on the bigram key with map-side partial
    * counts after it; no window, no all-pairs, and the rollup is the
    * same single corpus pass `tf_kn_prob` already makes. */
  val docKnRarity: Q = (s, d) => {
    val pkn = knBigramRel(s, d).select("w1", "w2", "p_kn")
    docs(s, d)
      .select(col("doc_id"), explode(Hashing.ngrams(toks, 2)).as("bigram"))
      .select(col("doc_id"),
        split_part(col("bigram"), lit(" "), lit(1)).as("w1"),
        split_part(col("bigram"), lit(" "), lit(2)).as("w2"))
      .join(pkn, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("p_kn") < KnRareThreshold, 1L).otherwise(0L))
          .as("n_rare"))
      .select(col("doc_id"), col("n_bigrams"), col("n_rare"),
        (col("n_rare").cast("double") /
          col("n_bigrams").cast("double")).as("rare_rate"),
        when(col("n_rare") * 4 > col("n_bigrams"), "quarantined_rare")
          .otherwise("admitted").as("decision"))
      .orderBy("doc_id")
  }

  /** Token window size / stride for [[docChunkTokens]] — overlap of
    * `ChunkTokens - ChunkStride` tokens between adjacent chunks. */
  val ChunkTokens = 32
  val ChunkStride = 24

  /** Training-window chunking: each document split into fixed-size
    * token windows with overlap — the step that turns a variable-length
    * corpus into model-input-sized rows (context-window packing's
    * front half). One chunk row per (doc, start) with the window's
    * text reassembled; the final window is short rather than padded.
    *
    * Scale shape: tokenize is the one-pass codegen'd projection, the
    * window starts come from a per-row `sequence` + posexplode (narrow,
    * no shuffle — chunk count ∝ corpus tokens / stride), and the
    * ORDER BY is output presentation only. At 100 TB this is the
    * classic embarrassingly-parallel map; the explode multiplies rows
    * ~n_tokens/stride× so downstream consumers should repartition by
    * size, not count. */
  private def chunkRel(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .select(col("doc_id"), col("source"),
        Hashing.tokens(col("text")).as("tk"))
      .filter(size(col("tk")) >= 1)
      .select(col("doc_id"), col("source"), col("tk"),
        posexplode(sequence(lit(0), size(col("tk")) - 1, lit(ChunkStride)))
          .as(Seq("chunk_id", "start_tok")))
      .select(col("doc_id"), col("source"),
        col("chunk_id").cast("long").as("chunk_id"),
        col("start_tok").cast("long").as("start_tok"),
        size(slice(col("tk"), col("start_tok") + 1, lit(ChunkTokens)))
          .cast("long").as("n_tok"),
        array_join(slice(col("tk"), col("start_tok") + 1, lit(ChunkTokens)),
          " ").as("chunk_text"))

  val docChunkTokens: Q = (s, d) =>
    chunkRel(s, d)
      .select(col("doc_id"), col("chunk_id"), col("start_tok"),
        col("n_tok"), col("chunk_text"))
      .orderBy("doc_id", "chunk_id")

  /** Sequence length for [[docPackChunks]]. */
  val PackSeqTokens = 64L

  /** Context-window packing — the back half of [[docChunkTokens]]:
    * chunks are concatenated in (doc_id, chunk_id) order and chopped
    * into fixed-[[PackSeqTokens]] training sequences; each chunk row
    * gets the sequence it starts in and its token offset there.
    *
    * Packing is PER SOURCE (the shard key), not global: a single
    * global running sum would serialize the whole corpus through one
    * partition — the per-source window keeps the prefix-sum parallel
    * across shards, which is how a 100 TB packing run actually shards
    * (each source's chunk stream packs independently). The ties-free
    * (doc_id, chunk_id) ordering makes the running sum deterministic
    * on both engines. */
  val docPackChunks: Q = (s, d) => {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("doc_id"), col("chunk_id"))
    chunkRel(s, d)
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("off", col("cum") - col("n_tok"))
      .select(col("source"), col("doc_id"), col("chunk_id"), col("n_tok"),
        expr(s"off div $PackSeqTokens").as("seq_id"),
        (col("off") % PackSeqTokens).as("seq_off"))
      .orderBy("source", "doc_id", "chunk_id")
  }

  /** Vocabulary size for [[tfVocabCoverage]]. */
  val VocabTopK = 100

  /** Vocabulary coverage: what fraction of each language's token
    * OCCURRENCES the global top-[[VocabTopK]] vocabulary covers — the
    * number that sizes a tokenizer's vocab (or flags a language the
    * vocab underserves before training). Two combinable aggregations
    * (global term counts, per-language covered/total counts) and one
    * broadcast of the tiny vocab relation; the fact table shuffles on
    * the token only. Ratio is one exact division of exact counts. */
  val tfVocabCoverage: Q = (s, d) => {
    val tok = docs(s, d)
      .select(col("lang"), explode(toks).as("token"))
    val vocab = tok.groupBy("token")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(VocabTopK)
      .select(col("token"))
    tok.join(broadcast(vocab).withColumn("in_vocab", lit(1L)),
        Seq("token"), "left")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("in_vocab"), lit(0L))).as("n_covered"))
      .select(col("lang"), col("n_tokens"), col("n_covered"),
        (col("n_covered").cast("double") / col("n_tokens").cast("double"))
          .as("coverage"))
      .orderBy("lang")
  }

  /** N-gram length / minimum document frequency for
    * [[textBoilerplateNgrams]]. */
  val BoilerplateN = 5
  val BoilerplateMinDf = 2L

  /** Cross-document boilerplate detection: word [[BoilerplateN]]-grams
    * that appear in at least [[BoilerplateMinDf]] DISTINCT documents,
    * with their document frequency and total occurrence count — the
    * "repeated span" report (headers, footers, license blurbs,
    * templated sentences) that feeds a span-removal pass in a web
    * corpus cleanup (the documents here have no newlines, so the
    * dedup unit is the n-gram window, not the line).
    *
    * Scale shape: two STACKED map-side-combinable aggregates — per
    * (doc, gram) occurrence counts first, then per-gram (df, n) over
    * the already-collapsed rows — never a COUNT(DISTINCT) Expand over
    * the exploded fact (the q16 pre-dedup lesson). At 100 TB you'd group on
    * the gram's 64-bit hash instead of the string to shrink the
    * shuffle payload — same plan shape. */
  val textBoilerplateNgrams: Q = (s, d) =>
    docs(s, d)
      .withColumn("toks", Hashing.tokens(col("text")))
      .filter(size(col("toks")) >= BoilerplateN)
      .select(col("doc_id"),
        explode(Hashing.ngrams(col("toks"), BoilerplateN)).as("gram"))
      .groupBy("doc_id", "gram")
      .agg(count(lit(1)).as("tf"))
      .groupBy("gram")
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("n_occurrences"))
      .filter(col("df") >= BoilerplateMinDf)
      .orderBy(col("df").desc, col("n_occurrences").desc, col("gram"))

  /** The apply step of [[textBoilerplateNgrams]]: per document, the
    * fraction of its word 5-grams that are corpus boilerplate
    * (df ≥ [[BoilerplateMinDf]]) — the score a span-removal pass
    * thresholds on (a doc that is mostly template text gets dropped
    * or stripped; compare [[textContamination]], which scores overlap
    * against a BENCHMARK set instead of the corpus itself).
    *
    * Scale shape: the boilerplate relation reduces to distinct gram
    * hashes (compact, broadcast-able the way the benchmark set is);
    * the per-doc side joins its distinct gram hashes against it and
    * counts hits — explode → equi-join → combinable agg, never a
    * doc × doc comparison. */
  val textBoilerplateFraction: Q = (s, d) => {
    val grams = docs(s, d)
      .withColumn("toks", Hashing.tokens(col("text")))
      .filter(size(col("toks")) >= BoilerplateN)
      .select(col("doc_id"),
        explode(array_distinct(
          Hashing.hashAll(Hashing.ngrams(col("toks"), BoilerplateN))))
          .as("gh"))
    val boiler = grams.groupBy("gh")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= BoilerplateMinDf)
      .select(col("gh"))
    val totals = grams.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
    val hits = grams.join(broadcast(boiler), "gh")
      .groupBy("doc_id").agg(count(lit(1)).as("n_boiler"))
    totals.join(hits, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_boiler"))
      .select(col("doc_id"), col("n_grams"), col("n_boiler"),
        (col("n_boiler").cast("double") / col("n_grams").cast("double"))
          .as("boiler_fraction"))
      .orderBy("doc_id")
  }

  /** Temperature-sampling exponent is fixed at 0.5 (`sqrt`) — the
    * only power that is IEEE-correctly-rounded on both engines (`pow`
    * with arbitrary exponents is libm-dependent; see
    * [[graft.functions.Exact]]). */
  val docSampleTemperature: Q = (s, d) => {
    val total = docs(s, d).agg(count(lit(1)).as("n_total"))
    val perLang = docs(s, d)
      .groupBy("lang").agg(count(lit(1)).as("n_docs"))
      .crossJoin(broadcast(total))
      .withColumn("share",
        col("n_docs").cast("double") / col("n_total").cast("double"))
      .withColumn("weight", sqrt(col("share")))
    // Σ weight over languages as a SEQUENTIAL lang-ordered fold (not
    // SUM, whose accumulation order is engine-internal): sort the
    // (lang, weight) structs, fold in order — deterministic on both
    // engines. |langs| rows, so the collect_list is trivially small.
    val z = perLang
      .agg(aggregate(
        transform(
          array_sort(collect_list(struct(col("lang"), col("weight")))),
          x => x.getField("weight")),
        lit(0.0), (acc, w) => acc + w).as("z"))
    perLang.crossJoin(broadcast(z))
      .select(col("lang"), col("n_docs"), col("share"), col("weight"),
        (col("weight") / col("z")).as("q_prob"),
        floor(col("weight") / col("z") * col("n_total").cast("double"))
          .cast("long").as("target_docs"))
      .orderBy("lang")
  }

  /** Weighted sample size for [[docSampleWeighted]]. */
  val WeightedSampleK = 100

  /** Weighted sampling WITHOUT replacement by sequential Poisson
    * (priority) sampling — the deterministic form of "sample docs
    * proportionally to length/quality" (Ohlsson's priority sampling;
    * the quality-weighted corpus draw a mixture pipeline runs after
    * scoring). Each doc gets priority = u / w where u is the
    * polynomial hash of its id (the reproducible stand-in for a
    * uniform draw — the same hash-not-rand() lineage rule as
    * [[docSampleHash]]) and w = n_chars; the k smallest priorities
    * are the sample, so heavier docs, with smaller priorities, are
    * proportionally more likely to be drawn. Exactness: ONE double
    * division of two exact integers per row (both engines correctly
    * round it identically), ties broken by doc_id.
    *
    * Scale shape: pure projection + global top-k — the plan is
    * TakeOrderedAndProject (bounded per-partition heaps, k rows to
    * the driver-side reduce), NEVER a global sort; at 100 TB this is
    * one scan, no shuffle of the corpus. */
  val docSampleWeighted: Q = (s, d) =>
    weightedPriority(docs(s, d))
      .orderBy(col("priority"), col("doc_id"))
      .limit(WeightedSampleK)

  /** The (doc_id, lang, weight, priority) projection of a documents
    * relation — the ONLY copy of the priority formula, shared by the
    * batch sample and the streaming reservoir
    * ([[graft.operators.StreamOps]] `stream_sample_weighted`): any
    * split of the corpus yields per-split k-min samples that
    * union-merge into exactly the global one (every global top-k
    * priority is in its split's top-k). Needs only (doc_id, lang,
    * n_chars) — document text never enters the sampling path. */
  private[graft] def weightedPriority(df: DataFrame): DataFrame =
    // n_chars > 0 is an explicit contract, not a reliance on IEEE
    // division semantics: a zero-weight doc would otherwise get
    // priority +Inf (or NaN when its hash is 0) and sort by whatever
    // both engines happen to do with non-finite doubles. A weight-0
    // doc cannot be drawn by weighted sampling anyway — excluded on
    // both sides (the oracles mirror the filter).
    df.filter(col("n_chars") > 0L)
      .select(col("doc_id"), col("lang"), col("n_chars").as("weight"),
        (Hashing.charHash(col("doc_id").cast("string")).cast("double") /
          col("n_chars").cast("double")).as("priority"))

  /** Per-language budget for [[docSampleWeightedQuota]]. */
  val WeightedQuotaK = 20

  /** Stratified weighted sampling: the priority draw of
    * [[docSampleWeighted]] under PER-LANGUAGE budgets — the form a
    * mixture pipeline actually runs ("N docs per language, favoring
    * quality/length within each"), composing the quota pattern
    * ([[docSampleQuota]]) with the priority formula. The rank window
    * rewrites to WindowGroupLimit (bounded per-key heap — a language's
    * partition never materializes), so the stratified draw costs one
    * lang-keyed shuffle regardless of corpus size. */
  val docSampleWeightedQuota: Q = (s, d) => {
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("priority"), col("doc_id"))
    weightedPriority(docs(s, d))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= WeightedQuotaK)
      .select(col("doc_id"), col("lang"), col("weight"),
        col("priority"), col("rk"))
      .orderBy("lang", "rk")
  }

  /** Oracle shared verbatim by `doc_sample_weighted` and the
    * streaming reservoir `stream_sample_weighted` — one semantic
    * result, two plan costs (the asof/compact convention). */
  private[graft] val sqlSampleWeighted: String =
    s"""SELECT doc_id, lang, n_chars AS weight,
          CAST(${Hashing.sqlCharHash("CAST(doc_id AS VARCHAR)")}
            AS DOUBLE) / CAST(n_chars AS DOUBLE) AS priority
        FROM documents
        WHERE n_chars > 0
        ORDER BY priority, doc_id LIMIT $WeightedSampleK"""

  /** Power-of-two sequence-length buckets for [[docLengthBuckets]]. */
  val LengthBucketBounds: Seq[Long] = Seq(16L, 32L, 64L, 128L, 256L, 512L)
  val LengthBucketCap = 1024L

  /** Length-bucketed batching report: documents grouped into
    * power-of-two token-length buckets, with the padding waste a
    * pad-to-bucket-max batching strategy would pay — the number that
    * decides bucket boundaries (or switches the pipeline to packing,
    * [[docPackChunks]]) before a training run burns FLOPs on pad
    * tokens. One projection + one combinable agg; all-integer until
    * the final exact division. */
  val docLengthBuckets: Q = (s, d) => {
    val nTok = size(toks).cast("long")
    val bucket = LengthBucketBounds.reverse
      .foldLeft(lit(LengthBucketCap): Column) { (acc, b) =>
        when(nTok <= b, b).otherwise(acc)
      }
    docs(s, d)
      .select(bucket.as("bucket_max"), nTok.as("n_tok"))
      .groupBy("bucket_max")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("sum_tokens"))
      .select(col("bucket_max"), col("n_docs"), col("sum_tokens"),
        (col("bucket_max") * col("n_docs") - col("sum_tokens"))
          .as("pad_tokens"),
        ((col("bucket_max") * col("n_docs") - col("sum_tokens"))
          .cast("double") /
          (col("bucket_max") * col("n_docs")).cast("double"))
          .as("pad_ratio"))
      .orderBy("bucket_max")
  }

  /** Corpus integrity audit — the pre-training data-quality gate, as
    * one (metric, value) report: table sizes, docs with no embedding,
    * orphaned embeddings, and malformed vector dims. Every metric is
    * a combinable count or an anti-join (both broadcastable one way
    * or the other at scale); a pipeline asserts `n_vecs_no_doc == 0
    * && n_bad_dim == 0` before training and treats `n_docs_no_vec`
    * as the embedding-coverage backlog. */
  val corpusIntegrity: Q = (s, d) => {
    val dd = docs(s, d)
    val ee = Tables.embeddings(s, d)
    def row(name: String, from: DataFrame) =
      from.agg(count(lit(1)).as("value"))
        .select(lit(name).as("metric"), col("value"))
    row("n_docs", dd)
      .unionAll(row("n_vecs", ee))
      .unionAll(row("n_docs_no_vec",
        dd.join(ee, col("doc_id") === col("vec_id"), "left_anti")))
      .unionAll(row("n_vecs_no_doc",
        ee.join(dd, col("vec_id") === col("doc_id"), "left_anti")))
      .unionAll(row("n_bad_dim",
        ee.filter(size(col("embedding")) =!= SimilarityOps.Dims)))
      .orderBy("metric")
  }

  /** The REMOVAL step completing the boilerplate family (report →
    * per-doc fraction → REMOVE): every token covered by at least one
    * corpus-boilerplate 5-gram occurrence is dropped, the survivors
    * reassemble the cleaned text in original order, and the
    * before/after counts quantify what the pass cost. Same df rule as
    * [[textBoilerplateNgrams]], so the three queries describe one
    * consistent pass.
    *
    * Scale shape: the boilerplate gram set is compact (df-capped:
    * ≤ total_grams/MinDf entries) and BROADCAST onto the
    * per-position occurrence explode; coverage expansion is a 5-way
    * sequence explode rolled straight into per-doc covered-position
    * ARRAYS — the only hash exchange in the plan moves (doc_id, pos)
    * int pairs for covered positions, never tokens. The cleaned text
    * is then rebuilt IN PLACE: the covered-set relation (∝ docs that
    * contain boilerplate, not ∝ corpus tokens) broadcasts back onto
    * the base scan and one indexed `filter` drops covered tokens
    * without the corpus ever leaving its scan stage. Round 6 instead
    * exploded every corpus token into its own row and pushed them
    * through TWO wide exchanges (per-position anti-join + ordered
    * re-collect) — the 3 s bench entry this rewrite removes. If the
    * covered-set relation ever outgrew the driver, the fallback is a
    * plain doc_id join (one text exchange — still strictly narrower
    * than per-token rows). */
  val textRemoveBoilerplate: Q = (s, d) => {
    val base = docs(s, d).withColumn("toks", Hashing.tokens(col("text")))
    // df over 64-bit gram FINGERPRINTS (the `text_boilerplate_fraction`
    // convention): gram bytes never reach the df shuffle or the
    // broadcast set — only hashes move
    val boiler = base.filter(size(col("toks")) >= BoilerplateN)
      .select(col("doc_id"), explode(array_distinct(
        Hashing.hashAll(Hashing.ngrams(col("toks"), BoilerplateN))))
        .as("gh"))
      .groupBy("gh").agg(count(lit(1)).as("df"))
      .filter(col("df") >= BoilerplateMinDf)
      .select(col("gh"))
    val occ = base.select(col("doc_id"),
      posexplode(Hashing.hashAll(Hashing.ngrams(col("toks"), BoilerplateN)))
        .as(Seq("gpos", "gh")))
    val covered = occ.join(broadcast(boiler), "gh")
      .select(col("doc_id"),
        explode(sequence(col("gpos"), col("gpos") + lit(BoilerplateN - 1)))
          .as("pos"))
      .groupBy("doc_id")
      .agg(collect_set(col("pos")).as("cov"))
    base.join(broadcast(covered), Seq("doc_id"), "left")
      .withColumn("kept", when(col("cov").isNull, col("toks"))
        .otherwise(filter(col("toks"),
          (t, i) => !array_contains(col("cov"), i))))
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"),
        size(col("kept")).cast("long").as("n_kept"),
        (size(col("toks")) - size(col("kept"))).cast("long").as("n_removed"),
        concat_ws(" ", col("kept")).as("cleaned_text"))
      .orderBy("doc_id")
  }

  /** Language-ID confusion matrix: the labeled lang × heuristic lang
    * counts with row shares — the evaluation report for
    * [[textLangid]]'s classifier (which cells dominate tells you
    * whether to fix the stopword list or the script ranges before
    * trusting per-language sampling built on the heuristic). One
    * projection + one combinable agg; the row normalizer windows over
    * the |langs|² aggregate. */
  val docLangidConfusion: Q = (s, d) => {
    val nStop = size(filter(toks, t => t.isInCollection(Stopwords)))
    val heur = when(col("text").rlike("[\\x{4e00}-\\x{9fff}]"), "zh")
      .when(col("text").rlike("[àâçéèêëîïôùûüáíóúñ]"), "romance")
      .when(nStop > 0, "en")
      .otherwise("unknown")
    val cells = docs(s, d)
      .select(col("lang").as("labeled_lang"), heur.as("heur_lang"))
      .groupBy("labeled_lang", "heur_lang")
      .agg(count(lit(1)).as("n"))
    cells.select(col("labeled_lang"), col("heur_lang"), col("n"),
        (col("n").cast("double") /
          sum(col("n")).over(Window.partitionBy(col("labeled_lang")))
            .cast("double")).as("row_share"))
      .orderBy("labeled_lang", "heur_lang")
  }

  /** Profile size for [[textLangidNgram]] — top trigrams kept per
    * language. */
  val LangidProfileSize = 100

  /** N-gram language ID (Cavnar–Trenkle shape): per-language char
    * TRIGRAM profiles (top [[LangidProfileSize]] by corpus count,
    * ties → lowest hash) learned from the labeled corpus, then each
    * document classified to the profile it overlaps most (distinct
    * trigrams ∩ profile, ties → lexicographically first language;
    * no overlap with any profile → 'unknown'). This is the "n-gram
    * heuristic" tier of language ID — script/stopword rules
    * ([[textLangid]]) are the fallback tier, and
    * `doc_langid_confusion` evaluates either against labels.
    *
    * Scale shape: trigrams are hashed substring windows (codegen'd,
    * hashes shuffle — never text); profiles are |langs|·K rows and
    * BROADCAST onto the per-doc distinct-trigram explode; scoring is
    * one combinable (doc, lang) count + a WindowGroupLimit argmax.
    * Everything is integer counts — no FP in the decision. */
  val textLangidNgram: Q = (s, d) => {
    val N = 3
    def grams(c: Column): Column = Hashing.charNgramHashes(c, N)
    val docGrams = docs(s, d)
      .filter(length(col("text")) >= N)
      .select(col("doc_id"),
        explode(array_distinct(grams(col("text")))).as("gh"))
    val allGrams = docs(s, d)
      .filter(length(col("text")) >= N)
      .select(col("lang"), explode(grams(col("text"))).as("gh"))
    val wProf = Window.partitionBy(col("lang"))
      .orderBy(col("n").desc, col("gh"))
    val profiles = allGrams
      .groupBy(col("lang"), col("gh"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(wProf))
      .filter(col("rn") <= LangidProfileSize)
      .select(col("lang").as("cand_lang"), col("gh"))
    val wBest = Window.partitionBy(col("doc_id"))
      .orderBy(col("overlap").desc, col("cand_lang"))
    val best = docGrams.join(broadcast(profiles), "gh")
      .groupBy(col("doc_id"), col("cand_lang"))
      .agg(count(lit(1)).as("overlap"))
      .withColumn("rn", row_number().over(wBest))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("cand_lang"), col("overlap"))
    docs(s, d).select(col("doc_id"), col("lang").as("labeled_lang"))
      .join(best, Seq("doc_id"), "left")
      .na.fill(0L, Seq("overlap"))
      .select(col("doc_id"), col("labeled_lang"),
        coalesce(col("cand_lang"), lit("unknown")).as("ngram_lang"),
        col("overlap"))
      .orderBy("doc_id")
  }

  /** Language-ID ambiguity audit (`text_langid_margin`) — the
    * decision-confidence twin of [[textLangidNgram]]: per document,
    * the top TWO profile overlaps and their margin. Per-language
    * sampling, quota, and affinity selection all key on the
    * classifier's argmax; a document whose runner-up profile scores
    * within 80% of the winner (second·5 >= top·4, integer
    * cross-multiplied — code-switched text, romance-language
    * cognates, boilerplate-heavy pages) is routed to the fallback
    * tier instead of being trusted. No-overlap documents are
    * ambiguous by definition. Same plan shape as the classifier
    * (broadcast |langs|·K profile onto the distinct-trigram explode,
    * one combinable (doc, lang) count); the only addition is keeping
    * rank <= 2 of the same WindowGroupLimit instead of rank = 1, then
    * a one-row-per-doc conditional rollup. All integer — no FP in
    * the decision. */
  val textLangidMargin: Q = (s, d) => {
    val N = 3
    def grams(c: Column): Column = Hashing.charNgramHashes(c, N)
    val docGrams = docs(s, d)
      .filter(length(col("text")) >= N)
      .select(col("doc_id"),
        explode(array_distinct(grams(col("text")))).as("gh"))
    val allGrams = docs(s, d)
      .filter(length(col("text")) >= N)
      .select(col("lang"), explode(grams(col("text"))).as("gh"))
    val wProf = Window.partitionBy(col("lang"))
      .orderBy(col("n").desc, col("gh"))
    val profiles = allGrams
      .groupBy(col("lang"), col("gh"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(wProf))
      .filter(col("rn") <= LangidProfileSize)
      .select(col("lang").as("cand_lang"), col("gh"))
    val wBest = Window.partitionBy(col("doc_id"))
      .orderBy(col("overlap").desc, col("cand_lang"))
    val top2 = docGrams.join(broadcast(profiles), "gh")
      .groupBy(col("doc_id"), col("cand_lang"))
      .agg(count(lit(1)).as("overlap"))
      .withColumn("rn", row_number().over(wBest))
      .filter(col("rn") <= 2)
      .groupBy(col("doc_id"))
      .agg(max(when(col("rn") === 1, col("cand_lang"))).as("tl"),
        max(when(col("rn") === 1, col("overlap"))).as("to"),
        max(when(col("rn") === 2, col("cand_lang"))).as("sl"),
        max(when(col("rn") === 2, col("overlap"))).as("so"))
    docs(s, d).select(col("doc_id"), col("lang").as("labeled_lang"))
      .join(top2, Seq("doc_id"), "left")
      .select(col("doc_id"), col("labeled_lang"),
        coalesce(col("tl"), lit("unknown")).as("top_lang"),
        coalesce(col("to"), lit(0L)).as("top_overlap"),
        coalesce(col("sl"), lit("none")).as("second_lang"),
        coalesce(col("so"), lit(0L)).as("second_overlap"))
      .select(col("doc_id"), col("labeled_lang"), col("top_lang"),
        col("top_overlap"), col("second_lang"), col("second_overlap"),
        (col("top_overlap") - col("second_overlap")).as("margin"),
        (col("top_overlap") === 0L ||
          col("second_overlap") * 5L >= col("top_overlap") * 4L)
          .as("ambiguous"))
      .orderBy("doc_id")
  }

  /** Pearson correlations between integer document features
    * (n_tokens / n_distinct_tokens / n_chars) from EXACT integer
    * moments: every Σ is a DECIMAL(38,0) sum, and every product is
    * taken AFTER widening both operands to DECIMAL(19,0) — a
    * long·long product overflows a long past ~3e9 chars/doc, so the
    * widening (not just the sum type) is what makes the moments
    * overflow-free at any corpus size — and r is one fixed
    * double-expression tree over the cast moments — the same
    * correctly-rounded value on both engines. Spark's built-in
    * `corr` is deliberately NOT used: its one-pass co-moment updates
    * accumulate doubles in partition order and can't be bit-matched
    * cross-engine. One scan computes all ten moments; the three
    * output rows are a stack reshape of the 1-row aggregate. */
  val corpusCorrelations: Q = (s, d) => {
    val a = size(toks).cast("long")
    val b = size(array_distinct(toks)).cast("long")
    val c = length(col("text")).cast("long")
    def m(x: Column) = sum(x.cast("decimal(38,0)"))
    // decimal(19,0) holds any long; the product is decimal(38,0) — exact
    def m2(x: Column, y: Column) =
      sum(x.cast("decimal(19,0)") * y.cast("decimal(19,0)"))
    val agg = docs(s, d).agg(
      count(lit(1)).as("n"),
      m(a).as("sa"), m(b).as("sb"), m(c).as("sc"),
      m2(a, a).as("saa"), m2(b, b).as("sbb"), m2(c, c).as("scc"),
      m2(a, b).as("sab"), m2(a, c).as("sac"), m2(b, c).as("sbc"))
    def r(sx: String, sy: String, sxx: String, syy: String, sxy: String) = {
      val n = col("n").cast("double")
      def D(cn: String) = col(cn).cast("double")
      (n * D(sxy) - D(sx) * D(sy)) /
        (sqrt(n * D(sxx) - D(sx) * D(sx)) *
          sqrt(n * D(syy) - D(sy) * D(sy)))
    }
    agg.select(col("n"),
        r("sa", "sb", "saa", "sbb", "sab").as("r_tokens_distinct"),
        r("sa", "sc", "saa", "scc", "sac").as("r_tokens_chars"),
        r("sb", "sc", "sbb", "scc", "sbc").as("r_distinct_chars"))
      .select(col("n"), expr(
        """stack(3,
           'tokens_vs_distinct', r_tokens_distinct,
           'tokens_vs_chars', r_tokens_chars,
           'distinct_vs_chars', r_distinct_chars) AS (pair, r)"""))
      .select(col("pair"), col("n"), col("r"))
      .orderBy("pair")
  }

  /** Occurrence floor for [[tfBurstiness]] — clumping estimates on
    * rarer tokens are noise. */
  val BurstMinOcc = 50L
  /** Rows kept by [[tfBurstiness]]. */
  val BurstTopK = 20L

  /** Token burstiness (`tf_burstiness`) — the Church–Gale adaptation
    * statistic: for every frequent token, total occurrences vs the
    * DOCUMENTS containing it, and their ratio (mean occurrences per
    * containing doc). A token with high clumping ("Francisco",
    * navigation chrome, code identifiers) concentrates its mass in
    * few docs — frequency alone over-prices it for vocab and
    * unigram-model decisions ([[tfContinuationCounts]] is the
    * context-side view of the same failure; this is the document
    * side). Top-[[BurstTopK]] ordered by the scaled-INTEGER key
    * `occ·2^20 div docs` with floor ties broken by token — fully
    * deterministic, textually mirrored in the oracle, and no double
    * is ever compared for the ORDER; the readable ratio is one final
    * division. One explode + one combinable groupBy; the rank window
    * runs on the ≥[[BurstMinOcc]] slice of the vocabulary. */
  val tfBurstiness: Q = (s, d) => {
    val perToken = docs(s, d)
      .select(col("doc_id"), explode(toks).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("n_occ"),
        countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_occ") >= BurstMinOcc)
    // integer-exact ordering: occ/docs compared by cross-product via
    // a scaled integer key (occ·2^20 div docs fits the gate range)
    val rankKey = expr("(n_occ << 20) div n_docs")
    perToken
      .withColumn("rank", row_number().over(
        Window.orderBy(rankKey.desc, col("tok"))).cast("long"))
      .filter(col("rank") <= BurstTopK)
      .select(col("rank"), col("tok"), col("n_occ"), col("n_docs"),
        (col("n_occ").cast("double") / col("n_docs").cast("double"))
          .as("occ_per_doc"))
      .orderBy("rank")
  }

  /** Zipf diagnostic: the top-50 tokens with frequency rank and the
    * rank·count product (roughly constant under Zipf's law — a flat
    * product column is the healthy-natural-corpus signature, and a
    * wildly non-flat one flags boilerplate or synthetic text). The
    * rank window is global but runs over the VOCAB-sized aggregate,
    * not the corpus (the q15 rule); ties break on token for
    * determinism. */
  val tfZipf: Q = (s, d) => {
    val counts = docs(s, d)
      .select(explode(toks).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
    counts
      .withColumn("rank",
        row_number().over(Window.orderBy(col("n").desc, col("tok")))
          .cast("long"))
      .filter(col("rank") <= 50)
      .select(col("rank"), col("tok"), col("n"),
        (col("rank") * col("n")).as("rank_times_n"))
      .orderBy("rank")
  }

  /** Collocation scoring without logarithms: lift =
    * p(ab) / (p(a)·p(b)) for the top bigrams — PMI's argument without
    * the `ln` (cross-libm `ln` is not correctly rounded, so exact
    * oracle parity bans it; lift is the same ranking signal). A lift
    * ≫ 1 marks a true collocation, ≈ 1 statistical coincidence. Every
    * input is an exact integer count; the score is a fixed tree of
    * three exact ratios, so no overflow however large the corpus
    * (counts never multiply as integers). Unigram relation is
    * vocab-sized and broadcast twice (left/right); corpus scanned
    * twice (unigrams, bigrams), each one combinable agg. */
  val tfBigramLift: Q = (s, d) => {
    val tok = docs(s, d).select(explode(toks).as("tok"))
    val uni = tok.groupBy("tok").agg(count(lit(1)).as("n_uni"))
    val nTotal = tok.agg(count(lit(1)).as("n_tokens"))
    val biAll = docs(s, d)
      .select(explode(Hashing.ngrams(toks, 2)).as("bigram"))
    val bTotal = biAll.agg(count(lit(1)).as("n_bigrams"))
    val bi = biAll.groupBy("bigram").agg(count(lit(1)).as("n_ab"))
      .orderBy(col("n_ab").desc, col("bigram")).limit(20)
      .withColumn("left_tok", split_part(col("bigram"), lit(" "), lit(1)))
      .withColumn("right_tok", split_part(col("bigram"), lit(" "), lit(2)))
    bi.join(broadcast(uni.select(col("tok").as("left_tok"),
        col("n_uni").as("n_a"))), "left_tok")
      .join(broadcast(uni.select(col("tok").as("right_tok"),
        col("n_uni").as("n_b"))), "right_tok")
      .crossJoin(broadcast(nTotal))
      .crossJoin(broadcast(bTotal))
      .select(col("bigram"), col("n_ab"), col("n_a"), col("n_b"),
        (ratio(col("n_ab"), col("n_bigrams")) /
          (ratio(col("n_a"), col("n_tokens")) *
            ratio(col("n_b"), col("n_tokens")))).as("lift"))
      .orderBy(col("n_ab").desc, col("bigram"))
  }

  /** Per-language RELATIVE quality gate: keep documents at or above
    * their own language's median quality — the thresholding move that
    * doesn't starve low-resource languages (a global cutoff drops
    * whole languages whose score distribution sits lower, e.g. from
    * stopword-list bias). The median is the exact window-rank lerp of
    * `q23_percentiles` (built-in `percentile` buffers whole groups;
    * the window form spills), per language; medians then BROADCAST
    * back onto the scored projection — |langs| rows, so the fact side
    * never shuffles for the join. Quality arithmetic is identical to
    * [[textQuality]], so the two relations agree bit-for-bit. */
  val docQualityGate: Q = (s, d) => {
    val nTokens = size(toks).cast("long")
    val nStop = size(filter(toks, t => t.isInCollection(Stopwords)))
      .cast("long")
    val nAlpha = length(regexp_replace(col("text"), "[^a-zA-Z]", ""))
      .cast("long")
    val nDistinct = size(array_distinct(toks)).cast("long")
    val quality = ratio(nStop, nTokens) * lit(0.2) +
      ratio(nAlpha, length(col("text")).cast("long")) * lit(0.4) +
      ratio(nDistinct, nTokens) * lit(0.4)
    val scored = docs(s, d)
      .select(col("doc_id"), col("lang"), quality.as("quality"))
    val wAll = Window.partitionBy(col("lang"))
    val wSort = wAll.orderBy(col("quality"))
    val pos = (col("n") - 1).cast("double") * lit(0.5)
    val lo = max(when(col("rn") === floor(pos).cast("long") + 1, col("quality")))
    val hi = max(when(col("rn") === ceil(pos).cast("long") + 1, col("quality")))
    val frac = max(pos - floor(pos))
    val medians = scored
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("rn", row_number().over(wSort))
      .groupBy(col("lang"))
      .agg((lo * (lit(1.0) - frac) + hi * frac).as("lang_median"))
    scored.join(broadcast(medians), "lang")
      .select(col("doc_id"), col("lang"), col("quality"),
        col("lang_median"),
        when(col("quality") >= col("lang_median"), "keep")
          .otherwise("drop").as("verdict"))
      .orderBy("doc_id")
  }

  // ------------------------------------------------------------------
  // BPE tokenizer training (the vocabulary-learning step of the
  // pipeline whose sizing inputs are tf_vocab_coverage /
  // text_token_count)
  // ------------------------------------------------------------------

  /** Number of BPE merge rounds learned by [[tfBpeTrain]] — fixed
    * (not convergence-tested) so the DuckDB oracle can unroll the
    * exact same rounds as a CTE chain, like [[SimilarityOps.KmeansIters]]. */
  val BpeMerges = 8

  private def docsMtime(d: String): Option[Long] =
    try Some(java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(s"$d/documents.parquet")).toMillis)
    catch { case _: java.io.IOException => None }

  /** The word-frequency relation BPE trains on. This is the classic
    * trainer shape (Sennrich et al.'s reference implementation counts
    * words once, then learns merges over the vocab table): the corpus
    * is scanned and shuffled EXACTLY ONCE — one combinable count agg,
    * shuffle ∝ |vocab| — and every merge round after that touches only
    * the vocab-sized relation. At 100 TB the corpus pass dominates and
    * is unavoidable; the training loop itself is corpus-size-free. */
  private def bpeVocab(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .select(explode(toks).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Symbol representation of a word: symbols separated by TWO
    * spaces, with two-space padding at both ends. The double-space
    * separator is what makes a plain left-to-right `replace` EXACT
    * greedy BPE: the pattern `" L  R "` keeps one space of each outer
    * gap, so (a) a pair can never match a suffix of a longer symbol
    * (`"tal o"` does not contain `" al  o "`), and (b) consecutive
    * overlapping occurrences (`a a a a`) merge exactly like the
    * greedy non-overlapping scan (`aa aa`, not `aa a a` — a
    * SINGLE-space encoding gets this wrong because the shared
    * delimiter is consumed by the previous match). Spark's `replace`
    * and DuckDB's `replace` share these scan semantics, so the oracle
    * matches by construction. */
  private[graft] def bpeCharRepr(word: Column): Column =
    concat(lit("  "), concat_ws("  ", split(word, "")), lit("  "))

  /** One BPE merge `"L R" -> "LR"` applied to a [[bpeCharRepr]]
    * string (gram is the space-joined pair as counted by
    * [[bpePairCounts]]). */
  private[graft] def bpeApplyMerge(repr: Column, gram: Column): Column =
    replace(repr,
      concat(lit(" "), replace(gram, lit(" "), lit("  ")), lit(" ")),
      concat(lit(" "), replace(gram, lit(" "), lit("")), lit(" ")))

  /** Frequency-weighted adjacent-symbol pair counts over a
    * (freq, repr) vocab relation — one explode + one combinable agg
    * on the vocab-sized input. */
  private[graft] def bpePairCounts(vocab: DataFrame): DataFrame =
    vocab
      .select(col("freq"),
        explode(Hashing.ngrams(split(trim(col("repr")), "  "), 2)).as("gram"))
      .groupBy("gram").agg(sum("freq").as("c"))

  /** One trained merge table per (session, dataset, mtime) — the BPE
    * analogue of [[SimilarityOps]]'s trained quantizer, shared by
    * `tf_bpe_train` and `tf_bpe_encode`; the bench builds it in the
    * untimed warm-up like the other index relations. */
  private val bpeCache = new IndexCache

  /** The checkpointed character-level (word, freq, repr) vocab
    * relation — the single corpus scan behind BOTH the training loop
    * and `tf_bpe_pairs` / `tf_bpe_encode`. Cached alongside the merge
    * table so the encode step replays merges over the materialized
    * vocab instead of re-scanning (and re-shuffling) the corpus. */
  private val bpeVocabCache = new IndexCache

  private def bpeVocabRepr(s: SparkSession, d: String): DataFrame =
    bpeVocabCache.getOrBuild(s, d, docsMtime(d)) {
      bpeVocab(s, d)
        .withColumn("repr", bpeCharRepr(col("word")))
        .transform(graft.Checkpointing.cut)
    }

  /** Drop the cached BPE merge tables and vocab relations (releases
    * executor storage). */
  def invalidateIndexes(): Unit = {
    bpeCache.invalidate()
    bpeVocabCache.invalidate()
  }

  /** The trained merge table (step, gram, c): [[BpeMerges]] rounds of
    * count-pairs → argmax (count desc, tie → lexicographically
    * smallest pair) → apply-merge. Each round's winner is eagerly
    * `localCheckpoint()`ed (1 row), so round i+1's pair count replays
    * only cheap vocab-sized projections on top of the materialized
    * vocab relation — the same O(1)-plan-depth discipline as the
    * k-means and connected-components loops. */
  private def bpeMergeTable(s: SparkSession, d: String): DataFrame =
    bpeCache.getOrBuild(s, d, docsMtime(d)) {
      var cur = bpeVocabRepr(s, d)
      var merges: DataFrame = null
      for (i <- 1 to BpeMerges) {
        val best = bpePairCounts(cur)
          .orderBy(col("c").desc, col("gram"))
          .limit(1)
          .select(lit(i.toLong).as("step"), col("gram"), col("c"))
          .transform(graft.Checkpointing.cut)
        merges = if (merges == null) best else merges.unionAll(best)
        cur = cur
          .crossJoin(broadcast(best.select(col("gram").as("mgram"))))
          .withColumn("repr", bpeApplyMerge(col("repr"), col("mgram")))
          .drop("mgram")
      }
      // the merge table's leaves are the per-step checkpoints; the
      // vocab relation stays cached (bpeVocabCache) for the encode step
      merges
    }

  /** First-round BPE pair-frequency report: the top candidate merges
    * over the character-level vocab — the "what would BPE learn
    * first" diagnostic. */
  val tfBpePairs: Q = (s, d) =>
    bpePairCounts(bpeVocabRepr(s, d))
      .orderBy(col("c").desc, col("gram"))
      .limit(20)
      .select(col("gram").as("pair"),
        split_part(col("gram"), lit(" "), lit(1)).as("left_sym"),
        split_part(col("gram"), lit(" "), lit(2)).as("right_sym"),
        col("c").as("n"))
      .orderBy(col("n").desc, col("pair"))

  /** The learned BPE merge table after [[BpeMerges]] rounds — the
    * artifact a tokenizer ships. Oracle: the identical rounds
    * unrolled as a DuckDB CTE chain. */
  val tfBpeTrain: Q = (s, d) =>
    bpeMergeTable(s, d)
      .select(col("step"),
        split_part(col("gram"), lit(" "), lit(1)).as("left_sym"),
        split_part(col("gram"), lit(" "), lit(2)).as("right_sym"),
        replace(col("gram"), lit(" "), lit("")).as("merged"),
        col("c").as("pair_count"))
      .orderBy("step")

  /** The trained merge table applied to the vocab in step order —
    * the (word, freq, repr) relation both the encode report and the
    * fertility rollup read. Applying M merges is M broadcast-1-row
    * joins + projections over the vocab relation; the corpus itself
    * is never re-scanned. */
  private def bpeEncodedVocab(s: SparkSession, d: String): DataFrame = {
    val merges = bpeMergeTable(s, d)
    var cur = bpeVocabRepr(s, d)
    for (i <- 1 to BpeMerges) {
      cur = cur
        .crossJoin(broadcast(
          merges.filter(col("step") === i).select(col("gram").as("mgram"))))
        .withColumn("repr", bpeApplyMerge(col("repr"), col("mgram")))
        .drop("mgram")
    }
    cur
  }

  /** ENCODE step: the trained merges applied to the vocab in step
    * order, emitting each word's segmentation and symbol count — the
    * corpus-compression report (Σ freq·n_symbols is the token count
    * training would see). */
  val tfBpeEncode: Q = (s, d) =>
    bpeEncodedVocab(s, d).select(col("word"), col("freq"),
        length(col("word")).cast("long").as("n_chars"),
        size(split(trim(col("repr")), "  ")).cast("long").as("n_symbols"),
        replace(trim(col("repr")), lit("  "), lit(" ")).as("encoded"))
      .orderBy("word")

  /** Tokenizer fertility by language (`tf_fertility`) — tokens per
    * word and bytes per token under the TRAINED tokenizer, the
    * standard tokenizer-bias report (a language whose fertility runs
    * high pays more sequence length for the same text, so its
    * training mix is effectively down-weighted). Unlike
    * `tf_compression_ratio` (heuristic language, regex proto-tokens),
    * this prices each language through the LEARNED merge table — the
    * number an actual training run would see.
    *
    * Scale shape: the corpus collapses to the O(langs × vocab)
    * (lang, word) count rollup (combinable), joins the vocab-sized
    * encoded relation on `word`, and re-aggregates to O(langs) —
    * the corpus is scanned once and never carries the merge chain.
    * Ratios are single IEEE divisions of exact integer sums. */
  val tfFertility: Q = (s, d) => {
    val enc = bpeEncodedVocab(s, d)
      .select(col("word"),
        size(split(trim(col("repr")), "  ")).cast("long").as("n_symbols"))
    docs(s, d)
      .select(col("lang"), explode(toks).as("word"))
      .groupBy("lang", "word").agg(count(lit(1)).as("cnt"))
      .join(enc, "word")
      .groupBy("lang")
      .agg(sum(col("cnt")).as("n_words"),
        sum(col("cnt") * col("n_symbols")).as("n_bpe_tokens"),
        sum(col("cnt") * octet_length(col("word")).cast("long"))
          .as("n_word_bytes"))
      .select(col("lang"), col("n_words"), col("n_bpe_tokens"),
        col("n_word_bytes"),
        ratio(col("n_bpe_tokens"), col("n_words")).as("fertility"),
        ratio(col("n_word_bytes"), col("n_bpe_tokens")).as("bytes_per_bpe"))
      .orderBy("lang")
  }

  /** Encoding-health audit per source (`text_encoding_audit`) — the
    * mojibake report every web-crawl ingest runs before spending
    * tokenizer budget on garbage: replacement characters (U+FFFD, the
    * scar a lossy transcode leaves), raw C0 control characters
    * (excluding tab/newline/CR — binary-in-text contamination), and
    * the ASCII share of each source's characters. A source whose
    * replacement-char rate spikes changed its upstream charset; one
    * codegen'd regex projection + one combinable O(sources) groupBy,
    * ratios as single divisions of exact integer sums. The regex
    * subset (char classes, \\x escapes) has identical semantics in
    * Java regex and RE2. */
  val textEncodingAudit: Q = (s, d) => {
    val nRepl = regexp_count(col("text"), lit("�")).cast("long")
    val nCtrl = regexp_count(col("text"),
      lit("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]")).cast("long")
    val nAscii = length(regexp_replace(col("text"), "[^\\x00-\\x7F]", ""))
      .cast("long")
    docs(s, d)
      .select(col("source"), nRepl.as("r"), nCtrl.as("c"),
        nAscii.as("a"), length(col("text")).cast("long").as("len"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum((col("r") > 0L).cast("long")).as("docs_with_replacement"),
        sum(col("r")).as("n_replacement_chars"),
        sum((col("c") > 0L).cast("long")).as("docs_with_control"),
        sum(col("c")).as("n_control_chars"),
        sum(col("a")).as("n_ascii_chars"),
        sum(col("len")).as("n_chars"))
      .withColumn("ascii_ratio",
        ratio(col("n_ascii_chars"), col("n_chars")))
      .orderBy("source")
  }

  /** Heaps-law vocabulary growth (`tf_vocab_growth`) — distinct
    * vocabulary vs corpus size at ten corpus prefixes (deciles of the
    * doc_id order): new types per decile, cumulative vocabulary,
    * cumulative tokens, and the type–token ratio. The curve that
    * sizes tokenizer vocabularies and detects a corpus going stale
    * (new-type flow drying up under dedup is healthy; under fresh
    * crawl volume it means the source is recycling itself).
    *
    * Scale shape: ONE corpus scan builds the O(vocab) (word,
    * first_doc) rollup (combinable min), the decile thresholds come
    * from an O(docs) NTILE over the doc_id total order, and each
    * word's first decile is a broadcast range-join against the 10-row
    * threshold relation — the cumulative windows then run on 10 rows.
    * All counts integer; ttr is one division. */
  val tfVocabGrowth: Q = (s, d) => {
    val deciles = docs(s, d)
      .select(col("doc_id"), size(toks).cast("long").as("ntok"))
      .withColumn("decade",
        ntile(10).over(Window.orderBy(col("doc_id"))).cast("long"))
      .groupBy("decade")
      .agg(max(col("doc_id")).as("thr"), count(lit(1)).as("n_docs"),
        sum(col("ntok")).as("n_tokens"))
    val firstDoc = docs(s, d)
      .select(col("doc_id"), explode(toks).as("word"))
      .groupBy("word").agg(min(col("doc_id")).as("first_doc"))
    val newWords = firstDoc
      .join(broadcast(deciles.select(col("decade"), col("thr"))),
        col("first_doc") <= col("thr"))
      .groupBy("word").agg(min(col("decade")).as("decade"))
      .groupBy("decade").agg(count(lit(1)).as("new_words"))
    val w = Window.orderBy("decade")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deciles.join(newWords, Seq("decade"), "left")
      .na.fill(0L, Seq("new_words"))
      .select(col("decade"), col("n_docs"), col("n_tokens"),
        col("new_words"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("cum_vocab", sum(col("new_words")).over(w))
      .withColumn("ttr", ratio(col("cum_vocab"), col("cum_tokens")))
      .orderBy("decade")
  }

  // ------------------------------------------------------------------
  // Raw-text PII audit + token-budget allocation + quality tiers
  // ------------------------------------------------------------------

  /** PII detector patterns — a regex subset with identical semantics
    * in Java regex (Spark) and RE2 (DuckDB): character classes, bounded
    * quantifiers, `\b`, no lookaround/backrefs. Fixed forever. */
  val PiiEmail = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PiiIpv4 =
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PiiLongNum = "[0-9]{9,}"

  /** Raw-text PII audit per source: match counts for email / IPv4 /
    * long-digit-run detectors plus the char volume a redaction pass
    * would remove — the governance report for UNSTRUCTURED text (the
    * `pii_*` family audits structured columns). One codegen'd regex
    * projection + one combinable O(sources) groupBy; per-pattern
    * redaction volumes are summed independently, so a char matched by
    * two detectors counts once per detector (documented, mirrored in
    * the oracle). */
  val textPiiScrub: Q = (s, d) => {
    def cnt(pat: String) =
      regexp_count(col("text"), lit(pat)).cast("long")
    def redacted(pat: String) =
      (length(col("text")) -
        length(regexp_replace(col("text"), pat, ""))).cast("long")
    docs(s, d)
      .select(col("source"),
        cnt(PiiEmail).as("e"), cnt(PiiIpv4).as("i"),
        cnt(PiiLongNum).as("n"),
        (redacted(PiiEmail) + redacted(PiiIpv4) + redacted(PiiLongNum))
          .as("red"))
      .groupBy("source")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum((col("e") + col("i") + col("n") > 0).cast("long"))
          .as("docs_with_pii"),
        sum("e").as("n_emails"), sum("i").as("n_ipv4"),
        sum("n").as("n_long_numbers"), sum("red").as("chars_redacted"))
      .orderBy("source")
  }

  /** Max-min-fair (water-filling) token-budget allocation across
    * sources: given a global budget of half the corpus tokens, each
    * source gets min(its tokens, water level), with the integer
    * remainder distributed deterministically (+1 to the smallest
    * source names among the unfunded). The data-mixing primitive that
    * turns "we can afford N tokens" into per-source sampling budgets
    * without starving small sources. All-integer arithmetic (level =
    * div, remainder = mod); the closed form over the ASC-sorted
    * source list replaces the iterative fill. Cost: one combinable
    * groupBy to O(sources) rows, then windows over that tiny relation
    * — never a doc-level window. */
  val docBudgetWaterfill: Q = (s, d) => {
    val perSrc = docs(s, d)
      .select(col("source"), size(toks).cast("long").as("t"))
      .groupBy("source").agg(sum("t").as("tokens"))
    val wAll = Window.partitionBy(lit(1))
    val wAsc = Window.partitionBy(lit(1))
      .orderBy(col("tokens"), col("source"))
    perSrc
      .withColumn("k", count(lit(1)).over(wAll))
      .withColumn("total", sum(col("tokens")).over(wAll))
      .withColumn("budget", expr("total div 2"))
      .withColumn("i", row_number().over(wAsc).cast("long"))
      .withColumn("cum_prev",
        coalesce(sum(col("tokens")).over(
          wAsc.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      // sorted ASC, source i is fully funded iff its tokens fit the
      // water level: tokens*(k-i+1) + cum_prev <= budget
      .withColumn("funded",
        col("tokens") * (col("k") - col("i") + 1) + col("cum_prev")
          <= col("budget"))
      .withColumn("funded_tok",
        sum(when(col("funded"), col("tokens")).otherwise(0L)).over(wAll))
      .withColumn("m", sum(col("funded").cast("long")).over(wAll))
      .withColumn("ru", row_number().over(
        Window.partitionBy(lit(1)).orderBy(col("funded"), col("source"))))
      .select(col("source"), col("tokens"),
        col("funded").cast("long").as("funded"),
        when(col("funded"), col("tokens"))
          .otherwise(
            expr("(budget - funded_tok) div greatest(k - m, 1)") +
              (col("ru") <= expr(
                "(budget - funded_tok) % greatest(k - m, 1)"))
                .cast("long"))
          .as("alloc"))
      .orderBy("source")
  }

  /** CCNet-style quality tiers (Wenzek et al. 2020 bucket corpora by
    * LM perplexity into head/middle/tail): per language, docs are cut
    * into rare/mid/common thirds by mean corpus frequency of their
    * tokens — the unigram stand-in for perplexity. The cut is the
    * HISTOGRAM form, the 100 TB path: bin = sum_tf div n_tokens
    * (integer, no doubles anywhere), cumulative counts over the
    * per-language BIN histogram (thousands of bins, never a doc-level
    * window), straddling bin assigned wholly to the lower tier —
    * deterministic at bin granularity by construction. */
  val docQualityTiers: Q = (s, d) => {
    val tf = docs(s, d)
      .select(explode(toks).as("token"))
      .groupBy("token").agg(count(lit(1)).as("tf"))
    val binned = docs(s, d)
      .select(col("doc_id"), col("lang"), explode(toks).as("token"))
      .join(tf, "token")
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("tf")).as("sum_tf"))
      .select(col("lang"), expr("sum_tf div n_tokens").as("bin"))
    val wCum = Window.partitionBy(col("lang")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wLang = Window.partitionBy(col("lang"))
    binned.groupBy(col("lang"), col("bin"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(wLang))
      .withColumn("tier",
        when((col("cum") - col("c")) * 3 < col("n"), "rare")
          .when((col("cum") - col("c")) * 3 < col("n") * 2, "mid")
          .otherwise("common"))
      .groupBy(col("lang"), col("tier"))
      .agg(sum(col("c")).as("n_docs"),
        count(lit(1)).as("n_bins"),
        min(col("bin")).as("min_bin"), max(col("bin")).as("max_bin"))
      .orderBy("lang", "tier")
  }

  /** Per-document novelty: the fraction of a doc's distinct 3-word
    * shingles whose FIRST corpus occurrence (min doc_id over holders)
    * is this doc — the "how much new content does this doc
    * contribute" curation signal that catches template re-spins
    * exact/near dedup admit (a re-spin re-uses most shingles without
    * being a near-dup of any single earlier doc). Attribution is one
    * explode + one combinable min-groupBy + one equi-join — never
    * pairwise; same codegen'd shingle hashes as the dedup family, so
    * at 100 TB the gram→first_doc relation IS the dedup bucket index
    * re-read. Docs under 3 tokens have no shingles and are absent by
    * construction (mirrored in the oracle). */
  val tfNgramNovelty: Q = (s, d) => {
    val grams = docs(s, d)
      .filter(size(toks) >= 3)
      .select(col("doc_id"),
        explode(array_distinct(
          Hashing.hashAll(Hashing.shingles(toks)))).as("gh"))
    val first = grams.groupBy("gh")
      .agg(min(col("doc_id")).as("first_doc"))
    grams.join(first, "gh")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum((col("first_doc") === col("doc_id")).cast("long"))
          .as("n_novel"))
      .select(col("doc_id"), col("n_grams"), col("n_novel"),
        ratio(col("n_novel"), col("n_grams")).as("novelty"))
      .orderBy("doc_id")
  }

  /** "Today's ingest" residue tag and drift threshold (permille) for
    * [[docLengthKs]]. Residue 9 matches the ~10%-slice convention of
    * the drift family; 150‰ (KS > 0.15) is a deliberately blunt fixed
    * alarm bar — the exact numerator/denominator ship in the output,
    * so a consumer can apply any critical value. */
  val KsSliceTag = 9L
  val KsThreshPermille = 150L

  /** Two-sample Kolmogorov–Smirnov drift alarm on the per-source
    * document LENGTH distribution (`doc_length_ks`): today's ingest
    * slice (doc_id hash residue [[KsSliceTag]], the drift family's
    * ~10% convention) against the standing corpus, per source. A
    * crawler change, an extraction regression, or a spam flood shifts
    * the length distribution long before content-level monitors fire
    * — this is the raw-corpus complement of `emb_centroid_drift`'s
    * embedding-space alarm. Exactness: the KS statistic
    * sup|F_base − F_slice| is evaluated only at observed lengths
    * (where the sup of step CDFs lives) with the comparison
    * CROSS-MULTIPLIED — ks_num = max|cum_base·n_slice −
    * cum_slice·n_base| is a BIGINT, the statistic itself one division
    * by n_base·n_slice, and the alarm flag an integer permille
    * comparison, so the gate stays hash-exact (no double ever
    * compares to a double). Overflow bound: cum·n < 2⁶³ holds to
    * ~3·10⁹ docs per source. Plan shape: one combinable
    * groupBy(source, len) over the scan (lengths come from the
    * n_chars column — no tokenization), a cumulative window
    * partitioned BY SOURCE over its distinct lengths (bounded by the
    * length domain, never by rows), and an O(sources) rollup.
    * Sources with an empty side emit no row (no distribution to
    * compare — documented). */
  val docLengthKs: Q = (s, d) => {
    val isSlice = Hashing.charHash(col("doc_id").cast("string")) % 10 ===
      KsSliceTag
    val base = docs(s, d).select(col("source"), col("n_chars"),
      isSlice.as("is_slice"))
    val counts = base.groupBy(col("source"), col("n_chars").as("len"))
      .agg(sum(when(col("is_slice"), 1L).otherwise(0L)).as("c_s"),
        sum(when(col("is_slice"), 0L).otherwise(1L)).as("c_b"))
    val w = Window.partitionBy(col("source")).orderBy(col("len"))
    val cum = counts
      .withColumn("cum_s", sum(col("c_s")).over(w))
      .withColumn("cum_b", sum(col("c_b")).over(w))
    val totals = base.groupBy(col("source"))
      .agg(sum(when(col("is_slice"), 1L).otherwise(0L)).as("n_slice"),
        sum(when(col("is_slice"), 0L).otherwise(1L)).as("n_base"))
    cum.join(totals, "source")
      .filter(col("n_slice") > 0L && col("n_base") > 0L)
      .groupBy(col("source"), col("n_base"), col("n_slice"))
      .agg(max(abs(col("cum_b") * col("n_slice") -
        col("cum_s") * col("n_base"))).as("ks_num"))
      .select(col("source"), col("n_base"), col("n_slice"),
        col("ks_num"),
        (col("n_base") * col("n_slice")).as("ks_den"),
        (col("ks_num").cast("double") /
          (col("n_base") * col("n_slice")).cast("double")).as("ks"),
        (col("ks_num") * 1000L >
          lit(KsThreshPermille) * col("n_base") * col("n_slice"))
          .as("drifted"))
      .orderBy("source")
  }

  /** Source-concentration audit per language (`doc_source_hhi`) —
    * the data-mixing governance number: the Herfindahl–Hirschman
    * index of TOKEN mass across sources, plus its inverse (effective
    * source count — "this language's corpus behaves like N equal
    * sources"). A language whose tokens come overwhelmingly from one
    * crawl domain inherits that domain's biases however many sources
    * are nominally present; HHI > 0.25 (the standard
    * highly-concentrated bar) flags it for the water-filling /
    * quota levers (`doc_budget_waterfill`, `doc_sample_quota`).
    * Exactness: shares never materialize — hhi_num = Σ t_s² and the
    * flag 4·Σt_s² > T² are BIGINT (cross-multiplied, same discipline
    * as `doc_length_ks`); the index and effective count are single
    * divisions. Overflow bound: T < 3·10⁹ tokens per language; the
    * 100 TB form swaps BIGINT for DECIMAL(38,0) with no other
    * change. Plan: two combinable groupBys (docs → per-(lang,source)
    * token mass → per-lang rollup); output is O(langs). */
  val docSourceHhi: Q = (s, d) => {
    val perSource = docs(s, d)
      .select(col("lang"), col("source"),
        size(Hashing.tokens(col("text"))).cast("long").as("nt"))
      .groupBy(col("lang"), col("source"))
      .agg(sum(col("nt")).as("t"))
    perSource
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sources"),
        sum(col("t")).as("total_tokens"),
        sum(col("t") * col("t")).as("hhi_num"))
      .select(col("lang"), col("n_sources"), col("total_tokens"),
        col("hhi_num"),
        when(col("total_tokens") > 0L,
          col("hhi_num").cast("double") /
            (col("total_tokens") * col("total_tokens")).cast("double"))
          .otherwise(lit(0.0)).as("hhi"),
        when(col("hhi_num") > 0L,
          (col("total_tokens") * col("total_tokens")).cast("double") /
            col("hhi_num").cast("double"))
          .otherwise(lit(0.0)).as("effective_sources"),
        (col("hhi_num") * 4L >
          col("total_tokens") * col("total_tokens")).as("concentrated"))
      .orderBy("lang")
  }

  /** Pareto source-coverage audit per language
    * (`doc_pareto_sources`) — the 80/20 complement of
    * [[docSourceHhi]]: HHI says how concentrated a language's token
    * mass is; this says how FEW sources you'd have to vet (or lose)
    * to touch 80% of it. Per language: `n80` = the minimum number of
    * sources (ranked by token mass, ties broken by source name)
    * whose cumulative mass reaches 80% of the total, the classic
    * Pareto flag (`n80` within 20% of the source count — mass and
    * membership both integer cross-multiplied, no thresholds on
    * doubles), and the largest single source's share. Exactness:
    * coverage is counted as rows with `cum·5 < total·4` plus one
    * (strictly-before-the-cut prefix), all BIGINT; the only doubles
    * are two final single divisions. Plan: the window runs over the
    * per-(lang,source) ROLLUP — O(sources-per-lang) rows, catalog-
    * bounded however big the corpus — never over documents, so the
    * 100 TB form is identical. Zero-token languages pin n80 = 0 and
    * share 0.0 rather than a vacuous 1. */
  val docParetoSources: Q = (s, d) => {
    val perSource = docs(s, d)
      .select(col("lang"), col("source"),
        size(Hashing.tokens(col("text"))).cast("long").as("nt"))
      .groupBy(col("lang"), col("source"))
      .agg(sum(col("nt")).as("t"))
    val byMass = Window.partitionBy(col("lang"))
      .orderBy(col("t").desc, col("source"))
    val whole = Window.partitionBy(col("lang"))
    perSource
      .withColumn("cum", sum(col("t")).over(byMass))
      .withColumn("total", sum(col("t")).over(whole))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sources"),
        max(col("total")).as("total_tokens"),
        max(col("t")).as("top_t"),
        (sum(when(col("cum") * 5L < col("total") * 4L, 1L)
          .otherwise(0L)) + 1L).as("n80_raw"))
      .withColumn("n80",
        when(col("total_tokens") > 0L, col("n80_raw")).otherwise(lit(0L)))
      .select(col("lang"), col("n_sources"), col("total_tokens"),
        col("n80"),
        (col("total_tokens") > 0L &&
          col("n80") * 5L <= col("n_sources")).as("pareto"),
        when(col("total_tokens") > 0L,
          col("top_t").cast("double") / col("total_tokens").cast("double"))
          .otherwise(lit(0.0)).as("top_share"))
      .orderBy("lang")
  }

  /** Ingestion-batch width (docs per batch) for [[tfOovBurst]] —
    * doc_id is the arrival order in the synthetic corpus, so
    * `doc_id div 100` is the batch stand-in for a crawl's day
    * partition. */
  val OovBatchDocs = 100L

  /** Out-of-vocabulary burst detector (`tf_oov_burst`) — the crawl
    * drift alarm: per ingestion batch, the fraction of token
    * OCCURRENCES whose token type is first seen in that batch. A
    * healthy crawl's OOV rate decays monotonically toward the
    * neologism floor; a rate that more than DOUBLES
    * batch-over-batch means the pipeline started ingesting a new
    * domain/language/spam cluster and the tokenizer + unigram
    * models upstream are stale for it. Exactness: first-seen is
    * `min(batch)` per type, the burst flag is the lag cross-product
    * compare `new·prev_total > 2·prev_new·total` — all BIGINT, the
    * rate is one final division; a 0 → positive rate transition
    * flags (infinite increase), batch 0 never does (no baseline).
    * Plan: explode → per-(batch,type) counts and per-type min-batch
    * (both combinable) → one equi-join → O(batches) rollup; the
    * unpartitioned lag window runs on the O(batches) time series,
    * never on token rows, so the 100 TB form (batch = day) is
    * identical. */
  val tfOovBurst: Q = (s, d) => {
    val tok = docs(s, d)
      .select(floor(col("doc_id") / lit(OovBatchDocs)).cast("long")
        .as("batch"), explode(Hashing.tokens(col("text"))).as("tok"))
    val perBatchTok = tok.groupBy(col("batch"), col("tok"))
      .agg(count(lit(1)).as("occ"))
    val first = perBatchTok.groupBy(col("tok"))
      .agg(min(col("batch")).as("first_batch"))
    val perBatch = perBatchTok.join(first, "tok")
      .groupBy(col("batch"))
      .agg(sum(col("occ")).as("total_occ"),
        sum(when(col("first_batch") === col("batch"), col("occ"))
          .otherwise(0L)).as("new_occ"),
        sum(when(col("first_batch") === col("batch"), 1L)
          .otherwise(0L)).as("new_types"))
    val nDocs = docs(s, d)
      .groupBy(floor(col("doc_id") / lit(OovBatchDocs)).cast("long")
        .as("batch"))
      .agg(count(lit(1)).as("n_docs"))
    val series = nDocs.join(perBatch, Seq("batch"), "left")
      .select(col("batch"), col("n_docs"),
        coalesce(col("total_occ"), lit(0L)).as("total_occ"),
        coalesce(col("new_occ"), lit(0L)).as("new_occ"),
        coalesce(col("new_types"), lit(0L)).as("new_types"))
    val byBatch = Window.orderBy(col("batch"))
    series
      .withColumn("prev_total", lag(col("total_occ"), 1).over(byBatch))
      .withColumn("prev_new", lag(col("new_occ"), 1).over(byBatch))
      .select(col("batch"), col("n_docs"), col("total_occ"),
        col("new_occ"), col("new_types"),
        when(col("total_occ") > 0L,
          col("new_occ").cast("double") / col("total_occ").cast("double"))
          .otherwise(lit(0.0)).as("oov_rate"),
        (col("prev_total").isNotNull && col("prev_total") > 0L &&
          col("total_occ") > 0L &&
          col("new_occ") * col("prev_total") >
            col("prev_new") * col("total_occ") * 2L).as("burst"))
      .orderBy("batch")
  }

  val defs: Map[String, Q] = Map(
    "tf_oov_burst" -> tfOovBurst,
    "tf_burstiness" -> tfBurstiness,
    "doc_pareto_sources" -> docParetoSources,
    "doc_length_ks" -> docLengthKs,
    "doc_source_hhi" -> docSourceHhi,
    "text_stats" -> textStats,
    "text_quality" -> textQuality,
    "text_langid" -> textLangid,
    "text_script_mix" -> textScriptMix,
    "text_readability" -> textReadability,
    "text_fingerprint" -> textFingerprint,
    "tf_compression_ratio" -> tfCompressionRatio,
    "text_token_count" -> textTokenCount,
    "text_longest_doc" -> textLongestDoc,
    "text_keyterms" -> textKeyterms,
    "text_contamination" -> textContamination,
    "doc_decontaminate" -> docDecontaminate,
    "text_repetition" -> textRepetition,
    "doc_sample_hash" -> docSampleHash,
    "doc_sample_quota" -> docSampleQuota,
    "doc_unigram_score" -> docUnigramScore,
    "doc_target_affinity" -> docTargetAffinity,
    "doc_affinity_calibration" -> docAffinityCalibration,
    "doc_affinity_select" -> docAffinitySelect,
    "doc_affinity_select_threshold" -> docAffinitySelectThreshold,
    "doc_mix_epochs" -> docMixEpochs,
    "doc_source_stats" -> docSourceStats,
    "tf_top_tokens" -> tfTopTokens,
    "tf_top_bigrams" -> tfTopBigrams,
    "doc_chunk_tokens" -> docChunkTokens,
    "doc_pack_chunks" -> docPackChunks,
    "corpus_integrity" -> corpusIntegrity,
    "tf_vocab_coverage" -> tfVocabCoverage,
    "tf_freq_of_freq" -> tfFreqOfFreq,
    "tf_good_turing" -> tfGoodTuring,
    "doc_train_order" -> docTrainOrder,
    "doc_keep_decision" -> docKeepDecision,
    "text_boilerplate_ngrams" -> textBoilerplateNgrams,
    "doc_sample_temperature" -> docSampleTemperature,
    "doc_sample_weighted" -> docSampleWeighted,
    "doc_sample_weighted_quota" -> docSampleWeightedQuota,
    "doc_length_buckets" -> docLengthBuckets,
    "doc_filter_funnel" -> docFilterFunnel,
    "text_boilerplate_fraction" -> textBoilerplateFraction,
    "tf_bpe_pairs" -> tfBpePairs,
    "tf_bpe_train" -> tfBpeTrain,
    "tf_bpe_encode" -> tfBpeEncode,
    "tf_fertility" -> tfFertility,
    "tf_vocab_growth" -> tfVocabGrowth,
    "text_encoding_audit" -> textEncodingAudit,
    "doc_quality_gate" -> docQualityGate,
    "tf_bigram_lift" -> tfBigramLift,
    "text_remove_boilerplate" -> textRemoveBoilerplate,
    "doc_langid_confusion" -> docLangidConfusion,
    "tf_zipf" -> tfZipf,
    "text_langid_ngram" -> textLangidNgram,
    "text_langid_margin" -> textLangidMargin,
    "corpus_correlations" -> corpusCorrelations,
    "text_pii_scrub" -> textPiiScrub,
    "doc_budget_waterfill" -> docBudgetWaterfill,
    "doc_quality_tiers" -> docQualityTiers,
    "tf_ngram_novelty" -> tfNgramNovelty,
    "tf_continuation_counts" -> tfContinuationCounts,
    "tf_kn_prob" -> tfKnProb,
    "doc_kn_rarity" -> docKnRarity,
    "doc_gopher_rules" -> docGopherRules)

  // ------------------------------------------------------------------

  private val sqlToks = Hashing.sqlTokens("text")
  private val sqlStopList = Stopwords.map(w => s"'$w'").mkString("[", ", ", "]")
  private val sqlNStop =
    s"length(list_filter($sqlToks, t -> list_contains($sqlStopList, t)))"

  // lazy: oracle strings interpolate constants from SIBLING operator
  // objects (TextOps -> SimilarityOps.Dims, SimilarityOps -> DedupOps
  // delta constants, DedupOps -> TextOps.oracle), so eager init here
  // would make the map's value depend on which object the JVM
  // happened to initialize first (a mid-cycle read sees null). Lazy
  // defers interpolation past every clinit.
  /** Mirror of [[docTargetAffinity]] — also the scored input of the
    * `doc_affinity_select` oracle. */
  private def sqlDocAffinity: String =
    s"""WITH feats AS (
            SELECT doc_id, lang,
              ${Hashing.sqlCharHash("g")} % $FeatBuckets AS b
            FROM (SELECT doc_id, lang,
                    unnest(${Hashing.sqlNgrams(Hashing.sqlTokens("text"), 2)})
                      AS g
                  FROM documents) x),
          counts AS (
            SELECT b, CAST(COUNT(*) AS BIGINT) AS cnt_r,
              CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                AS BIGINT) AS cnt_t
            FROM feats GROUP BY b),
          model AS (
            SELECT b, cnt_r, cnt_t,
              (SELECT CAST(SUM(cnt_r) AS BIGINT) FROM counts) AS n_r,
              (SELECT CAST(SUM(cnt_t) AS BIGINT) FROM counts) AS n_t
            FROM counts)
          SELECT f.doc_id,
            CAST(COUNT(*) AS BIGINT) AS n_feat,
            CAST(SUM(CASE WHEN m.cnt_t * m.n_r > m.cnt_r * m.n_t
              THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
            CAST(SUM(CASE WHEN m.cnt_t * m.n_r < m.cnt_r * m.n_t
              THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
            CAST(CAST(SUM(CASE WHEN m.cnt_t * m.n_r > m.cnt_r * m.n_t
                THEN 1 ELSE 0 END)
              - SUM(CASE WHEN m.cnt_t * m.n_r < m.cnt_r * m.n_t
                THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE)
              / CAST(COUNT(*) AS DOUBLE) AS affinity
          FROM feats f JOIN model m ON f.b = m.b
          GROUP BY f.doc_id ORDER BY f.doc_id"""

  /** The KN bigram CTEs (rollup + marginals + continuation + total)
    * shared verbatim by the `tf_kn_prob` report and the
    * `doc_kn_rarity` filter oracles. */
  private lazy val sqlKnCtes =
    s"""big AS (
            SELECT split_part(bigram, ' ', 1) AS w1,
              split_part(bigram, ' ', 2) AS w2,
              CAST(COUNT(*) AS BIGINT) AS c_bigram
            FROM (SELECT unnest(list_transform(range(1, length($sqlToks)),
                    i -> $sqlToks[i] || ' ' || $sqlToks[i+1])) AS bigram
                  FROM documents) t
            GROUP BY 1, 2),
          lm AS (SELECT w1, CAST(SUM(c_bigram) AS BIGINT) AS c_w1,
                   CAST(COUNT(*) AS BIGINT) AS right_types
                 FROM big GROUP BY w1),
          cl AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS left_types
                 FROM big GROUP BY w2),
          tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_distinct_bigrams
                  FROM big)"""

  /** The interpolated-KN double tree, parenthesized identically to
    * the engine's Column expression — shared by both KN oracles. */
  private lazy val sqlKnPExpr =
    s"""((CAST(big.c_bigram AS DOUBLE) - $KnDiscount)
               / CAST(lm.c_w1 AS DOUBLE))
            + ($KnDiscount * CAST(lm.right_types AS DOUBLE)
               / CAST(lm.c_w1 AS DOUBLE))
              * (CAST(cl.left_types AS DOUBLE)
               / CAST(tot.n_distinct_bigrams AS DOUBLE))"""

  lazy val oracle: Map[String, String] = Map(
    // OOV burst: first-seen = min(batch) per type; the burst flag is
    // the BIGINT lag cross-product compare; rates are one division.
    "tf_oov_burst" ->
      s"""WITH tok AS (
            SELECT doc_id // $OovBatchDocs AS batch, unnest($sqlToks) AS tok
            FROM documents),
          pbt AS (
            SELECT batch, tok, CAST(COUNT(*) AS BIGINT) AS occ
            FROM tok GROUP BY batch, tok),
          fst AS (
            SELECT tok, CAST(MIN(batch) AS BIGINT) AS first_batch
            FROM pbt GROUP BY tok),
          pb AS (
            SELECT p.batch, CAST(SUM(p.occ) AS BIGINT) AS total_occ,
              CAST(SUM(CASE WHEN f.first_batch = p.batch THEN p.occ
                ELSE 0 END) AS BIGINT) AS new_occ,
              CAST(SUM(CASE WHEN f.first_batch = p.batch THEN 1
                ELSE 0 END) AS BIGINT) AS new_types
            FROM pbt p JOIN fst f ON p.tok = f.tok GROUP BY p.batch),
          nd AS (
            SELECT doc_id // $OovBatchDocs AS batch,
              CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM documents GROUP BY 1),
          series AS (
            SELECT nd.batch, nd.n_docs,
              COALESCE(pb.total_occ, CAST(0 AS BIGINT)) AS total_occ,
              COALESCE(pb.new_occ, CAST(0 AS BIGINT)) AS new_occ,
              COALESCE(pb.new_types, CAST(0 AS BIGINT)) AS new_types
            FROM nd LEFT JOIN pb ON nd.batch = pb.batch),
          lagged AS (
            SELECT *, lag(total_occ) OVER (ORDER BY batch) AS prev_total,
              lag(new_occ) OVER (ORDER BY batch) AS prev_new
            FROM series)
          SELECT batch, n_docs, total_occ, new_occ, new_types,
            CASE WHEN total_occ > 0
              THEN CAST(new_occ AS DOUBLE) / CAST(total_occ AS DOUBLE)
              ELSE 0.0 END AS oov_rate,
            (prev_total IS NOT NULL AND prev_total > 0
              AND total_occ > 0
              AND new_occ * prev_total > prev_new * total_occ * 2)
              AS burst
          FROM lagged ORDER BY batch""",

    // Affinity calibration: integer binning off the score's own
    // numerators (top edge clipped); target rate one division.
    "doc_affinity_calibration" ->
      s"""WITH aff AS ($sqlDocAffinity),
          binned AS (
            SELECT least(((a.n_pos - a.n_neg + a.n_feat)
                * $AffinityCalBins) // (2 * a.n_feat),
                ${AffinityCalBins - 1}) AS bin,
              CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS is_target
            FROM aff a JOIN documents d ON d.doc_id = a.doc_id)
          SELECT bin,
            CAST(bin * 2 - $AffinityCalBins AS DOUBLE)
              / ${AffinityCalBins.toDouble} AS bin_lo,
            CAST(COUNT(*) AS BIGINT) AS n_docs,
            CAST(SUM(is_target) AS BIGINT) AS n_target,
            CAST(SUM(is_target) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
              AS target_rate
          FROM binned GROUP BY bin ORDER BY bin""",

    // Burstiness: same scaled-integer ordering key, floor ties by
    // token; the ratio is one final division.
    "tf_burstiness" ->
      s"""WITH pt AS (
            SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_occ,
              CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
            FROM (SELECT doc_id, unnest($sqlToks) AS tok
                  FROM documents) x
            GROUP BY tok
            HAVING COUNT(*) >= $BurstMinOcc)
          SELECT rank, tok, n_occ, n_docs,
            CAST(n_occ AS DOUBLE) / CAST(n_docs AS DOUBLE)
              AS occ_per_doc
          FROM (
            SELECT CAST(ROW_NUMBER() OVER (
                ORDER BY (n_occ << 20) // n_docs DESC, tok) AS BIGINT)
                AS rank, tok, n_occ, n_docs
            FROM pt) r
          WHERE rank <= $BurstTopK ORDER BY rank""",

    // Pareto coverage: the window runs over the per-(lang,source)
    // rollup; n80 = strictly-before-the-80%-cut prefix + 1, all
    // BIGINT cross-multiplication; zero-token languages pin 0/0.0.
    "doc_pareto_sources" ->
      s"""WITH persrc AS (
            SELECT lang, source,
              CAST(SUM(length($sqlToks)) AS BIGINT) AS t
            FROM documents GROUP BY lang, source),
          cum AS (
            SELECT lang, t,
              CAST(SUM(t) OVER (PARTITION BY lang
                ORDER BY t DESC, source) AS BIGINT) AS cum,
              CAST(SUM(t) OVER (PARTITION BY lang) AS BIGINT) AS total
            FROM persrc),
          agg AS (
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_sources,
              CAST(MAX(total) AS BIGINT) AS total_tokens,
              CAST(MAX(t) AS BIGINT) AS top_t,
              CAST(SUM(CASE WHEN cum * 5 < total * 4 THEN 1 ELSE 0 END)
                + 1 AS BIGINT) AS n80_raw
            FROM cum GROUP BY lang)
          SELECT lang, n_sources, total_tokens,
            CASE WHEN total_tokens > 0 THEN n80_raw
              ELSE CAST(0 AS BIGINT) END AS n80,
            (total_tokens > 0 AND
              (CASE WHEN total_tokens > 0 THEN n80_raw ELSE 0 END) * 5
                <= n_sources) AS pareto,
            CASE WHEN total_tokens > 0
              THEN CAST(top_t AS DOUBLE) / CAST(total_tokens AS DOUBLE)
              ELSE 0.0 END AS top_share
          FROM agg ORDER BY lang""",
    "doc_source_hhi" ->
      s"""WITH persrc AS (
            SELECT lang, source,
              CAST(SUM(length($sqlToks)) AS BIGINT) AS t
            FROM documents GROUP BY lang, source),
          agg AS (
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_sources,
              CAST(SUM(t) AS BIGINT) AS total_tokens,
              CAST(SUM(t * t) AS BIGINT) AS hhi_num
            FROM persrc GROUP BY lang)
          SELECT lang, n_sources, total_tokens, hhi_num,
            CASE WHEN total_tokens > 0
              THEN CAST(hhi_num AS DOUBLE)
                / CAST(total_tokens * total_tokens AS DOUBLE)
              ELSE 0.0 END AS hhi,
            CASE WHEN hhi_num > 0
              THEN CAST(total_tokens * total_tokens AS DOUBLE)
                / CAST(hhi_num AS DOUBLE)
              ELSE 0.0 END AS effective_sources,
            (hhi_num * 4 > total_tokens * total_tokens) AS concentrated
          FROM agg ORDER BY lang""",
    "doc_length_ks" ->
      s"""WITH tagged AS (
            SELECT source, n_chars,
              CASE WHEN ${Hashing.sqlCharHash("CAST(doc_id AS VARCHAR)")}
                % 10 = $KsSliceTag THEN 1 ELSE 0 END AS is_slice
            FROM documents),
          counts AS (
            SELECT source, n_chars AS len,
              SUM(is_slice) AS c_s, SUM(1 - is_slice) AS c_b
            FROM tagged GROUP BY source, n_chars),
          cum AS (
            SELECT source, len,
              SUM(c_s) OVER (PARTITION BY source ORDER BY len) AS cum_s,
              SUM(c_b) OVER (PARTITION BY source ORDER BY len) AS cum_b
            FROM counts),
          totals AS (
            SELECT source, CAST(SUM(is_slice) AS BIGINT) AS n_slice,
              CAST(SUM(1 - is_slice) AS BIGINT) AS n_base
            FROM tagged GROUP BY source)
          SELECT c.source, t.n_base, t.n_slice,
            CAST(MAX(ABS(c.cum_b * t.n_slice - c.cum_s * t.n_base))
              AS BIGINT) AS ks_num,
            t.n_base * t.n_slice AS ks_den,
            CAST(MAX(ABS(c.cum_b * t.n_slice - c.cum_s * t.n_base))
              AS DOUBLE) / CAST(t.n_base * t.n_slice AS DOUBLE) AS ks,
            (MAX(ABS(c.cum_b * t.n_slice - c.cum_s * t.n_base)) * 1000
              > $KsThreshPermille * t.n_base * t.n_slice) AS drifted
          FROM cum c JOIN totals t ON c.source = t.source
          WHERE t.n_slice > 0 AND t.n_base > 0
          GROUP BY c.source, t.n_base, t.n_slice
          ORDER BY c.source""",
    "text_stats" ->
      s"""SELECT doc_id,
          CAST(length(text) AS BIGINT) AS n_chars_actual,
          CAST(length($sqlToks) AS BIGINT) AS n_tokens,
          CAST(length(list_distinct($sqlToks)) AS BIGINT) AS n_distinct_tokens,
          CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform($sqlToks, t -> CAST(length(t) AS BIGINT))),
              (a, b) -> a + b) AS DOUBLE)
            / CAST(length($sqlToks) AS DOUBLE) AS avg_token_len
          FROM documents ORDER BY doc_id""",
    "text_quality" ->
      s"""SELECT doc_id,
          CAST($sqlNStop AS DOUBLE) / CAST(length($sqlToks) AS DOUBLE)
            AS stop_ratio,
          CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
            / CAST(length(text) AS DOUBLE) AS alpha_ratio,
          CAST(length(list_distinct($sqlToks)) AS DOUBLE)
            / CAST(length($sqlToks) AS DOUBLE) AS diversity,
          (CAST($sqlNStop AS DOUBLE) / CAST(length($sqlToks) AS DOUBLE)) * 0.2
            + (CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
               / CAST(length(text) AS DOUBLE)) * 0.4
            + (CAST(length(list_distinct($sqlToks)) AS DOUBLE)
               / CAST(length($sqlToks) AS DOUBLE)) * 0.4 AS quality
          FROM documents ORDER BY doc_id""",
    "text_langid" ->
      s"""SELECT doc_id, lang AS labeled_lang,
          CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
               WHEN regexp_matches(text, '[àâçéèêëîïôùûüáíóúñ]') THEN 'romance'
               WHEN $sqlNStop > 0 THEN 'en'
               ELSE 'unknown' END AS heur_lang
          FROM documents ORDER BY doc_id""",
    "text_fingerprint" ->
      s"""SELECT doc_id,
          ${Hashing.sqlCharHash("text")} AS fingerprint,
          ${Hashing.sqlSimhash32(Hashing.sqlHashAll(sqlToks))} AS simhash
          FROM documents ORDER BY doc_id""",
    "tf_compression_ratio" ->
      s"""WITH c AS (
            SELECT
              CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
                   WHEN regexp_matches(text, '[àâçéèêëîïôùûüáíóúñ]') THEN 'romance'
                   WHEN $sqlNStop > 0 THEN 'en'
                   ELSE 'unknown' END AS heur_lang,
              CAST(strlen(text) AS BIGINT) AS bytes,
              CAST(length(regexp_extract_all(text,
                '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]')) AS BIGINT) AS n_bpe
            FROM documents)
          SELECT heur_lang, COUNT(*) AS n_docs,
            CAST(SUM(bytes) AS BIGINT) AS total_bytes,
            CAST(SUM(n_bpe) AS BIGINT) AS total_bpe_tokens,
            CAST(SUM(bytes) AS DOUBLE) / CAST(SUM(n_bpe) AS DOUBLE)
              AS bytes_per_token
          FROM c GROUP BY heur_lang ORDER BY heur_lang""",
    "text_token_count" ->
      s"""SELECT doc_id,
          CAST(length($sqlToks) AS BIGINT) AS n_ws_tokens,
          CAST(length(regexp_extract_all(text,
            '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]')) AS BIGINT) AS n_bpe_tokens,
          CAST(length(regexp_extract_all(text,
            '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]')) AS DOUBLE)
            / CAST(length($sqlToks) AS DOUBLE) AS bpe_per_ws
          FROM documents ORDER BY doc_id""",
    "text_longest_doc" ->
      """SELECT lang, doc_id, len FROM (
           SELECT lang, doc_id, CAST(length(text) AS BIGINT) AS len,
             ROW_NUMBER() OVER (PARTITION BY lang
               ORDER BY length(text) DESC, doc_id) AS rn
           FROM documents) t
         WHERE rn = 1 ORDER BY lang""",
    "text_keyterms" ->
      s"""WITH tok AS (
            SELECT doc_id, unnest($sqlToks) AS token FROM documents),
          tf AS (
            SELECT doc_id, token, COUNT(*) AS tf FROM tok
            GROUP BY doc_id, token),
          dfreq AS (
            SELECT token, COUNT(*) AS df
            FROM (SELECT DISTINCT doc_id, token FROM tok) u
            GROUP BY token),
          n AS (SELECT COUNT(*) AS n_docs FROM documents),
          scored AS (
            SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
              CAST(tf.tf AS DOUBLE) *
                ((CAST(n.n_docs AS DOUBLE) - CAST(dfreq.df AS DOUBLE) + 0.5)
                  / (CAST(dfreq.df AS DOUBLE) + 0.5)) AS score
            FROM tf JOIN dfreq ON tf.token = dfreq.token, n)
          SELECT doc_id, rank, token, tf, df, score FROM (
            SELECT scored.*, ROW_NUMBER() OVER (PARTITION BY doc_id
              ORDER BY score DESC, token) AS rank
            FROM scored) z
          WHERE rank <= 3 ORDER BY doc_id, rank""",
    "text_contamination" ->
      s"""WITH g AS (
            SELECT doc_id,
              unnest(list_distinct(${Hashing.sqlHashAll(
                Hashing.sqlNgrams("toks", 5))})) AS gh
            FROM (SELECT doc_id, $sqlToks AS toks FROM documents) t
            WHERE length(toks) >= 5),
          bench AS (SELECT DISTINCT gh FROM g WHERE doc_id < 5),
          corpus AS (SELECT doc_id, gh FROM g WHERE doc_id >= 5),
          totals AS (
            SELECT doc_id, COUNT(*) AS n_grams FROM corpus GROUP BY doc_id),
          hits AS (
            SELECT c.doc_id, COUNT(*) AS n_hits
            FROM corpus c JOIN bench b ON c.gh = b.gh GROUP BY c.doc_id)
          SELECT t.doc_id, t.n_grams, COALESCE(h.n_hits, 0) AS n_hits,
            CAST(COALESCE(h.n_hits, 0) AS DOUBLE)
              / CAST(t.n_grams AS DOUBLE) AS contamination
          FROM totals t LEFT JOIN hits h ON t.doc_id = h.doc_id
          ORDER BY t.doc_id""",
    // Decontamination enforcement: the detector's CTEs + the integer
    // cross-multiplied verdict over EVERY doc (benchmark material and
    // gram-less shorts included, never silently dropped).
    "doc_decontaminate" ->
      s"""WITH g AS (
            SELECT doc_id,
              unnest(list_distinct(${Hashing.sqlHashAll(
                Hashing.sqlNgrams("toks", 5))})) AS gh
            FROM (SELECT doc_id, $sqlToks AS toks FROM documents) t
            WHERE length(toks) >= 5),
          bench AS (SELECT DISTINCT gh FROM g WHERE doc_id < 5),
          corpus AS (SELECT doc_id, gh FROM g WHERE doc_id >= 5),
          totals AS (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams
            FROM corpus GROUP BY doc_id),
          hits AS (
            SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
            FROM corpus c JOIN bench b ON c.gh = b.gh GROUP BY c.doc_id)
          SELECT d.doc_id,
            COALESCE(t.n_grams, CAST(0 AS BIGINT)) AS n_grams,
            COALESCE(h.n_hits, CAST(0 AS BIGINT)) AS n_hits,
            CASE WHEN d.doc_id < 5 THEN 'benchmark'
              WHEN COALESCE(t.n_grams, 0) = 0 THEN 'kept_short'
              WHEN COALESCE(h.n_hits, 0) * $DecontamBar
                >= COALESCE(t.n_grams, 0) THEN 'dropped_contaminated'
              ELSE 'kept' END AS verdict
          FROM documents d
          LEFT JOIN totals t ON t.doc_id = d.doc_id
          LEFT JOIN hits h ON h.doc_id = d.doc_id
          ORDER BY d.doc_id""",
    "text_repetition" ->
      s"""SELECT doc_id,
          CAST(length(g) AS BIGINT) AS n_grams,
          CAST(length(list_distinct(g)) AS BIGINT) AS n_distinct,
          CAST(length(g) - length(list_distinct(g)) AS DOUBLE)
            / CAST(length(g) AS DOUBLE) AS dup_ratio
          FROM (SELECT doc_id, ${Hashing.sqlNgrams("toks", 3)} AS g
                FROM (SELECT doc_id, $sqlToks AS toks FROM documents) t
                WHERE length(toks) >= 3) z
          ORDER BY doc_id""",
    "doc_source_stats" ->
      """WITH copies AS (
           SELECT text, COUNT(*) AS n_copies FROM documents GROUP BY text)
         SELECT d.source, COUNT(*) AS n_docs,
           CAST(SUM(d.n_chars) AS BIGINT) AS total_chars,
           CAST(COUNT(DISTINCT d.lang) AS BIGINT) AS n_langs,
           CAST(SUM(CASE WHEN c.n_copies > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_docs
         FROM documents d JOIN copies c ON d.text = c.text
         GROUP BY d.source ORDER BY d.source""",
    "doc_mix_epochs" ->
      s"""SELECT doc_id, lang,
          unnest(range(0, CASE WHEN lang = 'en' THEN ${MixEpochs("en")}
                             ELSE $DefaultMixEpochs END)) AS copy_idx
          FROM documents ORDER BY doc_id, copy_idx""",
    "doc_sample_hash" ->
      s"""SELECT doc_id, lang,
          ${Hashing.sqlCharHash("CAST(doc_id AS VARCHAR)")} % 100 AS bucket,
          CASE WHEN lang = 'en' THEN ${SampleRates("en")}
               ELSE $DefaultSampleRate END AS rate
          FROM documents
          WHERE ${Hashing.sqlCharHash("CAST(doc_id AS VARCHAR)")} % 100
            < CASE WHEN lang = 'en' THEN ${SampleRates("en")}
                   ELSE $DefaultSampleRate END
          ORDER BY doc_id""",
    "doc_sample_quota" ->
      s"""SELECT doc_id, lang, rk FROM (
            SELECT doc_id, lang,
              ROW_NUMBER() OVER (PARTITION BY lang
                ORDER BY ${Hashing.sqlCharHash("CAST(doc_id AS VARCHAR)")},
                         doc_id) AS rk
            FROM documents) t
          WHERE rk <= $QuotaPerLang ORDER BY lang, rk""",
    "tf_freq_of_freq" ->
      s"""SELECT occurrences, COUNT(*) AS n_tokens FROM (
            SELECT token, COUNT(*) AS occurrences
            FROM (SELECT unnest($sqlToks) AS token FROM documents) t
            GROUP BY token) z
          GROUP BY occurrences ORDER BY occurrences""",
    // Good-Turing: the same freq-of-freq rollup self-joined on r+1;
    // N = sum(r * N_r) off the rollup, mirrored divisions
    "tf_good_turing" ->
      s"""WITH fof AS (
            SELECT occurrences, CAST(COUNT(*) AS BIGINT) AS n_types
            FROM (
              SELECT token, CAST(COUNT(*) AS BIGINT) AS occurrences
              FROM (SELECT unnest($sqlToks) AS token FROM documents) t
              GROUP BY token) z
            GROUP BY occurrences),
          tot AS (
            SELECT CAST(SUM(occurrences * n_types) AS BIGINT) AS n_total
            FROM fof)
          SELECT a.occurrences, a.n_types,
            CAST(COALESCE(b.n_types, 0) AS BIGINT) AS n_types_next,
            tot.n_total,
            CAST((a.occurrences + 1) * COALESCE(b.n_types, 0) AS DOUBLE)
              / CAST(a.n_types AS DOUBLE) AS r_star,
            (CAST((a.occurrences + 1) * COALESCE(b.n_types, 0) AS DOUBLE)
              / CAST(a.n_types AS DOUBLE)) / CAST(tot.n_total AS DOUBLE)
              AS gt_prob
          FROM fof a
          LEFT JOIN fof b ON a.occurrences + 1 = b.occurrences
          CROSS JOIN tot
          ORDER BY a.occurrences""",
    // rarest_token ties break lexicographically on both sides: Spark
    // min(struct(tf, token)) ≡ conditional MIN at the windowed min tf
    "doc_unigram_score" ->
      s"""WITH tok AS (
            SELECT doc_id, unnest(${Hashing.sqlTokens("text")}) AS token
            FROM documents),
          tf AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS tf
                 FROM tok GROUP BY token),
          j AS (
            SELECT t.doc_id, t.token, f.tf,
              MIN(f.tf) OVER (PARTITION BY t.doc_id) AS mtf
            FROM tok t JOIN tf f ON t.token = f.token)
          SELECT doc_id,
            CAST(COUNT(*) AS BIGINT) AS n_tokens,
            CAST(SUM(tf) AS BIGINT) AS sum_tf,
            CAST(SUM(tf) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_tf,
            MIN(tf) AS min_tf,
            MIN(CASE WHEN tf = mtf THEN token END) AS rarest_token
          FROM j GROUP BY doc_id ORDER BY doc_id""",
    // sign-test DSIR: per-bucket target-vs-raw comparison by integer
    // cross-multiplication — no ln, no division until the final ratio
    "doc_target_affinity" -> sqlDocAffinity,
    "doc_affinity_select" ->
      s"""SELECT j.doc_id, j.source, j.affinity,
            CAST(j.rk AS BIGINT) AS rk,
            CAST(j.n_src AS BIGINT) AS n_src,
            CAST(CASE WHEN j.rk * $AffKeepDen <= j.n_src * $AffKeepNum
              THEN 1 ELSE 0 END AS BIGINT) AS selected
          FROM (
            SELECT d.doc_id, d.source, a.affinity,
              ROW_NUMBER() OVER (PARTITION BY d.source
                ORDER BY a.affinity DESC, d.doc_id) AS rk,
              COUNT(*) OVER (PARTITION BY d.source) AS n_src
            FROM ($sqlDocAffinity) a
            JOIN documents d ON a.doc_id = d.doc_id) j
          ORDER BY j.doc_id""",
    // the oracle proves the THRESHOLD form selects the exact set the
    // rank form does, so it deliberately runs the rank formulation —
    // one semantic result, two plan costs (the asof/compact
    // convention)
    "doc_affinity_select_threshold" ->
      s"""SELECT j.doc_id, j.source, j.affinity,
            CAST(CASE WHEN j.rk * $AffKeepDen <= j.n_src * $AffKeepNum
              THEN 1 ELSE 0 END AS BIGINT) AS selected
          FROM (
            SELECT d.doc_id, d.source, a.affinity,
              ROW_NUMBER() OVER (PARTITION BY d.source
                ORDER BY a.affinity DESC, d.doc_id) AS rk,
              COUNT(*) OVER (PARTITION BY d.source) AS n_src
            FROM ($sqlDocAffinity) a
            JOIN documents d ON a.doc_id = d.doc_id) j
          ORDER BY j.doc_id""",
    "doc_train_order" ->
      s"""WITH t AS (
            SELECT doc_id,
              ${Hashing.sqlCharHash("CAST(doc_id AS VARCHAR) || '#shard'")}
                % $TrainShards AS shard,
              ${Hashing.sqlCharHash("CAST(doc_id AS VARCHAR) || '#order'")}
                AS okey
            FROM documents)
          SELECT doc_id, shard,
            ROW_NUMBER() OVER (PARTITION BY shard ORDER BY okey, doc_id)
              AS pos
          FROM t ORDER BY shard, pos""",
    "doc_keep_decision" ->
      s"""WITH g AS (
            SELECT doc_id, text, length(toks) AS n_tok,
              ${Hashing.sqlNgrams("toks", 3)} AS g
            FROM (SELECT doc_id, text, $sqlToks AS toks FROM documents) tk),
          scored AS (
            SELECT doc_id, text, CAST(n_tok AS BIGINT) AS n_tokens,
              CASE WHEN n_tok >= 3
                THEN CAST(length(g) - length(list_distinct(g)) AS DOUBLE)
                  / CAST(length(g) AS DOUBLE)
                ELSE 0.0 END AS dup_ratio
            FROM g),
          canon AS (
            SELECT text, MIN(doc_id) AS canonical_id
            FROM documents GROUP BY text)
          SELECT s.doc_id, s.n_tokens, s.dup_ratio,
            CASE WHEN s.doc_id != c.canonical_id THEN 'exact_dup'
                 WHEN s.n_tokens < $KeepMinTokens THEN 'too_short'
                 WHEN s.dup_ratio > $KeepMaxDupRatio THEN 'repetitive'
                 ELSE 'keep' END AS decision
          FROM scored s JOIN canon c ON s.text = c.text
          ORDER BY s.doc_id""",
    "tf_top_tokens" ->
      s"""SELECT token, COUNT(*) AS n
          FROM (SELECT unnest($sqlToks) AS token FROM documents) t
          GROUP BY token ORDER BY n DESC, token LIMIT 20""",
    "tf_top_bigrams" ->
      s"""SELECT bigram, COUNT(*) AS n
          FROM (SELECT unnest(list_transform(range(1, length($sqlToks)),
                  i -> $sqlToks[i] || ' ' || $sqlToks[i+1])) AS bigram
                FROM documents) t
          GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20""",
    "doc_chunk_tokens" ->
      s"""WITH tk AS (
            SELECT doc_id, $sqlToks AS tk FROM documents
            WHERE length($sqlToks) >= 1),
          ch AS (
            SELECT doc_id, tk,
              unnest(range(0, length(tk), $ChunkStride)) AS start_tok
            FROM tk)
          SELECT doc_id, start_tok // $ChunkStride AS chunk_id, start_tok,
            length(list_slice(tk, start_tok + 1, start_tok + $ChunkTokens))
              AS n_tok,
            array_to_string(
              list_slice(tk, start_tok + 1, start_tok + $ChunkTokens), ' ')
              AS chunk_text
          FROM ch ORDER BY doc_id, chunk_id""",
    "tf_vocab_coverage" ->
      s"""WITH tok AS (
            SELECT lang, unnest($sqlToks) AS token FROM documents),
          vocab AS (
            SELECT token FROM (
              SELECT token, COUNT(*) AS n FROM tok
              GROUP BY token ORDER BY n DESC, token LIMIT $VocabTopK) v)
          SELECT lang, COUNT(*) AS n_tokens,
            CAST(SUM(CASE WHEN token IN (SELECT token FROM vocab)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
            CAST(SUM(CASE WHEN token IN (SELECT token FROM vocab)
                     THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
              AS coverage
          FROM tok GROUP BY lang ORDER BY lang""",
    "corpus_integrity" ->
      s"""SELECT 'n_docs' AS metric, COUNT(*) AS value FROM documents
          UNION ALL SELECT 'n_vecs', COUNT(*) FROM embeddings
          UNION ALL SELECT 'n_docs_no_vec', COUNT(*) FROM documents d
            WHERE NOT EXISTS (SELECT 1 FROM embeddings e
                              WHERE e.vec_id = d.doc_id)
          UNION ALL SELECT 'n_vecs_no_doc', COUNT(*) FROM embeddings e
            WHERE NOT EXISTS (SELECT 1 FROM documents d
                              WHERE d.doc_id = e.vec_id)
          UNION ALL SELECT 'n_bad_dim', COUNT(*) FROM embeddings
            WHERE len(embedding) != ${SimilarityOps.Dims}
          ORDER BY metric""",
    "text_boilerplate_ngrams" ->
      s"""WITH g AS (
            SELECT doc_id, unnest(${Hashing.sqlNgrams("toks", BoilerplateN)})
              AS gram
            FROM (SELECT doc_id, $sqlToks AS toks FROM documents) t
            WHERE length(toks) >= $BoilerplateN),
          tf AS (
            SELECT doc_id, gram, COUNT(*) AS tf FROM g
            GROUP BY doc_id, gram)
          SELECT gram, COUNT(*) AS df,
            CAST(SUM(tf) AS BIGINT) AS n_occurrences
          FROM tf GROUP BY gram
          HAVING COUNT(*) >= $BoilerplateMinDf
          ORDER BY df DESC, n_occurrences DESC, gram""",
    "text_boilerplate_fraction" ->
      s"""WITH g AS (
            SELECT doc_id,
              unnest(list_distinct(${Hashing.sqlHashAll(
                Hashing.sqlNgrams("toks", BoilerplateN))})) AS gh
            FROM (SELECT doc_id, $sqlToks AS toks FROM documents) t
            WHERE length(toks) >= $BoilerplateN),
          boiler AS (
            SELECT gh FROM (
              SELECT gh, COUNT(*) AS df FROM g GROUP BY gh) z
            WHERE df >= $BoilerplateMinDf),
          totals AS (
            SELECT doc_id, COUNT(*) AS n_grams FROM g GROUP BY doc_id),
          hits AS (
            SELECT g.doc_id, COUNT(*) AS n_boiler
            FROM g JOIN boiler b ON g.gh = b.gh GROUP BY g.doc_id)
          SELECT t.doc_id, t.n_grams, COALESCE(h.n_boiler, 0) AS n_boiler,
            CAST(COALESCE(h.n_boiler, 0) AS DOUBLE)
              / CAST(t.n_grams AS DOUBLE) AS boiler_fraction
          FROM totals t LEFT JOIN hits h ON t.doc_id = h.doc_id
          ORDER BY t.doc_id""",
    "doc_sample_temperature" ->
      """WITH t AS (SELECT COUNT(*) AS n_total FROM documents),
          w AS (
            SELECT lang, COUNT(*) AS n_docs, t.n_total,
              CAST(COUNT(*) AS DOUBLE) / CAST(t.n_total AS DOUBLE) AS share,
              sqrt(CAST(COUNT(*) AS DOUBLE) / CAST(t.n_total AS DOUBLE))
                AS weight
            FROM documents, t GROUP BY lang, t.n_total),
          z AS (
            SELECT list_reduce(
              list_prepend(CAST(0.0 AS DOUBLE), list(weight ORDER BY lang)),
              (a, b) -> a + b) AS z
            FROM w)
          SELECT lang, n_docs, share, weight,
            weight / z.z AS q_prob,
            CAST(floor(weight / z.z * CAST(n_total AS DOUBLE)) AS BIGINT)
              AS target_docs
          FROM w, z ORDER BY lang""",
    "doc_sample_weighted" -> sqlSampleWeighted,
    "doc_sample_weighted_quota" ->
      s"""WITH pri AS (
            SELECT doc_id, lang, n_chars AS weight,
              CAST(${Hashing.sqlCharHash("CAST(doc_id AS VARCHAR)")}
                AS DOUBLE) / CAST(n_chars AS DOUBLE) AS priority
            FROM documents WHERE n_chars > 0)
          SELECT doc_id, lang, weight, priority, rk FROM (
            SELECT pri.*, CAST(ROW_NUMBER() OVER (PARTITION BY lang
              ORDER BY priority, doc_id) AS BIGINT) AS rk
            FROM pri) z
          WHERE rk <= $WeightedQuotaK ORDER BY lang, rk""",
    "doc_filter_funnel" ->
      s"""WITH g AS (
            SELECT doc_id, text, length(toks) AS n_tok,
              ${Hashing.sqlNgrams("toks", 3)} AS g
            FROM (SELECT doc_id, text, $sqlToks AS toks FROM documents) tk),
          scored AS (
            SELECT doc_id, text, CAST(n_tok AS BIGINT) AS n_tokens,
              CASE WHEN n_tok >= 3
                THEN CAST(length(g) - length(list_distinct(g)) AS DOUBLE)
                  / CAST(length(g) AS DOUBLE)
                ELSE 0.0 END AS dup_ratio
            FROM g),
          canon AS (
            SELECT text, MIN(doc_id) AS canonical_id
            FROM documents GROUP BY text),
          f AS (
            SELECT COUNT(*) AS n0,
              CAST(SUM(CASE WHEN s.doc_id = c.canonical_id
                THEN 1 ELSE 0 END) AS BIGINT) AS n1,
              CAST(SUM(CASE WHEN s.doc_id = c.canonical_id
                AND s.n_tokens >= $KeepMinTokens
                THEN 1 ELSE 0 END) AS BIGINT) AS n2,
              CAST(SUM(CASE WHEN s.doc_id = c.canonical_id
                AND s.n_tokens >= $KeepMinTokens
                AND s.dup_ratio <= $KeepMaxDupRatio
                THEN 1 ELSE 0 END) AS BIGINT) AS n3
            FROM scored s JOIN canon c ON s.text = c.text)
          SELECT stage_id, stage, n_surviving, n_dropped,
            CASE WHEN n0 = 0 THEN NULL
              ELSE CAST(n_surviving AS DOUBLE) / CAST(n0 AS DOUBLE)
            END AS survival
          FROM (
            SELECT CAST(0 AS BIGINT) AS stage_id, 'total' AS stage,
              n0 AS n_surviving, CAST(0 AS BIGINT) AS n_dropped, n0 FROM f
            UNION ALL SELECT 1, 'exact_dedup', n1, n0 - n1, n0 FROM f
            UNION ALL SELECT 2, 'min_length',  n2, n1 - n2, n0 FROM f
            UNION ALL SELECT 3, 'repetition',  n3, n2 - n3, n0 FROM f) u
          ORDER BY stage_id""",
    "doc_length_buckets" -> {
      val bucketCase = LengthBucketBounds
        .map(b => s"WHEN n_tok <= $b THEN $b")
        .mkString("CASE ", " ", s" ELSE $LengthBucketCap END")
      s"""WITH t AS (
            SELECT CAST($bucketCase AS BIGINT) AS bucket_max, n_tok FROM (
              SELECT CAST(length($sqlToks) AS BIGINT) AS n_tok
              FROM documents) z)
          SELECT bucket_max, COUNT(*) AS n_docs,
            CAST(SUM(n_tok) AS BIGINT) AS sum_tokens,
            CAST(bucket_max * COUNT(*) - SUM(n_tok) AS BIGINT)
              AS pad_tokens,
            CAST(bucket_max * COUNT(*) - SUM(n_tok) AS DOUBLE)
              / CAST(bucket_max * COUNT(*) AS DOUBLE) AS pad_ratio
          FROM t GROUP BY bucket_max ORDER BY bucket_max"""
    },
    "doc_pack_chunks" ->
      s"""WITH tk AS (
            SELECT doc_id, source, $sqlToks AS tk FROM documents
            WHERE length($sqlToks) >= 1),
          ch AS (
            SELECT doc_id, source, tk,
              unnest(range(0, length(tk), $ChunkStride)) AS start_tok
            FROM tk),
          sized AS (
            SELECT doc_id, source, start_tok // $ChunkStride AS chunk_id,
              length(list_slice(tk, start_tok + 1, start_tok + $ChunkTokens))
                AS n_tok
            FROM ch),
          packed AS (
            SELECT source, doc_id, chunk_id, n_tok,
              CAST(SUM(n_tok) OVER (PARTITION BY source
                ORDER BY doc_id, chunk_id) AS BIGINT) - n_tok AS o
            FROM sized)
          SELECT source, doc_id, chunk_id, n_tok,
            o // $PackSeqTokens AS seq_id, o % $PackSeqTokens AS seq_off
          FROM packed ORDER BY source, doc_id, chunk_id""",
    "tf_bpe_pairs" ->
      s"""WITH ${sqlBpeCtes(0)}
          SELECT gram AS pair,
            split_part(gram, ' ', 1) AS left_sym,
            split_part(gram, ' ', 2) AS right_sym,
            c AS n
          FROM (SELECT gram, c FROM p1 ORDER BY c DESC, gram LIMIT 20) t
          ORDER BY n DESC, pair""",
    "tf_bpe_train" ->
      s"""WITH ${sqlBpeCtes(BpeMerges)}
          SELECT step,
            split_part(gram, ' ', 1) AS left_sym,
            split_part(gram, ' ', 2) AS right_sym,
            replace(gram, ' ', '') AS merged,
            c AS pair_count
          FROM (${(1 to BpeMerges).map(i =>
              s"SELECT CAST($i AS BIGINT) AS step, gram, c FROM b$i")
            .mkString(" UNION ALL ")}) t
          ORDER BY step""",
    "tf_bpe_encode" ->
      s"""WITH ${sqlBpeCtes(BpeMerges)}
          SELECT word, freq,
            CAST(length(word) AS BIGINT) AS n_chars,
            CAST(length(string_split(trim(repr), '  ')) AS BIGINT)
              AS n_symbols,
            replace(trim(repr), '  ', ' ') AS encoded
          FROM r$BpeMerges ORDER BY word""",
    // fertility: same merge-chain CTEs; the (lang, word) rollup joins
    // the encoded vocab and re-aggregates to O(langs)
    "tf_fertility" ->
      s"""WITH ${sqlBpeCtes(BpeMerges)},
          enc AS (
            SELECT word,
              CAST(length(string_split(trim(repr), '  ')) AS BIGINT)
                AS n_symbols
            FROM r$BpeMerges),
          lwc AS (
            SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM (SELECT lang, unnest($sqlToks) AS word FROM documents) u
            GROUP BY lang, word)
          SELECT lang,
            CAST(SUM(cnt) AS BIGINT) AS n_words,
            CAST(SUM(cnt * n_symbols) AS BIGINT) AS n_bpe_tokens,
            CAST(SUM(cnt * strlen(word)) AS BIGINT) AS n_word_bytes,
            CAST(SUM(cnt * n_symbols) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE)
              AS fertility,
            CAST(SUM(cnt * strlen(word)) AS DOUBLE)
              / CAST(SUM(cnt * n_symbols) AS DOUBLE) AS bytes_per_bpe
          FROM lwc JOIN enc USING (word)
          GROUP BY lang ORDER BY lang""",
    // encoding audit: same regex subset, 'g' flag for the RE2 strip
    "text_encoding_audit" ->
      s"""WITH t AS (
            SELECT source,
              CAST(length(regexp_extract_all(text, '�')) AS BIGINT) AS r,
              CAST(length(regexp_extract_all(text,
                '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]')) AS BIGINT) AS c,
              CAST(length(regexp_replace(text, '[^\\x00-\\x7F]', '', 'g'))
                AS BIGINT) AS a,
              CAST(length(text) AS BIGINT) AS len
            FROM documents)
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
            CAST(SUM(CASE WHEN r > 0 THEN 1 ELSE 0 END) AS BIGINT)
              AS docs_with_replacement,
            CAST(SUM(r) AS BIGINT) AS n_replacement_chars,
            CAST(SUM(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS BIGINT)
              AS docs_with_control,
            CAST(SUM(c) AS BIGINT) AS n_control_chars,
            CAST(SUM(a) AS BIGINT) AS n_ascii_chars,
            CAST(SUM(len) AS BIGINT) AS n_chars,
            CAST(SUM(a) AS DOUBLE) / CAST(SUM(len) AS DOUBLE)
              AS ascii_ratio
          FROM t GROUP BY source ORDER BY source""",
    // vocab growth: NTILE(10) prefix thresholds + the (word,
    // first_doc) rollup range-joined to them; windows run on 10 rows
    "tf_vocab_growth" ->
      s"""WITH dt AS (
            SELECT doc_id, CAST(length($sqlToks) AS BIGINT) AS ntok,
              CAST(NTILE(10) OVER (ORDER BY doc_id) AS BIGINT) AS decade
            FROM documents),
          dec AS (
            SELECT decade, MAX(doc_id) AS thr,
              CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(ntok) AS BIGINT) AS n_tokens
            FROM dt GROUP BY decade),
          fd AS (
            SELECT word, MIN(doc_id) AS first_doc
            FROM (SELECT doc_id, unnest($sqlToks) AS word
                  FROM documents) u
            GROUP BY word),
          wd AS (
            SELECT word, MIN(decade) AS decade
            FROM fd JOIN dec ON fd.first_doc <= dec.thr
            GROUP BY word),
          nw AS (SELECT decade, CAST(COUNT(*) AS BIGINT) AS new_words
                 FROM wd GROUP BY decade),
          j AS (
            SELECT dec.decade, dec.n_docs, dec.n_tokens,
              CAST(COALESCE(nw.new_words, 0) AS BIGINT) AS new_words
            FROM dec LEFT JOIN nw ON dec.decade = nw.decade)
          SELECT decade, n_docs, n_tokens, new_words,
            CAST(SUM(n_tokens) OVER (ORDER BY decade ROWS BETWEEN
              UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
              AS cum_tokens,
            CAST(SUM(new_words) OVER (ORDER BY decade ROWS BETWEEN
              UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
              AS cum_vocab,
            CAST(SUM(new_words) OVER (ORDER BY decade ROWS BETWEEN
              UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
              / CAST(SUM(n_tokens) OVER (ORDER BY decade ROWS BETWEEN
                UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS ttr
          FROM j ORDER BY decade""",
    "corpus_correlations" -> {
      def branch(name: String, sx: String, sy: String,
          sxx: String, syy: String, sxy: String) = {
        def D(e: String) = s"CAST($e AS DOUBLE)"
        s"""SELECT '$name' AS pair, n,
            (${D("n")} * ${D(sxy)} - ${D(sx)} * ${D(sy)})
              / (sqrt(${D("n")} * ${D(sxx)} - ${D(sx)} * ${D(sx)})
                 * sqrt(${D("n")} * ${D(syy)} - ${D(sy)} * ${D(sy)})) AS r
            FROM m"""
      }
      s"""WITH m AS (
            SELECT COUNT(*) AS n,
              SUM(a) AS sa, SUM(b) AS sb, SUM(c) AS sc,
              SUM(a*a) AS saa, SUM(b*b) AS sbb, SUM(c*c) AS scc,
              SUM(a*b) AS sab, SUM(a*c) AS sac, SUM(b*c) AS sbc
            FROM (SELECT CAST(length($sqlToks) AS HUGEINT) AS a,
                    CAST(length(list_distinct($sqlToks)) AS HUGEINT) AS b,
                    CAST(length(text) AS HUGEINT) AS c
                  FROM documents) f)
          SELECT pair, n, r FROM (
            ${branch("tokens_vs_distinct", "sa", "sb", "saa", "sbb", "sab")}
            UNION ALL
            ${branch("tokens_vs_chars", "sa", "sc", "saa", "scc", "sac")}
            UNION ALL
            ${branch("distinct_vs_chars", "sb", "sc", "sbb", "scc", "sbc")}) z
          ORDER BY pair"""
    },
    "text_langid_ngram" -> {
      val grams =
        s"""${Hashing.sqlHashAll(
          "list_transform(range(1, length(text) - 1), i -> substr(text, i, 3))")}"""
      s"""WITH dg AS (
            SELECT doc_id, unnest(list_distinct($grams)) AS gh
            FROM documents WHERE length(text) >= 3),
          ag AS (
            SELECT lang, unnest($grams) AS gh
            FROM documents WHERE length(text) >= 3),
          prof AS (
            SELECT lang AS cand_lang, gh FROM (
              SELECT lang, gh, ROW_NUMBER() OVER (PARTITION BY lang
                  ORDER BY COUNT(*) DESC, gh) AS rn
              FROM ag GROUP BY lang, gh) z
            WHERE rn <= $LangidProfileSize),
          best AS (
            SELECT doc_id, cand_lang, overlap FROM (
              SELECT doc_id, cand_lang, COUNT(*) AS overlap,
                ROW_NUMBER() OVER (PARTITION BY doc_id
                  ORDER BY COUNT(*) DESC, cand_lang) AS rn
              FROM dg JOIN prof ON dg.gh = prof.gh
              GROUP BY doc_id, cand_lang) z
            WHERE rn = 1)
          SELECT d.doc_id, d.lang AS labeled_lang,
            COALESCE(b.cand_lang, 'unknown') AS ngram_lang,
            CAST(COALESCE(b.overlap, 0) AS BIGINT) AS overlap
          FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id
          ORDER BY d.doc_id"""
    },
    // Readability: integer counts from Java≡RE2 classes, one fixed
    // double tree, bands compare identical doubles.
    "text_readability" ->
      s"""WITH c AS (
            SELECT doc_id,
              greatest(CAST(length(regexp_extract_all(text, '[.!?]+'))
                AS BIGINT), 1) AS n_sentences,
              CAST(length($sqlToks) AS BIGINT) AS n_words,
              CAST(length(regexp_extract_all(text, '[aeiouyAEIOUY]+'))
                AS BIGINT) AS n_syllables
            FROM documents),
          scored AS (
            SELECT doc_id, n_sentences, n_words, n_syllables,
              206.835
                - 1.015 * (CAST(n_words AS DOUBLE)
                  / CAST(n_sentences AS DOUBLE))
                - 84.6 * (CAST(n_syllables AS DOUBLE)
                  / CAST(n_words AS DOUBLE)) AS flesch
            FROM c WHERE n_words > 0)
          SELECT doc_id, n_sentences, n_words, n_syllables, flesch,
            CASE WHEN flesch >= 60.0 THEN 'easy'
              WHEN flesch >= 30.0 THEN 'medium' ELSE 'hard' END AS band
          FROM scored ORDER BY doc_id""",

    // Script mix: same length-minus-replaced arithmetic; DuckDB's
    // regexp_replace needs the 'g' flag to strip ALL matches.
    "text_script_mix" ->
      s"""WITH c AS (
            SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
              CAST(length(text) - length(regexp_replace(text,
                '[A-Za-z0-9]', '', 'g')) AS BIGINT) AS n_ascii_alnum,
              CAST(length(text) - length(regexp_replace(text,
                '[\\x{4e00}-\\x{9fff}]', '', 'g')) AS BIGINT) AS n_cjk,
              CAST(length(text) - length(regexp_replace(text,
                '[àâçéèêëîïôùûüáíóúñ]', '', 'g')) AS BIGINT)
                AS n_accent,
              CAST(length(text) - length(regexp_replace(text,
                '[ ]', '', 'g')) AS BIGINT) AS n_space
            FROM documents)
          SELECT doc_id, n_chars, n_ascii_alnum, n_cjk, n_accent,
            n_space,
            n_chars - n_ascii_alnum - n_cjk - n_accent - n_space
              AS n_other,
            (CASE WHEN n_ascii_alnum > 0 THEN 1 ELSE 0 END
              + CASE WHEN n_cjk > 0 THEN 1 ELSE 0 END
              + CASE WHEN n_accent > 0 THEN 1 ELSE 0 END) >= 2
              AS mixed_script
          FROM c ORDER BY doc_id""",

    // Langid margin: same profile CTEs as text_langid_ngram, keeping
    // rank <= 2; the ambiguity flag is the integer cross-product
    // compare second*5 >= top*4 (or a zero-overlap top).
    "text_langid_margin" -> {
      val grams =
        s"""${Hashing.sqlHashAll(
          "list_transform(range(1, length(text) - 1), i -> substr(text, i, 3))")}"""
      s"""WITH dg AS (
            SELECT doc_id, unnest(list_distinct($grams)) AS gh
            FROM documents WHERE length(text) >= 3),
          ag AS (
            SELECT lang, unnest($grams) AS gh
            FROM documents WHERE length(text) >= 3),
          prof AS (
            SELECT lang AS cand_lang, gh FROM (
              SELECT lang, gh, ROW_NUMBER() OVER (PARTITION BY lang
                  ORDER BY COUNT(*) DESC, gh) AS rn
              FROM ag GROUP BY lang, gh) z
            WHERE rn <= $LangidProfileSize),
          ranked AS (
            SELECT doc_id, cand_lang, overlap, rn FROM (
              SELECT doc_id, cand_lang, COUNT(*) AS overlap,
                ROW_NUMBER() OVER (PARTITION BY doc_id
                  ORDER BY COUNT(*) DESC, cand_lang) AS rn
              FROM dg JOIN prof ON dg.gh = prof.gh
              GROUP BY doc_id, cand_lang) z
            WHERE rn <= 2),
          wide AS (
            SELECT doc_id,
              MAX(CASE WHEN rn = 1 THEN cand_lang END) AS tl,
              MAX(CASE WHEN rn = 1 THEN overlap END) AS t_o,
              MAX(CASE WHEN rn = 2 THEN cand_lang END) AS sl,
              MAX(CASE WHEN rn = 2 THEN overlap END) AS s_o
            FROM ranked GROUP BY doc_id),
          base AS (
            SELECT d.doc_id, d.lang AS labeled_lang,
              COALESCE(w.tl, 'unknown') AS top_lang,
              CAST(COALESCE(w.t_o, 0) AS BIGINT) AS top_overlap,
              COALESCE(w.sl, 'none') AS second_lang,
              CAST(COALESCE(w.s_o, 0) AS BIGINT) AS second_overlap
            FROM documents d LEFT JOIN wide w ON d.doc_id = w.doc_id)
          SELECT doc_id, labeled_lang, top_lang, top_overlap,
            second_lang, second_overlap,
            top_overlap - second_overlap AS margin,
            (top_overlap = 0 OR second_overlap * 5 >= top_overlap * 4)
              AS ambiguous
          FROM base ORDER BY doc_id"""
    },
    "doc_langid_confusion" ->
      s"""WITH cells AS (
            SELECT lang AS labeled_lang,
              CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]')
                     THEN 'zh'
                   WHEN regexp_matches(text, '[àâçéèêëîïôùûüáíóúñ]')
                     THEN 'romance'
                   WHEN $sqlNStop > 0 THEN 'en'
                   ELSE 'unknown' END AS heur_lang,
              COUNT(*) AS n
            FROM documents GROUP BY 1, 2)
          SELECT labeled_lang, heur_lang, n,
            CAST(n AS DOUBLE)
              / CAST(SUM(n) OVER (PARTITION BY labeled_lang) AS DOUBLE)
              AS row_share
          FROM cells ORDER BY labeled_lang, heur_lang""",
    "tf_zipf" ->
      s"""SELECT rank, tok, n, CAST(rank * n AS BIGINT) AS rank_times_n
          FROM (
            SELECT tok, n,
              CAST(ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS BIGINT)
                AS rank
            FROM (SELECT t AS tok, COUNT(*) AS n FROM (
                    SELECT unnest($sqlToks) AS t FROM documents) u
                  GROUP BY t) c) r
          WHERE rank <= 50 ORDER BY rank""",
    "text_remove_boilerplate" ->
      s"""WITH base AS (SELECT doc_id, $sqlToks AS toks FROM documents),
          boiler AS (
            SELECT gh FROM (
              SELECT gh, COUNT(*) AS df FROM (
                SELECT doc_id,
                  unnest(list_distinct(${Hashing.sqlHashAll(
                    Hashing.sqlNgrams("toks", BoilerplateN))})) AS gh
                FROM base WHERE length(toks) >= $BoilerplateN) g
              GROUP BY gh) z
            WHERE df >= $BoilerplateMinDf),
          occ AS (
            SELECT doc_id,
              unnest(range(0, length(g))) AS gpos, unnest(g) AS gh
            FROM (SELECT doc_id,
                    ${Hashing.sqlHashAll(
                      Hashing.sqlNgrams("toks", BoilerplateN))} AS g
                  FROM base) t),
          covered AS (
            SELECT DISTINCT o.doc_id, o.gpos + s.i AS pos
            FROM (SELECT occ.doc_id, occ.gpos
                  FROM occ JOIN boiler ON occ.gh = boiler.gh) o,
              (SELECT unnest(range(0, $BoilerplateN)) AS i) s),
          tokpos AS (
            SELECT doc_id, unnest(range(0, length(toks))) AS pos,
              unnest(toks) AS tok
            FROM base),
          ka AS (
            SELECT t.doc_id, COUNT(*) AS n_kept,
              array_to_string(list(t.tok ORDER BY t.pos), ' ')
                AS cleaned_text
            FROM tokpos t
            LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.pos = c.pos
            WHERE c.doc_id IS NULL
            GROUP BY t.doc_id)
          SELECT b.doc_id, CAST(length(b.toks) AS BIGINT) AS n_tokens,
            CAST(COALESCE(ka.n_kept, 0) AS BIGINT) AS n_kept,
            CAST(length(b.toks) - COALESCE(ka.n_kept, 0) AS BIGINT)
              AS n_removed,
            COALESCE(ka.cleaned_text, '') AS cleaned_text
          FROM base b LEFT JOIN ka ON b.doc_id = ka.doc_id
          ORDER BY b.doc_id""",
    "tf_bigram_lift" ->
      s"""WITH tok AS (
            SELECT unnest($sqlToks) AS tok FROM documents),
          uni AS (SELECT tok, COUNT(*) AS n_uni FROM tok GROUP BY tok),
          nt AS (SELECT COUNT(*) AS n_tokens FROM tok),
          ba AS (
            SELECT unnest(g) AS bigram FROM (
              SELECT ${Hashing.sqlNgrams(sqlToks, 2)} AS g
              FROM documents) z),
          bt AS (SELECT COUNT(*) AS n_bigrams FROM ba),
          bi AS (
            SELECT bigram, COUNT(*) AS n_ab FROM ba GROUP BY bigram
            ORDER BY n_ab DESC, bigram LIMIT 20)
          SELECT bi.bigram, bi.n_ab, ua.n_uni AS n_a, ub.n_uni AS n_b,
            (CAST(bi.n_ab AS DOUBLE) / CAST(bt.n_bigrams AS DOUBLE))
              / ((CAST(ua.n_uni AS DOUBLE) / CAST(nt.n_tokens AS DOUBLE))
                * (CAST(ub.n_uni AS DOUBLE) / CAST(nt.n_tokens AS DOUBLE)))
              AS lift
          FROM bi
          JOIN uni ua ON ua.tok = split_part(bi.bigram, ' ', 1)
          JOIN uni ub ON ub.tok = split_part(bi.bigram, ' ', 2)
          CROSS JOIN nt CROSS JOIN bt
          ORDER BY bi.n_ab DESC, bi.bigram""",
    "doc_quality_gate" ->
      s"""WITH q AS (
            SELECT doc_id, lang,
              (CAST($sqlNStop AS DOUBLE) / CAST(length($sqlToks) AS DOUBLE))
                  * 0.2
                + (CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                     AS DOUBLE) / CAST(length(text) AS DOUBLE)) * 0.4
                + (CAST(length(list_distinct($sqlToks)) AS DOUBLE)
                   / CAST(length($sqlToks) AS DOUBLE)) * 0.4 AS quality
            FROM documents),
          m AS (
            SELECT lang, quantile_cont(quality, 0.5) AS lang_median
            FROM q GROUP BY lang)
          SELECT q.doc_id, q.lang, q.quality, m.lang_median,
            CASE WHEN q.quality >= m.lang_median THEN 'keep' ELSE 'drop' END
              AS verdict
          FROM q JOIN m ON q.lang = m.lang
          ORDER BY q.doc_id""",
    "text_pii_scrub" ->
      s"""SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
            CAST(SUM(CASE WHEN e + i + n > 0 THEN 1 ELSE 0 END) AS BIGINT)
              AS docs_with_pii,
            CAST(SUM(e) AS BIGINT) AS n_emails,
            CAST(SUM(i) AS BIGINT) AS n_ipv4,
            CAST(SUM(n) AS BIGINT) AS n_long_numbers,
            CAST(SUM(red) AS BIGINT) AS chars_redacted
          FROM (
            SELECT source,
              length(regexp_extract_all(text, '$PiiEmail')) AS e,
              length(regexp_extract_all(text, '$PiiIpv4')) AS i,
              length(regexp_extract_all(text, '$PiiLongNum')) AS n,
              (length(text)
                 - length(regexp_replace(text, '$PiiEmail', '', 'g')))
              + (length(text)
                 - length(regexp_replace(text, '$PiiIpv4', '', 'g')))
              + (length(text)
                 - length(regexp_replace(text, '$PiiLongNum', '', 'g')))
                AS red
            FROM documents) t
          GROUP BY source ORDER BY source""",
    "doc_budget_waterfill" ->
      s"""WITH per_src AS (
            SELECT source, CAST(SUM(length($sqlToks)) AS BIGINT) AS tokens
            FROM documents GROUP BY source),
          w AS (
            SELECT source, tokens,
              CAST(COUNT(*) OVER () AS BIGINT) AS k,
              CAST(SUM(tokens) OVER () AS BIGINT) // 2 AS budget,
              CAST(ROW_NUMBER() OVER (ORDER BY tokens, source) AS BIGINT)
                AS i,
              CAST(COALESCE(SUM(tokens) OVER (ORDER BY tokens, source
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS cum_prev
            FROM per_src),
          f AS (
            SELECT *, CASE WHEN tokens * (k - i + 1) + cum_prev <= budget
                           THEN 1 ELSE 0 END AS funded
            FROM w),
          g AS (
            SELECT *,
              CAST(SUM(CASE WHEN funded = 1 THEN tokens ELSE 0 END)
                OVER () AS BIGINT) AS funded_tok,
              CAST(SUM(funded) OVER () AS BIGINT) AS m,
              CAST(ROW_NUMBER() OVER (ORDER BY funded, source) AS BIGINT)
                AS ru
            FROM f)
          SELECT source, tokens, CAST(funded AS BIGINT) AS funded,
            CAST(CASE WHEN funded = 1 THEN tokens
                 ELSE (budget - funded_tok) // GREATEST(k - m, 1)
                      + CASE WHEN ru <= (budget - funded_tok)
                               % GREATEST(k - m, 1)
                             THEN 1 ELSE 0 END END AS BIGINT) AS alloc
          FROM g ORDER BY source""",
    "doc_quality_tiers" ->
      s"""WITH tok AS (
            SELECT doc_id, unnest($sqlToks) AS token FROM documents),
          tf AS (SELECT token, COUNT(*) AS tf FROM tok GROUP BY token),
          ds AS (
            SELECT t.doc_id,
              CAST(SUM(f.tf) AS BIGINT) // CAST(COUNT(*) AS BIGINT)
                AS bin
            FROM tok t JOIN tf f ON t.token = f.token
            GROUP BY t.doc_id),
          db AS (
            SELECT d.lang, ds.bin, COUNT(*) AS c
            FROM ds JOIN documents d ON ds.doc_id = d.doc_id
            GROUP BY 1, 2),
          cc AS (
            SELECT lang, bin, c,
              SUM(c) OVER (PARTITION BY lang ORDER BY bin) AS cum,
              SUM(c) OVER (PARTITION BY lang) AS n
            FROM db)
          SELECT lang,
            CASE WHEN (cum - c) * 3 < n THEN 'rare'
                 WHEN (cum - c) * 3 < n * 2 THEN 'mid'
                 ELSE 'common' END AS tier,
            CAST(SUM(c) AS BIGINT) AS n_docs,
            CAST(COUNT(*) AS BIGINT) AS n_bins,
            MIN(bin) AS min_bin, MAX(bin) AS max_bin
          FROM cc GROUP BY 1, 2 ORDER BY lang, tier""",
    "tf_ngram_novelty" ->
      s"""WITH g AS (
            SELECT doc_id,
              unnest(list_distinct(${Hashing.sqlHashAll(
                Hashing.sqlShingles("toks"))})) AS gh
            FROM (SELECT doc_id, $sqlToks AS toks FROM documents) t
            WHERE length(toks) >= 3),
          f AS (SELECT gh, MIN(doc_id) AS first_doc FROM g GROUP BY gh)
          SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
            CAST(SUM(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
              AS BIGINT) AS n_novel,
            CAST(SUM(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
              AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS novelty
          FROM g JOIN f ON g.gh = f.gh
          GROUP BY g.doc_id ORDER BY g.doc_id""",
    "tf_continuation_counts" ->
      s"""WITH pairs AS (
            SELECT DISTINCT split_part(bigram, ' ', 1) AS w1,
              split_part(bigram, ' ', 2) AS w2
            FROM (SELECT unnest(list_transform(range(1, length($sqlToks)),
                    i -> $sqlToks[i] || ' ' || $sqlToks[i+1])) AS bigram
                  FROM documents) t),
          tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_distinct_bigrams
                  FROM pairs),
          l AS (SELECT w2 AS token, CAST(COUNT(*) AS BIGINT)
                  AS left_types FROM pairs GROUP BY w2),
          r AS (SELECT w1 AS token, CAST(COUNT(*) AS BIGINT)
                  AS right_types FROM pairs GROUP BY w1)
          SELECT COALESCE(l.token, r.token) AS token,
            COALESCE(l.left_types, 0) AS left_types,
            COALESCE(r.right_types, 0) AS right_types,
            t.n_distinct_bigrams,
            CAST(COALESCE(l.left_types, 0) AS DOUBLE)
              / CAST(t.n_distinct_bigrams AS DOUBLE) AS p_continuation
          FROM l FULL OUTER JOIN r ON l.token = r.token
          CROSS JOIN tot t
          ORDER BY left_types DESC, token LIMIT 50""",
    // the same fixed double tree, parenthesized identically: the
    // division/product order must match the engine's op-for-op
    "tf_kn_prob" ->
      s"""WITH $sqlKnCtes
          SELECT big.w1, big.w2, big.c_bigram, lm.c_w1, lm.right_types,
            cl.left_types, tot.n_distinct_bigrams, $sqlKnPExpr AS p_kn
          FROM big JOIN lm ON lm.w1 = big.w1
          JOIN cl ON cl.w2 = big.w2
          CROSS JOIN tot
          ORDER BY big.c_bigram DESC, big.w1, big.w2 LIMIT 50""",
    // doc-level rarity off the SAME p_kn tree: the per-bigram test
    // compares bit-identical doubles; the keep bit is integer
    "doc_kn_rarity" ->
      s"""WITH $sqlKnCtes,
          pk AS (
            SELECT big.w1, big.w2, $sqlKnPExpr AS p_kn
            FROM big JOIN lm ON lm.w1 = big.w1
            JOIN cl ON cl.w2 = big.w2
            CROSS JOIN tot),
          db AS (
            SELECT doc_id, split_part(bigram, ' ', 1) AS w1,
              split_part(bigram, ' ', 2) AS w2
            FROM (SELECT doc_id,
                    unnest(list_transform(range(1, length($sqlToks)),
                      i -> $sqlToks[i] || ' ' || $sqlToks[i+1])) AS bigram
                  FROM documents) t)
          SELECT db.doc_id,
            CAST(COUNT(*) AS BIGINT) AS n_bigrams,
            CAST(SUM(CASE WHEN pk.p_kn < $KnRareThreshold
              THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
            CAST(SUM(CASE WHEN pk.p_kn < $KnRareThreshold
              THEN 1 ELSE 0 END) AS DOUBLE)
              / CAST(COUNT(*) AS DOUBLE) AS rare_rate,
            CASE WHEN SUM(CASE WHEN pk.p_kn < $KnRareThreshold
                THEN 1 ELSE 0 END) * 4 > COUNT(*)
              THEN 'quarantined_rare' ELSE 'admitted' END AS decision
          FROM db JOIN pk ON pk.w1 = db.w1 AND pk.w2 = db.w2
          GROUP BY db.doc_id ORDER BY db.doc_id""",
    // gopher rules: the identical integer cross-multiplications;
    // regexp_full_match = the anchored rlike
    "doc_gopher_rules" ->
      s"""WITH st AS (
            SELECT doc_id,
              CAST(length($sqlToks) AS BIGINT) AS n_tokens,
              CAST(length(list_aggregate($sqlToks, 'string_agg', ''))
                AS BIGINT) AS sum_token_chars,
              CAST(length(list_intersect(list_distinct($sqlToks),
                [${Stopwords.map(w => s"'$w'").mkString(", ")}]))
                AS BIGINT) AS n_distinct_stops,
              CAST(length(list_filter($sqlToks,
                t -> regexp_full_match(t, '[a-zA-Z]+')))
                AS BIGINT) AS n_alpha_tokens
            FROM documents)
          SELECT doc_id, n_tokens, sum_token_chars, n_distinct_stops,
            n_alpha_tokens,
            CAST(CASE WHEN n_tokens >= $GopherMinTokens
              AND n_tokens <= $GopherMaxTokens THEN 1 ELSE 0 END
              AS BIGINT) AS wc_ok,
            CAST(CASE WHEN sum_token_chars >= n_tokens * 3
              AND sum_token_chars <= n_tokens * 10 THEN 1 ELSE 0 END
              AS BIGINT) AS mwl_ok,
            CAST(CASE WHEN n_distinct_stops >= $GopherMinStops
              THEN 1 ELSE 0 END AS BIGINT) AS stop_ok,
            CAST(CASE WHEN n_alpha_tokens * 5 >= n_tokens * 4
              THEN 1 ELSE 0 END AS BIGINT) AS alpha_ok,
            CASE WHEN
              (CASE WHEN n_tokens >= $GopherMinTokens
                 AND n_tokens <= $GopherMaxTokens THEN 1 ELSE 0 END)
              + (CASE WHEN sum_token_chars >= n_tokens * 3
                 AND sum_token_chars <= n_tokens * 10 THEN 1 ELSE 0 END)
              + (CASE WHEN n_distinct_stops >= $GopherMinStops
                 THEN 1 ELSE 0 END)
              + (CASE WHEN n_alpha_tokens * 5 >= n_tokens * 4
                 THEN 1 ELSE 0 END) = 4
              THEN 'keep' ELSE 'drop' END AS verdict
          FROM st ORDER BY doc_id""")

  /** The BPE training rounds as a DuckDB CTE chain: `words` (the
    * word-frequency relation), `r0` (char-level symbol repr with the
    * double-space encoding of [[bpeCharRepr]]), then per round i:
    * `p_i` pair counts, `b_i` the argmax pair, `r_i` the merge applied
    * via the same literal `replace` as [[bpeApplyMerge]]. `merges = 0`
    * emits just the base + first-round pair counts (also exposes p1,
    * used by tf_bpe_pairs). */
  private def sqlBpeCtes(merges: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""words AS (
            SELECT t AS word, count(*) AS freq FROM (
              SELECT unnest($sqlToks) AS t FROM documents) u
            GROUP BY t),
          r0 AS (
            SELECT word, freq,
              '  ' || array_to_string(string_split(word, ''), '  ') || '  '
                AS repr
            FROM words)"""
    for (i <- 1 to math.max(merges, 1)) {
      sb ++= s""",
          p$i AS (
            SELECT g AS gram, CAST(sum(freq) AS BIGINT) AS c FROM (
              SELECT freq, unnest(${Hashing.sqlNgrams("syms", 2)}) AS g
              FROM (SELECT freq, string_split(trim(repr), '  ') AS syms
                    FROM r${i - 1}) sy) pg
            GROUP BY g)"""
      if (merges > 0) sb ++= s""",
          b$i AS (SELECT gram, c FROM p$i ORDER BY c DESC, gram LIMIT 1),
          r$i AS (
            SELECT word, freq,
              replace(repr, ' ' || replace(gram, ' ', '  ') || ' ',
                            ' ' || replace(gram, ' ', '') || ' ') AS repr
            FROM r${i - 1} CROSS JOIN b$i)"""
    }
    sb.toString
  }
}
