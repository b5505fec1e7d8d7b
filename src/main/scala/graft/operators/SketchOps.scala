package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Hashing
import graft.sources.Tables

/** Deterministic bounded-memory sketches: Bloom membership, Count-Min
  * heavy hitters, HyperLogLog-style distinct estimation.
  *
  * The reference's analytics surface has no sketch tier (its queries
  * are exact RxJava/Akka projections — see
  * /root/reference/README.md:1), but a 100 TB curation pipeline
  * cannot afford corpus-sized broadcast sets or unbounded groupBy
  * maps on its monitoring paths. The classic answer is the sketch
  * family, and the engineering point of THIS implementation is that
  * every sketch here is *deterministic and engine-portable*: built
  * from [[Hashing]]'s fixed affine-permutation constants, all
  * accounting integer until at most one final double division, so —
  * unlike `ev_approx_stats`, which uses Spark's internal HLL/KLL
  * implementations and is gated rows-only by documented design —
  * these three gate HASH-EXACT against the DuckDB oracle running the
  * same arithmetic.
  *
  * Scale shapes (the reason each exists):
  *  - Bloom: the bit array is represented relationally as the set of
  *    SET positions — bounded by [[BloomBits]] rows (8 KB of actual
  *    bits, ≤1 M rows worst-case as a relation) REGARDLESS of corpus
  *    size, where the exact fingerprint set grows ∝ corpus. One
  *    combinable distinct builds it; probing is a broadcast join
  *    against it. No false negatives by construction
  *    ([[graft.SketchSpec]] pins that), false positives bounded by
  *    occupancy.
  *  - Count-Min: the counter matrix is [[CmsDepth]]×[[CmsWidth]]
  *    cells no matter how large the vocabulary; merge across shards /
  *    days is cell-wise addition (same mergeability argument as
  *    `ev_histogram_quantiles`); estimates never undercount.
  *  - HLL: [[HllRegisters]] registers replace a corpus-wide
  *    COUNT(DISTINCT); registers merge by MAX, and the register sum
  *    is kept as an exact BIGINT (2^(24-rho) is an integer) so the
  *    estimate is ONE double division at the end — bit-reproducible.
  */
object SketchOps {
  type Q = (SparkSession, String) => DataFrame

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  /** Bloom filter size in bits (2^20 — sized for ~10 bits/element at
    * the sf1 corpus; a production build sizes m ∝ expected n). */
  val BloomBits: Long = 1L << 20

  /** Bloom hash count k (reuses the first k minhash permutations). */
  val BloomK = 4

  /** Count-Min depth (rows; one affine permutation each) and width. */
  val CmsDepth = 4
  val CmsWidth: Long = 1024L

  /** Heavy hitters probed against the CMS (top by true count). */
  val CmsProbeK = 20

  /** HLL register count m = 2^8; h div m has [[HllWBits]] usable bits
    * (h < 2^31), so rho ∈ [1, 24] with 24 = "all w-bits zero". */
  val HllRegisters: Long = 256L
  val HllWBits = 23

  /** alpha_m * m^2 * 2^24 for m=256 — the whole double-arithmetic
    * prefix of the HLL estimate folded into ONE Scala-computed
    * constant interpolated verbatim into both engines, so the
    * estimate is exactly one double division on each side. */
  val HllScale: Double =
    0.7213 / (1.0 + 1.079 / 256.0) * 256.0 * 256.0 * 16777216.0

  /** Small-range (linear-counting) correction table: entry V is
    * m·ln(m/V) for V = number of EMPTY registers, V ∈ [1, m]; entry 0
    * is unused (V = 0 means every register is set and the raw
    * estimator applies). Flajolet et al. apply linear counting when
    * raw_est ≤ 2.5·m and V > 0 — without it the raw estimator is
    * several× high at small n (the sf0.001 fixture has 31 distinct
    * tokens against m = 256). The whole table is precomputed HERE as
    * Scala doubles and interpolated verbatim into both engines
    * (typedLit array on the Spark side, a list literal in the DuckDB
    * oracle), so no cross-libm `ln` can make the two sides drift —
    * the repo-wide bit-exactness discipline. */
  val HllLinearCount: Seq[Double] =
    0.0 +: (1 to HllRegisters.toInt).map(v =>
      HllRegisters.toDouble * math.log(HllRegisters.toDouble / v))

  /** Raw-estimate threshold below which linear counting applies. */
  val HllSmallRange: Double = 2.5 * HllRegisters

  /** Streaming-ingest split: `charhash(doc_id) % 10 = 7` plays the
    * incoming batch, the rest the corpus (the repo-wide delta
    * convention — DedupOps.scala:577). */
  private[graft] def isNew(id: Column) =
    Hashing.charHash(id.cast("string")) % 10 === 7

  /** i-th sketch position of hash `h` modulo `mod`: the same affine
    * permutations as minhash ((a_i·h + b_i) mod P), folded to the
    * sketch's address space. Pure per-row projection — codegen'd
    * integer ops, no shuffle. */
  def sketchPos(h: Column, i: Int, mod: Long): Column =
    ((lit(Hashing.A(i)) * h + lit(Hashing.B(i))) % Hashing.P) % mod

  /** DuckDB mirror of [[sketchPos]], generated from the same
    * constants so the two sides cannot drift. */
  def sqlSketchPos(h: String, i: Int, mod: Long): String =
    s"((${Hashing.A(i)} * $h + ${Hashing.B(i)}) % ${Hashing.P}) % $mod"

  private[graft] def posArray(h: Column, mod: Long, k: Int): Column =
    array((0 until k).map(i => sketchPos(h, i, mod)): _*)

  /** The corpus-side Bloom relation (distinct SET positions of the
    * non-incoming docs' text fingerprints) — shared by the batch
    * probe and the streaming gate. Bounded by [[BloomBits]] rows. */
  private[graft] def bloomPositions(s: SparkSession, d: String): DataFrame =
    docs(s, d).filter(!isNew(col("doc_id")))
      .select(Hashing.charHash(col("text")).as("fp")).distinct()
      .select(explode(posArray(col("fp"), BloomBits, BloomK)).as("pos"))
      .distinct()
      .withColumn("hit", lit(1L))

  /** The heavy-hitter CTE chain (tk/grams/hh/cms/thr/pr/pcell/est/
    * cand/ex) over `documents` with an optional doc-level predicate
    * — the SQL mirror of [[heavyReportOf]]'s parameterization, shared
    * by the `tf_heavy_hitters` report and the `stream_template_gate`
    * corpus side. `docWhere` is a bare predicate ANDed into the
    * token projection (empty = whole corpus). */
  private def sqlHeavyCtes(docWhere: String, p: String = ""): String = {
    val h = Hashing.sqlCharHash("g")
    val where = if (docWhere.isEmpty) "" else s"WHERE $docWhere"
    s"""${p}tk AS (
            SELECT ${Hashing.sqlTokens("text")} AS toks
            FROM documents $where),
          ${p}grams AS (
            SELECT unnest(${Hashing.sqlNgrams("toks", 3)}) AS g
            FROM ${p}tk WHERE length(toks) >= 3),
          ${p}hh AS (SELECT $h AS h FROM ${p}grams),
          ${p}cms AS (
            SELECT row, bucket, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
            ${sqlCmsCells(s"${p}hh", width = HeavyCmsWidth)}) z
            GROUP BY row, bucket),
          ${p}thr AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
              greatest(CAST(COUNT(*) AS BIGINT) // $HeavyDen,
                $HeavyMinCnt) AS t
            FROM ${p}grams),
          ${p}pr AS (SELECT g, $h AS h
            FROM (SELECT DISTINCT g FROM ${p}grams)),
          ${p}pcell AS (
            ${sqlCmsCells(s"${p}pr", "g", HeavyCmsWidth)}),
          ${p}est AS (
            SELECT p.g, CAST(MIN(c.cnt) AS BIGINT) AS est_cnt
            FROM ${p}pcell p JOIN ${p}cms c
              ON p.row = c.row AND p.bucket = c.bucket
            GROUP BY p.g),
          ${p}cand AS (
            SELECT e.g, e.est_cnt FROM ${p}est e, ${p}thr
            WHERE e.est_cnt >= ${p}thr.t),
          ${p}ex AS (
            SELECT ${p}grams.g, CAST(COUNT(*) AS BIGINT) AS true_cnt
            FROM ${p}grams JOIN ${p}cand ON ${p}grams.g = ${p}cand.g
            GROUP BY ${p}grams.g),
          ${p}heavy AS (
            SELECT c.g FROM ${p}cand c JOIN ${p}ex x ON c.g = x.g,
              ${p}thr
            WHERE x.true_cnt >= ${p}thr.t)"""
  }

  /** Oracle for the STREAMING CMS monitor (`stream_cms_monitor` in
    * [[graft.operators.StreamOps]]): the batch cell matrix, ordered —
    * the stream's addition-merged matrix must equal it CELL-FOR-CELL,
    * which is the strongest possible statement of the additive-merge
    * contract (the whole relation is the proof, not a summary). */
  /** Per-depth-row CMS cell projection (UNION ALL over [[CmsDepth]])
    * for a CTE holding hash column `h` — the ONLY SQL copy of the
    * cell addressing, shared by every CMS oracle (matrix monitor,
    * heavy-hitter probe, shard merge). `extra` prefixes pass-through
    * columns. */
  private def sqlCmsCells(from: String, extra: String = "",
      width: Long = CmsWidth): String = {
    val pre = if (extra.isEmpty) "" else s"$extra, "
    (0 until CmsDepth).map(i =>
      s"SELECT $pre$i AS row, " +
        s"${sqlSketchPos("h", i, width)} AS bucket FROM $from")
      .mkString("\n            UNION ALL ")
  }

  /** Oracle for the STREAMING template gate (`stream_template_gate`
    * in [[graft.operators.StreamOps]]): the corpus-side heavy-gram
    * set (the [[sqlHeavyCtes]] chain over NON-incoming docs) probed
    * by every incoming doc's shingle stream — a doc more than half
    * of whose shingles are corpus heavy hitters is boilerplate/
    * template material and quarantines. Batch mirror of the
    * stream-static broadcast join. */
  private[graft] def sqlTemplateGateOracle: String = {
    val gate = s"${Hashing.sqlCharHash("CAST(doc_id AS VARCHAR)")} % 10 = 7"
    s"""WITH ${sqlHeavyCtes(s"NOT ($gate)")},
          itk AS (
            SELECT doc_id, ${Hashing.sqlTokens("text")} AS toks
            FROM documents WHERE $gate),
          inc AS (
            SELECT doc_id, unnest(${Hashing.sqlNgrams("toks", 3)}) AS g
            FROM itk WHERE length(toks) >= 3)
          SELECT i.doc_id,
            CAST(COUNT(*) AS BIGINT) AS n_grams,
            CAST(SUM(CASE WHEN h.g IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_heavy,
            CASE WHEN SUM(CASE WHEN h.g IS NOT NULL THEN 1 ELSE 0 END)
                   * 2 > COUNT(*)
                 THEN 'quarantined_template' ELSE 'admitted' END
              AS decision
          FROM inc i LEFT JOIN heavy h ON i.g = h.g
          GROUP BY i.doc_id
          ORDER BY i.doc_id"""
  }

  /** Oracle for the STREAMING CMS monitor (`stream_cms_monitor` in
    * [[graft.operators.StreamOps]]): the batch cell matrix, ordered —
    * the stream's addition-merged matrix must equal it CELL-FOR-CELL,
    * which is the strongest possible statement of the additive-merge
    * contract (the whole relation is the proof, not a summary). */
  private[graft] def sqlCmsMatrixOracle: String =
    s"""WITH tok AS (
          SELECT unnest(${Hashing.sqlTokens("text")}) AS token
          FROM documents),
        hh AS (SELECT ${Hashing.sqlCharHash("token")} AS h FROM tok),
        cells AS (
          ${sqlCmsCells("hh")})
        SELECT row, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM cells GROUP BY row, bucket
        ORDER BY row, bucket"""

  /** Oracle for the STREAMING bloom gate (`stream_bloom_gate` in
    * [[graft.operators.StreamOps]]): the bloom-only probe — no truth
    * join, because the gate's entire point is deciding from the
    * bounded bit relation alone. Owned here with the constants. */
  private[graft] def sqlBloomGateOracle: String =
    s"""WITH fps AS (
          SELECT DISTINCT ${Hashing.sqlCharHash("text")} AS fp
          FROM documents WHERE NOT ($sqlIsNew)),
        bloom AS (
          SELECT DISTINCT unnest(${sqlPosList("fp", BloomBits, BloomK)})
            AS pos FROM fps),
        probe AS (
          SELECT doc_id, ${Hashing.sqlCharHash("text")} AS fp
          FROM documents WHERE $sqlIsNew),
        ppos AS (
          SELECT doc_id, unnest(${sqlPosList("fp", BloomBits, BloomK)})
            AS pos FROM probe),
        roll AS (
          SELECT p.doc_id,
            CAST(SUM(CASE WHEN b.pos IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_pos_hit
          FROM ppos p LEFT JOIN bloom b ON p.pos = b.pos
          GROUP BY p.doc_id)
        SELECT doc_id, n_pos_hit,
          CASE WHEN n_pos_hit = $BloomK THEN 'route_exact_tier'
               ELSE 'admitted_new' END AS decision
        FROM roll ORDER BY doc_id"""

  private def sqlPosList(h: String, mod: Long, k: Int): String =
    (0 until k).map(i => sqlSketchPos(h, i, mod)).mkString("[", ", ", "]")

  // ------------------------------------------------------------------
  // Queries
  // ------------------------------------------------------------------

  /** Bloom-filter membership probe of the incoming batch against the
    * corpus fingerprint set — the "have we seen this exact document
    * before?" pre-filter that runs BEFORE any join at ingest.
    *
    * Shape: the corpus collapses to its distinct SET bit positions
    * (≤ min(k·|fps|, m) rows — bounded by [[BloomBits]] no matter the
    * corpus size); each probe doc explodes to its k positions and
    * broadcast-joins that bounded relation; a doc is a `bloom_hit`
    * iff all k positions are set. The exact-truth column exists ONLY
    * for false-positive accounting (it is what the probe replaces at
    * scale); the production gate ([[StreamOps.streamBloomGate]])
    * runs bloom-only. */
  val dedupBloomProbe: Q = (s, d) => {
    val dd = docs(s, d)
    val fps = dd.filter(!isNew(col("doc_id")))
      .select(Hashing.charHash(col("text")).as("fp")).distinct()
    val bloom = bloomPositions(s, d)
    val probe = dd.filter(isNew(col("doc_id")))
      .select(col("doc_id"), Hashing.charHash(col("text")).as("fp"))
    val roll = probe
      .select(col("doc_id"),
        explode(posArray(col("fp"), BloomBits, BloomK)).as("pos"))
      .join(broadcast(bloom), Seq("pos"), "left")
      .groupBy("doc_id")
      .agg(sum(coalesce(col("hit"), lit(0L))).as("n_pos_hit"))
    // truth join: FP accounting only — the thing the bloom replaces
    val exact = probe
      .join(fps.withColumn("ex", lit(1L)), Seq("fp"), "left")
      .select(col("doc_id"), coalesce(col("ex"), lit(0L)).as("exact_dup"))
    roll.join(exact, Seq("doc_id"))
      .select(col("doc_id"), col("n_pos_hit"),
        when(col("n_pos_hit") === BloomK, 1L).otherwise(0L).as("bloom_hit"),
        col("exact_dup"),
        when(col("n_pos_hit") === BloomK && col("exact_dup") === 1L, "dup")
          .when(col("n_pos_hit") === BloomK, "false_positive")
          .otherwise("new").as("verdict"))
      .orderBy("doc_id")
  }

  /** Deliberately SMALL address space for [[dedupBloomFpr]] — the
    * production filter's 2^20 bits are so empty at gate scale that
    * every measured rate would be 0; calibration needs occupancy. */
  val CalBloomBits: Long = 1L << 12

  /** Bloom-filter FPR calibration (`dedup_bloom_fpr`) — the
    * measurement behind choosing k (hashes per key) for the dedup
    * gate: for each k = 1..[[BloomK]], build the filter over the
    * corpus fingerprints in a [[CalBloomBits]]-bit space, probe it
    * with the TRUE NON-MEMBERS of the incoming batch (exact-dup
    * probes are removed by an anti join first — a duplicate "hit" is
    * correct, not false), and report occupancy and the measured
    * false-positive rate. The textbook trade-off appears as data:
    * occupancy grows with k while per-probe evidence compounds, so
    * FPR dips then climbs — where it dips is the k to ship. All
    * counting is integer; the two rates are one division each. Cost:
    * BloomK passes over the O(distinct fps) relation, each bounded by
    * the address space — corpus-size-independent after the fingerprint
    * rollup. */
  val dedupBloomFpr: Q = (s, d) => {
    val dd = docs(s, d)
    val fps = dd.filter(!isNew(col("doc_id")))
      .select(Hashing.charHash(col("text")).as("fp")).distinct()
      .transform(graft.Checkpointing.cut)
    val nonMembers = dd.filter(isNew(col("doc_id")))
      .select(col("doc_id"), Hashing.charHash(col("text")).as("fp"))
      .join(fps, Seq("fp"), "left_anti")
      .transform(graft.Checkpointing.cut)
    (1 to BloomK).map { k =>
      val bloom = fps
        .select(explode(posArray(col("fp"), CalBloomBits, k)).as("pos"))
        .distinct().withColumn("hit", lit(1L))
      val bits = bloom.agg(count(lit(1)).as("bits_set"))
      val probes = nonMembers
        .select(col("doc_id"),
          explode(posArray(col("fp"), CalBloomBits, k)).as("pos"))
        .join(broadcast(bloom), Seq("pos"), "left")
        .groupBy(col("doc_id"))
        .agg(sum(coalesce(col("hit"), lit(0L))).as("nhit"))
        .agg(count(lit(1)).as("n_probes"),
          sum(when(col("nhit") === k.toLong, 1L).otherwise(0L))
            .as("n_false_pos"))
      probes.crossJoin(broadcast(bits))
        .select(lit(k.toLong).as("k"), col("bits_set"),
          (col("bits_set").cast("double") / lit(CalBloomBits.toDouble))
            .as("occupancy"),
          col("n_probes"), col("n_false_pos"),
          when(col("n_probes") > 0L,
            col("n_false_pos").cast("double") /
              col("n_probes").cast("double"))
            .otherwise(lit(0.0)).as("fpr"))
    }.reduce(_ unionByName _).orderBy("k")
  }

  /** The (row, bucket, cnt) Count-Min cell matrix of a documents
    * relation — ≤ [[CmsDepth]]·[[CmsWidth]] rows regardless of corpus
    * size. Shared by the batch probe and the streaming monitor
    * ([[graft.operators.StreamOps]] `stream_cms_monitor`): any split
    * of the corpus yields per-split matrices that merge by cell-wise
    * ADDITION into exactly the global one. */
  private[graft] def cmsMatrix(docsDf: DataFrame): DataFrame =
    docsDf
      .select(explode(Hashing.tokens(col("text"))).as("token"))
      .select(posexplode(
        posArray(Hashing.charHash(col("token")), CmsWidth, CmsDepth)))
      .toDF("row", "bucket")
      .groupBy("row", "bucket").agg(count(lit(1)).as("cnt"))

  /** Count-Min heavy-hitter estimation over the corpus token stream:
    * the d×w counter matrix ([[cmsMatrix]] — fixed memory regardless
    * of vocabulary size) built in ONE combinable groupBy, then the
    * top-[[CmsProbeK]] true heavy hitters probed against it (est =
    * min over rows of the addressed cell). The oracle runs identical
    * integer arithmetic, so estimates including every collision
    * overcount are bit-equal; `overcount >= 0` always (CMS never
    * underestimates — [[graft.SketchSpec]] pins it). */
  val tfCmsCounts: Q = (s, d) => {
    val toks = docs(s, d)
      .select(explode(Hashing.tokens(col("text"))).as("token"))
    val truth = toks.groupBy("token").agg(count(lit(1)).as("true_cnt"))
    val cms = cmsMatrix(docs(s, d))
    val cells = truth
      .orderBy(col("true_cnt").desc, col("token")).limit(CmsProbeK)
      .select(col("token"), col("true_cnt"),
        posexplode(
          posArray(Hashing.charHash(col("token")), CmsWidth, CmsDepth)))
      .toDF("token", "true_cnt", "row", "bucket")
    cells.join(broadcast(cms), Seq("row", "bucket"))
      .groupBy("token", "true_cnt")
      .agg(min(col("cnt")).as("est_cnt"))
      .select(col("token"), col("true_cnt"), col("est_cnt"),
        (col("est_cnt") - col("true_cnt")).as("overcount"))
      .orderBy(col("true_cnt").desc, col("token"))
  }

  /** Heavy-hitter threshold for [[tfHeavyHitters]]: heavy means
    * count ≥ max(N div [[HeavyDen]], [[HeavyMinCnt]]) — relative so
    * the bar tracks corpus size, floored so tiny corpora don't
    * declare every 1-count gram heavy. */
  val HeavyDen = 15000L
  val HeavyMinCnt = 6L

  /** The heavy-hitter tier's own matrix width: the filter only
    * prunes when expected collision mass N/width sits WELL BELOW the
    * threshold (at the monitor width 1024 a 16k-gram universe puts
    * ~25 collision counts in every cell — est ≥ 6 then admits the
    * whole vocabulary, an empirically-caught failure). 65536 buckets
    * → collision mass ≈ N/65536 ≪ [[HeavyMinCnt]] at every probed
    * SF; memory is still a fixed d×w = 256 Ki cells however large
    * the corpus. */
  val HeavyCmsWidth: Long = 65536L

  /** SKETCH-FILTERED heavy hitters over the 3-word-shingle stream —
    * the real heavy-hitter pipeline, where [[tfCmsCounts]] is the
    * calibration report (it probes the TRUE top-k; this query does
    * not know the answer in advance). Three bounded passes:
    *
    *   1. the d×w CMS matrix over shingle hashes (fixed memory,
    *      combinable groupBy);
    *   2. candidate generation: DISTINCT shingles probed against the
    *      BROADCAST matrix (est = min over d addressed cells),
    *      kept iff est ≥ threshold — CMS never underestimates, so
    *      this admits every true heavy hitter (no false negatives BY
    *      CONSTRUCTION; collision overcounts only ADD candidates,
    *      each later exposed by exact verification);
    *   3. exact verification: the shingle stream semi-joins to the
    *      (tiny, broadcast) candidate set BEFORE the exact count
    *      groupBy — the full-vocabulary exact aggregate, the thing
    *      that needs unbounded reduce-side state on an open n-gram
    *      universe at 100 TB, never runs.
    *
    * Output labels each candidate `heavy` or `cms_false_positive` —
    * the false-positive rows are the measured price of the d×w
    * memory bound. All-integer thresholds; both engines run the
    * identical sketch arithmetic, so estimates (collisions included)
    * are bit-equal. */
  /** The heavy-hitter report relation of an arbitrary documents
    * relation — the whole sketch-filter-then-verify pipeline,
    * parameterized so the batch query ([[tfHeavyHitters]], whole
    * corpus) and the ingest gate (corpus-minus-incoming side of
    * `stream_template_gate`) cannot drift. Unordered. */
  private[graft] def heavyReportOf(docsDf: DataFrame): DataFrame = {
    val grams = docsDf
      .withColumn("toks", Hashing.tokens(col("text")))
      .filter(size(col("toks")) >= 3)
      .select(explode(Hashing.shingles(col("toks"))).as("g"))
      .transform(graft.Checkpointing.cut)
    val cms = grams
      .select(posexplode(
        posArray(Hashing.charHash(col("g")), HeavyCmsWidth, CmsDepth)))
      .toDF("row", "bucket")
      .groupBy("row", "bucket").agg(count(lit(1)).as("cnt"))
    val total = grams.agg(count(lit(1)).as("n_total"))
    val thr = greatest(expr(s"n_total div $HeavyDen"), lit(HeavyMinCnt))
    val cand = grams.distinct()
      .select(col("g"), posexplode(
        posArray(Hashing.charHash(col("g")), HeavyCmsWidth, CmsDepth)))
      .toDF("g", "row", "bucket")
      .join(broadcast(cms), Seq("row", "bucket"))
      .groupBy("g").agg(min(col("cnt")).as("est_cnt"))
      .crossJoin(broadcast(total))
      .filter(col("est_cnt") >= thr)
    val exact = grams
      .join(broadcast(cand.select("g")), Seq("g"), "left_semi")
      .groupBy("g").agg(count(lit(1)).as("true_cnt"))
    cand.join(exact, "g")
      .select(col("g").as("gram"), col("est_cnt"), col("true_cnt"),
        col("n_total"),
        when(col("true_cnt") >= thr, "heavy")
          .otherwise("cms_false_positive").as("verdict"))
  }

  val tfHeavyHitters: Q = (s, d) =>
    heavyReportOf(docs(s, d))
      .orderBy(col("true_cnt").desc, col("gram"))

  /** The VERIFIED heavy-gram set of a documents relation — the tiny
    * (gram) relation the streaming template gate broadcasts. */
  private[graft] def heavyGramsOf(docsDf: DataFrame): DataFrame =
    heavyReportOf(docsDf)
      .filter(col("verdict") === "heavy")
      .select(col("gram").as("g"))

  /** Heavy-hitter MEMBERSHIP DELTA across the ingest snapshot — the
    * monitor that catches an arriving template/boilerplate wave the
    * moment it crosses the heavy bar: heavy sets are computed over
    * the pre-ingest corpus (the `!isNew` side, the snapshot
    * convention `doc_snapshot_diff` uses) and over the post-ingest
    * corpus, then full-outer joined. `emerging` grams became heavy
    * only WITH the ingest (a new template wave — exactly what the
    * template gate should learn next refresh); `vanished` grams fell
    * below the RELATIVE bar because the corpus grew around them;
    * `persistent` are stable boilerplate. Both sides are the tiny
    * verified heavy sets, so the join is a few-row full-outer —
    * corpus cost is two heavy-hitter passes, each sketch-bounded. */
  val tfHeavyDelta: Q = (s, d) => {
    // FUSED single-scan form (round 13). The r11/r12 plan ran the
    // whole [[heavyReportOf]] pipeline TWICE (base = 90% of the
    // corpus, after = 100%): two shingle explodes, two checkpoint
    // materializations, two CMS groupBys, two distinct+verify passes
    // — ~2× the corpus work for a delta both sides of which read the
    // SAME gram stream. Fused: ONE explode carries an `is_new` flag
    // per gram, ONE d×w groupBy builds BOTH matrices as (cnt_base,
    // cnt_after) cell pairs, ONE distinct probes both, ONE verify
    // counts both. Every per-side number (cell count, total,
    // threshold, estimate, exact count) is arithmetic-identical to
    // the two-pass form — cnt_base sums exactly the !is_new
    // occurrences the base matrix counted — so the heavy sets, hence
    // the emerging/vanished/persistent statuses, are equal by
    // construction (the oracle still computes both sides
    // independently; hash-equality is the fusion proof). A gram with
    // zero base occurrences can reach the base probe via the shared
    // distinct, but collisions-only est_base either misses the bar or
    // is voided by true_base = 0 at verification — CMS admits no
    // false negatives and verification kills the false positives,
    // same as the two-pass form.
    def isNew(id: Column) =
      Hashing.charHash(id.cast("string")) % 10 === 7
    val grams = docs(s, d)
      .withColumn("toks", Hashing.tokens(col("text")))
      .filter(size(col("toks")) >= 3)
      .select(explode(Hashing.shingles(col("toks"))).as("g"),
        isNew(col("doc_id")).as("is_new"))
      .transform(graft.Checkpointing.cut)
    val baseCnt = sum(when(!col("is_new"), 1L).otherwise(0L))
    val cms = grams
      .select(col("is_new"), posexplode(
        posArray(Hashing.charHash(col("g")), HeavyCmsWidth, CmsDepth)))
      .toDF("is_new", "row", "bucket")
      .groupBy("row", "bucket")
      .agg(count(lit(1)).as("cnt_after"), baseCnt.as("cnt_base"))
    val totals = grams.agg(count(lit(1)).as("n_after"),
      baseCnt.as("n_base"))
    def thr(n: String) = greatest(expr(s"$n div $HeavyDen"),
      lit(HeavyMinCnt))
    val cand = grams.select("g").distinct()
      .select(col("g"), posexplode(
        posArray(Hashing.charHash(col("g")), HeavyCmsWidth, CmsDepth)))
      .toDF("g", "row", "bucket")
      .join(broadcast(cms), Seq("row", "bucket"))
      .groupBy("g")
      .agg(min(col("cnt_after")).as("est_after"),
        min(col("cnt_base")).as("est_base"))
      .crossJoin(broadcast(totals))
      .filter(col("est_after") >= thr("n_after") ||
        col("est_base") >= thr("n_base"))
    val exact = grams
      .join(broadcast(cand.select("g")), Seq("g"), "left_semi")
      .groupBy("g")
      .agg(count(lit(1)).as("true_after"), baseCnt.as("true_base"))
    cand.join(exact, "g")
      .select(col("g").as("gram"),
        (col("true_base") >= thr("n_base")).as("in_base"),
        (col("true_after") >= thr("n_after")).as("in_after"))
      .filter(col("in_base") || col("in_after"))
      .select(col("gram"),
        when(!col("in_base"), "emerging")
          .when(!col("in_after"), "vanished")
          .otherwise("persistent").as("status"))
      .orderBy("gram")
  }

  /** (reg, rho) projection of a relation of distinct hashes `h`,
    * optionally keeping grouping columns — the ONLY Scala copy of the
    * register-addressing / leading-zero-rank formula (each distinct
    * hash addresses register h mod m and contributes rho = 24 minus
    * the bit length of the remaining [[HllWBits]]-bit word; rho = 24
    * when the word is all zeros). Every register builder (single-pass,
    * per-shard, streaming micro-batch) goes through here, so the
    * formula cannot drift between the paths that must be bit-equal. */
  private def regRhoOf(hashes: DataFrame, keep: String*): DataFrame =
    hashes
      .select(keep.map(col) :+ (col("h") % HllRegisters).as("reg") :+
        expr(s"h div $HllRegisters").as("w"): _*)
      .select(keep.map(col) :+ col("reg") :+
        when(col("w") === 0L, lit(24L))
          .otherwise(lit(24L) - length(bin(col("w"))).cast("long"))
          .as("rho"): _*)

  /** The (reg, rho) register relation of a documents relation —
    * bounded by m rows regardless of corpus size. Shared by the
    * batch queries and the streaming monitor
    * ([[graft.operators.StreamOps]] `stream_hll_monitor`): any split
    * of the corpus yields per-split register relations that merge by
    * per-register MAX into exactly the global one. */
  private[graft] def hllRegs(docsDf: DataFrame): DataFrame =
    regRhoOf(docsDf
      .select(explode(Hashing.tokens(col("text"))).as("token"))
      .select(Hashing.charHash(col("token")).as("h")).distinct())
      .groupBy("reg").agg(max(col("rho")).as("rho"))

  /** One-row (n_registers, n_set, sum_scaled, est_raw, est_distinct)
    * summary of a (reg, rho) register relation — the exact integer
    * register sum, the single double division, and the small-range
    * correction, all shared with the oracles' arithmetic. */
  private[graft] def hllSummary(s: SparkSession, regs: DataFrame)
      : DataFrame =
    s.range(HllRegisters).select(col("id").as("reg"))
      .join(regs, Seq("reg"), "left")
      .select(coalesce(col("rho"), lit(0L)).as("rho"))
      .agg(
        sum(expr("shiftleft(cast(1 as bigint), cast(24 - rho as int))"))
          .as("sum_scaled"),
        sum(when(col("rho") > 0L, 1L).otherwise(0L)).as("n_set"))
      .select(lit(HllRegisters).as("n_registers"),
        col("n_set"), col("sum_scaled"),
        (lit(HllScale) / col("sum_scaled").cast("double"))
          .as("est_raw"))
      .select(col("n_registers"), col("n_set"), col("sum_scaled"),
        col("est_raw"),
        when(col("est_raw") <= lit(HllSmallRange) &&
            (lit(HllRegisters) - col("n_set")) > 0L,
          element_at(typedLit(HllLinearCount),
            (lit(HllRegisters) - col("n_set") + 1L).cast("int")))
          .otherwise(col("est_raw"))
          .as("est_distinct"))

  /** HLL-style distinct-token estimate ([[hllRegs]] + [[hllSummary]]):
    * registers keep the MAX rho, the register sum is the exact integer
    * Σ 2^(24-rho), and [[HllScale]]/sum plus the [[HllLinearCount]]
    * small-range correction are the only floating-point operations —
    * deterministic to the bit on both engines. Output also carries the
    * exact distinct count for error accounting (the COUNT(DISTINCT)
    * the registers replace at scale). */
  val tfHllDistinct: Q = (s, d) => {
    val hs = docs(s, d)
      .select(explode(Hashing.tokens(col("text"))).as("token"))
      .select(Hashing.charHash(col("token")).as("h")).distinct()
    hs.agg(count(lit(1)).as("n_exact"))
      .crossJoin(hllSummary(s, hllRegs(docs(s, d))))
      .select(col("n_exact"), col("n_registers"), col("n_set"),
        col("sum_scaled"), col("est_raw"), col("est_distinct"))
  }

  /** Shard count for the HLL mergeability demonstration. */
  val HllShards: Long = 4L

  /** The HLL *mergeability* contract, oracle-gated: build per-shard
    * register vectors over a 4-way hash split of the corpus, merge
    * them by per-register MAX, and estimate from the merged vector —
    * the distributed plan a 1000-executor deployment actually runs
    * (each executor sketches its shard; the driver merges m-sized
    * vectors, never token streams). The output carries the merged
    * estimate AND the single-pass global estimate ([[tfHllDistinct]]'s
    * arithmetic) with an exact-equality flag: MAX is associative and
    * register addressing is shard-independent, so the two register
    * vectors are IDENTICAL — not approximately, bit-for-bit, and both
    * engines prove it. */
  val tfHllMerge: Q = (s, d) => {
    val hs = docs(s, d)
      .select(col("doc_id"),
        explode(Hashing.tokens(col("text"))).as("token"))
      .select(col("doc_id"), Hashing.charHash(col("token")).as("h"))
    // shard by DOCUMENT (the physical unit a scan task holds), not by
    // token hash — the merge claim is only interesting when the same
    // token can appear in several shards. Same (reg, rho) projection
    // as every other register builder ([[regRhoOf]]).
    val sharded = regRhoOf(
      hs.select(
          (Hashing.charHash(col("doc_id").cast("string")) % HllShards)
            .as("shard"), col("h"))
        .distinct(), // distinct (shard, h): per-shard distinct hashes
      "shard")
      .groupBy("shard", "reg").agg(max(col("rho")).as("rho"))
    // the merge: per-register MAX across the shard vectors
    val merged = sharded.groupBy("reg").agg(max(col("rho")).as("rho"))
    val global = hllRegs(docs(s, d))
    // [[hllSummary]] IS the single-pass estimate arithmetic — reused
    // verbatim for both sides, only the columns are prefixed
    def pfx(p: String, regs: DataFrame): DataFrame =
      hllSummary(s, regs).select(
        col("sum_scaled").as(s"${p}_sum_scaled"),
        col("n_set").as(s"${p}_n_set"),
        col("est_distinct").as(s"${p}_est"))
    // the bit-for-bit claim is proven at REGISTER level: a full outer
    // join on reg (an addressing bug that permuted rho values across
    // registers would fool a sum/n_set comparison)
    val regDiff = merged.as("m")
      .join(global.as("g"), Seq("reg"), "full")
      .select(when(coalesce(col("m.rho"), lit(-1L)) ===
          coalesce(col("g.rho"), lit(-2L)), 0L).otherwise(1L).as("bad"))
      .agg(sum(col("bad")).as("n_reg_diff"))
    val nShards = sharded.select(col("shard")).distinct()
      .agg(count(lit(1)).as("n_shards"))
    nShards
      .crossJoin(pfx("merged", merged))
      .crossJoin(pfx("global", global))
      .crossJoin(regDiff)
      .select(col("n_shards"),
        col("merged_sum_scaled"), col("merged_n_set"), col("merged_est"),
        col("global_est"),
        (coalesce(col("n_reg_diff"), lit(0L)) === 0L)
          .cast("long").as("registers_identical"))
  }

  /** The CMS *mergeability* contract, oracle-gated — the additive
    * sibling of [[tfHllMerge]]'s MAX-merge: per-shard d×w counter
    * matrices over the same 4-way doc-hash split, merged by CELL-WISE
    * ADDITION. A token instance lands in exactly one shard, addition
    * is associative, and cell addressing is shard-independent, so the
    * merged matrix is BIT-IDENTICAL to the single-pass global build —
    * the property that lets per-day / per-executor matrices roll up
    * into weekly corpus counts without ever re-reading a token
    * stream. Output: shard count, merged-matrix stats, and a
    * full-outer cell-by-cell equality rollup both engines compute. */
  val tfCmsMerge: Q = (s, d) => {
    val toks = docs(s, d)
      .select(col("doc_id"), explode(Hashing.tokens(col("text"))).as("token"))
    val cells = toks.select(
        (Hashing.charHash(col("doc_id").cast("string")) % HllShards)
          .as("shard"),
        posexplode(
          posArray(Hashing.charHash(col("token")), CmsWidth, CmsDepth)))
      .toDF("shard", "row", "bucket")
    val sharded = cells.groupBy("shard", "row", "bucket")
      .agg(count(lit(1)).as("cnt"))
    val merged = sharded.groupBy("row", "bucket")
      .agg(sum(col("cnt")).as("cnt"))
    val global = cmsMatrix(docs(s, d))
    val diff = merged.as("m")
      .join(global.as("g"), Seq("row", "bucket"), "full")
      .select(when(coalesce(col("m.cnt"), lit(-1L)) ===
          coalesce(col("g.cnt"), lit(-2L)), 0L).otherwise(1L).as("bad"))
      .agg(sum(col("bad")).as("n_diff"))
    val nSh = sharded.select(col("shard")).distinct()
      .agg(count(lit(1)).as("n_shards"))
    val mstats = merged.agg(count(lit(1)).as("n_cells"),
      sum(col("cnt")).as("sum_count"))
    nSh.crossJoin(mstats).crossJoin(diff)
      .select(col("n_shards"), col("n_cells"), col("sum_count"),
        (coalesce(col("n_diff"), lit(0L)) === 0L)
          .cast("long").as("cells_identical"))
  }

  // ------------------------------------------------------------------
  // KMV (k-minimum-values) distinct sketch — the set-OPERATION sketch
  // ------------------------------------------------------------------

  /** KMV sample size k. */
  val KmvK = 256

  /** (k−1)·P — the exact integer numerator of the KMV estimator,
    * computed ONCE here and interpolated into both engines (it is
    * exactly representable in double: 255·(2^31−1) < 2^39), so the
    * estimate is one double division on each side. */
  val KmvScaleNum: Long = (KmvK - 1).toLong * Hashing.P

  /** The KMV estimate over (n_sample, kth_min) columns: exact when the
    * universe fits the sample, else (k−1)·P / h_(k) — the classic
    * k-minimum-values estimator with the hash space [0, P) as the
    * unit interval. */
  private def kmvEst(nSample: Column, kth: Column): Column =
    when(nSample < KmvK, nSample.cast("double"))
      .otherwise(lit(KmvScaleNum.toDouble) / kth.cast("double"))

  /** Distinct 3-word-shingle hashes of a documents relation — the KMV
    * universe. Token vocabulary is a closed 31-word pool at every SF
    * (the HLL fixture note), so the SHINGLE space is the first
    * text-derived universe that genuinely exceeds the sample size —
    * ~16k distinct at sf0.01 — and it is the same universe the
    * minhash/LSH tier signatures, making KMV the cardinality
    * companion of that machinery. */
  private[graft] def shingleHashes(docsDf: DataFrame): DataFrame =
    docsDf.select(Hashing.tokens(col("text")).as("tk"))
      .filter(size(col("tk")) >= 3)
      .select(explode(Hashing.hashAll(Hashing.shingles(col("tk"))))
        .as("h"))
      .distinct()

  /** Distinct (key, shingle-hash) rows — the KEYED sibling of
    * [[shingleHashes]], shared by the per-source HLL and KMV tiers so
    * the shingle definition (tokenizer, the >= 3 guard, the hash)
    * cannot silently drift between sketch families. */
  private[graft] def keyedShingleHashes(docsDf: DataFrame, key: String)
      : DataFrame =
    docsDf.select(col(key), Hashing.tokens(col("text")).as("tk"))
      .filter(size(col("tk")) >= 3)
      .select(col(key),
        explode(Hashing.hashAll(Hashing.shingles(col("tk")))).as("h"))
      .distinct()

  /** The k smallest distinct hashes. `orderBy().limit()` plans as
    * TakeOrderedAndProject — per-partition bounded heaps merged once,
    * never a global sort — which IS the distributed KMV build. */
  private[graft] def kmvSample(hs: DataFrame): DataFrame =
    hs.orderBy(col("h")).limit(KmvK)

  /** Per-KEY k-min samples over a (key, h) relation: a rank filter
    * inside the one key-partitioned window pass. Exposed UN-materialized
    * so [[graft.PlanSpec]] can pin the sample-build stage's exchanges
    * text-free — `dedup_kmv_matrix` checkpoints this relation, which
    * truncates the lineage its own plan shows. */
  private[graft] def keyedKmvSamples(keyedHs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val key = keyedHs.columns.head
    val w = Window.partitionBy(key).orderBy("h")
    keyedHs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= KmvK).drop("rn")
  }

  /** One-row (n_sample, kth_min, est) summary of a k-min sample. */
  private[graft] def kmvSummary(sample: DataFrame): DataFrame =
    sample.agg(count(lit(1)).as("n_sample"), max(col("h")).as("kth_min"))
      .select(col("n_sample"), col("kth_min"),
        kmvEst(col("n_sample"), col("kth_min")).as("est_distinct"))

  /** KMV distinct-count estimate over the corpus shingle space — the
    * bounded-memory stand-in for COUNT(DISTINCT shingle), and the
    * third distinct-estimation tier next to HLL (smaller state, no
    * set operations) and the exact count (unbounded state): KMV keeps
    * k actual hash VALUES, which is what buys the set-operation
    * support `dedup_kmv_overlap` exercises. Exact count carried for
    * error accounting. */
  val dedupKmvDistinct: Q = (s, d) => {
    val hs = shingleHashes(docs(s, d))
    hs.agg(count(lit(1)).as("n_exact"))
      .crossJoin(kmvSummary(kmvSample(hs)))
      .select(col("n_exact"), lit(KmvK.toLong).as("k"),
        col("n_sample"), col("kth_min"), col("est_distinct"))
  }

  /** Per-source-PAIR overlap matrix from per-source KMV samples
    * (`dedup_kmv_matrix`) — the cross-source contamination screen a
    * multi-source training corpus runs before mixing: which source
    * pairs share content, estimated WITHOUT ever joining two full
    * shingle sets. One pass builds a k-min sample per source (a rank
    * filter inside the single source-keyed shuffle), then every pair
    * estimate is computed from samples alone — `dedup_kmv_overlap`'s
    * union-sample lemma applied to all |S|·(|S|−1)/2 pairs at once:
    * the k smallest of (sample_a ∪ sample_b) IS a KMV sample of
    * A ∪ B, and membership flags against each side's sample give ρ =
    * |both|/|union sample|, so est_jaccard = ρ and est_intersection =
    * ρ·est_union. At 100 TB the full corpus is touched ONCE (per-source
    * sampling); the pairwise stage manipulates |S|²·k BIGINTs — for a
    * thousand sources that is ~10⁸ integers, independent of corpus
    * size, where exact pairwise Jaccard would re-shuffle the corpus
    * |S| times. Per-source exact distinct counts ride along for error
    * accounting (one cheap groupBy); per-PAIR exacts are deliberately
    * absent — computing them is the quadratic work the sketch
    * replaces (the fixture-level accuracy envelope lives in
    * [[graft.KmvSpec]]). */
  val dedupKmvMatrix: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val srcHs = keyedShingleHashes(docs(s, d), "source")
    // materialize the |S|·k-row sample relation EAGERLY: it feeds the
    // per-source summaries and BOTH sides of every pair, and without
    // the checkpoint each consumer re-runs the corpus shingle scan —
    // the cost the sketch exists to pay exactly once
    val samples = keyedKmvSamples(srcHs).transform(graft.Checkpointing.cut)
    val sums = srcHs.groupBy("source")
      .agg(count(lit(1)).as("n_exact"))
      .join(samples.groupBy("source")
        .agg(count(lit(1)).as("n_sample"), max(col("h")).as("kth")),
        Seq("source"))
      .select(col("source"), col("n_exact"),
        kmvEst(col("n_sample"), col("kth")).as("est"))
    // every non-empty source contributes >= 1 sample row, so the
    // source list derives from the checkpointed samples — no third
    // corpus scan
    val srcs = samples.select("source").distinct()
    val pairs = srcs.select(col("source").as("source_a"))
      .crossJoin(srcs.select(col("source").as("source_b")))
      .filter(col("source_a") < col("source_b"))
    // per-pair sample membership: the a-side and b-side samples of
    // each pair, de-duplicated per hash with side flags
    val memA = pairs.join(samples.withColumnRenamed("source", "source_a"),
        Seq("source_a"))
      .select(col("source_a"), col("source_b"), col("h"),
        lit(1L).as("ina"), lit(0L).as("inb"))
    val memB = pairs.join(samples.withColumnRenamed("source", "source_b"),
        Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("h"),
        lit(0L).as("ina"), lit(1L).as("inb"))
    val mem = memA.unionByName(memB)
      .groupBy("source_a", "source_b", "h")
      .agg(max(col("ina")).as("ina"), max(col("inb")).as("inb"))
    val wPair = Window.partitionBy("source_a", "source_b").orderBy("h")
    val agg = mem.withColumn("rn", row_number().over(wPair))
      .filter(col("rn") <= KmvK)
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_union_sample"), max(col("h")).as("kth_u"),
        sum(col("ina") * col("inb")).as("n_both"))
    agg
      .join(broadcast(sums.select(col("source").as("source_a"),
        col("n_exact").as("n_a_exact"), col("est").as("est_a"))),
        Seq("source_a"))
      .join(broadcast(sums.select(col("source").as("source_b"),
        col("n_exact").as("n_b_exact"), col("est").as("est_b"))),
        Seq("source_b"))
      .select(col("source_a"), col("source_b"),
        col("n_a_exact"), col("n_b_exact"), col("est_a"), col("est_b"),
        col("n_union_sample"), col("n_both"),
        kmvEst(col("n_union_sample"), col("kth_u")).as("est_union"),
        (col("n_both").cast("double") /
          col("n_union_sample").cast("double")).as("est_jaccard"))
      .withColumn("est_intersection",
        col("est_jaccard") * col("est_union"))
      .orderBy("source_a", "source_b")
  }

  /** The KMV *mergeability* contract, oracle-gated (the sibling of
    * [[tfHllMerge]]'s MAX-merge and [[tfCmsMerge]]'s addition-merge):
    * per-shard k-min samples over a 4-way doc-hash split, merged by
    * taking the k smallest distinct of the sample union. Any global
    * top-k hash is in its own shard's top-k, so the merged sample is
    * BIT-IDENTICAL to the single-pass global build — proven at RANK
    * level by a full outer join on sample rank (a bug that kept the
    * right multiset in the wrong order would fool a count/max
    * comparison). At scale: executors ship k-value integer lists,
    * never shingle streams. */
  val dedupKmvMerge: Q = (s, d) => {
    val perShard = docs(s, d)
      .select((Hashing.charHash(col("doc_id").cast("string")) % HllShards)
          .as("shard"),
        Hashing.tokens(col("text")).as("tk"))
      .filter(size(col("tk")) >= 3)
      .select(col("shard"),
        explode(Hashing.hashAll(Hashing.shingles(col("tk")))).as("h"))
      .distinct()
    val shardSamples = perShard
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("h"))))
      .filter(col("rk") <= KmvK)
      .select(col("shard"), col("h"))
    val merged = kmvSample(shardSamples.select(col("h")).distinct())
    val global = kmvSample(shingleHashes(docs(s, d)))
    // rank-indexed equality: both samples sorted, compared rank-for-
    // rank (k rows — the unpartitioned window is bounded by k)
    def ranked(df: DataFrame, hName: String) =
      df.select(col("h").as(hName))
        .withColumn("rk", row_number().over(Window.orderBy(col(hName))))
    val diff = ranked(merged, "mh")
      .join(ranked(global, "gh"), Seq("rk"), "full")
      .select(when(coalesce(col("mh"), lit(-1L)) ===
          coalesce(col("gh"), lit(-2L)), 0L).otherwise(1L).as("bad"))
      .agg(sum(col("bad")).as("n_rank_diff"))
    val nSh = shardSamples.select(col("shard")).distinct()
      .agg(count(lit(1)).as("n_shards"))
    nSh.crossJoin(kmvSummary(merged)
        .select(col("n_sample").as("merged_n_sample"),
          col("kth_min").as("merged_kth"),
          col("est_distinct").as("merged_est")))
      .crossJoin(kmvSummary(global)
        .select(col("est_distinct").as("global_est")))
      .crossJoin(diff)
      .select(col("n_shards"), col("merged_n_sample"), col("merged_kth"),
        col("merged_est"), col("global_est"),
        // coalesce: the rank-diff SUM over an EMPTY full-outer join is
        // NULL, and two empty samples ARE identical (vacuously) — the
        // oracle mirrors with COALESCE(n_rank_diff, 0)
        (coalesce(col("n_rank_diff"), lit(0L)) === 0L)
          .cast("long").as("sample_identical"))
  }

  /** Cross-corpus OVERLAP estimation from two KMV sketches — the set
    * operation HLL registers cannot answer and the reason KMV exists
    * in this tier: estimate the shingle-space Jaccard and
    * intersection between two halves of the corpus (sources split by
    * hash) from two k-value samples, never comparing the full sets.
    * The union sample is the k smallest of the two samples' union
    * (exactly the global union's k smallest, by the merge lemma), and
    * within it membership in each side's SAMPLE equals membership in
    * the side's full SET (any union-sample hash is under both sides'
    * kth thresholds), so ρ = |both| / |union sample| is a true
    * Jaccard estimate and ρ·est(union) estimates the intersection.
    * Exact values carried for error accounting — at 100 TB the exact
    * side is the corpus-sized join this sketch replaces; per-source
    * vocabulary overlap is the contamination / near-duplicate-source
    * signal (`dedup_cross_source`'s question, answered in O(k)). */
  val dedupKmvOverlap: Q = (s, d) => {
    def side(g: Int): DataFrame =
      shingleHashes(docs(s, d)
        .filter(Hashing.charHash(col("source")) % 2 === g))
    val ha = side(0)
    val hb = side(1)
    val sa = kmvSample(ha)
    val sb = kmvSample(hb)
    val su = kmvSample(sa.union(sb).distinct())
    val flags = su
      .join(sa.withColumn("ina", lit(1L)), Seq("h"), "left")
      .join(sb.withColumn("inb", lit(1L)), Seq("h"), "left")
      .agg(count(lit(1)).as("n_union_sample"), max(col("h")).as("kth_u"),
        sum(when(col("ina") === 1L && col("inb") === 1L, 1L)
          .otherwise(0L)).as("n_both"))
    val exact = ha.union(hb).distinct()
      .agg(count(lit(1)).as("exact_union"))
      .crossJoin(ha.join(hb, Seq("h"), "left_semi")
        .agg(count(lit(1)).as("exact_intersection")))
    ha.agg(count(lit(1)).as("n_a_exact"))
      .crossJoin(hb.agg(count(lit(1)).as("n_b_exact")))
      .crossJoin(kmvSummary(sa).select(col("est_distinct").as("est_a")))
      .crossJoin(kmvSummary(sb).select(col("est_distinct").as("est_b")))
      .crossJoin(flags)
      .crossJoin(exact)
      .select(col("n_a_exact"), col("n_b_exact"), col("est_a"),
        col("est_b"), col("n_union_sample"), col("n_both"),
        kmvEst(col("n_union_sample"), col("kth_u")).as("est_union"),
        // NULL-guarded: the Jaccard of two EMPTY corpora is undefined
        // (0/0 — the degenerate shape a pruned-to-nothing partition
        // feeds this monitor at 100 TB); oracle mirrors the CASE
        when(col("n_union_sample") === 0L, lit(null))
          .otherwise(col("n_both").cast("double") /
            col("n_union_sample").cast("double")).as("est_jaccard"),
        col("exact_union"), col("exact_intersection"),
        when(col("exact_union") === 0L, lit(null))
          .otherwise(col("exact_intersection").cast("double") /
            col("exact_union").cast("double")).as("exact_jaccard"))
      .select(col("n_a_exact"), col("n_b_exact"), col("est_a"),
        col("est_b"), col("n_union_sample"), col("n_both"),
        col("est_union"), col("est_jaccard"),
        (col("est_jaccard") * col("est_union")).as("est_intersection"),
        col("exact_union"), col("exact_intersection"),
        col("exact_jaccard"))
  }

  /** GROUP-BY HLL — per-SOURCE distinct-shingle estimation in one
    * pass: the per-tenant / per-domain vocabulary monitor a 100 TB
    * curation pipeline runs daily, and the proof that the sketch tier
    * COMPOSES with grouping (m registers per group, the same MAX-merge
    * contract per group; state = |groups|·m integers regardless of
    * corpus size, where the exact COUNT(DISTINCT) per group is
    * unbounded). The shingle universe (not the closed 31-token vocab)
    * is where per-source cardinality genuinely varies — ~800/source
    * at sf0.01, spanning the linear-counting/raw switchover.
    *
    * Arithmetic note: the per-group register sum is computed as
    * Σ_set 2^(24−rho) + (m − n_set)·2^24 — integer-identical to
    * [[hllSummary]]'s scaffold join over all m registers, without
    * materializing |groups|·m scaffold rows. Exact counts carried for
    * error accounting. */
  val tfHllBySource: Q = (s, d) => {
    val hs = keyedShingleHashes(docs(s, d), "source")
    val regs = regRhoOf(hs, "source")
      .groupBy(col("source"), col("reg")).agg(max(col("rho")).as("rho"))
    val summary = regs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_set"),
        sum(expr("shiftleft(cast(1 as bigint), cast(24 - rho as int))"))
          .as("sum_set"))
      .select(col("source"), col("n_set"),
        (col("sum_set") +
          (lit(HllRegisters) - col("n_set")) * lit(1L << 24))
          .as("sum_scaled"))
      .select(col("source"), col("n_set"), col("sum_scaled"),
        (lit(HllScale) / col("sum_scaled").cast("double")).as("est_raw"))
      .select(col("source"), col("n_set"), col("sum_scaled"),
        col("est_raw"),
        when(col("est_raw") <= lit(HllSmallRange) &&
            (lit(HllRegisters) - col("n_set")) > 0L,
          element_at(typedLit(HllLinearCount),
            (lit(HllRegisters) - col("n_set") + 1L).cast("int")))
          .otherwise(col("est_raw"))
          .as("est_distinct"))
    val exact = hs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_exact"))
    exact.join(summary, Seq("source"))
      .select(col("source"), col("n_exact"), col("n_set"),
        col("sum_scaled"), col("est_raw"), col("est_distinct"))
      .orderBy("source")
  }

  val defs: Map[String, Q] = Map(
    "tf_hll_by_source" -> tfHllBySource,
    "dedup_bloom_probe" -> dedupBloomProbe,
    "dedup_bloom_fpr" -> dedupBloomFpr,
    "dedup_kmv_distinct" -> dedupKmvDistinct,
    "dedup_kmv_merge" -> dedupKmvMerge,
    "dedup_kmv_overlap" -> dedupKmvOverlap,
    "dedup_kmv_matrix" -> dedupKmvMatrix,
    "tf_cms_counts" -> tfCmsCounts,
    "tf_heavy_hitters" -> tfHeavyHitters,
    "tf_heavy_delta" -> tfHeavyDelta,
    "tf_cms_merge" -> tfCmsMerge,
    "tf_hll_distinct" -> tfHllDistinct,
    "tf_hll_merge" -> tfHllMerge)

  // ------------------------------------------------------------------
  // DuckDB oracles (same constants, same arithmetic)
  // ------------------------------------------------------------------

  private def sqlIsNew =
    s"${Hashing.sqlCharHash("CAST(doc_id AS VARCHAR)")} % 10 = 7"

  /** [[HllLinearCount]] as a DuckDB list literal. Each element is a
    * STRING cast to DOUBLE: a bare numeric list literal unifies to
    * DECIMAL(20,16) in DuckDB, whose decimal->double conversion is
    * 1 ulp off the string->double parse (scaled-int division vs a
    * correctly-rounded parse) — the string cast round-trips Scala's
    * shortest-repr toString exactly. */
  private def sqlHllTable: String =
    HllLinearCount.map(v => s"'$v'::DOUBLE").mkString("[", ", ", "]")

  /** The per-register rho projection shared by the HLL oracles. */
  private def sqlRho(h: String): String =
    s"""CASE WHEN $h // $HllRegisters = 0 THEN CAST(24 AS BIGINT)
             ELSE CAST(24 - length(bin($h // $HllRegisters)) AS BIGINT)
        END"""

  /** The oracle for the STREAMING register monitor
    * (`stream_hll_monitor` in [[graft.operators.StreamOps]]): the
    * batch single-pass arithmetic over the whole corpus, WITHOUT the
    * exact distinct count — the monitor's entire point is that the
    * stream never stores the distinct token set, so its output carries
    * only what m registers can answer. Register MAX-merge across
    * micro-batches is exact, which is why a streaming replay can gate
    * HASH-EXACT against this batch SQL. Owned here because every
    * constant it interpolates is this object's. */
  private[graft] def sqlHllMonitorOracle: String =
    s"""WITH tok AS (
          SELECT unnest(${Hashing.sqlTokens("text")}) AS token
          FROM documents),
        hs AS (
          SELECT DISTINCT ${Hashing.sqlCharHash("token")} AS h FROM tok),
        regs AS (
          SELECT h % $HllRegisters AS reg, MAX(${sqlRho("h")}) AS rho
          FROM hs GROUP BY h % $HllRegisters),
        agg AS (
          SELECT
            CAST(SUM(CAST(1 AS BIGINT)
              << CAST(24 - COALESCE(g.rho, 0) AS INTEGER)) AS BIGINT)
              AS sum_scaled,
            CAST(SUM(CASE WHEN COALESCE(g.rho, 0) > 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_set
          FROM (SELECT unnest(range(0, $HllRegisters)) AS reg) rt
          LEFT JOIN regs g ON rt.reg = g.reg)
        SELECT CAST($HllRegisters AS BIGINT) AS n_registers,
          n_set, sum_scaled,
          CAST($HllScale AS DOUBLE) / CAST(sum_scaled AS DOUBLE)
            AS est_raw,
          ${sqlHllEst("sum_scaled", "n_set")} AS est_distinct
        FROM agg"""

  /** Corrected-estimate expression over (sum_scaled, n_set) columns. */
  private def sqlHllEst(sum: String, nset: String): String =
    s"""CASE WHEN CAST($HllScale AS DOUBLE) / CAST($sum AS DOUBLE)
               <= $HllSmallRange
             AND ($HllRegisters - $nset) > 0
        THEN ($sqlHllTable)[CAST($HllRegisters - $nset + 1 AS INTEGER)]
        ELSE CAST($HllScale AS DOUBLE) / CAST($sum AS DOUBLE) END"""

  /** KMV estimate expression over (n, kth) SQL columns — mirror of
    * [[kmvEst]], interpolating the same [[KmvScaleNum]]. */
  private def sqlKmvEst(n: String, kth: String): String =
    s"""CASE WHEN $n < $KmvK THEN CAST($n AS DOUBLE)
        ELSE CAST($KmvScaleNum AS DOUBLE) / CAST($kth AS DOUBLE) END"""

  /** The (tagged) shingle-hash projection: one row per shingle hash
    * with a pass-through expression, shared by every KMV oracle. */
  private def sqlShingleRows(tag: String): String =
    s"""tok AS (SELECT doc_id, source,
          ${Hashing.sqlTokens("text")} AS tk FROM documents),
        shl AS (SELECT $tag AS tag,
          unnest(${Hashing.sqlHashAll(Hashing.sqlShingles("tk"))}) AS h
          FROM tok WHERE length(tk) >= 3)"""

  /** Oracle for the STREAMING KMV monitor (`stream_kmv_monitor` in
    * [[graft.operators.StreamOps]]): the batch single-pass k-min
    * sample arithmetic WITHOUT the exact distinct count — the
    * monitor's point is that the stream keeps k hash values, never
    * the distinct shingle set. The k-min union-merge across
    * micro-batches is exact AND idempotent (set union + keep-k-min
    * absorbs batch replays for free), which is why the finite replay
    * gates HASH-EXACT against this batch SQL. */
  private[graft] def sqlKmvMonitorOracle: String =
    s"""WITH ${sqlShingleRows("0")},
          hs AS (SELECT DISTINCT h FROM shl),
          samp AS (SELECT h FROM hs ORDER BY h LIMIT $KmvK),
          agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_sample,
                    MAX(h) AS kth_min FROM samp)
        SELECT n_sample, kth_min,
          ${sqlKmvEst("n_sample", "kth_min")} AS est_distinct
        FROM agg"""

  // lazy: interpolates sibling-object constants (see TextOps.oracle)
  /** Per-k position list for the FPR-calibration oracle. */
  private def sqlCalPosList(k: Int): String =
    (0 until k).map(i => sqlSketchPos("fp", i, CalBloomBits))
      .mkString("[", ", ", "]")

  lazy val oracle: Map[String, String] = Map(
    // FPR calibration: one bloom/probe CTE pair per k, generated from
    // the same affine constants; exact-dup probes anti-joined away
    // before probing (a dup hit is correct, not false).
    "dedup_bloom_fpr" -> {
      val perK = (1 to BloomK).map { k =>
        s"""bloom$k AS MATERIALIZED (
             SELECT DISTINCT pos FROM (
               SELECT unnest(${sqlCalPosList(k)}) AS pos FROM fps)),
           pr$k AS (
             SELECT p.doc_id,
               CAST(SUM(CASE WHEN b.pos IS NOT NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS nhit
             FROM (SELECT doc_id, unnest(${sqlCalPosList(k)}) AS pos
                   FROM nm) p
             LEFT JOIN bloom$k b ON b.pos = p.pos
             GROUP BY p.doc_id),
           agg$k AS (
             SELECT CAST($k AS BIGINT) AS k,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM bloom$k)
                 AS bits_set,
               CAST(COUNT(*) AS BIGINT) AS n_probes,
               CAST(SUM(CASE WHEN nhit = $k THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_false_pos
             FROM pr$k)"""
      }.mkString(",\n         ")
      val unions = (1 to BloomK)
        .map(k => s"SELECT * FROM agg$k").mkString("\n           UNION ALL ")
      s"""WITH fps AS MATERIALIZED (
            SELECT DISTINCT ${Hashing.sqlCharHash("text")} AS fp
            FROM documents WHERE NOT ($sqlIsNew)),
          nm AS MATERIALIZED (
            SELECT doc_id, fp FROM (
              SELECT doc_id, ${Hashing.sqlCharHash("text")} AS fp
              FROM documents WHERE $sqlIsNew) probe
            WHERE fp NOT IN (SELECT fp FROM fps)),
          $perK
          SELECT k, bits_set,
            CAST(bits_set AS DOUBLE) / ${CalBloomBits.toDouble}
              AS occupancy,
            n_probes, n_false_pos,
            CASE WHEN n_probes > 0
              THEN CAST(n_false_pos AS DOUBLE) / CAST(n_probes AS DOUBLE)
              ELSE 0.0 END AS fpr
          FROM ($unions) z ORDER BY k"""
    },
    "tf_hll_by_source" ->
      s"""WITH ${sqlShingleRows("source")},
            hs AS (SELECT DISTINCT tag AS source, h FROM shl),
            regs AS (SELECT source, h % $HllRegisters AS reg,
                       MAX(${sqlRho("h")}) AS rho
                     FROM hs GROUP BY source, h % $HllRegisters),
            agg AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_set,
                      CAST(SUM(CAST(1 AS BIGINT)
                        << CAST(24 - rho AS INTEGER)) AS BIGINT)
                        AS sum_set
                    FROM regs GROUP BY source),
            summ AS (SELECT source, n_set,
                       CAST(sum_set + ($HllRegisters - n_set) * 16777216
                         AS BIGINT) AS sum_scaled
                     FROM agg),
            ex AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_exact
                   FROM hs GROUP BY source)
          SELECT ex.source, ex.n_exact, summ.n_set, summ.sum_scaled,
            CAST($HllScale AS DOUBLE) / CAST(summ.sum_scaled AS DOUBLE)
              AS est_raw,
            ${sqlHllEst("summ.sum_scaled", "summ.n_set")} AS est_distinct
          FROM ex JOIN summ ON ex.source = summ.source
          ORDER BY ex.source""",
    "dedup_kmv_distinct" ->
      s"""WITH ${sqlShingleRows("0")},
            hs AS (SELECT DISTINCT h FROM shl),
            samp AS (SELECT h FROM hs ORDER BY h LIMIT $KmvK),
            agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_sample,
                      MAX(h) AS kth_min FROM samp),
            ex AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_exact FROM hs)
          SELECT ex.n_exact, CAST($KmvK AS BIGINT) AS k, agg.n_sample,
            agg.kth_min,
            ${sqlKmvEst("agg.n_sample", "agg.kth_min")} AS est_distinct
          FROM ex, agg""",
    "dedup_kmv_merge" ->
      s"""WITH ${sqlShingleRows(
              Hashing.sqlCharHash("CAST(doc_id AS VARCHAR)") +
                s" % $HllShards")},
            shs AS (SELECT DISTINCT tag AS shard, h FROM shl),
            ss AS (SELECT shard, h FROM (
                     SELECT shard, h, row_number()
                       OVER (PARTITION BY shard ORDER BY h) AS rk
                     FROM shs) r WHERE rk <= $KmvK),
            merged AS (SELECT DISTINCT h FROM ss ORDER BY h LIMIT $KmvK),
            hs AS (SELECT DISTINCT h FROM shl),
            gsamp AS (SELECT h FROM hs ORDER BY h LIMIT $KmvK),
            mr AS (SELECT h AS mh, row_number() OVER (ORDER BY h) AS rk
                   FROM merged),
            gr AS (SELECT h AS gh, row_number() OVER (ORDER BY h) AS rk
                   FROM gsamp),
            diff AS (SELECT CAST(SUM(CASE WHEN COALESCE(mh, -1) =
                       COALESCE(gh, -2) THEN 0 ELSE 1 END) AS BIGINT)
                       AS n_rank_diff
                     FROM mr FULL OUTER JOIN gr ON mr.rk = gr.rk),
            ns AS (SELECT CAST(COUNT(DISTINCT shard) AS BIGINT)
                     AS n_shards FROM ss),
            ma AS (SELECT CAST(COUNT(*) AS BIGINT) AS merged_n_sample,
                     MAX(h) AS merged_kth FROM merged),
            ga AS (SELECT CAST(COUNT(*) AS BIGINT) AS gn, MAX(h) AS gk
                   FROM gsamp)
          SELECT ns.n_shards, ma.merged_n_sample, ma.merged_kth,
            ${sqlKmvEst("ma.merged_n_sample", "ma.merged_kth")}
              AS merged_est,
            ${sqlKmvEst("ga.gn", "ga.gk")} AS global_est,
            CAST(CASE WHEN COALESCE(diff.n_rank_diff, 0) = 0 THEN 1
              ELSE 0 END AS BIGINT) AS sample_identical
          FROM ns, ma, ga, diff""",
    "dedup_kmv_overlap" ->
      s"""WITH ${sqlShingleRows(Hashing.sqlCharHash("source") + " % 2")},
            ha AS (SELECT DISTINCT h FROM shl WHERE tag = 0),
            hb AS (SELECT DISTINCT h FROM shl WHERE tag = 1),
            sa AS (SELECT h FROM ha ORDER BY h LIMIT $KmvK),
            sb AS (SELECT h FROM hb ORDER BY h LIMIT $KmvK),
            su AS (SELECT DISTINCT h FROM (
                     SELECT h FROM sa UNION ALL SELECT h FROM sb) u
                   ORDER BY h LIMIT $KmvK),
            fl AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_union_sample,
                     MAX(su.h) AS kth_u,
                     CAST(SUM(CASE WHEN sa.h IS NOT NULL
                         AND sb.h IS NOT NULL THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_both
                   FROM su LEFT JOIN sa ON su.h = sa.h
                     LEFT JOIN sb ON su.h = sb.h),
            ea AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_a_exact FROM ha),
            eb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_b_exact FROM hb),
            aa AS (SELECT CAST(COUNT(*) AS BIGINT) AS na, MAX(h) AS ka
                   FROM sa),
            bb AS (SELECT CAST(COUNT(*) AS BIGINT) AS nb, MAX(h) AS kb
                   FROM sb),
            eu AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact_union FROM (
                     SELECT h FROM ha UNION SELECT h FROM hb) u2),
            ei AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact_intersection
                   FROM ha WHERE h IN (SELECT h FROM hb)),
            pre AS (SELECT ea.n_a_exact, eb.n_b_exact,
                ${sqlKmvEst("aa.na", "aa.ka")} AS est_a,
                ${sqlKmvEst("bb.nb", "bb.kb")} AS est_b,
                fl.n_union_sample, fl.n_both,
                ${sqlKmvEst("fl.n_union_sample", "fl.kth_u")} AS est_union,
                CASE WHEN fl.n_union_sample = 0 THEN NULL
                  ELSE CAST(fl.n_both AS DOUBLE)
                    / CAST(fl.n_union_sample AS DOUBLE) END AS est_jaccard,
                eu.exact_union, ei.exact_intersection,
                CASE WHEN eu.exact_union = 0 THEN NULL
                  ELSE CAST(ei.exact_intersection AS DOUBLE)
                    / CAST(eu.exact_union AS DOUBLE) END AS exact_jaccard
              FROM ea, eb, aa, bb, fl, eu, ei)
          SELECT n_a_exact, n_b_exact, est_a, est_b, n_union_sample,
            n_both, est_union, est_jaccard,
            est_jaccard * est_union AS est_intersection,
            exact_union, exact_intersection, exact_jaccard
          FROM pre""",
    "dedup_kmv_matrix" ->
      s"""WITH ${sqlShingleRows("source")},
            sh AS (SELECT DISTINCT tag AS source, h FROM shl),
            samp AS (
              SELECT source, h FROM (
                SELECT source, h, row_number() OVER
                  (PARTITION BY source ORDER BY h) AS rn
                FROM sh) z
              WHERE rn <= $KmvK),
            sums AS (
              SELECT e.source, e.n_exact,
                ${sqlKmvEst("s.n_sample", "s.kth")} AS est
              FROM (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_exact
                    FROM sh GROUP BY source) e
              JOIN (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sample,
                      MAX(h) AS kth
                    FROM samp GROUP BY source) s
                ON e.source = s.source),
            srcs AS (SELECT DISTINCT source FROM sh),
            pairs AS (
              SELECT a.source AS source_a, b.source AS source_b
              FROM srcs a, srcs b WHERE a.source < b.source),
            mem AS (
              SELECT source_a, source_b, h,
                MAX(ina) AS ina, MAX(inb) AS inb
              FROM (
                SELECT p.source_a, p.source_b, s.h,
                  CAST(1 AS BIGINT) AS ina, CAST(0 AS BIGINT) AS inb
                FROM pairs p JOIN samp s ON s.source = p.source_a
                UNION ALL
                SELECT p.source_a, p.source_b, s.h,
                  CAST(0 AS BIGINT) AS ina, CAST(1 AS BIGINT) AS inb
                FROM pairs p JOIN samp s ON s.source = p.source_b) u
              GROUP BY 1, 2, 3),
            agg AS (
              SELECT source_a, source_b,
                CAST(COUNT(*) AS BIGINT) AS n_union_sample,
                MAX(h) AS kth_u,
                CAST(SUM(ina * inb) AS BIGINT) AS n_both
              FROM (
                SELECT *, row_number() OVER
                  (PARTITION BY source_a, source_b ORDER BY h) AS rn
                FROM mem) z
              WHERE rn <= $KmvK
              GROUP BY 1, 2),
            pre AS (
              SELECT a.source_a, a.source_b,
                sa.n_exact AS n_a_exact, sb.n_exact AS n_b_exact,
                sa.est AS est_a, sb.est AS est_b,
                a.n_union_sample, a.n_both,
                ${sqlKmvEst("a.n_union_sample", "a.kth_u")} AS est_union,
                CAST(a.n_both AS DOUBLE)
                  / CAST(a.n_union_sample AS DOUBLE) AS est_jaccard
              FROM agg a
              JOIN sums sa ON a.source_a = sa.source
              JOIN sums sb ON a.source_b = sb.source)
          SELECT source_a, source_b, n_a_exact, n_b_exact, est_a, est_b,
            n_union_sample, n_both, est_union, est_jaccard,
            est_jaccard * est_union AS est_intersection
          FROM pre ORDER BY source_a, source_b""",
    "dedup_bloom_probe" ->
      s"""WITH fps AS (
            SELECT DISTINCT ${Hashing.sqlCharHash("text")} AS fp
            FROM documents WHERE NOT ($sqlIsNew)),
          bloom AS (
            SELECT DISTINCT unnest(${sqlPosList("fp", BloomBits, BloomK)})
              AS pos FROM fps),
          probe AS (
            SELECT doc_id, ${Hashing.sqlCharHash("text")} AS fp
            FROM documents WHERE $sqlIsNew),
          ppos AS (
            SELECT doc_id, unnest(${sqlPosList("fp", BloomBits, BloomK)})
              AS pos FROM probe),
          roll AS (
            SELECT p.doc_id,
              CAST(SUM(CASE WHEN b.pos IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_pos_hit
            FROM ppos p LEFT JOIN bloom b ON p.pos = b.pos
            GROUP BY p.doc_id),
          ex AS (
            SELECT p.doc_id,
              CAST(CASE WHEN f.fp IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
                AS exact_dup
            FROM probe p LEFT JOIN fps f ON p.fp = f.fp)
          SELECT r.doc_id, r.n_pos_hit,
            CAST(CASE WHEN r.n_pos_hit = $BloomK THEN 1 ELSE 0 END
              AS BIGINT) AS bloom_hit,
            e.exact_dup,
            CASE WHEN r.n_pos_hit = $BloomK AND e.exact_dup = 1 THEN 'dup'
                 WHEN r.n_pos_hit = $BloomK THEN 'false_positive'
                 ELSE 'new' END AS verdict
          FROM roll r JOIN ex e ON r.doc_id = e.doc_id
          ORDER BY r.doc_id""",
    "tf_cms_counts" -> {
      val h = Hashing.sqlCharHash("token")
      val rows = sqlCmsCells("hh")
      val pcells = sqlCmsCells("pr", "token, true_cnt")
      s"""WITH tok AS (
            SELECT unnest(${Hashing.sqlTokens("text")}) AS token
            FROM documents),
          truth AS (
            SELECT token, CAST(COUNT(*) AS BIGINT) AS true_cnt
            FROM tok GROUP BY token),
          hh AS (SELECT $h AS h FROM tok),
          cms AS (
            SELECT row, bucket, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
            $rows) z GROUP BY row, bucket),
          top AS (
            SELECT token, true_cnt FROM truth
            ORDER BY true_cnt DESC, token LIMIT $CmsProbeK),
          pr AS (SELECT token, true_cnt, $h AS h FROM top),
          pcell AS (
            $pcells)
          SELECT p.token, p.true_cnt,
            CAST(MIN(c.cnt) AS BIGINT) AS est_cnt,
            CAST(MIN(c.cnt) - p.true_cnt AS BIGINT) AS overcount
          FROM pcell p JOIN cms c ON p.row = c.row AND p.bucket = c.bucket
          GROUP BY p.token, p.true_cnt
          ORDER BY p.true_cnt DESC, p.token"""
    },
    "tf_heavy_delta" -> {
      val gate =
        s"${Hashing.sqlCharHash("CAST(doc_id AS VARCHAR)")} % 10 = 7"
      s"""WITH ${sqlHeavyCtes(s"NOT ($gate)", "b_")},
          ${sqlHeavyCtes("", "a_")}
          SELECT COALESCE(a.g, b.g) AS gram,
            CASE WHEN b.g IS NULL THEN 'emerging'
                 WHEN a.g IS NULL THEN 'vanished'
                 ELSE 'persistent' END AS status
          FROM a_heavy a FULL OUTER JOIN b_heavy b ON a.g = b.g
          ORDER BY gram"""
    },
    "tf_heavy_hitters" ->
      s"""WITH ${sqlHeavyCtes("")}
          SELECT c.g AS gram, c.est_cnt, x.true_cnt, thr.n_total,
            CASE WHEN x.true_cnt >= thr.t THEN 'heavy'
                 ELSE 'cms_false_positive' END AS verdict
          FROM cand c JOIN ex x ON c.g = x.g, thr
          ORDER BY x.true_cnt DESC, gram""",
    "tf_hll_distinct" ->
      s"""WITH tok AS (
            SELECT unnest(${Hashing.sqlTokens("text")}) AS token
            FROM documents),
          hs AS (
            SELECT DISTINCT ${Hashing.sqlCharHash("token")} AS h FROM tok),
          rr AS (
            SELECT h % $HllRegisters AS reg,
              CASE WHEN h // $HllRegisters = 0 THEN CAST(24 AS BIGINT)
                   ELSE CAST(24 - length(bin(h // $HllRegisters)) AS BIGINT)
              END AS rho
            FROM hs),
          regs AS (SELECT reg, MAX(rho) AS rho FROM rr GROUP BY reg),
          al AS (
            SELECT COALESCE(g.rho, CAST(0 AS BIGINT)) AS rho
            FROM (SELECT unnest(range(0, $HllRegisters)) AS reg) rt
            LEFT JOIN regs g ON rt.reg = g.reg),
          agg AS (
            SELECT
              CAST(SUM(CAST(1 AS BIGINT) << CAST(24 - rho AS INTEGER))
                AS BIGINT) AS sum_scaled,
              CAST(SUM(CASE WHEN rho > 0 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_set
            FROM al),
          ex AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_exact FROM hs),
          fin AS (
            SELECT ex.n_exact,
              CAST($HllRegisters AS BIGINT) AS n_registers,
              agg.n_set, agg.sum_scaled,
              CAST($HllScale AS DOUBLE) / CAST(agg.sum_scaled AS DOUBLE)
                AS est_raw
            FROM ex, agg)
          SELECT n_exact, n_registers, n_set, sum_scaled, est_raw,
            CASE WHEN est_raw <= $HllSmallRange
                   AND (n_registers - n_set) > 0
              THEN ($sqlHllTable)
                     [CAST(n_registers - n_set + 1 AS INTEGER)]
              ELSE est_raw END AS est_distinct
          FROM fin""",
    "tf_cms_merge" -> {
      val h = Hashing.sqlCharHash("token")
      val shardedCells = sqlCmsCells("hh", "shard")
      val globalCells = sqlCmsCells("hh")
      s"""WITH tok AS (
            SELECT doc_id, unnest(${Hashing.sqlTokens("text")}) AS token
            FROM documents),
          hh AS (
            SELECT ${Hashing.sqlCharHash("CAST(doc_id AS VARCHAR)")}
              % $HllShards AS shard, $h AS h
            FROM tok),
          scells AS (
            $shardedCells),
          sharded AS (
            SELECT shard, row, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM scells GROUP BY shard, row, bucket),
          merged AS (
            SELECT row, bucket, CAST(SUM(cnt) AS BIGINT) AS cnt
            FROM sharded GROUP BY row, bucket),
          gcells AS (
            $globalCells),
          gmat AS (
            SELECT row, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM gcells GROUP BY row, bucket),
          diff AS (
            SELECT CAST(SUM(CASE WHEN COALESCE(m.cnt, -1)
                = COALESCE(g.cnt, -2) THEN 0 ELSE 1 END) AS BIGINT)
              AS n_diff
            FROM merged m FULL JOIN gmat g
              ON m.row = g.row AND m.bucket = g.bucket),
          ns AS (
            SELECT CAST(COUNT(DISTINCT shard) AS BIGINT) AS n_shards
            FROM sharded),
          mstats AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
              CAST(SUM(cnt) AS BIGINT) AS sum_count
            FROM merged)
          SELECT ns.n_shards, mstats.n_cells, mstats.sum_count,
            CAST(CASE WHEN COALESCE(diff.n_diff, 0) = 0
              THEN 1 ELSE 0 END AS BIGINT) AS cells_identical
          FROM ns, mstats, diff"""
    },
    "tf_hll_merge" ->
      s"""WITH tok AS (
            SELECT doc_id, unnest(${Hashing.sqlTokens("text")}) AS token
            FROM documents),
          hs AS (
            SELECT doc_id, ${Hashing.sqlCharHash("token")} AS h FROM tok),
          sh AS (
            SELECT DISTINCT
              ${Hashing.sqlCharHash("CAST(doc_id AS VARCHAR)")}
                % $HllShards AS shard, h
            FROM hs),
          sregs AS (
            SELECT shard, h % $HllRegisters AS reg,
              MAX(${sqlRho("h")}) AS rho
            FROM sh GROUP BY shard, h % $HllRegisters),
          merged AS (SELECT reg, MAX(rho) AS rho FROM sregs GROUP BY reg),
          gregs AS (
            SELECT h % $HllRegisters AS reg, MAX(${sqlRho("h")}) AS rho
            FROM (SELECT DISTINCT h FROM hs) z GROUP BY h % $HllRegisters),
          m_agg AS (
            SELECT
              CAST(SUM(CAST(1 AS BIGINT)
                << CAST(24 - COALESCE(g.rho, 0) AS INTEGER)) AS BIGINT)
                AS sum_scaled,
              CAST(SUM(CASE WHEN COALESCE(g.rho, 0) > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_set
            FROM (SELECT unnest(range(0, $HllRegisters)) AS reg) rt
            LEFT JOIN merged g ON rt.reg = g.reg),
          g_agg AS (
            SELECT
              CAST(SUM(CAST(1 AS BIGINT)
                << CAST(24 - COALESCE(g.rho, 0) AS INTEGER)) AS BIGINT)
                AS sum_scaled,
              CAST(SUM(CASE WHEN COALESCE(g.rho, 0) > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_set
            FROM (SELECT unnest(range(0, $HllRegisters)) AS reg) rt
            LEFT JOIN gregs g ON rt.reg = g.reg),
          ns AS (
            SELECT CAST(COUNT(DISTINCT shard) AS BIGINT) AS n_shards
            FROM sh),
          rdiff AS (
            SELECT CAST(SUM(CASE WHEN COALESCE(m.rho, -1)
                = COALESCE(g.rho, -2) THEN 0 ELSE 1 END) AS BIGINT)
              AS n_reg_diff
            FROM merged m FULL JOIN gregs g ON m.reg = g.reg)
          SELECT ns.n_shards,
            m_agg.sum_scaled AS merged_sum_scaled,
            m_agg.n_set AS merged_n_set,
            ${sqlHllEst("m_agg.sum_scaled", "m_agg.n_set")} AS merged_est,
            ${sqlHllEst("g_agg.sum_scaled", "g_agg.n_set")} AS global_est,
            CAST(CASE WHEN COALESCE(rdiff.n_reg_diff, 0) = 0
              THEN 1 ELSE 0 END AS BIGINT) AS registers_identical
          FROM ns, m_agg, g_agg, rdiff""")
}
