package graft

/** The `spark.sql` front door: a user can register the tables as views
  * and run whole queries as SQL strings — including the engine's
  * custom functions — and get exactly what the Column API computes. */
class SqlSurfaceSpec extends SparkSpec {

  private def registerViews(): Unit =
    graft.sources.Tables.all.foreach { t =>
      graft.sources.Tables.load(spark, Sf, t).createOrReplaceTempView(t)
    }

  test("a TPC-H-style query runs as one SQL string, equal to the Column API") {
    registerViews()
    val viaSql = spark.sql(
      """SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(8,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS count_order
         FROM lineitem
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""").collect()
    val viaCol = SparkEntry.queries("q1_pricing_summary")(spark, Sf)
      .select("l_returnflag", "l_linestatus", "sum_qty", "count_order")
      .collect()
    assert(viaSql.toSeq === viaCol.toSeq)
  }

  test("a k-means assignment runs as one SQL string via graft_sq_dist") {
    registerViews()
    val viaSql = spark.sql(
      s"""WITH cent AS (
            SELECT CAST(e.label AS BIGINT) AS clabel,
              array_sort(collect_list(struct(dim, mean))).mean AS c
            FROM (
              SELECT label, pos AS dim,
                CAST(SUM(CAST(CAST(v AS STRING) AS DECIMAL(30,20)))
                  AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean
              FROM embeddings LATERAL VIEW posexplode(embedding) AS pos, v
              GROUP BY label, pos) e
            GROUP BY e.label)
          SELECT vec_id, assigned, dist FROM (
            SELECT vec_id, clabel AS assigned,
              graft_sq_dist(embedding, c) AS dist,
              ROW_NUMBER() OVER (PARTITION BY vec_id
                ORDER BY graft_sq_dist(embedding, c), clabel) AS rn
            FROM embeddings CROSS JOIN cent) z
          WHERE rn = 1 ORDER BY vec_id""").collect()
    val viaCol = SparkEntry.queries("kmeans_assign")(spark, Sf)
      .select("vec_id", "assigned", "dist").collect()
    assert(viaSql.toSeq === viaCol.toSeq)
  }

  test("BPE pair counting runs as one SQL string via graft_bigrams") {
    registerViews()
    val viaSql = spark.sql(
      """WITH words AS (
           SELECT t AS word, COUNT(*) AS freq
           FROM (SELECT explode(graft_tokens(text)) AS t FROM documents)
           GROUP BY t),
         r0 AS (
           SELECT freq,
             concat('  ', concat_ws('  ', split(word, '')), '  ') AS repr
           FROM words),
         p AS (
           SELECT g AS gram, SUM(freq) AS c
           FROM (SELECT freq,
                   explode(graft_bigrams(split(trim(repr), '  '))) AS g
                 FROM r0)
           GROUP BY g)
         SELECT gram AS pair, split_part(gram, ' ', 1) AS left_sym,
           split_part(gram, ' ', 2) AS right_sym, c AS n
         FROM (SELECT gram, c FROM p ORDER BY c DESC, gram LIMIT 20) t
         ORDER BY n DESC, pair""").collect()
    val viaCol = SparkEntry.queries("tf_bpe_pairs")(spark, Sf).collect()
    assert(viaSql.toSeq === viaCol.toSeq)
  }

  test("custom functions compose with joins and aggregation in SQL") {
    registerViews()
    val r = spark.sql(
      """SELECT graft_lsh_bucket(embedding) AS bucket, COUNT(*) AS n
         FROM embeddings GROUP BY bucket ORDER BY bucket""").collect()
    val expected = SparkEntry.queries("ann_lsh_buckets")(spark, Sf)
      .select("bucket", "n").collect()
    assert(r.toSeq === expected.toSeq)
  }

  test("the wide dual-base hash is SQL-reachable and decomposes as " +
      "h31 * P + h37") {
    registerViews()
    val p = graft.functions.Hashing.P
    // upper limb of the packed wide hash must BE the base-31 hash,
    // for every document text, straight from SQL
    val bad = spark.sql(
      s"""SELECT COUNT(*) AS n FROM (
            SELECT graft_char_hash_wide_all(array(text))[0] AS wh,
              graft_char_hash(text) AS h31
            FROM documents)
          WHERE wh div ${p}L != h31 OR wh % ${p}L < 0
            OR wh % ${p}L >= ${p}L""").collect().head.getLong(0)
    assert(bad == 0L)
  }
}
