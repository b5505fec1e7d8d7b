package graft

/** Semantic pins for the substring-level dedup tier (`text_cdc_dedup`):
  * the cross-doc quote/mirror case — a LONG passage duplicated in
  * exactly TWO documents — must surface even when everything around
  * the passage differs (df=2 is below the boilerplate df-gate, and a
  * few hundred shared bytes inside otherwise-different documents is
  * below the doc-level shingle tiers' similarity threshold).
  */
class SubstrDedupSpec extends SparkSpec {
  import graft.operators.DedupOps

  /** Deterministic printable-ASCII junk, distinct per seed. */
  private def junk(seed: Long, n: Int): String = {
    val r = new scala.util.Random(seed)
    (1 to n).map(_ => ('a' + r.nextInt(26)).toChar).mkString
  }

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = tmpDir("substr-dedup")
    rows.map { case (id, t) => (id, t, "en", "synthetic", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("a df=2 passage surfaces with re-synchronized chunks despite " +
      "different surroundings; unrelated docs never pair") {
    val passage = junk(42L, 600)
    val dir = writeDocs(Seq(
      // the shared passage sits at DIFFERENT offsets — fixed-range
      // chunking would mis-align; CDC re-synchronizes 8 bytes in
      1L -> (junk(1L, 37) + passage + junk(2L, 200)),
      2L -> (junk(3L, 411) + passage + junk(4L, 90)),
      3L -> junk(5L, 700),
      4L -> junk(6L, 700)))
    val out = SparkEntry.queries("text_cdc_dedup")(spark, dir).collect()
    val pairs = out.map(r =>
      (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs === Set((1L, 2L)),
      s"expected exactly the df=2 quote pair, got $pairs")
    val row = out.head
    assert(row.getAs[Long]("shared_bytes") >= DedupOps.MinSharedBytes)
    // most of the passage must be recovered: everything between the
    // first and last interior CDC boundary is shared by construction
    assert(row.getAs[Long]("shared_bytes") >= 300,
      s"CDC failed to re-synchronize: only ${row.getAs[Long]("shared_bytes")} shared bytes")
    assert(row.getAs[Long]("n_shared_chunks") >= 3)
  }

  test("removal pass: the canonical owner keeps the passage, the " +
      "later doc loses it, untouched docs round-trip byte-for-byte") {
    val passage = junk(42L, 600)
    val t1 = junk(1L, 37) + passage + junk(2L, 200)
    val t2 = junk(3L, 411) + passage + junk(4L, 90)
    val t3 = junk(5L, 700)
    val t4 = junk(6L, 700)
    val dir = writeDocs(Seq(1L -> t1, 2L -> t2, 3L -> t3, 4L -> t4))
    val out = SparkEntry.queries("text_cdc_remove")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // owner (min id) keeps everything, so it round-trips exactly
    assert(out(1L).getAs[String]("clean_text") === t1)
    // the later doc loses the shared interior: strictly shorter, and
    // a mid-passage window must be gone
    val clean2 = out(2L).getAs[String]("clean_text")
    assert(clean2.length < t2.length)
    assert(!clean2.contains(passage.substring(200, 280)),
      "mid-passage bytes must be stripped from the non-owner")
    assert(out(2L).getAs[Long]("n_kept") < out(2L).getAs[Long]("n_chunks"))
    // docs sharing nothing are untouched
    assert(out(3L).getAs[String]("clean_text") === t3)
    assert(out(4L).getAs[String]("clean_text") === t4)
    out.values.foreach { r =>
      assert(r.getAs[Long]("clean_len") ===
        r.getAs[String]("clean_text").length.toLong)
    }
  }

  test("non-ASCII documents round-trip byte-for-byte through the " +
      "removal pass") {
    // 2-byte (é, ö) and 3-byte (—) UTF-8 sequences: byte offsets and
    // char offsets diverge, so the round-6 reassembly — which sliced
    // the STRING with CDC's BYTE offsets — corrupted exactly these
    // docs; the binary-slice reassembly must round-trip them exactly
    val t1 = "héllo wörld — çafé übër " * 40
    val t2 = junk(7L, 700)
    val dir = writeDocs(Seq(1L -> t1, 2L -> t2))
    val out = SparkEntry.queries("text_cdc_remove")(spark, dir)
      .collect().map(r =>
        r.getAs[Long]("doc_id") -> r.getAs[String]("clean_text")).toMap
    assert(out(1L) === t1,
      "untouched non-ASCII doc must round-trip exactly")
    assert(out(2L) === t2)
  }

  test("a boilerplate-frequency chunk (df > MaxChunkDf) is excluded " +
      "from pair generation") {
    // 70 docs all carrying the same passage: df=70 > MaxChunkDf=64,
    // so the substring tier must stay silent (that family belongs to
    // text_boilerplate_* / its removal pass)
    val passage = junk(7L, 600)
    val dir = writeDocs((1L to 70L).map(i =>
      i -> (junk(100 + i, 50) + passage + junk(200 + i, 50))))
    val out = SparkEntry.queries("text_cdc_dedup")(spark, dir).collect()
    assert(out.isEmpty,
      s"df>cap digests must not generate pairs, got ${out.length} rows")
  }
}
