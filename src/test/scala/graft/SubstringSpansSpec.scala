package graft

import graft.operators.DedupOps

/** Pins for `dedup_substring_spans` (the Lee et al. exact-substring
  * tier): a driver-side recomputation of duplicated-window positions
  * and span merging from raw texts, a planted shared-passage corpus
  * whose maximal span (not just its windows) must surface with exact
  * token coverage, and the structural bounds that keep the report
  * consumable as a removal policy input.
  */
class SubstringSpansSpec extends SparkSpec {

  private val W = DedupOps.SpanW

  private def toks(text: String): Vector[String] =
    text.split(" ").filter(_.nonEmpty).toVector

  /** Driver-side mirror: per doc, positions (1-based) of W-token
    * windows whose window TEXT occurs in >= 2 distinct docs, merged
    * into maximal islands (gap <= W). */
  private def refSpans(texts: Map[Long, String])
      : Map[Long, Seq[(Long, Long, Long)]] = {
    val wins: Seq[(Long, Int, String)] = texts.toSeq.flatMap {
      case (id, t) =>
        val tk = toks(t)
        if (tk.length < W) Seq.empty
        else tk.sliding(W).zipWithIndex.toSeq.map {
          case (win, i) => (id, i + 1, win.mkString(" "))
        }
    }
    val dup = wins.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= 2)
      .keySet
    wins.filter(w => dup(w._3)).groupBy(_._1).map { case (id, ws) =>
      val ps = ws.map(_._2).sorted
      val islands = ps.foldLeft(Vector.empty[Vector[Int]]) { (acc, p) =>
        if (acc.nonEmpty && p - acc.last.last <= W)
          acc.init :+ (acc.last :+ p)
        else acc :+ Vector(p)
      }
      id -> islands.map(i =>
        (i.head.toLong, i.last.toLong, i.size.toLong))
    }
  }

  test("matches a driver-side recomputation from raw texts at sf0.001") {
    val texts = spark.read.parquet(s"$Sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = refSpans(texts)
    val rows = SparkEntry.queries("dedup_substring_spans")(spark, Sf)
      .collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSet == want.keySet)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val spans = want(id)
      assert(r.getAs[Long]("n_tokens") == toks(texts(id)).length.toLong)
      assert(r.getAs[Long]("n_spans") == spans.size.toLong, s"doc $id")
      assert(r.getAs[Long]("n_dup_windows") == spans.map(_._3).sum,
        s"doc $id")
      val cover = spans.map { case (fp, lp, _) => lp - fp + W }
      assert(r.getAs[Long]("dup_tokens") == cover.sum, s"doc $id")
      assert(r.getAs[Long]("longest_span") == cover.max, s"doc $id")
    }
  }

  test("a planted shared passage surfaces as ONE maximal span with " +
      "exact token coverage; unique docs emit no row") {
    import spark.implicits._
    // 20-token passage shared verbatim by docs 1 and 2, embedded in
    // otherwise-disjoint surroundings; doc 3 is entirely unique.
    val passage = (1 to 20).map(i => s"p$i").mkString(" ")
    val a = (1 to 15).map(i => s"a$i").mkString(" ") + " " + passage +
      " " + (1 to 7).map(i => s"z$i").mkString(" ")
    val b = (1 to 9).map(i => s"b$i").mkString(" ") + " " + passage
    val c = (1 to 40).map(i => s"c$i").mkString(" ")
    val dir = tmpDir("span-planted")
    Seq((1L, a), (2L, b), (3L, c))
      .map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val rows = DedupOps.dedupSubstringSpans(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows.keySet == Set(1L, 2L), s"got ${rows.keySet}")
    // the 20-token passage holds 20-W+1 = 13 duplicated windows that
    // merge into one island covering exactly the 20 passage tokens
    Seq(1L, 2L).foreach { id =>
      val r = rows(id)
      assert(r.getAs[Long]("n_spans") == 1L, s"doc $id")
      assert(r.getAs[Long]("n_dup_windows") == (20 - W + 1).toLong,
        s"doc $id")
      assert(r.getAs[Long]("dup_tokens") == 20L, s"doc $id")
      assert(r.getAs[Long]("longest_span") == 20L, s"doc $id")
    }
  }

  test("ANY intervening unique token keeps two passages as separate " +
      "spans; adjacent passages merge into one") {
    import spark.implicits._
    def words(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")
    val p1 = words("x", 10)
    val p2 = words("y", 10)
    // doc 2 carries p1 and p2 with its OWN surroundings, so only the
    // passages themselves are corpus-duplicated
    val other = s"${words("h", 5)} $p1 ${words("k", 15)} $p2"
    def run(docOne: String): (Long, Long) = {
      val dir = tmpDir("span-gaps")
      Seq((1L, docOne), (2L, other))
        .map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")
      val r = DedupOps.dedupSubstringSpans(spark, dir).collect()
        .map(r => r.getAs[Long]("doc_id") -> r).toMap.apply(1L)
      (r.getAs[Long]("n_spans"), r.getAs[Long]("dup_tokens"))
    }
    // one unique token between the passages: window-start distance is
    // W+1 > W, i.e. the coverages don't touch — two spans, and the
    // separator token never counts as duplicated
    assert(run(s"$p1 g1 $p2") == ((2L, 20L)),
      "a single unique token must split the spans")
    // adjacent passages: distance exactly W — coverages abut, one
    // span covering all 20 tokens (windows straddling the boundary
    // are unique to doc 1 and contribute nothing)
    assert(run(s"$p1 $p2") == ((1L, 20L)),
      "abutting coverage must merge into one maximal span")
  }

  test("structural bounds: coverage never exceeds doc length, " +
      "windows never exceed coverage opportunities") {
    SparkEntry.queries("dedup_substring_spans")(spark, Sf).collect()
      .foreach { r =>
        val n = r.getAs[Long]("n_tokens")
        val dup = r.getAs[Long]("dup_tokens")
        val spans = r.getAs[Long]("n_spans")
        val winds = r.getAs[Long]("n_dup_windows")
        assert(dup >= W && dup <= n)
        assert(r.getAs[Long]("longest_span") <= dup)
        assert(spans >= 1L && winds >= spans)
        assert(winds <= n - W + 1)
      }
  }
}
