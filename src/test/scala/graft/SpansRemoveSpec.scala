package graft

import graft.operators.DedupOps

/** Pins for `dedup_spans_remove`: a driver-side recomputation of the
  * ownership policy, consistency with the span report, and the
  * canonical-copy guarantee on a planted twin (the min-holder keeps
  * the passage verbatim; the other doc sheds exactly it).
  */
class SpansRemoveSpec extends SparkSpec {

  private val W = DedupOps.SpanW

  private def toks(text: String): Vector[String] =
    text.split(" ").filter(_.nonEmpty).toVector

  test("matches a driver-side recomputation of window ownership at " +
      "sf0.001") {
    val texts = spark.read.parquet(s"$Sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val wins = texts.toSeq.flatMap { case (id, t) =>
      val tk = toks(t)
      if (tk.length < W) Seq.empty
      else tk.sliding(W).zipWithIndex.map { case (w, i) =>
        (id, i + 1, w.mkString(" ")) }.toSeq
    }
    val holders = wins.groupBy(_._3).view
      .mapValues(ws => (ws.map(_._1).min, ws.map(_._1).distinct.size))
      .toMap
    val removedByDoc = wins
      .filter { case (id, _, w) =>
        val (owner, nd) = holders(w); nd >= 2 && id != owner }
      .flatMap { case (id, p, _) => (p until p + W).map(id -> _) }
      .toSet
    val rows = SparkEntry.queries("dedup_spans_remove")(spark, Sf)
      .collect()
    assert(rows.length == texts.size, "every doc must emit a row")
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val tk = toks(texts(id))
      val keptWant = tk.zipWithIndex
        .collect { case (t, i) if !removedByDoc(id -> (i + 1)) => t }
      assert(r.getAs[Long]("n_tokens") == tk.length.toLong, s"doc $id")
      assert(r.getAs[Long]("n_removed") ==
        (tk.length - keptWant.length).toLong, s"doc $id")
      assert(r.getAs[String]("cleaned_text") == keptWant.mkString(" "),
        s"doc $id")
    }
  }

  test("removal never exceeds the report's span coverage and spares " +
      "report-absent docs") {
    val report = SparkEntry.queries("dedup_substring_spans")(spark, Sf)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("dup_tokens"))
      .toMap
    SparkEntry.queries("dedup_spans_remove")(spark, Sf).collect()
      .foreach { r =>
        val id = r.getAs[Long]("doc_id")
        val removed = r.getAs[Long]("n_removed")
        report.get(id) match {
          case Some(cover) => assert(removed <= cover, s"doc $id")
          case None => assert(removed == 0L,
            s"doc $id has no duplicated window yet lost tokens")
        }
      }
  }

  test("planted twin: the min-holder keeps the shared passage " +
      "verbatim; the other doc sheds exactly it") {
    import spark.implicits._
    val passage = (1 to 20).map(i => s"p$i").mkString(" ")
    val pre1 = (1 to 10).map(i => s"a$i").mkString(" ")
    val pre2 = (1 to 6).map(i => s"b$i").mkString(" ")
    val d1 = s"$pre1 $passage"
    val d2 = s"$pre2 $passage"
    val dir = tmpDir("spans-remove")
    Seq((1L, d1), (2L, d2))
      .map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val out = DedupOps.dedupSpansRemove(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_removed") == 0L,
      "the canonical holder must keep its copy")
    assert(out(1L).getAs[String]("cleaned_text") == d1)
    assert(out(2L).getAs[Long]("n_removed") == 20L,
      "the twin sheds exactly the passage")
    assert(out(2L).getAs[String]("cleaned_text") == pre2)
  }
}
