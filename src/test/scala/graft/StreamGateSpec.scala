package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.functions.Hashing
import graft.operators.DedupOps

/** Pins for the streaming near-dup ingest gate
  * (`stream_neardup_candidates`): the stream-static candidate join
  * must keep ZERO state (it is the unbounded-safe ingest shape) and
  * must emit exactly what the equivalent batch join computes.
  */
class StreamGateSpec extends SparkSpec {
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  private def isNew(c: org.apache.spark.sql.Column) =
    Hashing.charHash(c.cast("string")) % 10 === 7

  test("streaming semi interval join equals the batch EXISTS rollup") {
    val stream = graft.operators.StreamOps
      .streamConversionWindow(spark, Sf).collect()
    val perDay = stream
      .groupBy(r => r.getAs[Long]("view_tsec") / 86400 * 86400)
      .view.mapValues(_.length.toLong).toMap
    val batch = graft.operators.EventOps
      .evConversionWindow(spark, Sf).collect()
      .map(r => r.getAs[Long]("day_sec") -> r.getAs[Long]("n_converted"))
      .filter(_._2 > 0L).toMap
    assert(perDay === batch,
      "per-day converted-view counts must match between the streaming " +
        "semi join and the batch EXISTS")
    assert(stream.map(_.getAs[Long]("view_id")).distinct.length ===
      stream.length, "a view converts at most once (semi, not inner)")
  }

  test("streaming histogram merges micro-batch partials into exactly " +
      "the batch histogram") {
    val stream = graft.operators.StreamOps
      .streamHistogram(spark, Sf).collect()
      .map(r => r.getAs[Long]("bin") -> r.getAs[Long]("n")).toMap
    val batch = graft.sources.Tables.events(spark, Sf)
      .filter(org.apache.spark.sql.functions.col("value").isNotNull)
      .groupBy(org.apache.spark.sql.functions
        .floor(org.apache.spark.sql.functions.col("value") / 10.0)
        .cast("long").as("bin"))
      .count().collect()
      .map(r => r.getAs[Long]("bin") -> r.getAs[Long]("count")).toMap
    assert(stream === batch,
      "the associative histogram must be replay-exact — partial " +
        "micro-batch counts merge by addition")
  }

  test("ingest gate is stateless and equals its batch mirror") {
    val batchDocs = spark.read.parquet(s"$Sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val corpusIdx = DedupOps.bucketRows(batchDocs)
      .filter(!isNew(col("doc_id")))
      .select(col("band"), col("bucket"), col("doc_id").as("cand_id"))

    val in = MemoryStream[(Long, String)]
    in.addData(batchDocs.as[(Long, String)].collect().toSeq: _*)
    val stream = in.toDF.toDF("doc_id", "text")
    val hits = DedupOps.bucketRows(stream)
      .filter(isNew(col("doc_id")))
      .join(corpusIdx, Seq("band", "bucket"))
      .select(col("doc_id"), col("band"), col("bucket"), col("cand_id"))

    val q = hits.writeStream.format("memory").queryName("gate_spec")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(q.recentProgress.flatMap(_.stateOperators).isEmpty,
      "the ingest gate must not allocate any state store")

    val got = spark.table("gate_spec")
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    val expected = DedupOps.bucketRows(batchDocs)
      .filter(isNew(col("doc_id")))
      .join(corpusIdx, Seq("band", "bucket"))
      .select(col("doc_id"), col("band"), col("bucket"), col("cand_id"))
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(got.nonEmpty, "sf0.001 must produce at least one candidate hit")
    assert(got === expected)

    // every emitted row respects the tagging: incoming is_new, the
    // candidate corpus-side
    got.foreach { r =>
      val Seq(docId, _, _, candId) = r.map(_.asInstanceOf[Long])
      def tag(id: Long) = {
        var h = 0L
        id.toString.foreach(c => h = (h * 31 + c.toLong) % Hashing.P)
        h % 10 == 7
      }
      assert(tag(docId) && !tag(candId))
    }
  }

  test("substring-dedup gate is stateless and equals its batch mirror") {
    import graft.operators.MultimodalOps
    val corpus = MultimodalOps.chunkStore(spark, Sf)
      .filter(!isNew(col("doc_id")))
      .select(col("doc_id").as("cand_id"), col("chunk_md5"))
      .distinct()
    val rare = corpus.groupBy("chunk_md5")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= graft.operators.DedupOps.MaxChunkDf)
      .select("chunk_md5")
    val eligible = corpus.join(rare, Seq("chunk_md5"), "left_semi")

    val batchDocs = spark.read.parquet(s"$Sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val in = MemoryStream[(Long, String)]
    in.addData(batchDocs.as[(Long, String)].collect().toSeq: _*)
    def gate(src: org.apache.spark.sql.DataFrame) =
      MultimodalOps.chunkDigestRows(src)
        .filter(isNew(col("doc_id")))
        .join(eligible, Seq("chunk_md5"))
        .select(col("doc_id"), col("chunk_md5"), col("cand_id"))
    val q = gate(in.toDF.toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("cdc_gate_spec")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(q.recentProgress.flatMap(_.stateOperators).isEmpty,
      "the substring gate must not allocate any state store")

    val got = spark.table("cdc_gate_spec")
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    val expected = gate(batchDocs)
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(got.nonEmpty, "sf0.001 must produce at least one chunk hit")
    assert(got === expected)
  }

  test("substring STRIP gate keeps zero streaming state and is " +
      "byte-equal to its batch mirror") {
    import graft.operators.MultimodalOps
    val corpusOwned = MultimodalOps.chunkStore(spark, Sf)
      .filter(!isNew(col("doc_id")))
      .groupBy(col("chunk_md5"))
      .agg(countDistinct(col("doc_id")).as("dfd"))
      .filter(col("dfd") <= DedupOps.MaxChunkDf)
      .select(col("chunk_md5"), lit(-1L).as("owner"))
    val incoming = spark.read.parquet(s"$Sf/documents.parquet")
      .select(col("doc_id"), col("text"))
      .filter(isNew(col("doc_id")))
    val expected = DedupOps.cdcStripAgainst(incoming, corpusOwned)
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(expected.nonEmpty, "sf0.001 must have incoming docs to strip")

    // the deployed gate, end to end (foreachBatch + parquet sink)
    val got = SparkEntry.queries("stream_cdc_strip")(spark, Sf)
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(got === expected,
      "the streaming strip must be byte-equal to the batch strip")

    // statelessness pinned on the same shape driven by MemoryStream:
    // the grouping lives INSIDE each micro-batch's batch job, never
    // in a streaming state store
    val in = MemoryStream[(Long, String)]
    in.addData(incoming.as[(Long, String)].collect().toSeq: _*)
    val outDir = tmpDir("strip-gate")
    val q = in.toDF.toDF("doc_id", "text")
      .writeStream.trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        DedupOps.cdcStripAgainst(b, corpusOwned)
          .write.mode("append").parquet(outDir)
      }
      .start()
    q.awaitTermination()
    assert(q.recentProgress.flatMap(_.stateOperators).isEmpty,
      "the strip gate must not allocate any state store")
    val viaMemStream = spark.read.parquet(outDir)
      .select(col("doc_id"), col("n_chunks"), col("n_kept"),
        col("clean_text"), col("clean_len"))
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(viaMemStream === expected)
  }

  test("unigram gate quarantines OOV-heavy docs and admits the rest, " +
      "equal to its batch mirror") {
    import graft.functions.Hashing
    val gated = SparkEntry.queries("stream_unigram_gate")(spark, Sf)
      .collect()
    assert(gated.nonEmpty)
    // batch mirror: score is_new docs against the non-new tf table
    val corpusTf = spark.read.parquet(s"$Sf/documents.parquet")
      .filter(!isNew(col("doc_id")))
      .select(explode(Hashing.tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("tf"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val incoming = spark.read.parquet(s"$Sf/documents.parquet")
      .filter(isNew(col("doc_id")))
      .select(col("doc_id"), Hashing.tokens(col("text")).as("toks"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[String](1))
      .filter(_._2.nonEmpty).toMap
    assert(gated.length === incoming.size)
    gated.foreach { r =>
      val toks = incoming(r.getAs[Long]("doc_id"))
      val oov = toks.count(t => !corpusTf.contains(t)).toLong
      assert(r.getAs[Long]("n_tokens") === toks.length.toLong)
      assert(r.getAs[Long]("n_oov") === oov)
      val expectDecision =
        if (oov * 4 > toks.length) "quarantined_oov" else "admitted"
      assert(r.getAs[String]("decision") === expectDecision)
    }
    // both routes occur on the fixture (the gate must actually gate)
    val decisions = gated.map(_.getAs[String]("decision")).toSet
    assert(decisions.contains("admitted"))
  }

  test("affinity gate routes by the corpus-fitted sign-test model, " +
      "equal to a driver-side mirror") {
    def buckets(text: String): Seq[Long] = refBigramBuckets(text)
    val gated = SparkEntry.queries("stream_affinity_gate")(spark, Sf)
      .collect()
    assert(gated.nonEmpty)
    val corpus = spark.read.parquet(s"$Sf/documents.parquet")
      .filter(!isNew(col("doc_id")))
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val all = corpus.toSeq.flatMap { case (_, t) => buckets(t) }
    val cntR = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tgtF = corpus.toSeq.filter(_._1 == "en")
      .flatMap { case (_, t) => buckets(t) }
    val cntT = tgtF.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (nR, nT) = (all.size.toLong, tgtF.size.toLong)
    val incoming = spark.read.parquet(s"$Sf/documents.parquet")
      .filter(isNew(col("doc_id")))
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> buckets(r.getString(1)))
      .filter(_._2.nonEmpty).toMap
    assert(gated.length === incoming.size)
    gated.foreach { r =>
      val bs = incoming(r.getAs[Long]("doc_id"))
      // a bucket the corpus never produced has no model row: the
      // stream's left join yields null counts, which land in NEITHER
      // counter — mirrored here by skipping unknown buckets
      val known = bs.filter(cntR.contains)
      val pos = known.count(b => cntT.getOrElse(b, 0L) * nR > cntR(b) * nT)
      val neg = known.count(b => cntT.getOrElse(b, 0L) * nR < cntR(b) * nT)
      assert(r.getAs[Long]("n_feat") === bs.size.toLong)
      assert(r.getAs[Long]("n_pos") === pos.toLong)
      assert(r.getAs[Long]("n_neg") === neg.toLong)
      val expect =
        if (neg > pos) "quarantined_offtarget" else "admitted"
      assert(r.getAs[String]("decision") === expect)
    }
    // the gate must actually route both ways on the fixture
    val ds = gated.map(_.getAs[String]("decision")).toSet
    assert(ds === Set("admitted", "quarantined_offtarget"))
  }

  // statelessness is structural: stream-static left joins allocate no
  // state store (pinned for this join shape by the upsert-gate test)
  test("takedown gate rejects every byte-identical resurrection") {
    val rows = graft.operators.StreamOps
      .streamTakedownGate(spark, Sf).collect()
    assert(rows.nonEmpty)
    val decisions = rows.map(r => r.getAs[Long]("doc_id") ->
      r.getAs[String]("decision")).toMap
    import graft.operators.DedupOps
    val tag = (t: Long) =>
      graft.sources.Tables.documents(spark, Sf)
        .filter(graft.functions.Hashing
          .charHash(col("doc_id").cast("string")) % 10 === t)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val tombs = tag(DedupOps.TombTag)
    assert(tombs.nonEmpty, "the tombstone tag must select docs at sf0.001")
    // every re-crawl of a taken-down doc is rejected — same bytes,
    // different id, caught by fingerprint alone
    tombs.foreach { id =>
      assert(decisions(id + DedupOps.DeltaIdOffset) == "rejected_takedown",
        s"resurrected copy of $id must be rejected")
    }
    // discoveries are admitted unless they happen to share bytes with
    // a taken-down doc (exact-dup across tags)
    assert(rows.count(_.getAs[String]("decision") == "admitted") > 0,
      "genuinely new docs must pass the gate")
  }

  test("template gate: a doc built from corpus heavy hitters " +
      "quarantines, fresh content admits") {
    import graft.operators.SketchOps
    val ids = spark.range(2000L)
      .select(col("id"), isNew(col("id")).as("nw"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val corpusIds = ids.filter(!_._2).map(_._1).take(10)
    val newIds = ids.filter(_._2).map(_._1).take(2)
    val template = (1 to 10).map(i => s"boiler$i").mkString(" ")
    // 8 corpus docs carry the template verbatim -> every template
    // shingle has corpus count 8 >= HeavyMinCnt, so it is HEAVY; two
    // filler docs keep the vocabulary from being all-template
    val corpus = corpusIds.take(8).map(id => (id, template)) ++
      corpusIds.drop(8).zipWithIndex.map { case (id, i) =>
        (id, (1 to 12).map(j => s"fill${i}x$j").mkString(" "))
      }
    val incoming = Seq(
      (newIds(0), template),                                // all heavy
      (newIds(1), (1 to 12).map(j => s"novel$j").mkString(" ")))
    // the streaming source symlinks `documents.parquet` expecting the
    // testdata convention of a single FILE — a Spark-written parquet
    // DIRECTORY behind the symlink lists as one opaque entry and the
    // file stream reads nothing, so materialize the one part file
    val dir = tmpDir("template-gate")
    val raw = tmpDir("template-gate-raw")
    (corpus ++ incoming).toSeq.map { case (id, t) =>
      (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(raw)
    val part = new java.io.File(raw).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(s"$dir/documents.parquet"))
    assert(SketchOps.HeavyMinCnt <= 8L,
      "fixture repetition count no longer clears the heavy floor")
    val out = graft.operators.StreamOps.streamTemplateGate(spark, dir)
      .select("doc_id", "decision").as[(Long, String)].collect().toMap
    assert(out(newIds(0)) == "quarantined_template",
      s"the all-template doc must quarantine: $out")
    assert(out(newIds(1)) == "admitted",
      s"fresh content must admit: $out")
  }

  test("streaming vector ingest collapse: the MIN-id twin survives " +
      "deterministically, ledger rows equal distinct fingerprints, " +
      "a replayed batch admits nothing") {
    import graft.operators.{SimilarityOps, StreamOps}
    // three hash-gated ingest ids: twins share one vector, the third
    // is distinct
    val newIds = spark.range(1000L)
      .filter(isNew(col("id"))).as[Long].take(3)
    assert(newIds.length == 3)
    val Seq(twinA, twinB, solo) = newIds.toSeq
    val v1 = Seq.tabulate(SimilarityOps.Dims)(j => (j + 1).toFloat)
    val v2 = Seq.tabulate(SimilarityOps.Dims)(j => (2 * j + 1).toFloat)
    // REVERSED arrival order (twinB first): the old
    // dropDuplicatesWithinWatermark form kept whichever row a task
    // processed first — the round-10 advisory's nondeterminism — so
    // this fixture would keep twinB on some runs; the min-id collapse
    // must keep twinA regardless of arrival/partition order
    val batch = Seq((twinB, v1), (twinA, v1), (solo, v2))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding"))
      .repartition(4)
    val corpus = SimilarityOps.upsertCorpus(spark, Sf, isNew(_))
    val ledgerDir = tmpDir("vec-ledger-spec")
    val outDir = tmpDir("vec-out-spec")
    StreamOps.vecDedupBatch(batch, corpus, ledgerDir, outDir)
    val ledger = spark.read
      .schema("vec_fp string, ts timestamp").parquet(ledgerDir)
    assert(ledger.count() == 2L,
      "ledger rows must equal DISTINCT fingerprints (2), not input " +
        "rows (3)")
    val admitted = ledger
      .withColumn("vec_id", unix_timestamp(col("ts")))
      .select(col("vec_id")).as[Long].collect().toSet
    assert(admitted == Set(twinA, solo),
      s"the MIN-id twin ($twinA) and the solo must be the admitted " +
        s"representatives, got $admitted")
    // second batch replays the same vectors under NEW ids: the ledger
    // anti-join must admit nothing (first-arrival wins across batches)
    val moreIds = spark.range(1000L, 3000L)
      .filter(isNew(col("id"))).as[Long].take(2)
    val replay = Seq((moreIds(0), v1), (moreIds(1), v2))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding"))
    StreamOps.vecDedupBatch(replay, corpus, ledgerDir, outDir)
    val after = spark.read
      .schema("vec_fp string, ts timestamp").parquet(ledgerDir)
    assert(after.count() == 2L,
      "a replayed batch must admit zero new fingerprints")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(ledgerDir))
    rm(new java.io.File(outDir))
  }

  test("ANN upsert gate is stateless and bit-equal to its batch mirror") {
    import graft.operators.SimilarityOps
    val corpus = SimilarityOps.upsertCorpus(spark, Sf, isNew(_))

    val batchEmb = spark.read.parquet(s"$Sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val in = MemoryStream[(Long, Seq[Float])]
    in.addData(batchEmb.as[(Long, Seq[Float])].collect().toSeq: _*)
    val stream = in.toDF.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>")
        .as("embedding"))
    def gate(src: org.apache.spark.sql.DataFrame) = {
      val cos = SimilarityOps.cosPre(
        col("qe"), col("ce"), col("qn"), col("cn"))
      SimilarityOps.probeRows(src)
        .filter(isNew(col("vec_id")))
        .join(corpus, Seq("bucket"))
        .select(col("vec_id"), col("bucket"), col("cand_id"),
          cos.as("cos"),
          when(cos >= 0.35, "near_dup").otherwise("ok").as("flag"))
    }
    val q = gate(stream).writeStream.format("memory")
      .queryName("ann_gate_spec")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(q.recentProgress.flatMap(_.stateOperators).isEmpty,
      "the ANN upsert gate must not allocate any state store")

    val got = spark.table("ann_gate_spec")
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    val expected = gate(batchEmb)
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(got.nonEmpty, "sf0.001 must produce at least one probe hit")
    // bit-equality includes the DOUBLE cosine — the streaming plan
    // must run the identical expression tree, not a reassociation
    assert(got === expected)
  }
}
