package graft

import graft.operators.MultimodalOps
import graft.sources.Tables

/** The real plumbing claim: the mapPartitions decode path produces
  * exactly the metadata the SQL projection (oracle-checked `mm_meta`)
  * declares — so swapping FakeCodec for a real codec changes only the
  * codec. */
class MultimodalSpec extends SparkSpec {
  test("decodeBatched matches the mm_meta projection row-for-row") {
    val docs = Tables.documents(spark, Sf)
    val viaPartitions = MultimodalOps.decodeBatched(spark, docs)
      .orderBy("doc_id").collect().toSeq
    val viaSql = MultimodalOps.mmMeta(spark, Sf).collect().toSeq
    assert(viaPartitions == viaSql)
    assert(viaPartitions.nonEmpty)
  }

  test("chunking reassembles byte-for-byte; corpus is ASCII so the " +
      "oracle's VARCHAR mirror is exact") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, Sf)
    // the oracle mirrors byte slicing through VARCHAR substring —
    // sound only while byte length == char length (ASCII)
    assert(docs.filter(length(col("text")) =!=
      length(col("text").cast("binary"))).count() === 0,
      "non-ASCII corpus: mm_chunk's oracle mirror is no longer byte-exact")

    val payloads = MultimodalOps.withPayload(docs)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val chunks = MultimodalOps.withPayload(docs)
      .withColumn("byte_len", length(col("payload")).cast("long"))
      .filter(col("byte_len") > 0)
      .withColumn("chunk_idx", explode(sequence(lit(0L),
        expr(s"(byte_len + ${MultimodalOps.ChunkBytes - 1}) div ${MultimodalOps.ChunkBytes} - 1"))))
      .select(col("doc_id"), col("chunk_idx"), expr(
        s"substring(payload, CAST(chunk_idx * ${MultimodalOps.ChunkBytes} + 1 AS INT), ${MultimodalOps.ChunkBytes})")
        .as("chunk"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Array[Byte]](2)))
    chunks.groupBy(_._1).foreach { case (docId, cs) =>
      val reassembled = cs.sortBy(_._2).flatMap(_._3)
      assert(java.util.Arrays.equals(reassembled, payloads(docId)),
        s"chunks of doc $docId do not reassemble to the payload")
    }
    assert(chunks.nonEmpty)
  }

  test("CDC chunks tile every payload exactly (gapless, complete)") {
    import org.apache.spark.sql.functions._
    val lens = MultimodalOps.withPayload(Tables.documents(spark, Sf))
      .select(col("doc_id"), length(col("payload")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val chunks = MultimodalOps.mmCdcChunk(spark, Sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_idx"),
        r.getAs[Long]("offset"), r.getAs[Long]("chunk_len")))
    assert(chunks.nonEmpty)
    chunks.groupBy(_._1).foreach { case (docId, cs) =>
      val sorted = cs.sortBy(_._2)
      assert(sorted.head._3 === 0L, s"doc $docId must start at offset 0")
      sorted.sliding(2).foreach {
        case Array((_, _, o1, l1), (_, _, o2, _)) =>
          assert(o1 + l1 === o2, s"doc $docId has a gap/overlap at $o2")
        case _ =>
      }
      val last = sorted.last
      assert(last._3 + last._4 === lens(docId),
        s"doc $docId chunks must cover the full payload")
      assert(cs.forall(_._4 > 0), s"doc $docId has an empty chunk")
    }
  }

  test("payload is opaque binary with byte-length metadata") {
    val docs = Tables.documents(spark, Sf)
    val row = MultimodalOps.withPayload(docs).head()
    val payload = row.getAs[Array[Byte]]("payload")
    assert(payload.length > 0)
  }
}
