package graft

import org.apache.spark.sql.functions._

import graft.operators.TextOps
import graft.functions.Hashing

/** Structural guarantees of the training-window pipeline that the
  * row-level oracle can't express:
  *  - chunking is LOSSLESS: de-overlapped chunks reassemble every
  *    document's exact token stream (nothing dropped at window
  *    boundaries, no duplicated tail);
  *  - packing is GAPLESS per source: consecutive chunks' stream
  *    offsets tile the concatenated token stream with no holes, so
  *    every token lands in exactly one training sequence slot. */
class ChunkPackSpec extends SparkSpec {
  import spark.implicits._

  test("de-overlapped chunks reassemble each document's token stream") {
    val chunks = TextOps.docChunkTokens(spark, Sf)
      .select("doc_id", "chunk_id", "chunk_text")
      .as[(Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    val docToks = graft.sources.Tables.documents(spark, Sf)
      .select(col("doc_id"), Hashing.tokens(col("text")).as("tk"))
      .as[(Long, Seq[String])].collect().toMap
      .filter(_._2.nonEmpty)
    assert(chunks.keySet === docToks.keySet)
    docToks.foreach { case (id, toks) =>
      val cs = chunks(id).map(_.split(' ').toSeq)
      // non-final chunks contribute their first `stride` tokens (the
      // overlap belongs to the next chunk's window); the final chunk
      // contributes everything
      val rebuilt = cs.init.flatMap(_.take(TextOps.ChunkStride)) ++ cs.last
      assert(rebuilt === toks, s"doc $id reassembly mismatch")
    }
  }

  test("per-source packing tiles the chunk stream with no gaps and " +
      "in-bounds sequence offsets") {
    val packed = TextOps.docPackChunks(spark, Sf)
      .select("source", "doc_id", "chunk_id", "n_tok", "seq_id", "seq_off")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(packed.nonEmpty)
    packed.groupBy(_._1).foreach { case (source, rows) =>
      val ordered = rows.sortBy(r => (r._2, r._3))
      var expectedOff = 0L
      ordered.foreach { case (_, doc, chunk, nTok, seqId, seqOff) =>
        val off = seqId * TextOps.PackSeqTokens + seqOff
        assert(off === expectedOff,
          s"$source doc $doc chunk $chunk: offset $off, expected $expectedOff")
        assert(seqOff >= 0 && seqOff < TextOps.PackSeqTokens)
        expectedOff += nTok
      }
    }
  }
}
