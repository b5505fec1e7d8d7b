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

  test("payload is opaque binary with byte-length metadata") {
    val docs = Tables.documents(spark, Sf)
    val row = MultimodalOps.withPayload(docs).head()
    val payload = row.getAs[Array[Byte]]("payload")
    assert(payload.length > 0)
  }
}
