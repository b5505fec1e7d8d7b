package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2.8 [EXT]): opaque binary
  * payloads + typed metadata, with the decode step STUBBED (the
  * container has no image/audio codecs) behind a deterministic fake.
  *
  * What is REAL and load-bearing here, exactly as it would be at
  * 100 TB:
  *  - the schema contract: `payload BINARY` + `meta STRUCT<...>`
  *    (parquet stores binary natively; metadata prunes without
  *    touching payload bytes);
  *  - the batched per-partition decode shape ([[decodeBatched]]):
  *    `mapPartitions` so a real codec would amortize init per
  *    partition (exactly where a Pandas-UDF/Arrow batch would sit in
  *    PySpark, and where a JNI codec sits in Scala);
  *  - partitioning: decode is a narrow transformation — no shuffle.
  *
  * Only [[FakeCodec.decode]] is fake, and deliberately deterministic
  * so the oracle-facing query ([[mmMeta]]) can pin the plumbing.
  */
object MultimodalOps {
  type Q = (SparkSession, String) => DataFrame

  /** The decoded-media metadata contract. */
  final case class MediaMeta(
      byte_len: Long, width: Long, height: Long, n_frames: Long,
      format: String)

  /** Deterministic stand-in for a real image/video codec. A real
    * implementation would parse payload headers; this derives the
    * same fields from payload length + a row key so tests and oracle
    * agree. */
  object FakeCodec {
    def decode(docId: Long, payload: Array[Byte]): MediaMeta = {
      val n = payload.length.toLong
      MediaMeta(
        byte_len = n,
        width = 16 + n % 64,
        height = 16 + (n * 31) % 64,
        n_frames = 1 + docId % 8,
        format = (n % 3) match {
          case 0 => "rgb"; case 1 => "yuv"; case _ => "gray"
        })
    }
  }

  /** Typed input/output rows for the decode step — the Encoders keep
    * the whole path in Tungsten binary rows (no `Row` boxing, no
    * `.rdd` detour). */
  final case class MediaIn(doc_id: Long, payload: Array[Byte])
  final case class DecodedMeta(
      doc_id: Long, byte_len: Long, width: Long, height: Long,
      n_frames: Long, format: String)

  /** Binary payload column derived from text (the testdata has no
    * real media; the bytes are opaque to everything downstream). */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))

  /** The real decode shape: typed per-partition iteration, the
    * batching point where a real codec (JNI, or an Arrow batch in
    * PySpark) would init once per partition. Narrow — no shuffle,
    * stays in Tungsten via the product Encoders. */
  def decodeBatched(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    withPayload(docs).as[MediaIn].mapPartitions { it =>
      // a real codec would init once here (per partition, per core)
      it.map { r =>
        val m = FakeCodec.decode(r.doc_id, r.payload)
        DecodedMeta(r.doc_id, m.byte_len, m.width, m.height, m.n_frames,
          m.format)
      }
    }.toDF()
  }

  /** Oracle-facing projection of the same metadata, expressed in pure
    * SQL functions (pins the byte-length semantics + fake-decode
    * arithmetic; [[MultimodalSpec]] asserts decodeBatched matches). */
  val mmMeta: Q = (s, d) =>
    graft.sources.Tables.documents(s, d)
      .select(col("doc_id"),
        length(col("text").cast("binary")).cast("long").as("byte_len"))
      .select(col("doc_id"), col("byte_len"),
        (lit(16L) + col("byte_len") % 64).as("width"),
        (lit(16L) + (col("byte_len") * 31) % 64).as("height"),
        (lit(1L) + col("doc_id") % 8).as("n_frames"),
        when(col("byte_len") % 3 === 0, "rgb")
          .when(col("byte_len") % 3 === 1, "yuv")
          .otherwise("gray").as("format"))
      .orderBy("doc_id")

  val defs: Map[String, Q] = Map("mm_meta" -> mmMeta)

  val oracle: Map[String, String] = Map(
    "mm_meta" ->
      """SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           16 + CAST(octet_length(encode(text)) AS BIGINT) % 64 AS width,
           16 + (CAST(octet_length(encode(text)) AS BIGINT) * 31) % 64 AS height,
           1 + doc_id % 8 AS n_frames,
           CASE CAST(octet_length(encode(text)) AS BIGINT) % 3
             WHEN 0 THEN 'rgb' WHEN 1 THEN 'yuv' ELSE 'gray' END AS format
         FROM documents ORDER BY doc_id""")
}
