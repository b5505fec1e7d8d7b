package graft

import org.apache.spark.sql.functions._

/** Pins the ADDRESSING INVARIANT documented at DedupOps.sqlCdcStrip:
  * the CDC / chunk-store oracles index CHARACTERS (DuckDB v1.0.0 has
  * no BLOB substring/md5) while the engine slices UTF-8 BYTES, and the
  * two coincide only over a pure-ASCII corpus. The generated
  * `documents` tables are ASCII at every SF; if a future fixture
  * breaks that, this suite fails with a pointed message instead of the
  * gate silently diverging on chunk boundaries/digests.
  *
  * The engine itself is NOT ASCII-restricted — SubstrDedupSpec
  * round-trips a multi-byte document through cdcStripAgainst; only the
  * DuckDB side of the oracle comparison needs the restriction.
  */
class AsciiInvariantSpec extends SparkSpec {

  private val gatedSfs = Seq(
    "/root/testdata/sf0.001", "/root/testdata/sf0.01")

  test("every oracle-gated documents table is pure ASCII (char-addressed " +
      "DuckDB oracles ≡ byte-addressed engine only under this invariant)") {
    gatedSfs.foreach { sf =>
      val docs = sources.Tables.documents(spark, sf)
      val nonAscii = docs
        .filter(octet_length(col("text")) =!= length(col("text")))
        .count()
      assert(nonAscii === 0L,
        s"$sf/documents.parquet has $nonAscii non-ASCII docs — the " +
          "char-addressed CDC oracles (DedupOps.sqlCdcStrip invariant " +
          "note) would diverge from the byte-addressed engine; either " +
          "restore an ASCII corpus or rewrite the oracles byte-addressed")
    }
  }
}
