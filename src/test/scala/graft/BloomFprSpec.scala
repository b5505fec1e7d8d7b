package graft

import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Pins for `dedup_bloom_fpr`: a driver-side exact replay of the
  * calibration (fingerprints from the engine's own hash, positions
  * from the shared affine constants) plus the structural facts —
  * occupancy grows with k, the probe set is constant, and exact
  * duplicates never pollute the false-positive count.
  */
class BloomFprSpec extends SparkSpec {

  test("matches a driver-side exact replay at sf0.001") {
    val rows = spark.read.parquet(s"$Sf/documents.parquet")
      .select(col("doc_id"),
        Hashing.charHash(col("text")).as("fp"),
        (Hashing.charHash(col("doc_id").cast("string")) % 10 === 7)
          .as("is_new"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val fps = rows.filter(!_._3).map(_._2).toSet
    val nonMembers = rows.filter(_._3).map(_._2).filterNot(fps)
    def pos(fp: Long, i: Int): Long =
      ((Hashing.A(i) * fp + Hashing.B(i)) % Hashing.P) %
        graft.operators.SketchOps.CalBloomBits
    val got = SparkEntry.queries("dedup_bloom_fpr")(spark, Sf)
      .collect().map(r => r.getAs[Long]("k") -> r).toMap
    assert(got.size == graft.operators.SketchOps.BloomK)
    var prevBits = 0L
    (1 to graft.operators.SketchOps.BloomK).foreach { k =>
      val bloom = fps.flatMap(fp => (0 until k).map(pos(fp, _)))
      val nFp = nonMembers.count { fp =>
        (0 until k).forall(i => bloom(pos(fp, i)))
      }.toLong
      val r = got(k.toLong)
      assert(r.getAs[Long]("bits_set") == bloom.size.toLong, s"k=$k")
      assert(r.getAs[Long]("n_probes") == nonMembers.size.toLong,
        s"k=$k: the probe set must not vary with k")
      assert(r.getAs[Long]("n_false_pos") == nFp, s"k=$k")
      assert(r.getAs[Double]("fpr") ==
        (if (nonMembers.isEmpty) 0.0
         else nFp.toDouble / nonMembers.size.toDouble), s"k=$k")
      assert(r.getAs[Double]("occupancy") == bloom.size.toDouble /
        graft.operators.SketchOps.CalBloomBits.toDouble, s"k=$k")
      assert(bloom.size.toLong >= prevBits,
        "more hashes can only set more bits")
      prevBits = bloom.size.toLong
    }
    assert(nonMembers.nonEmpty, "the calibration needs real probes")
  }
}
