package graft

import graft.operators.StreamOps

/** The round-13 banding-orientation experiment for the streaming
  * conversion semi join, kept executable: the registered
  * `stream_conversion_window` explodes the CLICK (probe) side to its
  * two candidate hours; the rejected mirror
  * ([[StreamOps.streamConversionWindowAlt]]) explodes the VIEW side
  * and restores emit-at-most-once with a stateful
  * `dropDuplicatesWithinWatermark`. Isolated 5-rep medians at sf0.1
  * priced them 2.52 s vs 2.96 s — the sides are equal-cardinality, so
  * the mirror only adds a dedup operator. This pin keeps the rejected
  * orientation a live, row-identical alternative (if the corpus ever
  * turns click-heavy, flipping is a one-line change whose semantics
  * are already proven) instead of a doc-comment claim. */
class ConversionOrientationSpec extends SparkSpec {

  test("view-exploded + within-watermark dedup emits exactly the " +
      "registered click-exploded orientation's rows") {
    val registered =
      StreamOps.streamConversionWindow(spark, Sf).collect().toSeq
    val mirrored =
      StreamOps.streamConversionWindowAlt(spark, Sf).collect().toSeq
    assert(registered.nonEmpty,
      "empty conversion set would vacuously pass — sf0.001 must " +
        "contain at least one view->click conversion")
    assert(mirrored == registered)
  }
}
