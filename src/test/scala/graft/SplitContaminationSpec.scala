package graft

import graft.operators.SimilarityOps

/** Semantic split-contamination QA (`emb_split_contamination`):
  * the gray zone it reports must sit strictly BELOW the near-dup edge
  * threshold — a same-bucket cross-split pair at ≥0.35 is impossible
  * while the component-based split derivation is correct, so any
  * `edge_leak` row is a tripwire on the split logic itself.
  */
class SplitContaminationSpec extends SparkSpec {

  test("gray-zone rows are consistent and no edge_leak tripwire fires") {
    val rows = SparkEntry.queries("emb_split_contamination")(spark, Sf)
      .collect()
    rows.foreach { r =>
      assert(r.getAs[String]("split") != "train",
        "only eval vectors may be reported")
      val c = r.getAs[Double]("best_cos")
      assert(c >= SimilarityOps.EmbContamMin, s"below gray-zone floor: $c")
      assert(r.getAs[String]("risk") === "gray",
        s"edge_leak tripwire fired at cos=$c — the component split " +
          "failed to co-locate a near-dup pair")
      assert(r.getAs[Long]("n_train_hits") >= 1L)
    }
  }
}
