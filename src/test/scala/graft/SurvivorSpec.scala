package graft

import org.apache.spark.sql.functions._

/** Pins for `dedup_survivor`: a driver-side recompute of the
  * survivorship rank over the engine's own component labeling at
  * sf0.001, and a planted revision chain where the policy picks the
  * RICHEST member while the naive rule would keep the oldest. */
class SurvivorSpec extends SparkSpec {

  test("matches a driver-side recompute of the (nd, chars, id) rank " +
      "over the engine's own components at sf0.001") {
    val comp = SparkEntry.queries("dedup_components")(spark, Sf)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("component_id"))
      .toSeq
    val stats = spark.read.parquet(s"$Sf/documents.parquet")
      .select(col("doc_id"),
        size(array_distinct(graft.functions.Hashing.tokens(col("text"))))
          .cast("long").as("nd"),
        col("n_chars"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val want = comp.groupBy(_._2)
      .filter(_._2.size > 1)
      .map { case (c, members) =>
        val ids = members.map(_._1)
        val surv = ids.minBy { id =>
          val (nd, ch) = stats(id); (-nd, -ch, id)
        }
        val (nd, ch) = stats(surv)
        (c, surv, ids.size.toLong, ids.size.toLong - 1, nd, ch,
          if (surv == ids.min) 1L else 0L)
      }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("dedup_survivor")(spark, Sf)
      .collect()
      .map(r => (r.getAs[Long]("component_id"),
        r.getAs[Long]("survivor_id"), r.getAs[Long]("n_members"),
        r.getAs[Long]("n_dropped"),
        r.getAs[Long]("survivor_distinct_tokens"),
        r.getAs[Long]("survivor_chars"),
        r.getAs[Long]("survivor_is_min_id"))).toSeq
    assert(got == want)
    assert(got.nonEmpty, "sf0.001 must have at least one dup cluster")
  }

  test("planted revision chain: the policy keeps the RICHEST " +
      "revision, not the oldest") {
    import spark.implicits._
    // three byte-distinct revisions of one page (a 40-DISTINCT-word
    // body keeps pairwise shingle Jaccard high enough for the LSH
    // bands): doc 1 is the oldest and SHORTEST, doc 3 the latest edit
    // with the most distinct content; plus filler singletons
    val page = (1 to 40).map(i => s"body$i").mkString(" ")
    val docs = Seq(
      (1L, page, "en", "web"),
      (2L, page + " edit one", "en", "web"),
      (3L, page + " edit one plus fresh nouns verbs adjectives",
        "en", "web")) ++
      (10L to 14L).map(i =>
        (i, s"unrelated singleton number $i with its own words " +
          s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i eta$i " +
          s"theta$i iota$i kappa$i", "en", "web"))
    val dir = tmpDir("survivor-planted")
    docs.map { case (id, t, l, s0) => (id, t, l, s0, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val out = graft.operators.DedupOps.dedupSurvivor(spark, dir)
      .collect()
    val cluster = out.find(_.getAs[Long]("n_members") >= 2L)
    assert(cluster.isDefined, "the revisions must cluster")
    val r = cluster.get
    assert(r.getAs[Long]("survivor_id") == 3L,
      "the richest revision wins")
    assert(r.getAs[Long]("survivor_is_min_id") == 0L,
      "and it is NOT the naive min-id pick")
  }
}
