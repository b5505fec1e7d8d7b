package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-factor multiplier for local scale probes: replicates a
  * testdata directory N× with key-shifted, content-perturbed replicas
  * and writes a new directory usable by [[Bench]] / the operators.
  *
  *   sbt "runMain graft.ScaleData /root/testdata/sf0.1 benchdata/sf1 10"
  *
  * Replica 0 is the identity; replica i shifts every join key by
  * i·[[ScaleData.IdStride]] so the replicas are DISJOINT id spaces:
  * row counts scale ×N while join fan-outs, group cardinalities per
  * key, and dup-cluster sizes stay at the original workload's shape
  * (naively unioning identical copies would turn every document into
  * an N-way exact-dup cluster and inflate the LSH pair join ~N² —
  * a different, adversarial workload, not a scale-up).
  *
  *  - documents: ids shifted; every token suffixed `~i` (i>0), so
  *    each replica is an independent corpus with its own vocabulary —
  *    near-dup structure inside a replica is preserved verbatim,
  *    nothing matches across replicas (how a 10× crawl looks).
  *  - embeddings: ids shifted; vectors cyclically rotated by
  *    i·Dims/N dims — norms and intra-replica geometry preserved,
  *    cross-replica directions decorrelated.
  *  - events: event/user ids shifted (10× traffic, same window).
  *  - TPC-H facts: orderkey/custkey/partkey/suppkey shifted; the
  *    fixed dims (region/nation + nationkey refs) are shared.
  */
object ScaleData {
  val IdStride = 10000000L

  def main(args: Array[String]): Unit = {
    val Array(src, dst, nStr) = args.take(3)
    val n = nStr.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def shift(df: DataFrame, i: Int, cols: String*): DataFrame =
      cols.foldLeft(df)((d, c) =>
        d.withColumn(c, col(c) + lit(i * IdStride)))

    def replicate(name: String)(tx: (DataFrame, Int) => DataFrame): Unit = {
      val base = spark.read.parquet(s"$src/$name.parquet")
      val out = (0 until n).map(i => tx(base, i)).reduce(_ unionAll _)
      out.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scale] $name -> ${n}x")
    }

    // fixed dims: plain copy
    for (t <- Seq("region", "nation"))
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")

    replicate("customer")((df, i) => shift(df, i, "c_custkey"))
    replicate("supplier")((df, i) => shift(df, i, "s_suppkey"))
    replicate("part")((df, i) => shift(df, i, "p_partkey"))
    replicate("orders")((df, i) => shift(df, i, "o_orderkey", "o_custkey"))
    replicate("lineitem")((df, i) =>
      shift(df, i, "l_orderkey", "l_partkey", "l_suppkey"))
    replicate("events")((df, i) => shift(df, i, "event_id", "user_id"))
    replicate("documents") { (df, i) =>
      val d = shift(df, i, "doc_id")
      if (i == 0) d
      else d
        .withColumn("text",
          regexp_replace(col("text"), "(\\S+)", s"$$1~$i"))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }
    replicate("embeddings") { (df, i) =>
      val d = shift(df, i, "vec_id")
      // rotation spread over the replica count; i*Dims/n (not
      // i*(Dims/n)) so n > Dims degrades to distinct-but-repeating
      // rotations instead of integer-dividing to rot=0 for EVERY
      // replica — which would mint byte-identical vectors at shifted
      // ids, the adversarial N-way-dup shape this generator avoids
      val rot = i * graft.operators.SimilarityOps.Dims / math.max(n, 1)
      if (rot == 0) d
      else d.withColumn("embedding",
        concat(slice(col("embedding"), rot + 1,
            graft.operators.SimilarityOps.Dims - rot),
          slice(col("embedding"), 1, rot)))
    }
    spark.stop()
  }
}
