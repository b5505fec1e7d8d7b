package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.functions.Hashing
import graft.operators.EventOps

/** Pins for `ev_ab_lift`: a driver-side exact fold (with the
  * degenerate-pool guard) at sf0.001, the A/A exchangeability
  * property, and a planted partial-conversion corpus exercising the
  * real z arithmetic the synthetic corpus's all-convert pool cannot.
  */
class AbLiftSpec extends SparkSpec {

  private def fold(perUser: Seq[(Long, Long)])
      : (Long, Long, Long, Long, Double, Double, Double, Double) = {
    val nA = perUser.count(_._1 == 0L).toLong
    val nB = perUser.count(_._1 == 1L).toLong
    val cA = perUser.filter(_._1 == 0L).map(_._2).sum
    val cB = perUser.filter(_._1 == 1L).map(_._2).sum
    val degenerate = nA == 0L || nB == 0L || cA + cB == 0L ||
      cA + cB == nA + nB
    val pa = if (nA > 0) cA.toDouble / nA.toDouble else 0.0
    val pb = if (nB > 0) cB.toDouble / nB.toDouble else 0.0
    val (lift, z) =
      if (degenerate) (0.0, 0.0)
      else {
        val pool = (cA + cB).toDouble / (nA + nB).toDouble
        ((pb - pa), (pb - pa) / math.sqrt(pool * (1.0 - pool) *
          (1.0 / nA.toDouble + 1.0 / nB.toDouble)))
      }
    (nA, nB, cA, cB, pa, pb, lift, z)
  }

  private def check(dir: String,
      expected: (Long, Long, Long, Long, Double, Double, Double, Double))
      : Unit = {
    val r = EventOps.evAbLift(spark, dir).collect().head
    val (nA, nB, cA, cB, pa, pb, lift, z) = expected
    assert(r.getAs[Long]("n_a") == nA && r.getAs[Long]("n_b") == nB)
    assert(r.getAs[Long]("conv_a") == cA && r.getAs[Long]("conv_b") == cB)
    assert(r.getAs[Double]("rate_a") == pa)
    assert(r.getAs[Double]("rate_b") == pb)
    assert(r.getAs[Double]("lift") == lift)
    assert(r.getAs[Double]("z") == z)
  }

  test("matches a driver-side exact fold at sf0.001; the A/A null z " +
      "is small") {
    val perUser = graft.sources.Tables.events(spark, Sf)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "view", 1L).otherwise(0L))
        .as("viewed"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("converted"))
      .filter(col("viewed") === 1L)
      .select((Hashing.charHash(col("user_id").cast("string")) % 2L)
        .as("arm"), col("converted"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expected = fold(perUser)
    check(Sf, expected)
    assert(expected._1 > 0L && expected._2 > 0L,
      "both arms must be populated")
    assert(math.abs(expected._8) < 4.0,
      "an A/A split must not 'detect' an effect")
  }

  test("planted: a partial-conversion corpus exercises the live z " +
      "arithmetic") {
    import spark.implicits._
    // engine-assigned arms for a pool of candidate users
    val arms = spark.range(1, 41)
      .select(col("id"),
        (Hashing.charHash(col("id").cast("string")) % 2L).as("arm"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val aUsers = arms.filter(_._2 == 0L).keys.toSeq.sorted.take(6)
    val bUsers = arms.filter(_._2 == 1L).keys.toSeq.sorted.take(6)
    assert(aUsers.size == 6 && bUsers.size == 6)
    def t(i: Int) = Timestamp.valueOf(f"2024-01-01 00:${i / 60}%02d:${i % 60}%02d")
    var id = 0L
    def ev(u: Long, typ: String) = { id += 1; (id, t(id.toInt), u, typ, 0.0, "{}") }
    // every candidate views; 2 of arm A and 4 of arm B convert
    val events = (aUsers ++ bUsers).map(ev(_, "view")) ++
      aUsers.take(2).map(ev(_, "purchase")) ++
      bUsers.take(4).map(ev(_, "purchase"))
    val dir = tmpDir("ablift-planted")
    events.toDF("event_id", "ts", "user_id", "event_type", "value",
        "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val perUser = (aUsers.map(u =>
      (0L, if (aUsers.take(2).contains(u)) 1L else 0L)) ++
      bUsers.map(u => (1L, if (bUsers.take(4).contains(u)) 1L else 0L)))
    val expected = fold(perUser)
    assert(expected._8 != 0.0, "the planted mix must yield a live z")
    check(dir, expected)
  }
}
