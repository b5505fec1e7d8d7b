package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Seeded fuzz of the hand-written codegen expressions against plain
  * Scala reference folds, driven through a real DataFrame so the
  * generated Java (not just the interpreted eval) computes the
  * values. Inputs include empty strings, runs of spaces, unicode
  * (including astral code points), and long documents. */
class HashExprsFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val P = 2147483647L

  private def refCharHash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31L + cp) % P
      i += Character.charCount(cp)
    }
    h
  }

  private def genStrings: Seq[String] = {
    val r = new Random(0xBADC0DE)
    val alphabets = Seq(
      "abcdefghij ",                 // ascii words
      "αβγδε ёжз 你好 ",             // BMP unicode
      "a b  c   d    ",              // space runs
      new String(Character.toChars(0x1F600)) + " x ")  // astral plane
    val fixed = Seq("", " ", "   ", "a", "one two three four five")
    fixed ++ (1 to 400).map { _ =>
      val alpha = alphabets(r.nextInt(alphabets.length))
      val len = r.nextInt(120)
      (0 until len).map(_ => alpha(r.nextInt(alpha.length))).mkString
    } ++ Seq(("word " * 3000).trim)   // long doc
  }

  test("charHash: codegen path equals the reference fold on fuzz input") {
    val rows = genStrings.toDF("s")
      .select(col("s"), Hashing.charHash(col("s")).as("h"))
      .collect()
    rows.foreach(r => assert(r.getLong(1) === refCharHash(r.getString(0)),
      s"mismatch on ${r.getString(0).take(50)}"))
  }

  test("tokens + ngrams: codegen path equals a reference sliding window") {
    val rows = genStrings.toDF("s")
      .select(col("s"), Hashing.ngrams(Hashing.tokens(col("s")), 2).as("g"),
        Hashing.shingles(Hashing.tokens(col("s"))).as("sh"))
      .collect()
    rows.foreach { r =>
      val toks = r.getString(0).split(" ", -1).filter(_.nonEmpty).toSeq
      val ref2 = if (toks.length < 2) Seq.empty
        else toks.sliding(2).map(_.mkString(" ")).toSeq
      val ref3 = if (toks.length < 3) Seq.empty
        else toks.sliding(3).map(_.mkString(" ")).toSeq
      assert(r.getSeq[String](1) === ref2, s"bigrams of '${r.getString(0).take(40)}'")
      assert(r.getSeq[String](2) === ref3, s"shingles of '${r.getString(0).take(40)}'")
    }
  }

  test("charNgramHashes: one-pass codegen equals the composed " +
      "substr-window form and a reference fold") {
    for (n <- Seq(1, 3, 5)) {
      val rows = genStrings.toDF("s")
        .select(col("s"),
          Hashing.charNgramHashes(col("s"), n).as("fast"),
          Hashing.hashAll(transform(
            sequence(lit(1), length(col("s")) - (n - 1)),
            i => col("s").substr(i, lit(n)))).as("composed"))
        .collect()
      rows.foreach { r =>
        val s = r.getString(0)
        val cps = s.codePoints().toArray
        val ref =
          if (cps.length < n) Seq.empty
          else cps.sliding(n).map(_.foldLeft(0L)((h, c) =>
            (h * 31L + c) % P)).toSeq
        assert(r.getSeq[Long](1) === ref,
          s"n=$n one-pass mismatch on ${s.take(40)}")
        // the composed form yields a DESCENDING sequence() for
        // len(code units) < n (sequence(1, <=0) counts down) — only
        // compare where the window construction is well-defined
        if (s.length >= n)
          assert(r.getSeq[Long](2) === ref,
            s"n=$n composed-form mismatch on ${s.take(40)}")
      }
    }
  }

  test("minhashSig + simhash32: codegen path equals per-lane reference") {
    val r = new Random(0x5EED)
    val arrays = Seq(Seq.empty[Long]) ++
      (1 to 200).map(_ => Seq.fill(1 + r.nextInt(50))(r.nextLong().abs % P))
    val rows = arrays.toDF("hs")
      .select(col("hs"), Hashing.minhashSig(col("hs")).as("sig"),
        Hashing.simhash32(col("hs")).as("sh"))
      .collect()
    rows.foreach { row =>
      val hs = row.getSeq[Long](0)
      if (hs.isEmpty) {
        assert(row.getSeq[Any](1).forall(_ == null), "empty -> all-null lanes")
        assert(row.getLong(2) === 0L)
      } else {
        val refSig = (0 until Hashing.K).map(k =>
          hs.map(h => (h * Hashing.A(k) + Hashing.B(k)) % P).min)
        assert(row.getSeq[Long](1) === refSig)
        val refSim = (0 until 32).map { j =>
          val vote = hs.map(h => if (((h >> j) & 1L) == 1L) 1 else -1).sum
          if (vote > 0) 1L << j else 0L
        }.sum
        assert(row.getLong(2) === refSim)
      }
    }
  }

  test("lshBucket: codegen path equals the weight-table reference; short arrays -> 0") {
    import graft.functions.LshBucket
    val r = new Random(0xB0C4e7)
    val w = LshBucket.weightTable(8, 64)
    val arrays = Seq(Seq.empty[Float], Seq.fill(63)(1.0f)) ++   // short -> 0
      (1 to 100).map(_ => Seq.fill(64)(r.nextFloat() * 2 - 1))
    val rows = arrays.toDF("e")
      .select(col("e"), org.apache.spark.sql.GraftColumn(LshBucket(
        org.apache.spark.sql.GraftColumn.expr(col("e")), 8, 64)).as("b"))
      .collect()
    rows.foreach { row =>
      val e = row.getSeq[Float](0)
      val expected = if (e.length < 64) 0L
        else (0 until 8).map { p =>
          var s = 0.0
          (0 until 64).foreach(i => s += e(i).toDouble * w(p * 64 + i))
          if (s > 0) 1L << p else 0L
        }.sum
      assert(row.getLong(1) === expected)
    }
  }

  test("sqDist: codegen path equals a sequential reference fold; " +
      "length mismatch -> null") {
    val r = new Random(0x5Dd157)
    val arrays = (1 to 100).map(_ =>
      (Seq.fill(64)(r.nextFloat() - 0.5f),
        Seq.fill(64)(r.nextDouble() - 0.5))) :+
      (Seq.fill(3)(1.0f), Seq.fill(4)(1.0))   // mismatch -> null
    val rows = arrays.toDF("a", "c")
      .select(col("a"), col("c"),
        org.apache.spark.sql.GraftColumn(graft.functions.ArraySqDist(
          org.apache.spark.sql.GraftColumn.expr(col("a")),
          org.apache.spark.sql.GraftColumn.expr(col("c")))).as("d"))
      .collect()
    rows.foreach { row =>
      val a = row.getSeq[Float](0); val c = row.getSeq[Double](1)
      if (a.length != c.length) assert(row.isNullAt(2))
      else {
        var s = 0.0
        a.indices.foreach { i =>
          val d = a(i).toDouble - c(i); s += d * d
        }
        assert(row.getDouble(2) === s)
      }
    }
  }

  test("cdcBoundaries: codegen path equals an O(n*W) window fold on " +
      "arbitrary bytes, and boundaries re-sync after an insertion") {
    import graft.functions.CdcBoundaries.{Divisor, Window}
    def refBoundaries(bytes: Array[Byte]): Seq[Long] =
      (Window until bytes.length).filter { end =>
        var h = 0L
        ((end - Window) until end).foreach(j =>
          h = (h * 31L + (bytes(j) & 0xffL)) % P)
        h % Divisor == 0L
      }.map(_.toLong)
    val r = new Random(0xCDC)
    val payloads = Seq(Array.emptyByteArray, Array[Byte](1),
      Array.fill[Byte](Window - 1)(7), Array.fill[Byte](Window)(7)) ++
      (1 to 200).map(_ => Array.fill[Byte](r.nextInt(600))(r.nextInt.toByte))
    val rows = payloads.zipWithIndex.map { case (b, i) => (i, b) }
      .toDF("id", "payload")
      .select(col("id"), col("payload"),
        org.apache.spark.sql.GraftColumn(graft.functions.CdcBoundaries(
          org.apache.spark.sql.GraftColumn.expr(col("payload")))).as("bs"))
      .collect()
    rows.foreach { row =>
      val bytes = row.getAs[Array[Byte]]("payload")
      assert(row.getSeq[Long](2) === refBoundaries(bytes),
        s"payload #${row.getInt(0)} (${bytes.length} bytes)")
    }
    // the CDC property: prepending a prefix shifts only boundaries
    // whose window overlaps the prefix; past prefixLen + W the cut
    // points re-synchronize exactly (fixed-size chunking shifts ALL
    // of them, which is why CDC exists)
    val doc = Array.fill[Byte](500)(r.nextInt.toByte)
    val prefix = Array.fill[Byte](37)(r.nextInt.toByte)
    val shifted = prefix ++ doc
    val resynced = refBoundaries(shifted)
      .filter(_ >= prefix.length + Window)
    assert(resynced === refBoundaries(doc).map(_ + prefix.length),
      "unchanged content must re-chunk identically after an insertion")
    assert(refBoundaries(doc).nonEmpty, "property test must not be vacuous")
  }

  test("floatDot: codegen path equals a sequential reference fold") {
    val r = new Random(0xD07)
    val arrays = (1 to 100).map(_ =>
      (Seq.fill(64)(r.nextFloat() - 0.5f), Seq.fill(64)(r.nextFloat() - 0.5f)))
    val rows = arrays.toDF("a", "b")
      .select(col("a"), col("b"),
        org.apache.spark.sql.GraftColumn(graft.functions.FloatDot(
          org.apache.spark.sql.GraftColumn.expr(col("a")),
          org.apache.spark.sql.GraftColumn.expr(col("b")))).as("d"))
      .collect()
    rows.foreach { row =>
      val a = row.getSeq[Float](0); val b = row.getSeq[Float](1)
      var s = 0.0
      a.indices.foreach(i => s += a(i).toDouble * b(i).toDouble)
      assert(row.getDouble(2) === s)
    }
  }
}
