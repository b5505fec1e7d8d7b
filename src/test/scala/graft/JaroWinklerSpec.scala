package graft

import org.apache.spark.unsafe.types.UTF8String

import graft.functions.EditExprs

/** Pins for the Jaro / Jaro–Winkler kernel and `dedup_jaro_winkler`:
  * DuckDB-generated bit-exact fingerprint doubles (including the
  * byte-walk multibyte cases the convention hinges on), an
  * independent straightforward re-implementation on fuzz strings,
  * the boost-rule edges (threshold 0.7, prefix cap 4), invariants on
  * the real candidate pairs, and the SQL registration.
  */
class JaroWinklerSpec extends SparkSpec {

  private def j(a: String, b: String): Double =
    EditExprs.jaro(UTF8String.fromString(a), UTF8String.fromString(b))
  private def jw(a: String, b: String): Double =
    EditExprs.jaroWinkler(UTF8String.fromString(a), UTF8String.fromString(b))

  /** Independent mirror in collection style (vs the kernel's while
    * loops): textbook first-fit window matching over UTF-8 bytes. */
  private def refJaro(sa: String, sb: String): Double = {
    val a = sa.getBytes("UTF-8")
    val b = sb.getBytes("UTF-8")
    if (a.isEmpty || b.isEmpty) return 0.0
    if (a.sameElements(b)) return 1.0
    val window = math.max(0, math.max(a.length, b.length) / 2 - 1)
    val mb = Array.fill(b.length)(false)
    val matchedA = a.indices.flatMap { i =>
      val hit = (math.max(0, i - window) to
        math.min(b.length - 1, i + window))
        .find(jj => !mb(jj) && a(i) == b(jj))
      hit.foreach(mb(_) = true)
      hit.map(jj => i)
    }
    val m = matchedA.size
    if (m == 0) return 0.0
    val bMatched = b.indices.filter(mb)
    val t = matchedA.zip(bMatched).count { case (i, k) => a(i) != b(k) } / 2
    (m.toDouble / a.length + m.toDouble / b.length +
      (m - t).toDouble / m) / 3.0
  }

  test("kernel: DuckDB-generated bit-exact fingerprints (incl. the " +
      "byte-walk multibyte cases)") {
    val cases: Seq[(String, String, Double, Double)] = Seq(
      ("MARTHA", "MARHTA", 0.9444444444444445, 0.9611111111111111),
      ("DWAYNE", "DUANE", 0.8222222222222223, 0.8400000000000001),
      ("DIXON", "DICKSONX", 0.7666666666666666, 0.8133333333333332),
      ("JELLYFISH", "SMELLYFISH", 0.8962962962962964, 0.8962962962962964),
      ("CRATE", "TRACE", 0.7333333333333334, 0.7333333333333334),
      ("abcd", "abcd", 1.0, 1.0),
      ("abcdefgh", "abcdxxxx", 0.6666666666666666, 0.6666666666666666),
      ("abcdefghij", "abcdefghix", 0.9333333333333332, 0.96),
      ("", "", 0.0, 0.0),
      ("a", "", 0.0, 0.0),
      ("ab", "ba", 0.0, 0.0),
      ("héllo", "hello", 0.8222222222222223, 0.8400000000000001),
      ("aé", "aé", 1.0, 1.0),
      ("漢字テスト", "漢字テント", 0.8854700854700855, 0.9312820512820513),
      ("aaab", "aaac", 0.8333333333333334, 0.8833333333333334),
      ("prefixmatch", "prefixmatXY", 0.8787878787878789, 0.9272727272727274))
    cases.foreach { case (a, b, ej, ejw) =>
      assert(j(a, b) == ej, s"jaro('$a','$b')")
      assert(jw(a, b) == ejw, s"jw('$a','$b')")
    }
  }

  test("boost rules: no boost at jaro <= 0.7 even with a shared " +
      "4-byte prefix; prefix counted in BYTES and capped at 4") {
    // jaro('abcdefgh','abcdxxxx') = 2/3 < 0.7 -> Winkler must NOT fire
    assert(jw("abcdefgh", "abcdxxxx") == j("abcdefgh", "abcdxxxx"))
    // 9-byte shared prefix boosts as 4: jw = j + 4*0.1*(1-j) exactly
    val base = j("abcdefghij", "abcdefghix")
    assert(jw("abcdefghij", "abcdefghix") == base + 4 * 0.1 * (1.0 - base))
    // 'é' shares only its FIRST byte with 'è' (0xC3) -> byte prefix 1
    val jm = j("était", "ètait")
    if (jm > 0.7)
      assert(jw("était", "ètait") == jm + 1 * 0.1 * (1.0 - jm))
  }

  test("kernel matches an independent collection-style mirror on a " +
      "deterministic multibyte fuzz set; symmetric; in [0,1]") {
    val rnd = new scala.util.Random(42)
    val alpha = "abcdeé漢 ."
    (1 to 500).foreach { _ =>
      val a = Seq.fill(rnd.nextInt(13))(alpha(rnd.nextInt(alpha.length)))
        .mkString
      val b = Seq.fill(rnd.nextInt(13))(alpha(rnd.nextInt(alpha.length)))
        .mkString
      assert(j(a, b) == refJaro(a, b), s"'$a' vs '$b'")
      assert(j(a, b) == j(b, a), s"symmetry: '$a' vs '$b'")
      assert(j(a, b) >= 0.0 && j(a, b) <= 1.0)
      assert(jw(a, b) >= j(a, b), s"boost can only raise: '$a' vs '$b'")
      assert(jw(a, b) <= 1.0)
    }
  }

  test("query: jw >= jaro on the real candidates; tier CASE routes " +
      "on the jw value") {
    val rows = SparkEntry.queries("dedup_jaro_winkler")(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ja = r.getAs[Double]("jaro")
      val w = r.getAs[Double]("jw")
      assert(w >= ja && w <= 1.0 && ja >= 0.0)
      val expect =
        if (w >= 0.9) "dup" else if (w >= 0.8) "near" else "far"
      assert(r.getAs[String]("tier") == expect)
    }
  }

  test("the SQL front door serves graft_jaro and graft_jaro_winkler") {
    val r = spark.sql(
      "SELECT graft_jaro('CRATE', 'TRACE') AS a, " +
        "graft_jaro_winkler('DWAYNE', 'DUANE') AS b").collect().head
    assert(r.getDouble(0) == 0.7333333333333334)
    assert(r.getDouble(1) == 0.8400000000000001)
  }
}
