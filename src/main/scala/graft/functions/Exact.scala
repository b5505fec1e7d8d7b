package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Oracle-parity arithmetic helpers.
  *
  * The driver hash-compares our parquet output against DuckDB running
  * the paired `oracleSql`. Floating-point aggregation order differs
  * between engines, so any plan that sums raw doubles is
  * nondeterministic at the last bits and can flip a rounded digit.
  * The rule used across every oracle-checked query:
  *
  *   1. Cast inputs to tightly-sized DECIMALs up front (the testdata's
  *      numerics are 2-decimal clean, verified in FIXTURES.md terms).
  *      A double→decimal cast rounds to nearest and can never hit an
  *      exact tie (no binary double sits exactly halfway between two
  *      scale-k decimals for k >= 1), so both engines produce the
  *      identical decimal.
  *   2. Do all sums/products in decimal — exact in both engines
  *      (Spark caps precision at 38; the widths below keep every
  *      intermediate within that, so no precision-loss rounding).
  *   3. Convert to double (or string) only in the final projection,
  *      and never `round()` a double: Spark's Round goes through the
  *      shortest-decimal representation while DuckDB rounds the binary
  *      value, and they disagree on values like 2.675.
  *
  * Quotients (averages, ratios) are computed as ONE IEEE division of
  * two identically-derived operands — bit-identical across engines.
  */
object Exact {
  /** Money-like columns (l_extendedprice, acctbal, …): 2-decimal clean. */
  def money(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Quantities (l_quantity): 2-decimal clean, small range. */
  def qty(c: Column): Column = c.cast(DecimalType(8, 2))

  /** Rates (l_discount, l_tax): 2-decimal clean, in [0,1]. */
  def rate(c: Column): Column = c.cast(DecimalType(4, 2))

  /** o_totalprice is NOT 2-decimal clean — widen so the cast is still
    * deterministic-nearest and sums stay exact. */
  def price6(c: Column): Column = c.cast(DecimalType(18, 6))

  /** Tightly-typed literal 1 so decimal products stay narrow: a plain
    * integer literal would widen to DECIMAL(11,1)+ and push triple
    * products past precision 38, triggering Spark's lossy rescale. */
  val one: Column = lit(1).cast(DecimalType(2, 0))

  /** `l_extendedprice * (1 - l_discount)` exactly: DECIMAL(18,4). */
  def discPrice(price: Column, disc: Column): Column =
    money(price) * (one - rate(disc))

  /** `l_extendedprice * (1 - l_discount) * (1 + l_tax)` exactly. */
  def charge(price: Column, disc: Column, tax: Column): Column =
    discPrice(price, disc) * (one + rate(tax))

  /** Final projection of an exact decimal aggregate to DOUBLE. */
  def asD(c: Column): Column = c.cast(DoubleType)

  /** Exact-decimal mean: one IEEE division, no rounding. */
  def meanOf(sum: Column, n: Column): Column =
    sum.cast(DoubleType) / n.cast(DoubleType)

  // ---- SQL (DuckDB) sides of the same helpers, for oracle strings ----
  def sqlMoney(e: String) = s"CAST($e AS DECIMAL(12,2))"
  def sqlQty(e: String) = s"CAST($e AS DECIMAL(8,2))"
  def sqlRate(e: String) = s"CAST($e AS DECIMAL(4,2))"
  def sqlPrice6(e: String) = s"CAST($e AS DECIMAL(18,6))"
  val sqlOne = "CAST(1 AS DECIMAL(2,0))"
  def sqlDiscPrice(p: String, d: String) =
    s"${sqlMoney(p)} * ($sqlOne - ${sqlRate(d)})"
  def sqlCharge(p: String, d: String, t: String) =
    s"${sqlDiscPrice(p, d)} * ($sqlOne + ${sqlRate(t)})"
}
