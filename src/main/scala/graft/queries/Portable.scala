package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Oracle-parity arithmetic shared by every query group.
  *
  * Raw money columns are 2-decimal; products have ≤4 decimals. Double
  * sums differ in the last ulp between engines (summation order), and
  * round(double) itself differs at .xx5 boundaries (Spark rounds the
  * shortest decimal repr HALF_UP, DuckDB the binary value). So:
  *  - sums of money values accumulate as DECIMAL(18,4) — exact and
  *    order-independent — and are rounded in decimal domain;
  *  - quotients (avgs, ratios) round via floor(x*10^d + 0.5)/10^d,
  *    which is the same double arithmetic in both engines.
  */
object Portable {
  /** Exact, order-independent sum of ≤4-decimal values, as double. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast("double")
  def dsumSql(x: String): String =
    s"CAST(sum(CAST($x AS DECIMAL(18,4))) AS DOUBLE)"

  /** Exact money sum rounded in decimal domain (HALF_UP both engines). */
  def moneySum(c: Column, d: Int = 2): Column =
    round(sum(c.cast(DecimalType(18, 4))), d).cast("double")
  def moneySumSql(x: String, d: Int = 2): String =
    s"CAST(round(sum(CAST($x AS DECIMAL(18,4))), $d) AS DOUBLE)"

  /** Portable double rounding: identical float ops in both engines. */
  def pround(c: Column, d: Int): Column = {
    val p = math.pow(10, d)
    floor(c * lit(p) + lit(0.5)).cast("double") / lit(p)
  }
  def proundSql(x: String, d: Int): String = {
    val p = math.pow(10, d)
    s"floor(($x) * $p + 0.5) / $p"
  }
}
