package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Exact-arithmetic helpers for aggregates whose results are compared
  * hash-for-hash against a DuckDB oracle.
  *
  * Summing doubles in parallel is order-dependent in the last ulp, so a
  * `sum(double)` can differ between Spark and any other engine. All money
  * columns in the test tables carry exactly two decimals (verified against
  * the parquet files), so casting to DECIMAL before aggregating makes the
  * aggregation exact and engine-independent; the final cast back to double
  * is a single deterministic conversion. The same pattern must be used on
  * the oracle side (`CAST(SUM(CAST(x AS DECIMAL(15,2))) AS DOUBLE)`).
  *
  * This is also the right posture at 100 TB: decimal partial aggregates are
  * still map-side combinable, and the result does not drift with the
  * (nondeterministic) merge order of thousands of shuffle partitions.
  */
object Exact {
  val Money: DecimalType = DecimalType(15, 2) // prices / balances / values
  val Pct: DecimalType   = DecimalType(4, 2)  // discount / tax in [0,1]

  def money(c: Column): Column = c.cast(Money)
  def pct(c: Column): Column   = c.cast(Pct)

  /** Exact SUM of a 2-decimal double column, returned as double. */
  def sumMoney(c: Column): Column = sum(money(c)).cast("double")

  /** Exact AVG of a 2-decimal double column, returned as double.
    * sum is exact decimal; the single double division is deterministic. */
  def avgMoney(c: Column): Column = sum(money(c)).cast("double") / count(c)

  /** Exact SUM of an integral-valued double column (e.g. l_quantity). */
  def sumIntegral(c: Column): Column = sum(c.cast("long"))

  /** lineitem revenue: l_extendedprice * (1 - l_discount), exact. */
  def discPrice(price: Column, discount: Column): Column =
    money(price) * (lit(1).cast(Pct) - pct(discount))

  /** lineitem charge: l_extendedprice * (1 - l_discount) * (1 + l_tax). */
  def charge(price: Column, discount: Column, tax: Column): Column =
    discPrice(price, discount) * (lit(1).cast(Pct) + pct(tax))
}
