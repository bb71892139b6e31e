package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine FP-stable arithmetic helpers.
  *
  * Summing doubles is order-dependent, so a Spark sum and a DuckDB sum of the
  * same column can differ in the last ulps and break hash comparison. All
  * money-like fixture columns carry exactly 2 decimal digits, so accumulating
  * through DECIMAL(18,2) is exact (and identical in any engine); the final
  * cast back to double is a single deterministic conversion.
  */
object Exact {
  private val dec = DecimalType(18, 2)

  /** Exact decimal sum of a 2-decimal double column, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(dec)).cast("double")

  /** Exact decimal sum of `price * (1 - discount)` (both 2-decimal). */
  def dsumRevenue(price: Column, discount: Column): Column =
    sum(price.cast(dec) * (lit(1).cast(dec) - discount.cast(dec))).cast("double")
}
