package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Long-cents fast path for exact money/quantity aggregation.
  *
  * The oracle-parity convention (`graft.queries.dec`) aggregates in
  * DecimalType(18,2): exact and order-independent, but every Decimal
  * sum runs through Spark's Decimal objects — an order of magnitude
  * more per-row work than a primitive long add, and the aggregation
  * buffer is unsafe-row Decimal instead of a mutable long slot.
  *
  * This path scales 2-dp values to integer CENTS (one codegen'd
  * round+cast at the scan), aggregates primitive longs (HashAggregate
  * with mutable primitive buffers, map-side combinable, vectorized),
  * and descales ONCE at the end. Results are bit-identical to the
  * decimal path for inputs with <= 2 decimal places: both compute the
  * same exact integer, and the final double conversion is one IEEE
  * division.
  *
  * Overflow headroom: a long holds ~9.2e18; at 1e6 cents (=$10,000)
  * per row the sum stays exact past 9e12 rows PER GROUP — comfortably
  * beyond 100 TB of lineitem rows. For adversarial magnitudes, fall
  * back to the decimal path (Spark promotes its sum precision) or
  * pre-aggregate per partition.
  */
object Cents {

  /** 2-dp value -> integer cents (exact for <=2-dp inputs). */
  def toCents(c: Column): Column = round(c * 100).cast(LongType)

  /** Cents sum -> exact double units (one IEEE division). */
  def fromCents(c: Column): Column = c.cast("double") / 100.0

  /** sum(col) in units, computed in cents: drop-in for
    * `sum(dec(c)).cast("double")`.
    */
  def sumUnits(c: Column): Column = fromCents(sum(toCents(c)))

  /** avg(col) in units, computed in cents: drop-in for
    * `sum(dec(c)).cast("double") / count(1)` — descale BEFORE the
    * count division so the IEEE rounding sequence matches the decimal
    * path bit-for-bit (descale-last differs in the final ulp).
    */
  def avgUnits(c: Column, n: Column): Column =
    fromCents(sum(toCents(c))) / n

  /** sum(a * (1 - b)) for 2-dp a, b — the discount-price shape —
    * computed in exact integer (cents x cents = 1e-4 units), descaled
    * once.
    */
  def sumProdComplement(a: Column, b: Column): Column =
    sum(toCents(a) * (lit(100L) - toCents(b))).cast("double") / 10000.0
}
