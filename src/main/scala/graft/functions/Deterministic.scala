package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic arithmetic helpers.
  *
  * Two failure classes make naive `round(sum(double))` oracle-unstable:
  *
  *  1. Summation order: Spark's partial aggregation sums doubles in
  *     partition order, which changes with `shuffle.partitions`; DuckDB
  *     sums in file order. The results differ at the ulp level, and when
  *     the true value sits on a rounding boundary (common here — the
  *     source data is 2-decimal-quantized), the rounded outputs diverge.
  *  2. round() implementation: Spark converts the double to BigDecimal
  *     (exact binary expansion) and applies HALF_UP; DuckDB rounds via
  *     binary multiply. At exact .5 boundaries they can disagree.
  *
  * Fixes, used by every oracle-checked query:
  *  - [[rd]]: rounding as pure IEEE ops (`floor(x·10ⁿ + 0.5)/10ⁿ`) —
  *    identical in any engine given the same input double. The oracle
  *    SQL spells the same expression.
  *  - [[qsum]]/[[qavg]]: quantize each value to integer 10⁻ⁿ units
  *    per row (per-row doubles are bit-identical across engines), sum
  *    as BIGINT — exact, order-independent, partition-count-independent.
  *    Bounds: values×10ⁿ must stay under 2^63 in the sum (~9.2e18;
  *    600k-row revenue sums at n=6 use <1e17).
  */
object Deterministic {

  private def p10(n: Int): Double = math.pow(10, n)

  /** Deterministic round-half-up via pure IEEE ops. */
  def rd(c: Column, n: Int): Column =
    floor(c * lit(p10(n)) + lit(0.5)) / lit(p10(n))

  /** Exact order-independent sum of n-dp-quantized values. */
  def qsum(c: Column, n: Int): Column =
    sum(floor(c * lit(p10(n)) + lit(0.5)).cast("long")).cast("double") / lit(p10(n))

  /** Exact order-independent mean of n-dp-quantized values (null-skipping,
    * like avg). */
  def qavg(c: Column, n: Int): Column =
    sum(floor(c * lit(p10(n)) + lit(0.5)).cast("long")).cast("double") /
      (count(c) * lit(p10(n)))

}
