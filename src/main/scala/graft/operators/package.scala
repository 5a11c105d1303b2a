package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared helpers for oracle-checked queries.
  *
  * Sums/averages of doubles are order-dependent at ULP level, and Spark's
  * partial aggregation order differs from DuckDB's. Casting to DECIMAL(18,2)
  * (the testdata's native precision) makes the sum exact and
  * order-independent in both engines; the final cast back to double is then
  * a single, deterministic rounding. Counts stay exact. This keeps the
  * driver's hash-compare stable without weakening the operators.
  */
package object operators {
  /** Order-independent exact sum of a 2-decimal double column, as double. */
  def exactSum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Deterministic mean: exact decimal sum divided by count (double/long). */
  def exactAvg(c: Column): Column =
    exactSum(c) / count(lit(1))
}
