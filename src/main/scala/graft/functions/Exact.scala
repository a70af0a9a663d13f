package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine-exact numeric helpers.
  *
  * Floating-point SUM/AVG are accumulation-order dependent: Spark's
  * partial/final aggregation over shuffled partitions and DuckDB's
  * sequential scan can legally differ in the last ulp, which breaks the
  * driver's hash-compare against the DuckDB oracle. Casting each value to
  * a decimal before summing makes the aggregate exact (and therefore
  * order-independent) in BOTH engines; the final cast back to double is a
  * single deterministic conversion. This is also the right call at 100 TB:
  * money-style aggregates stay exact no matter how AQE re-partitions.
  */
object Exact {
  /** 2-decimal money semantics (TPC-H style values). */
  def dec2(c: Column): Column = c.cast(DecimalType(12, 2))
  /** 6-decimal for arbitrary measure doubles. */
  def dec6(c: Column): Column = c.cast(DecimalType(18, 6))

  def sumExact2(c: Column): Column = sum(dec2(c)).cast("double")
  def sumExact6(c: Column): Column = sum(dec6(c)).cast("double")

  /** Exact mean: exact decimal sum divided by count, both deterministic. */
  def avgExact2(c: Column): Column =
    (sum(dec2(c)).cast("double") / count(c)).cast("double")
}
