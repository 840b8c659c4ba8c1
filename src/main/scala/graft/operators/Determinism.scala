package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Helpers that make floating aggregates hash-stable across engines and
  * across partition orderings (SURVEY §2.4 determinism rules, §7.4 item 1).
  *
  * Double addition is not associative, and Spark's partial/final aggregation
  * sums partitions in nondeterministic order. Casting the 2-decimal corpus
  * columns to DECIMAL(18,2) before SUM makes the fold exact and
  * order-independent; the final cast back to DOUBLE is then bit-deterministic
  * and matches DuckDB evaluating the same expression.
  */
object Determinism {
  /** Order-independent sum of a monetary/quantity double column. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Order-independent sum of a product of two 2-decimal double columns. */
  def dsumProd(a: Column, b: Column): Column =
    sum(a.cast(DecimalType(18, 2)) * b.cast(DecimalType(18, 2))).cast("double")

  /** Order-independent average (exact decimal sum / exact count). */
  def davg(c: Column): Column =
    (sum(c.cast(DecimalType(18, 2))).cast("double") / count(lit(1)))
}
