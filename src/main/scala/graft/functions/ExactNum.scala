package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Exact-arithmetic helpers for oracle parity (SURVEY.md §6).
  *
  * Doubles with fixed decimal scale (money, 2dp) are cast to DECIMAL
  * before aggregation so sums are exact and independent of partition
  * order — the property that makes results bit-identical between Spark
  * (distributed, arbitrary merge order) and a single-node SQL oracle.
  */
object ExactNum {
  /** 2-decimal double → DECIMAL(18,2), exact for money-scale values. */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Order-independent exact sum of a 2-decimal double, as DOUBLE. */
  def sumd(c: Column): Column = sum(dec2(c)).cast("double")

  /** Exact sum of products of two 2-decimal doubles, as DOUBLE.
    * DECIMAL×DECIMAL is exact (scale 4), so co-moments for
    * variance/correlation are order-independent too. */
  def sumProd(a: Column, b: Column): Column = sum(dec2(a) * dec2(b)).cast("double")

  /** Mean from exact sum: one deterministic FP division. */
  def meand(c: Column): Column = sum(dec2(c)).cast("double") / count(lit(1))
}
