package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Quantile aggregates with a scale-safe DEFAULT — the single
  * chokepoint every graft percentile call site goes through.
  *
  * Spark has two quantile aggregate forms with very different memory
  * contracts:
  *
  *  - `approx_percentile` — a fixed-memory rank sketch
  *    (Greenwald-Khanna). The aggregation buffer is O(accuracy)
  *    regardless of the column's distinct count, and the guarantee is
  *    a RANK error: the returned value's rank is within n/accuracy of
  *    the requested one. This is the only admissible default for
  *    unbounded-domain columns (prices, measurements, durations): at
  *    100 TB an exact per-group value→count map is O(rows/group) on
  *    the single merge task that finalizes each group — an executor
  *    OOM, not a slowdown.
  *
  *  - exact `percentile` — a mergeable value→count map with type-7
  *    (rank q·(n−1)) linear interpolation, bit-matching DuckDB's
  *    `quantile_cont`. Memory is O(distinct values per group), which
  *    is bounded only when the value DOMAIN is (l_quantity: 50
  *    values; ratings; ordinal codes). Use it for bounded domains and
  *    for oracle-parity paths — the sketch's answers are
  *    algorithm-specific and match no other engine bit-for-bit.
  *
  * Default = the sketch (`exact = false`). Exact is the opt-in, and a
  * call site passing `exact = true` over an unbounded-domain column
  * is declaring that column's distinct count bounded — PlanLintSpec
  * audits the inventory's exact call sites against this rule.
  */
object Quantiles {

  /** Sketch accuracy knob: rank error ≤ n/accuracy. 10k ⇒ ±0.01% of
    * rank — tighter than any downstream gate in this library — at a
    * few hundred KB per aggregation buffer. */
  val DefaultAccuracy = 10000

  /** Quantile aggregate column: `quantile(c, 0.5)` is the scale-safe
    * sketch median; `quantile(c, 0.5, exact = true)` is the
    * bounded-domain / oracle form. */
  def quantile(c: Column, p: Double, exact: Boolean = false,
               accuracy: Int = DefaultAccuracy): Column =
    if (exact) percentile(c, lit(p))
    else percentile_approx(c, lit(p), lit(accuracy))
}
