package graft

import org.apache.spark.sql.SparkSession

/** The ONE place the engine's session tuning lives. Verify, Bench,
  * and PlanDump used to each restate the same builder config; a user
  * deploying the library gets the same defaults via [[local]] or can
  * graft them onto an existing builder via [[tune]].
  *
  * What's set and why (the 100 TB rationale, applied at any scale):
  *  - AQE on + skew-join on: runtime re-planning is what turns the
  *    library's deliberately UNHINTED joins (t8's tf table, q21's
  *    supplier, st9's dim) into broadcasts exactly when they fit —
  *    and splits skewed shuffle partitions nobody predicted.
  *  - shuffle.partitions follows the parallelism argument instead of
  *    the 200 default: on local[N] anything else under- or
  *    over-splits every exchange; cluster deployments pass their own
  *    (usually 2-3× total cores, AQE coalesces the excess).
  *  - session timezone UTC: every oracle-checked timestamp rule
  *    (SURVEY §6.4) assumes it; a TZ-naive deployment would silently
  *    shift date_trunc/extract results.
  *  - GraftExtensions: registers the custom Catalyst surface
  *    (graft_cosine, graft_jaccard, the as-of join strategy). Pure
  *    SQL/DataFrame users lose nothing without it; the custom
  *    operators fall back (AsOfJoin has a union+window twin).
  */
object Sessions {

  /** Apply the engine's tuning to an existing builder. */
  def tune(b: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder =
    b.config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")

  /** Local session with `cpus` threads — the driver-contract mains'
    * entry point (UI off: these are headless batch runs). */
  def local(cpus: Int, ui: Boolean = false): SparkSession = {
    val s = tune(SparkSession.builder().master(s"local[$cpus]"), cpus)
      .config("spark.ui.enabled", ui.toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
