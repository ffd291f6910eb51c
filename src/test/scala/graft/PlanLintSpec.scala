package graft

import org.apache.spark.sql.functions._

/** Plan lint: structural rules every inventory query must satisfy —
  * the automated version of the PLANS.md audit. */
class PlanLintSpec extends SparkSuite {

  /** Every inventory query built ONCE and shared by the whole-inventory
    * lints below: construction is not free (plan-time count() scalars,
    * the trained keys' fits, i8's bucketed writes), and building all
    * 214 frames per lint was most of this suite's wall time. */
  private lazy val builtQueries: Seq[(String, org.apache.spark.sql.DataFrame)] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (n, f) => n -> f(spark, sf) }

  test("no query plans a non-broadcast cartesian product") {
    val offenders = builtQueries.flatMap { case (name, df) =>
      val plan = df.queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  /** Count of windows with an EMPTY partition spec anywhere in the
    * optimized plan — no structural excuses. */
  private def emptySpecWindows(df: org.apache.spark.sql.DataFrame): Int = {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    df.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }.size
  }

  /** The ONLY queries allowed to plan an empty-partition window, each
    * with its human audit. The pre-round-6 lint excused ANY window
    * whose child contained an Aggregate/Limit — but that is exactly
    * the q26 bug class (its scale-killer WAS a window over a
    * supplier-cardinality aggregate, ~750M rows at 100 TB). What
    * makes these four safe is the AUDIT — the aggregate's cardinality
    * is bounded by the SCHEMA/domain, a fact no plan shape can prove —
    * so the lint is an explicit allowlist: a new empty-spec window
    * anywhere else fails this suite and forces the same review. */
  private val auditedEmptySpecWindows = Map(
    "q23_revenue_share" -> "25 nation rows (schema-bounded dim)",
    "q24_daily_audience" -> "calendar days (domain-bounded)",
    "m16_domain_mix" -> "corpus sources (contract-bounded)",
    "m25_weighted_mix" -> "corpus sources (contract-bounded, m16's bound)",
    "mm6_shard_plan" -> "16 hex shards (construction-bounded)",
    "c5_label_encode" -> ("distinct values of a label-encode column — " +
      "contract-bounded: label encoding is only for low-cardinality " +
      "columns (the reference's nunique gate; c6 frequency encoding " +
      "is the high-cardinality path and uses a partitioned window)"),
    "m22_auc" -> ("B=1000 score bins (construction-bounded knob — the " +
      "cumulative ROC walk sees at most B rows regardless of SF)"),
    "m27_ks_test" -> ("B=200 value bins (construction-bounded knob — " +
      "the ECDF walk sees at most B rows regardless of SF; m22's bound)"),
    "t21_shuffle_shards" -> ("buckets=4096 order-aligned hash ranges " +
      "(construction-bounded knob — the cumulative-offset walk sees at " +
      "most `buckets` rows regardless of SF; per-doc ranking is the " +
      "bucket-partitioned window, max task = corpus/buckets)"),
    "m30_mann_whitney" -> ("B=200 value bins (construction-bounded knob — " +
      "the below-bin cumulative walk sees at most B rows regardless of " +
      "SF; m27's bound, same histogram)"))

  test("empty-partition windows appear ONLY in the audited allowlist") {
    val have = builtQueries.flatMap { case (name, df) =>
      if (emptySpecWindows(df) > 0) Some(name) else None
    }.toSet
    val unaudited = have -- auditedEmptySpecWindows.keySet
    assert(unaudited.isEmpty,
      s"NEW un-audited empty-partition windows in: $unaudited — either rewrite " +
        "(1-row agg + broadcast join back, q26's fix) or audit the bound and allowlist")
    val stale = auditedEmptySpecWindows.keySet -- have
    assert(stale.isEmpty, s"allowlist entries with no empty-spec window anymore: $stale")
  }

  test("the lint catches the q26 bug class the old aggregate-child excuse admitted") {
    import org.apache.spark.sql.expressions.Window
    // supplier-cardinality aggregate (grows with SF) + empty-spec max
    // window — q26's original scale-killer, verbatim shape
    val bad = Tables.lineitem(spark, sf)
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_extendedprice")).as("rev"))
      .withColumn("mx", max(col("rev")).over(Window.partitionBy()))
      .filter(col("rev") === col("mx"))
    assert(emptySpecWindows(bad) == 1, "the allowlist lint must flag this shape")
    // and the OLD predicate (excuse any window over an Aggregate) would not have:
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, Window => LWindow}
    val oldHits = bad.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty &&
          !w.child.exists(p => p.isInstanceOf[Aggregate] || p.isInstanceOf[GlobalLimit]) => w
    }
    assert(oldHits.isEmpty, "(this documents the hole the allowlist closes)")
  }

  test("every lineitem-scanning relational query prunes its read schema") {
    // q6 needs 4 of lineitem's 11 columns; the scan must not read more
    val plan = operators.Relational.q6(spark, sf).queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_orderkey") && !readSchema.contains("l_returnflag"),
      s"q6 reads unneeded columns: $readSchema")
  }

  test("results are AQE-independent on the queries that lean on it hardest") {
    // The engine DESIGNS for AQE (unhinted joins promote from runtime
    // sizes), but a deployment can disable it — plans may differ,
    // results must not. Sampled: the unhinted-broadcast queries (t8,
    // q21), the ReusedExchange one (q26), and a multi-join (q2).
    val names = Seq("q2_revenue_by_nation", "t8_unigram_logprob",
      "q26_top_supplier", "q21_volume_shipping")
    val on = names.map(n => SparkEntry.queries(n)(spark, sf).collect().map(_.toSeq))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val off = names.map(n => SparkEntry.queries(n)(spark, sf).collect().map(_.toSeq))
      names.lazyZip(on).lazyZip(off).foreach { (n, a, b) =>
        assert(a.length == b.length && a.zip(b).forall { case (x, y) => x == y },
          s"$n differs with AQE off")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("vizData produces render-ready aggregates for any frame") {
    val ev = Tables.events(spark, sf).drop("props")
    val v = Pipeline.vizData(ev, "event_type")
    assert(v.overview.head().getLong(0) === ev.count())
    assert(v.targetDistribution.count() === 5) // ≤20 distinct → counts
    assert(v.corrMatrix.columns.toSeq === Seq("col_a", "col_b", "corr"))
    assert(v.histograms.groupBy("col_name").count().count() > 0)
    val vNum = Pipeline.vizData(ev, "value")
    assert(vNum.targetDistribution.columns.contains("bucket")) // >20 distinct → histogram
  }
}
