package graft

import org.apache.spark.sql.functions._

/** Plan lint: structural rules every inventory query must satisfy —
  * the automated version of the PLANS.md audit. */
class PlanLintSpec extends SparkSuite {

  test("no query plans a non-broadcast cartesian product") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("no query plans an un-partitioned window over unbounded input") {
    // Window with an empty partition spec funnels the whole input
    // through ONE task — the round-1 m11 bug. A window whose input is
    // already bounded (below an Aggregate or Limit, e.g. c5's
    // distinct-values encoder) is fine — PROVIDED the aggregate's key
    // cardinality is bounded by the SCHEMA, not the data. Audit of the
    // empty-partition windows this lint admits: q23 (25 nations), q24
    // (calendar days), m16 (corpus sources), mm6 (16 hex shards) are
    // all schema/domain-bounded. q26 was NOT (suppliers scale with SF,
    // ~750M rows at 100 TB) and was rewritten as a 1-row agg +
    // broadcast join; any new empty-partition window over a
    // data-cardinality aggregate needs the same rewrite.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, Window => LWindow}
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val hits = fn(spark, sf).queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.isEmpty &&
            !w.child.exists(p => p.isInstanceOf[Aggregate] || p.isInstanceOf[GlobalLimit]) =>
          w
      }
      if (hits.nonEmpty) Some(name) else None
    }
    assert(offenders.isEmpty, s"un-partitioned windows over unbounded input in: $offenders")
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
