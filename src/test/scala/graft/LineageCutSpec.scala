package graft

import org.apache.spark.sql.functions._

/** The lineage-cut knob (round-15 VERDICT directive 4): the cluster
  * fault-tolerance design claim is a Config mode, not a comment — both
  * modes must be semantics-neutral at every cut site, and both must
  * actually CUT (Config's Scaladoc records the measured persist
  * failure: cached-but-uncut lineage sent the composed curate key's
  * analysis combinatorial). The full oracle sweep runs green under
  * both modes per round (PLANS.md); this spec pins the primitive's
  * contract and the heaviest cut-using operators cross-mode
  * in-process.
  */
class LineageCutSpec extends SparkSuite {

  private def withMode[A](m: Config.LineageCut)(body: => A): A = {
    val prev = Config.lineageCut
    Config.lineageCut = m
    try body finally Config.lineageCut = prev
  }

  test("cut() is semantics-neutral and PLAN-EQUAL across modes: both truncate to the same leaf shape") {
    val df = Tables.documents(spark, sf)
      .select(col("doc_id"), length(col("text")).as("len"))
    val want = df.orderBy(col("doc_id")).collect().toSeq
    def leaf(m: Config.LineageCut) = withMode(m) {
      val c = Config.cut(df)
      assert(c.schema === df.schema)
      assert(c.orderBy(col("doc_id")).collect().toSeq === want)
      c.queryExecution.analyzed.getClass.getSimpleName
    }
    val l = leaf(Config.LocalCheckpoint)
    val r = leaf(Config.ReliableCheckpoint)
    // plan equality of the cut frames: the lineage is GONE in both
    // modes — each analyzes to the same single leaf node class
    // (LogicalRDD over the materialized blocks), so downstream
    // analysis/optimization cost is identical whichever mode runs
    assert(l === r)
    assert(l === "LogicalRDD", s"cut frame should be a materialized leaf, got $l")
  }

  test("cut-heavy operators are mode-invariant: d6 / d7 / e2e_curate_fixed byte-identical across modes") {
    def run(key: String) =
      SparkEntry.queries(key)(spark, sf).collect().map(_.toSeq).toSeq
    for (key <- Seq("d6_decontaminate", "d7_neardup_clusters", "e2e_curate_fixed")) {
      val local = withMode(Config.LocalCheckpoint) { run(key) }
      val reliable = withMode(Config.ReliableCheckpoint) { run(key) }
      assert(reliable === local, s"$key diverged between lineage-cut modes")
    }
  }

  test("reliable eager cut: subtree computed ONCE (checkpoint-twice stays fixed) and zero persistent RDDs left behind") {
    withMode(Config.ReliableCheckpoint) {
      val sc = spark.sparkContext
      val before = sc.getPersistentRDDs.keySet
      // Count actual computes of the pre-cut subtree with an
      // accumulator-bearing UDF (test-only; main source bans UDFs).
      // Local mode, no speculation/retries: the count is exact.
      val acc = sc.longAccumulator("subtree-computes")
      val tick = udf((x: Long) => { acc.add(1L); x })
      val df = spark.range(0, 1000, 1, 4).toDF("id")
        .select(tick(col("id")).as("id"))
      val cut = Config.cut(df) // eager
      // One compute: the materialization job fills the DISK_ONLY
      // cache and the trailing checkpoint-write job READS that cache
      // (the r16 trap was 2× here: 1000 → 2000)
      assert(acc.value === 1000L,
        s"checkpoint-twice trap regressed: subtree computed ${acc.value / 1000.0}x")
      // consumers read checkpoint blocks, never the subtree
      cut.agg(sum(col("id"))).collect()
      cut.count()
      assert(acc.value === 1000L, "a consumer recomputed the cut subtree")
      // directive-2 gate: the redundant DISK_ONLY copy is dropped the
      // moment the eager checkpoint returns — nothing accumulates
      // across the session's 25 cut sites
      val leaked = sc.getPersistentRDDs.keySet -- before
      assert(leaked.isEmpty, s"DISK_ONLY cut copy leaked persistent RDDs: $leaked")
    }
  }

  test("reliable lazy cut: plan construction runs nothing; persist drops once the first action materializes the checkpoint") {
    withMode(Config.ReliableCheckpoint) {
      val sc = spark.sparkContext
      val before = sc.getPersistentRDDs.keySet
      val acc = sc.longAccumulator("lazy-subtree-computes")
      val tick = udf((x: Long) => { acc.add(1L); x })
      val df = spark.range(0, 800, 1, 4).toDF("id")
        .select(tick(col("id")).as("id"))
      val cut = Config.cut(df, eager = false)
      assert(acc.value === 0L, "lazy cut executed the subtree at plan time")
      assert(cut.count() === 800L) // first action: compute + checkpoint write
      assert(acc.value === 800L, "first action on a lazy cut computed the subtree more than once")
      // the job-end listener drains asynchronously (the write job's
      // own end event is the earliest trigger) — poll, nudging the
      // bus with no-op jobs
      val deadline = System.currentTimeMillis() + 15000
      while (System.currentTimeMillis() < deadline &&
        (sc.getPersistentRDDs.keySet -- before).nonEmpty) {
        spark.range(1).count(): Unit
        Thread.sleep(100)
      }
      val leaked = sc.getPersistentRDDs.keySet -- before
      assert(leaked.isEmpty, s"lazy cut's DISK_ONLY copy not dropped after materialization: $leaked")
      // and the cut frame still reads blocks, not the subtree
      assert(cut.count() === 800L)
      assert(acc.value === 800L)
    }
  }

  test("SPARK_GRAFT_LINEAGE_CUT parsing: the env contract the sweep mains rely on") {
    // the parse itself ran at object init from the real env (unset in
    // tests → LocalCheckpoint default); pin the mapping the mains use
    def parse(v: Option[String]): Config.LineageCut =
      v.map(_.toLowerCase) match {
        case Some("reliablecheckpoint") | Some("reliable") => Config.ReliableCheckpoint
        case _ => Config.LocalCheckpoint
      }
    assert(parse(None) === Config.LocalCheckpoint)
    assert(parse(Some("reliableCheckpoint")) === Config.ReliableCheckpoint)
    assert(parse(Some("reliable")) === Config.ReliableCheckpoint)
    assert(parse(Some("anything-else")) === Config.LocalCheckpoint)
  }
}
