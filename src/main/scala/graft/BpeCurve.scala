package graft

import org.apache.spark.sql.functions._

/** Dev-only cost-curve harness for the BPE counter (round-13 VERDICT
  * directive 3): times the t22-shaped workload (per-source sum of BPE
  * counts over documents) at growing merges-table sizes, for the
  * three forms —
  *  - ranked:     the execution path (pair-rank greedy merge,
  *                table-size-independent per word)
  *  - sequential: the reference rule-scan loop (O(rules·word)/word),
  *                driven through a Dataset map at ≤2500 rules
  *  - composed:   the unrolled-HOF oracle form, ≤250 rules (its
  *                analyzer wall is ~250 — the memory-noted limit)
  * min-of-2 per cell (TimeQuery's convention).
  *
  * Usage: runMain graft.BpeCurve /root/testdata/sf0.1
  */
object BpeCurve {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = Sessions.local(cpus)
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    val docs = Tables.documents(spark, dir).select(col("source"), col("text"))
      .localCheckpoint()
    def time(label: String)(body: => Unit): Unit =
      try {
        val ts = (1 to 2).map { _ =>
          val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
        }
        println(f"[bpecurve] $label%-18s min ${ts.min}%8.2f s  (runs ${ts.map(t => f"$t%.2f").mkString(", ")})")
      } catch {
        // the composed form's nested-HOF tree dies in ANALYSIS past a
        // few hundred rules (stack overflow) — record it as a data point
        case t: Throwable =>
          println(s"[bpecurve] $label FAILED: ${t.getClass.getSimpleName}: " +
            s"${Option(t.getMessage).getOrElse("").take(120)}")
      }
    for (n <- Seq(25, 250, 2500, 10000, 32000, 50000)) {
      val merges = graft.operators.TextOps.syntheticMerges(n)
      require(merges.length == n, s"syntheticMerges too small: ${merges.length} < $n")
      time(s"ranked n=$n") {
        docs.select(sum(graft.operators.TextOps.bpeTokenCount(col("text"), merges)))
          .collect()
      }
      if (n <= 2500) {
        val lefts = merges.map(_._1).toArray
        val rights = merges.map(_._2).toArray
        time(s"sequential n=$n") {
          docs.select(col("text")).as[String]
            .map(t => graft.plans.BpeApply.countTokens(
              org.apache.spark.unsafe.types.UTF8String.fromString(t), lefts, rights))
            .select(sum(col("value"))).collect()
        }
      }
      if (n <= 250) time(s"composed n=$n") {
        docs.select(sum(graft.operators.TextOps.bpeTokenCountComposed(col("text"), merges)))
          .collect()
      }
    }
    spark.stop()
  }
}
