package graft

import org.apache.spark.sql.functions.col

/** Dev-only per-stage profiler for the composed curate ledger
  * (e2e_curate) — the [[TimeQuery]] companion that answers "WHICH
  * stage dominates at ×N" instead of "how long does the whole ledger
  * take".
  *
  * Method: the curate flags are cumulative COLUMNS of one flagged
  * frame, built forward — selecting `(doc_id, flag_k)` lets Catalyst
  * prune every later stage's join subtree while the earlier stages
  * (which the flag depends on) all execute. Timing the cuts in
  * pipeline order and differencing neighbours attributes wall-clock
  * per stage. Stage-internal localCheckpoints (the LM token frame)
  * materialize in the first cut that needs them and are reused by
  * later cuts — exactly the sharing the real ledger run gets, so the
  * deltas sum to ≈ the full-ledger wall (printed last as the check).
  *
  * Usage: runMain graft.CurateProfile <dir1>[,<dir2>,...] [variant]
  * (variant: curate | full | fixed — which e2e config to profile)
  */
object CurateProfile {
  def main(args: Array[String]): Unit = {
    val dirs = args(0).split(",").toSeq
    val variant = args.lift(1).getOrElse("curate")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = Sessions.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect() // JVM warm
    dirs.foreach { dir =>
      val flagged = (variant match {
        case "full" => Corpus.e2eFullResult(spark, dir)
        case "fixed" => Corpus.e2eFixedResult(spark, dir)
        case _ => Corpus.e2eResult(spark, dir)
      }).flagged
      var prev = 0.0
      Corpus.StageFlags.foreach { case (name, flag) =>
        val t0 = System.nanoTime()
        val n = flagged.select(col("doc_id"), flag.as("__f"))
          .queryExecution.toRdd.count()
        val t = (System.nanoTime() - t0) / 1e9
        println(f"[profile] $dir $name%-16s cut: $t%7.2f s  delta: ${t - prev}%7.2f s  ($n rows)")
        prev = t
      }
      val t0 = System.nanoTime()
      val n = Corpus.e2eCurate(spark, dir).queryExecution.toRdd.count()
      println(f"[profile] $dir full ledger: ${(System.nanoTime() - t0) / 1e9}%7.2f s ($n rows)")
    }
    spark.stop()
  }
}
