package graft

/** Dev-only single-query timer — the scale-rehearsal companion to
  * [[PlanDump]]. Runs each named SparkEntry query `reps` times
  * against each given SF dir and prints per-run wall-clock and row
  * counts; min-of-reps is the number PLANS.md records (run 1 absorbs
  * codegen/JIT, same convention as Bench). The ×N rehearsal dirs come
  * from scripts/make_scale_corpus.py.
  *
  * Usage: runMain graft.TimeQuery <dir1>[,<dir2>,...] <query> [reps=2]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val dirs = args(0).split(",").toSeq
    val name = args(1)
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = Sessions.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect() // JVM warm
    dirs.foreach { dir =>
      val times = (1 to reps).map { r =>
        val t0 = System.nanoTime()
        // toRdd.count: full-output materialization (Bench's runOnce
        // rationale — Dataset.count() elides join subtrees)
        val n = SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count()
        val t = (System.nanoTime() - t0) / 1e9
        println(f"[time] $name $dir run$r: $t%.2f s, $n rows")
        t
      }
      println(f"[time] $name $dir min: ${times.min}%.2f s")
    }
    spark.stop()
  }
}
