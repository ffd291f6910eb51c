package graft


/** Plan-audit helper: prints the formatted physical plan of the named
  * SparkEntry queries (all of them with no names given) at the given
  * SF dir. Used each round to eyeball shuffle counts, broadcast
  * choices, pushed filters, and WholeStageCodegen spans before the
  * numbers in PLANS.md are written down.
  *
  * Usage: runMain graft.PlanDump /root/testdata/sf0.01 q20_range_window t8_unigram_logprob
  *
  * With `--exec` as the second arg, each query is EXECUTED first and
  * the FINAL adaptive plan is printed — AQE decisions (runtime
  * broadcast promotion, exchange/stage reuse, skew splits) only exist
  * there, not in the static `explain` output.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val exec = args.lift(1).contains("--exec")
    val rest = args.drop(if (exec) 2 else 1).toSeq
    val names = if (rest.nonEmpty) rest else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = Sessions.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      val df = SparkEntry.queries(n)(spark, sfDir)
      if (exec) {
        // collect() executes THIS DataFrame's own query execution —
        // count() would build (and adaptively finalize) a different
        // plan, leaving df's at isFinalPlan=false.
        df.collect()
        println(df.queryExecution.executedPlan.toString)
      } else df.explain("formatted")
    }
    spark.stop()
  }
}
