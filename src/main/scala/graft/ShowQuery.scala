package graft

/** Dev-only result printer — [[TimeQuery]]'s companion for eyeballing
  * a registered query's actual rows while tuning thresholds (the
  * ledger keys especially: attrition numbers are the design feedback).
  *
  * Usage: runMain graft.ShowQuery <dir> <query> [maxRows=50]
  */
object ShowQuery {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val maxRows = args.lift(2).map(_.toInt).getOrElse(50)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = Sessions.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries(name)(spark, dir).collect().take(maxRows)
      .foreach(r => println(s"[row] $r"))
    spark.stop()
  }
}
