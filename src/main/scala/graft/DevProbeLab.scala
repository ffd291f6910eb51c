package graft

import org.apache.spark.sql.SparkSession

/** Dev lab for the bench probe's SHAPE (round-16 VERDICT directive 1):
  * times candidate reference jobs so an idle-vs-loaded A/B can pick
  * the one whose contention response matches the real queries'.
  * Measured round 17 (32 spinners vs local[16], sf0.01 subset):
  * queries inflate ~3.5×, the scalar cal ~5.9×, a small 2M-row probe
  * ~12× — short jobs over-respond because fixed scheduling costs
  * dominate them; the candidates below scale task size up. Run idle
  * and loaded, compare medians. */
object DevProbeLab {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = Sessions.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def run(df: org.apache.spark.sql.DataFrame): Unit = {
      df.queryExecution.toRdd.count(): Unit
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val candidates: Seq[(String, () => Unit)] = Seq(
      "p2m" -> (() => run(spark.range(0, 2000000L, 1, 32)
        .selectExpr("id", "cast(id % 1000 as string) k", "(id * 48271) % 97 v")
        .groupBy("k").agg(org.apache.spark.sql.functions.expr("sum(v)"),
          org.apache.spark.sql.functions.expr("avg(v)"),
          org.apache.spark.sql.functions.expr("approx_count_distinct(id % 8191)")))),
      "p20m" -> (() => run(spark.range(0, 20000000L, 1, 32)
        .selectExpr("id", "cast(id % 1000 as string) k", "(id * 48271) % 97 v")
        .groupBy("k").agg(org.apache.spark.sql.functions.expr("sum(v)"),
          org.apache.spark.sql.functions.expr("avg(v)"),
          org.apache.spark.sql.functions.expr("approx_count_distinct(id % 8191)")))),
      "p60m" -> (() => run(spark.range(0, 60000000L, 1, 32)
        .selectExpr("id", "cast(id % 1000 as string) k", "(id * 48271) % 97 v")
        .groupBy("k").agg(org.apache.spark.sql.functions.expr("sum(v)"),
          org.apache.spark.sql.functions.expr("avg(v)")))),
      "pscan" -> (() => run(spark.read.parquet(s"$sfDir/lineitem.parquet")
        .selectExpr("l_orderkey", "cast(l_quantity as decimal(18,2)) q",
          "l_returnflag")
        .groupBy("l_returnflag", "l_orderkey")
        .agg(org.apache.spark.sql.functions.expr("sum(q)"))
        .groupBy("l_returnflag")
        .agg(org.apache.spark.sql.functions.expr("sum(`sum(q)`)"),
          org.apache.spark.sql.functions.expr("count(1)")))),
      "cal" -> (() => {
        spark.range(200000000L).selectExpr("sum(id * 2 + 1)").collect(): Unit
      })
    )
    // JIT warmup, then min-of-2 × 3 readings each, interleaved
    candidates.foreach(_._2())
    val readings = scala.collection.mutable.Map.empty[String, List[Double]]
    for (_ <- 1 to 3; (n, f) <- candidates) {
      val t = math.min(time(f()), time(f()))
      readings(n) = t :: readings.getOrElse(n, Nil)
    }
    candidates.foreach { case (n, _) =>
      val xs = readings(n).sorted
      println(f"PROBE $n%6s median=${xs(xs.size / 2)}%.3f all=${xs.map(x => f"$x%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
