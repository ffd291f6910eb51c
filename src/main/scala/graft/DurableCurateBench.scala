package graft

import org.apache.spark.sql.functions._

/** Dev-only scale harness for the DURABLE st21 twin
  * ([[graft.streaming.DurableSinks.DurableCurateSink]]) — TimeQuery
  * pins the in-memory batch twin; this pins the all-delta COMMIT
  * layer beside it: per-batch apply wall, per-commit segment bytes
  * (must stay O(batch), not O(history)), and the final decision read,
  * over id-ordered slices of a rehearsal corpus.
  *
  * Usage: runMain graft.DurableCurateBench <sfDir> [batches=3]
  */
object DurableCurateBench {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nBatches = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = Sessions.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect() // JVM warm

    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text"))
    val maxId = docs.agg(max(col("doc_id"))).collect()(0).getLong(0) + 1
    val storeDir = java.nio.file.Files.createTempDirectory("graft-durcur").toString
    val sink = new graft.streaming.DurableSinks.DurableCurateSink(spark, storeDir)
    val fs = new org.apache.hadoop.fs.Path(storeDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def commitBytes(id: Long): Long = {
      val p = new org.apache.hadoop.fs.Path(s"$storeDir/commit=$id")
      if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
    }
    var total = 0.0
    (0 until nBatches).foreach { i =>
      val lo = maxId * i / nBatches
      val hi = maxId * (i + 1) / nBatches
      val b = docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
      val t0 = System.nanoTime()
      sink.apply(b, i.toLong)
      val t = (System.nanoTime() - t0) / 1e9
      total += t
      println(f"[durable] $dir batch$i [$lo,$hi): $t%.2f s, commit bytes ${commitBytes(i.toLong)}")
    }
    val t0 = System.nanoTime()
    val n = sink.decisions.get.queryExecution.toRdd.count()
    val tRead = (System.nanoTime() - t0) / 1e9
    println(f"[durable] $dir decisions read: $tRead%.2f s ($n rows); total fold: $total%.2f s")
    spark.stop()
  }
}
