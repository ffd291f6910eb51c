package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Dev-only per-JOB profiler — the missing middle between [[TimeQuery]]
  * (one wall number) and the Spark UI (off in headless runs). Runs a
  * named SparkEntry query and prints every Spark job the run submits:
  * wall, total task time, peak shuffle bytes, and the job's first
  * stage name — so a multi-job key (checkpoint materializations,
  * plan-time scalars, iterative training) shows WHERE its seconds go.
  *
  * Usage: runMain graft.JobProfile <sfDir> <query1>[,<query2>,...] [reps=2]
  * (rep 1 absorbs codegen/JIT; read the LAST rep's breakdown.)
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: runMain graft.JobProfile <sfDir> <query1>[,<query2>,...] [reps=2]")
      sys.exit(2)
    }
    val dir = args.head
    val names = args(1).split(",").toSeq
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Sessions.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect() // JVM warm

    final case class Job(id: Int, t0: Long, desc: String,
        var wall: Double = 0.0, var taskTime: Double = 0.0,
        var shuffleRead: Long = 0L, var shuffleWrite: Long = 0L,
        var inputBytes: Long = 0L, var nTasks: Int = 0)
    val jobs = scala.collection.mutable.LinkedHashMap.empty[Int, Job]
    val stageToJob = scala.collection.mutable.HashMap.empty[Int, Int]
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.synchronized {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        jobs(js.jobId) = Job(js.jobId, js.time, desc)
        // record the job's stage set so completed stages attribute by
        // stageId, not "most recent job" (broadcast-exchange jobs and
        // stages completing after the next job starts were misattributed)
        js.stageInfos.foreach(si => stageToJob(si.stageId) = js.jobId)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(je.jobId).foreach(j => j.wall = (je.time - j.t0) / 1e3)
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = jobs.synchronized {
        val m = sc.stageInfo.taskMetrics
        stageToJob.get(sc.stageInfo.stageId).flatMap(jobs.get)
          .orElse(jobs.lastOption.map(_._2)).foreach { j =>
          j.taskTime += m.executorRunTime / 1e3
          j.shuffleRead += m.shuffleReadMetrics.totalBytesRead
          j.shuffleWrite += m.shuffleWriteMetrics.bytesWritten
          j.inputBytes += m.inputMetrics.bytesRead
          j.nTasks += sc.stageInfo.numTasks
        }
      }
    }

    if (sys.env.contains("SPARK_GRAFT_NOAQE"))
      spark.conf.set("spark.sql.adaptive.enabled", "false")
    names.foreach { name =>
      (1 to reps).foreach { r =>
        jobs.synchronized { jobs.clear(); stageToJob.clear() }
        spark.sparkContext.addSparkListener(listener)
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, dir)
        val tPlanned = System.nanoTime()
        df.queryExecution.executedPlan // force analysis+optimization+planning
        val tExec = System.nanoTime()
        val n = df.queryExecution.toRdd.count()
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"[jobprof] $name rep$r: construct ${(tPlanned - t0) / 1e9}%.2f s, " +
          f"plan ${(tExec - tPlanned) / 1e9}%.2f s, exec ${(System.nanoTime() - tExec) / 1e9}%.2f s")
        spark.sparkContext.removeSparkListener(listener)
        Thread.sleep(200) // drain listener bus
        println(f"%n[jobprof] $name rep$r: $wall%.2f s total, $n rows, ${jobs.size} jobs")
        if (r == reps) jobs.synchronized {
          jobs.values.toSeq.sortBy(-_.wall).foreach { j =>
            println(f"[jobprof]   job ${j.id}%3d wall ${j.wall}%6.2f s  task ${j.taskTime}%7.2f s  " +
              f"tasks ${j.nTasks}%4d  in ${j.inputBytes / 1e6}%7.1f MB  " +
              f"shW ${j.shuffleWrite / 1e6}%6.1f MB  shR ${j.shuffleRead / 1e6}%6.1f MB  ${j.desc.take(60)}")
          }
        }
      }
    }
    spark.stop()
  }
}
