package graft

import java.util.concurrent.{ConcurrentHashMap, Executors}
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.DataFrame

/** Minimal async job orchestration over `Pipeline.autoPipeline` — the
  * analogue of the reference's upload → background pipeline → status →
  * download flow (/root/reference/api.py:34-136), minus the HTTP
  * framing (web plumbing stays out of a Spark library; any server can
  * wrap these three calls).
  *
  * Jobs run on a small driver-side executor: a Spark driver is the
  * natural place for job control (the WORK inside autoPipeline is
  * distributed; only orchestration lives here, exactly like the
  * reference's BackgroundTasks). Status transitions: queued → running
  * → done | failed.
  */
object Jobs {

  sealed trait Status { def name: String }
  case object Queued extends Status { val name = "queued" }
  case object Running extends Status { val name = "running" }
  case class Done(result: Pipeline.Result, reportPath: Option[String],
      modelPath: Option[String]) extends Status {
    val name = "done"
  }
  /** Terminal state of a [[submitStream]] job (no model Result — the
    * streaming surface refreshes the viz/profile report; train on a
    * settled snapshot via [[submit]]). */
  case class StreamDone(reportPath: String) extends Status { val name = "done" }
  case class Failed(error: String) extends Status { val name = "failed" }

  private val seq = new AtomicLong(0)
  private val jobs = new ConcurrentHashMap[String, Status]()
  private val streams =
    new ConcurrentHashMap[String, (org.apache.spark.sql.streaming.StreamingQuery, String)]()
  private val pool = Executors.newFixedThreadPool(2, r => {
    val t = new Thread(r, "graft-job"); t.setDaemon(true); t
  })

  /** Submit a pipeline run; returns the job id immediately. When
    * `reportDir` is set, a Done job also writes `<reportDir>/<id>.html`
    * (viz + metrics — the reference's report artifact). When
    * `saveDir` is set, the winning MLlib model persists at
    * `<saveDir>/<id>/model` and Done carries the path — the analogue
    * of the reference's train→download-model loop (api.py:111-136,
    * main.py:370-371 joblib dump) threaded through the job flow;
    * reload with [[Pipeline.loadModel]] and score any frame. */
  def submit(df: DataFrame, target: String, reportDir: Option[String] = None,
      saveDir: Option[String] = None): String = {
    val id = s"job-${seq.incrementAndGet()}"
    jobs.put(id, Queued)
    pool.submit(new Runnable {
      override def run(): Unit = {
        jobs.put(id, Running)
        try {
          val result = Pipeline.autoPipeline(df, target,
            saveDir = saveDir.map(d => s"$d/$id"))
          val report = reportDir.map { d =>
            Report.save(Pipeline.vizData(result.cleaned, target), Some(result),
              s"$d/$id.html", s"graft report $id")
          }
          jobs.put(id, Done(result, report, result.modelPath))
        } catch {
          case e: Throwable => jobs.put(id, Failed(
            Option(e.getMessage).getOrElse(e.getClass.getName)))
        }
      }
    })
    id
  }

  /** Streaming analogue of [[submit]] — the reference's async
    * upload→status→report flow applied to a CONTINUOUSLY-ARRIVING
    * dataset. Each micro-batch appends to a parquet staging table and
    * refreshes `<reportDir>/<id>.html` from the accumulated table, so
    * the report artifact stays current as data lands (the incremental
    * surface is the viz/profile report; model training belongs on a
    * settled snapshot via [[submit]] — re-fitting MLlib per
    * micro-batch would be neither incremental nor cheap).
    *
    * Scale shape: the append is the micro-batch's own write — no
    * rewrite of history; the refresh re-aggregates the accumulated
    * table with vizData's chart-sized aggregates (one pass, nothing
    * collected beyond report-sized frames). A production deployment
    * points stagingDir at the lake table the stream already feeds and
    * runs the refresh on a cadence instead of every batch;
    * `compactSmallFiles` is the companion job for the append debris.
    *
    * Returns the job id; stop via [[finishStream]]. Status: running →
    * done (or failed if a batch throws). */
  def submitStream(stream: DataFrame, target: String, stagingDir: String,
      reportDir: String, checkpoint: String): String = {
    val id = s"job-${seq.incrementAndGet()}"
    val spark = stream.sparkSession
    val reportPath = s"$reportDir/$id.html"
    jobs.put(id, Running)
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, _: Long) =>
        try {
          b.write.mode("append").parquet(stagingDir)
          val acc = spark.read.parquet(stagingDir)
          Report.save(Pipeline.vizData(acc, target), None, reportPath, s"graft report $id")
          ()
        } catch {
          case e: Throwable =>
            jobs.put(id, Failed(Option(e.getMessage).getOrElse(e.getClass.getName)))
            throw e
        }
      }
      .start()
    streams.put(id, (q, reportPath))
    id
  }

  /** Stop a [[submitStream]] job's query (after the last data is
    * processed — callers drain first) and mark it done. Returns the
    * final report path. */
  def finishStream(id: String): Option[String] = Option(streams.remove(id)).map {
    case (q, reportPath) =>
      q.stop()
      if (status(id).contains("running")) jobs.put(id, StreamDone(reportPath))
      reportPath
  }

  /** The live streaming query of a running [[submitStream]] job
    * (drain/await convenience for callers and specs). */
  def streamingQuery(id: String): Option[org.apache.spark.sql.streaming.StreamingQuery] =
    Option(streams.get(id)).map(_._1)

  /** Job status by id ("queued" | "running" | "done" | "failed"). */
  def status(id: String): Option[String] = Option(jobs.get(id)).map(_.name)

  /** Result of a completed job (None until Done). */
  def result(id: String): Option[Pipeline.Result] = Option(jobs.get(id)).collect {
    case Done(r, _, _) => r
  }

  /** Persisted-model path of a completed job, when `saveDir` was set
    * — the reference's GET /download-model surface. */
  def modelPath(id: String): Option[String] = Option(jobs.get(id)).collect {
    case Done(_, _, Some(p)) => p
  }

  /** Report path of a completed job, when one was requested. */
  def reportPath(id: String): Option[String] = Option(jobs.get(id)) match {
    case Some(Done(_, p, _)) => p
    case Some(StreamDone(p)) => Some(p)
    case _ => None
  }

  /** Error message of a failed job. */
  def error(id: String): Option[String] = Option(jobs.get(id)).collect {
    case Failed(e) => e
  }

  /** Block until the job leaves queued/running (test + scripting
    * convenience; a server would poll `status`). */
  def await(id: String, timeoutMs: Long = 300000): Status = {
    val deadline = System.currentTimeMillis() + timeoutMs
    var s = jobs.get(id)
    while ((s == Queued || s == Running) && System.currentTimeMillis() < deadline) {
      Thread.sleep(100)
      s = jobs.get(id)
    }
    s
  }
}
