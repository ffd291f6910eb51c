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
  case class Done(result: Pipeline.Result, reportPath: Option[String]) extends Status {
    val name = "done"
  }
  case class Failed(error: String) extends Status { val name = "failed" }

  private val seq = new AtomicLong(0)
  private val jobs = new ConcurrentHashMap[String, Status]()
  private val pool = Executors.newFixedThreadPool(2, r => {
    val t = new Thread(r, "graft-job"); t.setDaemon(true); t
  })

  /** Submit a pipeline run; returns the job id immediately. When
    * `reportDir` is set, a Done job also writes `<reportDir>/<id>.html`
    * (viz + metrics — the reference's report artifact). */
  def submit(df: DataFrame, target: String, reportDir: Option[String] = None): String = {
    val id = s"job-${seq.incrementAndGet()}"
    jobs.put(id, Queued)
    pool.submit(new Runnable {
      override def run(): Unit = {
        jobs.put(id, Running)
        try {
          val result = Pipeline.autoPipeline(df, target)
          val report = reportDir.map { d =>
            Report.save(Pipeline.vizData(result.cleaned, target), Some(result),
              s"$d/$id.html", s"graft report $id")
          }
          jobs.put(id, Done(result, report))
        } catch {
          case e: Throwable => jobs.put(id, Failed(
            Option(e.getMessage).getOrElse(e.getClass.getName)))
        }
      }
    })
    id
  }

  /** Job status by id ("queued" | "running" | "done" | "failed"). */
  def status(id: String): Option[String] = Option(jobs.get(id)).map(_.name)

  /** Result of a completed job (None until Done). */
  def result(id: String): Option[Pipeline.Result] = Option(jobs.get(id)).collect {
    case Done(r, _) => r
  }

  /** Report path of a completed job, when one was requested. */
  def reportPath(id: String): Option[String] = Option(jobs.get(id)) match {
    case Some(Done(_, p)) => p
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
