package graft.plugins

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** The reference's progress heartbeat, mapped to Spark's listener bus.
  *
  * MapReduce-4 reports phase progress over its TCP control loop
  * (`asio_deep/main.cpp:47-78`: per-phase status strings to the client).
  * In Spark the control plane IS the listener bus: jobs and stages are
  * the phases, and a `SparkListener` observes them without touching the
  * data plane. This one records a bounded in-memory log of phase events
  * (job start/end, stage completion with task counts) — the hook where a
  * real deployment forwards progress to its own client, exactly as the
  * reference's `standard_message()` did.
  */
class PhaseListener extends SparkListener {
  private val events = new ConcurrentLinkedQueue[String]()
  private val MaxEvents = 1000

  private def record(e: String): Unit = {
    events.add(e)
    while (events.size() > MaxEvents) events.poll()
  }

  override def onJobStart(js: SparkListenerJobStart): Unit =
    record(s"job ${js.jobId} started: ${js.stageInfos.size} stages")

  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
    record(s"stage ${sc.stageInfo.stageId} complete: " +
      s"${sc.stageInfo.numTasks} tasks")

  override def onJobEnd(je: SparkListenerJobEnd): Unit =
    record(s"job ${je.jobId} ended: ${je.jobResult}")

  /** Snapshot of the recorded phase log (oldest first). */
  def log: Seq[String] = events.asScala.toSeq
}
