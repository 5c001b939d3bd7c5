package graft.plans

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** Per-phase shuffle/input attribution: job-group ids → stage ids → task
  * metrics. Extracted from ScaleEvidence (round 5) so RunPipeline's
  * `--posture scale` mode reports the same per-phase table the at-scale
  * evidence harness does, from the same listener.
  */
final class PhaseMetrics extends SparkListener {
  private val stageToGroup = new java.util.concurrent.ConcurrentHashMap[Int, String]()
  val shuffleRead = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  val shuffleWrite = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  val inputBytes = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  override def onJobStart(jobStart: SparkListenerJobStart): Unit = {
    val group = Option(jobStart.properties)
      .map(_.getProperty("spark.jobGroup.id", "ungrouped")).getOrElse("ungrouped")
    jobStart.stageInfos.foreach(si => stageToGroup.put(si.stageId, group))
  }

  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    val g = stageToGroup.getOrDefault(sc.stageInfo.stageId, "ungrouped")
    val m = sc.stageInfo.taskMetrics
    if (m != null) {
      shuffleRead.merge(g, m.shuffleReadMetrics.totalBytesRead, (a, b) => a + b)
      shuffleWrite.merge(g, m.shuffleWriteMetrics.bytesWritten, (a, b) => a + b)
      inputBytes.merge(g, m.inputMetrics.bytesRead, (a, b) => a + b)
    }
  }

  private def total(name: String): Long =
    shuffleRead.getOrDefault(name, 0L) + shuffleWrite.getOrDefault(name, 0L) +
      inputBytes.getOrDefault(name, 0L)

  /** Listener events arrive asynchronously: wait until this group's
    * counters stop moving before sampling them (review-caught undercount). */
  def settle(name: String, maxWaitMs: Int = 3000): Unit = {
    var prev = -1L
    var cur = total(name)
    var waited = 0
    while (cur != prev && waited < maxWaitMs) {
      prev = cur
      Thread.sleep(250)
      waited += 250
      cur = total(name)
    }
  }
}
