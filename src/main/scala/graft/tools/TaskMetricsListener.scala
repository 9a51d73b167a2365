package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerTaskEnd}
import java.util.concurrent.atomic.LongAdder

/** Aggregates Spark task metrics to decompose wall time: CPU vs GC vs
  * shuffle/serialization vs scheduler idle. */
class TaskMetricsListener extends SparkListener {
  case class JobSpan(id: Int, start: Long, var end: Long, desc: String)
  val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobSpan]()

  override def onJobStart(e: SparkListenerJobStart): Unit = {
    val desc = Option(e.properties)
      .map(_.getProperty("spark.job.description", "")).getOrElse("")
    jobs.put(e.jobId, JobSpan(e.jobId, e.time, -1, desc.take(60)))
  }
  override def onJobEnd(e: SparkListenerJobEnd): Unit = {
    val j = jobs.get(e.jobId); if (j != null) j.end = e.time
  }

  def timeline(): String = {
    import scala.jdk.CollectionConverters._
    val js = jobs.values.asScala.toSeq.sortBy(_.start)
    val t0 = js.headOption.map(_.start).getOrElse(0L)
    js.map { j =>
      f"\n[curve]   job${j.id}%3d +${(j.start - t0) / 1000.0}%6.1fs dur=${(j.end - j.start) / 1000.0}%6.1fs ${j.desc}"
    }.mkString
  }
  val runMs = new LongAdder; val cpuMs = new LongAdder; val gcMs = new LongAdder
  val shufWriteMs = new LongAdder; val shufFetchMs = new LongAdder
  val serMs = new LongAdder; val deserMs = new LongAdder
  val tasks = new LongAdder

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    val m = e.taskMetrics
    if (m != null) {
      tasks.increment()
      runMs.add(m.executorRunTime)
      cpuMs.add(m.executorCpuTime / 1000000)
      gcMs.add(m.jvmGCTime)
      shufWriteMs.add(m.shuffleWriteMetrics.writeTime / 1000000)
      shufFetchMs.add(m.shuffleReadMetrics.fetchWaitTime)
      serMs.add(m.resultSerializationTime)
      deserMs.add(m.executorDeserializeTime)
    }
  }

  def report(wallSec: Double, cores: Int): String = {
    val budget = wallSec * cores * 1000 // total core-ms available
    def p(v: LongAdder): String = f"${v.sum() / budget * 100}%.0f%%"
    f"tasks=${tasks.sum()} run=${p(runMs)} cpu=${p(cpuMs)} gc=${p(gcMs)} " +
      f"shufW=${p(shufWriteMs)} fetchWait=${p(shufFetchMs)} deser=${p(deserMs)} " +
      f"(%% of $cores-core budget)"
  }
}
