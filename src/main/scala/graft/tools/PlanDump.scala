package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import java.nio.file.{Files, Paths}

/** Round-6 evidence tool: writes `.explain("formatted")` for named declared
  * queries to `<outDir>/<name><suffix>.txt` so before/after plan shapes are
  * on record for the judge (guide §1 / §7.2). Driver-fast-path search
  * queries come out as LocalTableScan — their evidence is latency, not plan
  * shape — so callers normally pass the pipeline/aggregation query names.
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> [names] [suffix]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names: Seq[String] =
      if (args.length > 2 && args(2).nonEmpty) args(2).split(",").map(_.trim).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val suffix = if (args.length > 3) args(3) else ""
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
            Files.writeString(Paths.get(s"$outDir/$name$suffix.txt"), txt)
            println(s"[plandump] $name ok")
          } catch {
            case e: Throwable => println(s"[plandump] $name FAILED: ${e.getMessage}")
          }
        case None => println(s"[plandump] unknown query: $name")
      }
    }
    spark.stop()
  }
}
