package graft.tools

import graft.core.IndexConfig
import graft.index.IndexStore
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, concat, lit}

/** Round-6 measurement probe: isolates the four pipeline operators the
  * frozen bench times (minhash_lsh, simhash, curate, dedup_sweep) with the
  * EXACT parameters and session config Bench.pipelineBench uses, repeated
  * `GRAFT_PROBE_REPS` times each, and optionally dumps the physical plan
  * (`GRAFT_PROBE_EXPLAIN=dir`). Guide §1: measure before touching the
  * operators; per-op medians make a regression/speed-up attributable. */
object PipeProbe {
  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("GRAFT_PROBE_CORES", "32").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("GRAFT_PROBE_REPS", "3").toInt
    val explainDir = sys.env.get("GRAFT_PROBE_EXPLAIN")
    val only = sys.env.get("GRAFT_PROBE_ONLY").map(_.split(",").map(_.trim).toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-pipeprobe-$cores")
      .config("spark.sql.shuffle.partitions", (cores * 4).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (4L << 20).toString)
      .config("spark.sql.files.openCostInBytes", (128L << 10).toString)
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", (2L << 20).toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val work = java.nio.file.Files.createTempDirectory("graft-pipeprobe").toString
    try {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val nDocs = docs.count()
      val sweepStore = {
        import spark.implicits._
        val off = math.max(nDocs, 10000000L)
        val dups = docs.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + off).as("doc_id"),
            concat(col("text"), lit(" graftdup graftdup")).as("text"))
        val corpus = docs.unionByName(dups)
          .select(col("doc_id"), lit("r").as("repo"),
            concat(lit("doc/"), col("doc_id")).as("path"), lit("c").as("commit"),
            lit("en").as("lang"), col("text").as("content"))
          .as[graft.core.CorpusDoc]
        val store = new IndexStore(spark, s"$work/sweep-idx",
          IndexConfig(fields = Seq("content")))
        store.createSegment(corpus)
        store
      }
      def dfOf(name: String): Option[org.apache.spark.sql.DataFrame] = name match {
        case "minhash_lsh" => Some(graft.pipeline.Dedup.minHashLshPairs(
          docs, numHashes = 64, bands = 16, minJaccard = 0.5))
        case "simhash" => Some(graft.pipeline.Dedup.simHashPairs(docs, maxDist = 3))
        case "curate" => Some(graft.pipeline.Curation.curate(docs))
        case _ => None
      }
      def run(name: String): Long = name match {
        case "dedup_sweep" =>
          graft.pipeline.Dedup.sweepIndex(sweepStore, minJaccard = 0.5, dryRun = true)
        case other => dfOf(other).get.count()
      }
      val ops = Seq("minhash_lsh", "simhash", "curate", "dedup_sweep")
        .filter(o => only.forall(_.contains(o)))
      ops.foreach { name =>
        explainDir.foreach { dir =>
          dfOf(name).foreach { df =>
            val txt = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
            java.nio.file.Files.writeString(
              java.nio.file.Paths.get(dir, s"pipeline_$name.txt"), txt)
          }
        }
        spark.sparkContext.setJobDescription(s"pipeprobe: $name")
        val rows = run(name) // warm
        val times = (0 until reps).map { _ =>
          val t0 = System.nanoTime()
          run(name)
          (System.nanoTime() - t0) / 1e9
        }
        spark.sparkContext.setJobDescription(null)
        val med = times.sorted.apply(times.length / 2)
        println(f"[pipeprobe] $name%-12s median=$med%7.3f s  rows=$rows  " +
          f"all=${times.map(t => f"$t%.3f").mkString(",")}")
      }
    } finally {
      spark.stop()
      try {
        org.apache.hadoop.fs.FileSystem.getLocal(new org.apache.hadoop.conf.Configuration())
          .delete(new org.apache.hadoop.fs.Path(work), true); ()
      } catch { case _: Exception => () }
    }
  }
}
