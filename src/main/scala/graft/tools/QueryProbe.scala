package graft.tools

import graft.core.IndexConfig
import graft.corpus.CorpusGen
import graft.index.IndexStore
import graft.search.{SearchEngine, SearchMode}
import org.apache.spark.sql.SparkSession

/** Decomposes warm query latency on a bench-scale store: per-query wall time
  * over several repetitions, per mode. Isolates the driver fast path vs the
  * distributed path so optimization work targets the real bottleneck. */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("GRAFT_PROBE_CORES", "32").toInt
    val nDocs = sys.env.getOrElse("GRAFT_BENCH_DOCS", "500000").toLong
    val spark = SparkSession.builder().master(s"local[$cores]")
      .appName("queryprobe")
      .config("spark.sql.shuffle.partitions", (cores * 4).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (4L << 20).toString)
      .config("spark.sql.files.openCostInBytes", (128L << 10).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-qprobe").toString
    CorpusGen.generate(spark, nDocs, seed = 42, numRepos = 200)
      .write.mode("overwrite").parquet(s"$work/corpus")
    val store = new IndexStore(spark, s"$work/idx", IndexConfig(shardSpan = 1 << 14))
    store.createSegment(spark.read.parquet(s"$work/corpus").as[graft.core.CorpusDoc])
    val engine = new SearchEngine(store)
    val distEngine = new SearchEngine(new IndexStore(spark, s"$work/idx",
      IndexConfig(shardSpan = 1 << 14, driverWandMaxBytes = 0)))

    val mix = Seq(
      ("or3", "import class return", SearchMode.Or, engine),
      ("wand3_dist", "import class return", SearchMode.Wand, distEngine),
      ("or3_dist", "import class return", SearchMode.Or, distEngine),
      ("and2", "import val", SearchMode.And, engine),
      ("and2_dist", "import val", SearchMode.And, distEngine),
      ("wide_or5", "the data query window batch", SearchMode.Or, engine),
      ("wand3", "import class return", SearchMode.Wand, engine),
      ("hot1", "import", SearchMode.Wand, engine))
    mix.foreach { case (name, q, mode, eng) =>
      (0 until 2).foreach(_ => eng.search(q, Seq("content"), k = 10, mode = mode).collect())
      val times = (0 until 5).map { _ =>
        val t0 = System.nanoTime()
        eng.search(q, Seq("content"), k = 10, mode = mode).collect()
        (System.nanoTime() - t0) / 1e6
      }
      println(f"[qprobe] $name%-10s median=${times.sorted.apply(2)}%8.1f ms  all=${times.map(t => f"$t%.0f").mkString(",")}")
    }
    spark.stop()
  }
}
