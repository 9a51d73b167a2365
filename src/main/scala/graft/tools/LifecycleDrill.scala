package graft.tools

import graft.core.{CorpusDoc, IndexConfig}
import graft.corpus.CorpusGen
import graft.index.IndexStore
import graft.search.{SearchEngine, SearchMode}
import graft.streaming.StreamingIndex
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale drill for the micro-batch ingest lifecycle: stream a corpus in as
  * N parquet files (one segment per micro-batch), fold the segments with
  * the LSM merge, and check top-k parity against a single batch build of
  * the same rows at every step. Prints `[drill]` lines; exits nonzero on
  * any mismatch. */
object LifecycleDrill {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val nFiles = args.drop(1).headOption.map(_.toInt).getOrElse(16)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("lifecycle-drill")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[drill] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }

    val work = java.nio.file.Files.createTempDirectory("graft-lifecycle").toString
    try {
    val corpus = CorpusGen.generate(spark, n, seed = 42, numRepos = 200)
    corpus.write.mode("overwrite").parquet(s"$work/corpus")
    // stage as nFiles stream files (one micro-batch each)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    timed(s"stage $nFiles stream files") {
      spark.read.parquet(s"$work/corpus").repartition(nFiles)
        .write.mode("overwrite").parquet(s"$work/staged")
      fs.mkdirs(new org.apache.hadoop.fs.Path(s"$work/stream"))
      fs.globStatus(new org.apache.hadoop.fs.Path(s"$work/staged/part-*.parquet"))
        .zipWithIndex.foreach { case (st, i) =>
          fs.rename(st.getPath, new org.apache.hadoop.fs.Path(s"$work/stream/b$i.parquet"))
        }
    }

    val cfg = IndexConfig(fields = Seq("content"))
    val store = new IndexStore(spark, s"$work/idx", cfg)
    timed(s"stream-ingest $n docs in $nFiles micro-batches")(
      StreamingIndex.indexStream(spark, s"$work/stream", store).awaitTermination())
    require(store.segments.size == nFiles,
      s"expected $nFiles segments, got ${store.segments.size}")
    require(store.segments.map(_.numDocs).sum == n,
      s"expected $n docs, got ${store.segments.map(_.numDocs).sum}")

    val twin = new IndexStore(spark, s"$work/twin", cfg)
    timed(s"batch twin build $n docs")(
      twin.createSegment(spark.read.parquet(s"$work/corpus").as[CorpusDoc]))

    def top(s: IndexStore, q: String): Seq[(Long, Long)] =
      new SearchEngine(s).search(q, Seq("content"), k = 10, mode = SearchMode.Wand)
        .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9))).toSeq
    val queries = Seq("import class", "merge join stream", "the license static")
    queries.foreach { q =>
      require(timed(s"query [$q] segmented")(top(store, q)) ==
        timed(s"query [$q] batch-twin")(top(twin, q)),
        s"segmented result diverges from batch twin for [$q]")
    }

    val merged = timed(s"mergeSmallSegments ($nFiles -> 1)")(
      store.mergeSmallSegments(Long.MaxValue))
    require(merged.nonEmpty && store.segments.size == 1,
      s"merge must leave one segment, got ${store.segments}")
    require(store.segments.head.numDocs == n)
    queries.foreach { q =>
      require(timed(s"query [$q] merged")(top(store, q)) == top(twin, q),
        s"merged result diverges from batch twin for [$q]")
    }
    println(s"[drill] OK: $nFiles-batch stream ingest + LSM merge == batch build at $n docs")
    } finally {
      // best-effort: a delete failure must not mask the drill's own
      // diagnostic or skip the session stop
      try {
        org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
          .delete(new org.apache.hadoop.fs.Path(work), true); ()
      } catch { case _: Exception => () }
      spark.stop()
    }
  }
}
