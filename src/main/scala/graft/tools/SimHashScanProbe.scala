package graft.tools

import graft.core.{CorpusDoc, IndexConfig}
import graft.corpus.CorpusGen
import graft.index.{IndexStore, SimilarityIndex}
import graft.pipeline.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the stored-hash SimHash pair scan against the direct
  * (re-tokenize + re-vote) computation at scale: the per-ingest
  * dup-monitoring scan should pay parquet-long reads + the block-keyed
  * join, not 62 conditional sums over every token occurrence. Asserts the
  * two scans return identical pair sets. */
object SimHashScanProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("simhash-scan-probe")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[T](label: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $label: $sec%.1f s"); (r, sec)
    }

    val work = java.nio.file.Files.createTempDirectory("graft-shprobe").toString
    try {
      val base = CorpusGen.generate(spark, n, seed = 42, numRepos = 200)
      // dup id space starts past the base ids at ANY n (a fixed 10M
      // offset would collide once n reaches it)
      val off = math.max(n, 10000000L)
      val dups = base.filter($"doc_id" % 10 === 0)
        .map(d => d.copy(doc_id = d.doc_id + off,
          content = d.content + " graftdup graftdup"))
      base.unionByName(dups).write.mode("overwrite").parquet(s"$work/corpus")
      val store = new IndexStore(spark, s"$work/idx", IndexConfig(fields = Seq("content")))
      store.createSegment(spark.read.parquet(s"$work/corpus").as[CorpusDoc])

      val docs = store.liveCorpus().select($"doc_id", $"content".as("text"))
      // phase isolation: what persistence actually removes is the HASH
      // computation (tokenize + tf + 62 conditional sums per doc)
      val (_, tHashDirect) = timed(s"direct hash computation (${n + n / 10} docs)")(
        Dedup.simHashes(docs).count())
      val (_, tEnsure) = timed("ensureSimHash (one-time table build)")(
        new SimilarityIndex(store).ensureSimHash())
      val sim = new SimilarityIndex(store)
      val (_, tHashStored) = timed("stored hash read")(
        sim.liveSimHashes().count())
      // end-to-end pair scans (this synthetic corpus is template-heavy, so
      // the pair phase dominates both variants — the per-scan ratio is a
      // LOWER bound on what organic corpora with small dup clusters see)
      val (nDirect, tDirect) = timed("direct pair scan")(
        Dedup.simHashPairs(docs, maxDist = 3).count())
      val (nStored, tStored) = timed("stored-hash pair scan")(
        Dedup.simHashPairsPersisted(store, maxDist = 3).count())
      require(nDirect == nStored, s"pair counts diverge: $nDirect vs $nStored")
      println(f"[probe] OK: $nDirect pairs both ways; hash phase " +
        f"$tHashDirect%.1f s direct vs $tHashStored%.1f s stored " +
        f"(${tHashDirect / tHashStored}%.0fx); full scan $tDirect%.1f s vs " +
        f"$tStored%.1f s -> ${tDirect / tStored}%.1fx per scan " +
        f"(one-time table build $tEnsure%.1f s)")
    } finally {
      org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(work), true)
      spark.stop()
    }
  }
}
