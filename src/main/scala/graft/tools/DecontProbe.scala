package graft.tools

import graft.corpus.CorpusGen
import graft.pipeline.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for cross-corpus decontamination: N generated training docs
  * vs N/100 benchmark items (each the first 12 tokens of every 100th doc).
  * Every benchmark item must be caught in its source doc at containment
  * 1.0; prints `[probe]` timing lines and exits nonzero on a miss. */
object DecontProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("decont-probe")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }

    val work = java.nio.file.Files.createTempDirectory("graft-decont").toString
    try {
    CorpusGen.generate(spark, n, seed = 42, numRepos = 200)
      .select(col("doc_id"), col("content").as("text"))
      .write.mode("overwrite").parquet(s"$work/train")
    val train = spark.read.parquet(s"$work/train")
    train.filter(col("doc_id") % 100 === 0)
      .select((col("doc_id") + 100000000L).as("doc_id"),
        concat_ws(" ", slice(graft.analysis.Analyzer.tokens(col("text")), 1, 12)).as("text"))
      .write.mode("overwrite").parquet(s"$work/bench")
    val bench = spark.read.parquet(s"$work/bench")
    val nBench = bench.count()
    println(s"[probe] corpus: $n train docs, $nBench benchmark items")

    val pairs = Dedup.contaminationPairs(train, bench, minContainment = 0.8).cache()
    // cache() is lazy — time the materializing count
    val nPairs = timed(s"contaminationPairs($n x $nBench)")(pairs.count())
    val nSelf = pairs
      .filter(col("train_id") === col("bench_id") - 100000000L &&
        col("containment") === 1.0)
      .count()
    // items whose shingles are ALL over the union df cap are undetectable
    // by design; the coverage report surfaces them
    val nUndetectable = timed("contaminationCoverage")(
      Dedup.contaminationCoverage(train, bench)
        .filter(col("n_usable") === 0).count())
    println(s"[probe] pairs >= 0.8: $nPairs; self-catches at 1.0: " +
      s"$nSelf/$nBench ($nUndetectable undetectable under the df cap)")
    require(nSelf == nBench - nUndetectable,
      s"every coverable benchmark item must be caught in its source: " +
        s"$nSelf != $nBench - $nUndetectable")
    println(f"[probe] OK: ${n / 1.0}%.0f docs decontaminated against $nBench items")

    // persisted path: one-time shingle-table build (train-proportional),
    // then repeated reports ride the stored tables — per-report cost is
    // the bench side plus a single streaming read of the stored shingles,
    // never a re-tokenize/re-shingle of the corpus
    locally {
      import graft.core.CorpusDoc
      import graft.index.{IndexStore, SimilarityIndex}
      import spark.implicits._
      val store = new IndexStore(spark, s"$work/idx",
        graft.core.IndexConfig(fields = Seq("content")))
      timed(s"index build ($n docs)")(store.createSegment(
        spark.read.parquet(s"$work/train")
          .select(col("doc_id"), lit("r").as("repo"),
            concat(lit("d/"), col("doc_id")).as("path"), lit("c").as("commit"),
            lit("en").as("lang"), col("text").as("content")).as[CorpusDoc]))
      timed("ensureShingles (one-time, train-proportional)")(
        new SimilarityIndex(store).ensureShingles())
      def report(tag: String, mod: Long): Long = {
        val b = spark.read.parquet(s"$work/train")
          .filter(col("doc_id") % mod === 0)
          .select((col("doc_id") + 200000000L).as("doc_id"),
            concat_ws(" ", slice(graft.analysis.Analyzer.tokens(col("text")), 1, 12)).as("text"))
        timed(s"persisted report ($tag)")(
          Dedup.contaminationReportPersisted(store, b)._1.count())
      }
      val r1 = report("bench = every 100th", 100)
      val r2 = report("bench = every 200th", 200)
      println(s"[probe] persisted reports: $r1 / $r2 pairs — stored tables " +
        "reused, zero re-shingling (compare wall clocks above)")
    }
    } finally {
      // best-effort: a delete failure must not mask the probe's own
      // diagnostic or skip the session stop
      try {
        org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
          .delete(new org.apache.hadoop.fs.Path(work), true); ()
      } catch { case _: Exception => () }
      spark.stop()
    }
  }
}
