package graft.tools

import graft.core.{CorpusDoc, IndexConfig}
import graft.corpus.CorpusGen
import graft.index.IndexStore
import graft.pipeline.Dedup
import graft.search.{SearchEngine, SearchMode}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale drill for the round-3 surfaces: builds an index over a corpus with
  * 10% injected near-duplicates, runs the end-to-end near-dup sweep
  * (LSH pairs → dup groups → DISTRIBUTED bulk delete), then a second bulk
  * delete from a DataFrame of ids, checking counts and search behavior at
  * every step. Prints `[drill]` lines; exits nonzero on any mismatch. */
object SweepDrill {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(100000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("sweep-drill")
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

    val base = CorpusGen.generate(spark, n, seed = 42, numRepos = 200)
    // near-copies of every 10th doc, ids offset past the corpus
    val off = math.max(n, 10000000L) // past the base ids at ANY n
    val dups = base.filter($"doc_id" % 10 === 0)
      .map(d => d.copy(doc_id = d.doc_id + off,
        content = d.content + " graftdup graftdup"))
    val corpus = base.unionByName(dups)
    val work = java.nio.file.Files.createTempDirectory("graft-drill").toString
    corpus.write.mode("overwrite").parquet(s"$work/corpus")
    val input = spark.read.parquet(s"$work/corpus").as[CorpusDoc]
    val expectDups = n / 10

    val store = new IndexStore(spark, s"$work/idx",
      IndexConfig(fields = Seq("content")))
    timed(s"build ${n + expectDups} docs")(store.createSegment(input))

    // dups must be findable before, keepers-only after
    val engine = new SearchEngine(store)
    val dupHitsBefore = engine.search("graftdup", Seq("content"), k = 10,
      mode = SearchMode.Wand).count()
    require(dupHitsBefore > 0, "injected dups must be searchable before the sweep")

    val swept = timed(s"sweepIndex over ${n + expectDups} docs")(
      Dedup.sweepIndex(store, minJaccard = 0.5))
    println(s"[drill] swept $swept (expected >= $expectDups)")
    // every injected copy is in a group with its (lower-id) original, so at
    // least all copies go; natural near-dups in the generated corpus may add
    require(swept >= expectDups, s"sweep removed $swept < $expectDups")
    val liveAfter = store.liveCorpus().count()
    require(liveAfter == n + expectDups - swept,
      s"live count $liveAfter != ${n + expectDups - swept}")
    val dupHitsAfter = new SearchEngine(store)
      .search("graftdup", Seq("content"), k = 10, mode = SearchMode.Wand).count()
    require(dupHitsAfter == 0, s"graftdup-only docs must be gone, found $dupHitsAfter")

    // distributed bulk delete: a DataFrame of ~n/4 ids (never collected)
    val victims = store.liveCorpus().filter($"doc_id" % 4 === 1).select("doc_id")
      .localCheckpoint(true)
    val nVictims = victims.count()
    timed(s"bulk delete of $nVictims ids via DataFrame")(store.delete(victims))
    val liveFinal = store.liveCorpus().count()
    require(liveFinal == liveAfter - nVictims,
      s"live count $liveFinal != ${liveAfter - nVictims}")
    println(s"[drill] OK: ${n + expectDups} built, $swept swept, " +
      s"$nVictims bulk-deleted, $liveFinal live")
    spark.stop()
  }
}
