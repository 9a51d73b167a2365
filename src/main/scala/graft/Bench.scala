package graft

import graft.core.IndexConfig
import graft.corpus.CorpusGen
import graft.index.IndexStore
import graft.search.{SearchEngine, SearchMode}
import org.apache.spark.sql.SparkSession

/** Round benchmark (SURVEY.md §7.2 M6; BASELINE.md protocol).
  *
  * Measures the two BASELINE.json metrics on the deterministic synthetic
  * source-code corpus (FIXTURES.md §1):
  *   1. index-build throughput (files/sec = corpus docs/sec), and
  *   2. BM25 top-10 query latency over a seeded query mix,
  * at THREE parallelism levels on the IDENTICAL input parquet:
  *   - N and 4N cores (defaults 2 and 8) for the scaling-efficiency
  *     criterion: efficiency = (throughput_4N / throughput_N) / 4 ≥ 0.8;
  *   - a peak level (default 32 = all cores) for absolute throughput.
  *
  * NOISE PROTOCOL (round 5): this shared VM drifts ±30% over minutes, so
  * blocks of repeated builds at one level followed by blocks at another
  * bake the drift directly into the efficiency ratio (BENCH_r04 recorded
  * 0.762 on an untouched build path; the same code measured 0.912 and
  * 0.835 on other days). The levels are therefore INTERLEAVED: each rep
  * builds once at every level in its own fresh session, with the level
  * order alternating rep-to-rep (low→high, then high→low) so slow drift
  * lands symmetrically on both criterion levels. The headline efficiency
  * is the MEDIAN OF PER-REP PAIRED RATIOS — each rep's N and 4N builds run
  * within ~3 minutes of each other, so a per-rep ratio sees the same VM
  * state on both sides and drift cancels; the median then rejects outlier
  * reps. The cross-rep efficiency-of-medians is reported alongside, and
  * every sample is printed. Queries get the same treatment: each rep times
  * each query `GRAFT_BENCH_QUERY_REPS` times (median per rep), and the
  * reported latency is the median of per-rep medians with samples listed.
  *
  * Why N=2: this VM's cores share one memory system, and the build is
  * string/alloc-heavy — measured CPU time for the identical build inflates
  * ~2.6x from 8→32 threads (memory-stall cycles), while a pure-CPU probe
  * (graft.tools.ScaleProbe) scales at 0.83. On a real cluster the 4x step
  * adds machines (memory bandwidth scales with executors), so the
  * bandwidth-safe core range is the faithful proxy; the full ladder is
  * printed in BENCH.md for transparency.
  *
  * Top-10 docIDs are also compared across levels (rank-identity evidence).
  * Prints exactly ONE JSON line for the harness; human table in BENCH.md.
  */
object Bench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      // 4 task waves per core: sampled range bounds leave hot-term-dense
      // partitions long — finer ranges keep the tail short.
      .config("spark.sql.shuffle.partitions", (cores * 4).toString)
      .config("spark.sql.adaptive.enabled", "true")
      // Small-file regime knobs: the bench corpus is tens of MB, so the
      // 128MB default split size + 4MB per-file open cost would bin-pack the
      // whole scan into 1-2 tasks, and AQE's 64MB advisory size would
      // coalesce reduce stages below the core count — both would serialize
      // the build regardless of cores. At production scale (≥128MB files)
      // the defaults are correct and these overrides are unnecessary.
      .config("spark.sql.files.maxPartitionBytes", (4L << 20).toString)
      .config("spark.sql.files.openCostInBytes", (128L << 10).toString)
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", (2L << 20).toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private val queryMix: Seq[(String, String, Boolean, SearchMode)] = Seq(
    ("hot_single", "import", false, SearchMode.Wand),
    ("rare_single", "handlereqpars", false, SearchMode.Wand),
    ("or3_exhaustive", "import class return", false, SearchMode.Or),
    ("wand3", "import class return", false, SearchMode.Wand),
    ("wand5", "the license static interface lazy", false, SearchMode.Wand),
    ("and2", "import val", false, SearchMode.And),
    ("prefix", "im", true, SearchMode.Or)
  )

  private val allQueryNames: Seq[String] = queryMix.map(_._1) :+ "wand3_distributed"

  /** One interleaved rep at one level: a single timed build plus per-query
    * median-of-`queryReps` latencies, in a fresh session. */
  private final case class RepResult(buildSec: Double,
                                     queryMs: Map[String, Double],
                                     topDocs: Map[String, Seq[Long]])

  /** Per-level aggregation over the interleaved reps. */
  private final case class LevelResult(reps: Seq[RepResult]) {
    def buildSecs: Seq[Double] = reps.map(_.buildSec)
    def buildSec: Double = median(buildSecs)
    def queryMsSamples(name: String): Seq[Double] = reps.map(_.queryMs(name))
    def queryMs(name: String): Double = median(queryMsSamples(name))
  }

  /** Runs ONE rep at `cores`: fresh session, small untimed warm-up build
    * (per-session lazy init + JIT on the first rep), one timed build of the
    * shared corpus, then the query mix (one warm pass, `queryReps` timed
    * passes, per-query median). Rank evidence (top-10 docIDs) is captured
    * per rep and later asserted identical across every rep and level. */
  private def runRep(cores: Int, corpusPath: String, indexBase: String,
                     warmupPath: String, queryReps: Int): RepResult = {
    val spark = session(cores)
    try {
      import spark.implicits._
      locally {
        val warmBase = indexBase + ".warm"
        val wPath = new org.apache.hadoop.fs.Path(warmBase)
        val wfs = wPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (wfs.exists(wPath)) wfs.delete(wPath, true)
        val w = new IndexStore(spark, warmBase, IndexConfig(shardSpan = 1 << 14))
        w.createSegment(spark.read.parquet(warmupPath).as[graft.core.CorpusDoc])
      }
      val corpus = spark.read.parquet(corpusPath).as[graft.core.CorpusDoc]
      val fsPath = new org.apache.hadoop.fs.Path(indexBase)
      val fs = fsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(fsPath)) fs.delete(fsPath, true)
      val store0 = new IndexStore(spark, indexBase, IndexConfig(shardSpan = 1 << 14))
      val t0 = System.nanoTime()
      store0.createSegment(corpus)
      val buildSec = (System.nanoTime() - t0) / 1e9

      val store = new IndexStore(spark, indexBase, IndexConfig(shardSpan = 1 << 14))
      val engine = new SearchEngine(store)
      val lat = scala.collection.mutable.LinkedHashMap.empty[String, Double]
      val tops = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Long]]
      def timeQuery(name: String, run: () => Array[org.apache.spark.sql.Row]): Unit = {
        tops(name) = run().map(_.getLong(0)).toSeq // warm pass doubles as rank evidence
        lat(name) = median((0 until math.max(queryReps, 1)).map { _ =>
          val q0 = System.nanoTime()
          run()
          (System.nanoTime() - q0) / 1e6
        })
      }
      queryMix.foreach { case (name, q, bw, mode) =>
        timeQuery(name, () => engine.search(q, Seq("content"), bw, 10, mode).collect())
      }
      // distributed-WAND latency (fast path disabled): same store, same query
      locally {
        val distEngine = new SearchEngine(new IndexStore(spark, indexBase,
          IndexConfig(shardSpan = 1 << 14, driverWandMaxBytes = 0)))
        timeQuery("wand3_distributed", () => distEngine.search(
          "import class return", Seq("content"), k = 10, mode = SearchMode.Wand).collect())
      }
      RepResult(buildSec, lat.toMap, tops.toMap)
    } finally spark.stop()
  }

  /** Pipeline-operator throughput at peak cores over the sf documents table:
    * MinHash-LSH dedup, SimHash near-dup pairing, the fused curation pass,
    * and the end-to-end index dedup sweep (warm, one timed pass each —
    * regressions in the pipeline plans become visible round-over-round). */
  private def pipelineBench(cores: Int, sfDir: String): Map[String, (Double, Long, Long)] = {
    val spark = session(cores)
    val work = java.nio.file.Files.createTempDirectory("graft-bench-pipe").toString
    try {
      import org.apache.spark.sql.functions.{col, concat, lit}
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val nDocs = docs.count()
      def timed(f: => Long): (Double, Long, Long) = {
        f // warm
        val t0 = System.nanoTime()
        val rows = f
        ((System.nanoTime() - t0) / 1e9, rows, nDocs)
      }
      // sweep target: an index over docs ∪ near-copies of every 10th; the
      // dry-run sweep runs the FULL pipeline (shingle → signature → LSH →
      // verify → components → victim count) without mutating the store, so
      // warm and timed passes measure the same work
      val sweepStore = {
        import spark.implicits._
        // dup ids start past the base ids at ANY corpus size (a fixed
        // offset would collide with base doc_ids once nDocs reached it,
        // silently corrupting the measured sweep — same rule as the drills)
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
      Map(
        "minhash_lsh" -> timed(
          graft.pipeline.Dedup.minHashLshPairs(docs, numHashes = 64, bands = 16,
            minJaccard = 0.5).count()),
        "simhash" -> timed(
          graft.pipeline.Dedup.simHashPairs(docs, maxDist = 3).count()),
        "curate" -> timed(graft.pipeline.Curation.curate(docs).count()),
        "dedup_sweep" -> timed(
          graft.pipeline.Dedup.sweepIndex(sweepStore, minJaccard = 0.5,
            dryRun = true)))
    } finally {
      spark.stop()
      try {
        org.apache.hadoop.fs.FileSystem.getLocal(new org.apache.hadoop.conf.Configuration())
          .delete(new org.apache.hadoop.fs.Path(work), true); ()
      } catch { case _: Exception => () }
    }
  }

  /** Recursive on-disk size of a directory (bytes). */
  private def dirBytes(path: String): Long = {
    val f = new java.io.File(path)
    if (!f.exists) 0L
    else if (f.isFile) f.length
    else f.listFiles.map(x => dirBytes(x.getPath)).sum
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nDocs = sys.env.getOrElse("GRAFT_BENCH_DOCS", "500000").toLong
    val nLow = sys.env.getOrElse("GRAFT_BENCH_CORES_LOW", "2").toInt
    val nHigh = sys.env.getOrElse("GRAFT_BENCH_CORES_HIGH", "8").toInt
    val nPeak = sys.env.getOrElse("GRAFT_BENCH_CORES_PEAK", "32").toInt
    // ≥5 interleaved reps; the efficiency is the median of per-rep ratios
    val reps = sys.env.getOrElse("GRAFT_BENCH_REPS", "5").toInt
    val queryReps = sys.env.getOrElse("GRAFT_BENCH_QUERY_REPS", "5").toInt
    val work = java.nio.file.Files.createTempDirectory("graft-bench").toString
    try {

    // generate the shared input once (generation is NOT timed)
    locally {
      val s = session(nPeak)
      try {
        CorpusGen.generate(s, nDocs, seed = 42, numRepos = 200)
          .write.mode("overwrite").parquet(s"$work/corpus")
        CorpusGen.generate(s, 5000, seed = 99, numRepos = 20)
          .write.mode("overwrite").parquet(s"$work/warmup")
      } finally s.stop()
    }

    // interleaved A/B/A ladder: every rep builds once at every level; the
    // level order flips on odd reps so monotonic drift within a rep hits
    // the criterion levels symmetrically
    // reps accumulate per level SLOT (low/high/peak index), not per core
    // count: an A/A validation run (LOW == HIGH) or HIGH == PEAK must keep
    // the slots' rep vectors separate, or the per-rep zip below would pair
    // runs from different reps and silently corrupt the paired ratios
    val levels = Vector(nLow, nHigh, nPeak)
    val bySlot = Array.fill(levels.size)(Vector.empty[RepResult])
    (0 until math.max(reps, 1)).foreach { rep =>
      val order = if (rep % 2 == 0) levels.indices else levels.indices.reverse
      order.foreach { slot =>
        val cores = levels(slot)
        val r = runRep(cores, s"$work/corpus", s"$work/idx-slot$slot",
          s"$work/warmup", queryReps)
        bySlot(slot) = bySlot(slot) :+ r
        println(f"[bench] rep $rep local[$cores]: build ${r.buildSec}%.1f s " +
          f"(${nDocs / r.buildSec}%.0f docs/s)")
      }
    }
    val low = LevelResult(bySlot(0))
    val high = LevelResult(bySlot(1))
    val peak = LevelResult(bySlot(2))

    // per-rep paired ratio: rep i's N and 4N builds ran minutes apart in
    // the same VM state, so drift cancels inside each ratio; the median
    // rejects outlier reps
    val pairedEffs = low.reps.zip(high.reps).map { case (l, h) =>
      (l.buildSec / h.buildSec) / (nHigh.toDouble / nLow)
    }
    val efficiency = median(pairedEffs)
    val effOfMedians = (low.buildSec / high.buildSec) / (nHigh.toDouble / nLow)
    val rankIdentical = allQueryNames.forall { name =>
      val sets = (low.reps ++ high.reps ++ peak.reps).map(_.topDocs(name))
      sets.forall(_ == sets.head)
    }
    val pipeline = pipelineBench(nPeak, sfDir)

    def f(d: Double): String = f"$d%.3f"
    def samples(xs: Seq[Double]): String = xs.map(f).mkString("[", ",", "]")
    // JSON keys are per-SLOT, like the rep bookkeeping above: an A/A
    // validation run (LOW == HIGH, or HIGH == PEAK) must not emit the
    // same "<cores>c" key twice — a JSON parser keeps only the last
    // occurrence and one slot's record silently vanishes — so colliding
    // core counts get a slot-name suffix
    val slotLabels = {
      val raw = Seq(s"${nLow}c", s"${nHigh}c", s"${nPeak}c")
      if (raw.distinct.size == raw.size) raw
      else raw.zip(Seq("low", "high", "peak")).map { case (r, s) => s"${r}_$s" }
    }
    val queriesJson = (
      allQueryNames.map(n => s""""q_$n":${f(peak.queryMs(n) / 1000)}""") ++
      Seq(s""""index_build_${slotLabels(0)}":${f(low.buildSec)}""",
          s""""index_build_${slotLabels(1)}":${f(high.buildSec)}""",
          s""""index_build_${slotLabels(2)}":${f(peak.buildSec)}""")
    ).mkString("{", ",", "}")
    // per-query per-rep medians (ms) at every level: the dispersion record
    // that distinguishes a real query regression from VM noise
    val querySamplesJson = Seq(slotLabels(0) -> low, slotLabels(1) -> high,
        slotLabels(2) -> peak).map {
      case (label, lv) =>
        s""""query_ms_samples_$label":""" + allQueryNames.map(n =>
          s""""$n":${samples(lv.queryMsSamples(n))}""").mkString("{", ",", "}")
    }.mkString(",")
    val corpusBytes = dirBytes(s"$work/corpus")
    val postingsBytes = dirBytes(s"$work/idx-slot2/seg-0/postings")
    val indexBytes = dirBytes(s"$work/idx-slot2") - dirBytes(s"$work/idx-slot2/seg-0/corpus")
    val pipelineJson = pipeline.map { case (name, (sec, rows, nd)) =>
      s""""pipeline_${name}_sec":${f(sec)},"pipeline_${name}_docs_per_sec":${f(nd / sec)},"pipeline_${name}_rows":$rows"""
    }.mkString(",")
    val json =
      s"""{"metric":"index_docs_per_sec_peak","value":${f(nDocs / peak.buildSec)},"unit":"docs/sec",""" +
      s""""queries":$queriesJson,"sf":"$sfDir",""" +
      s""""bench_docs":$nDocs,"build_reps":$reps,"query_reps":$queryReps,""" +
      s""""protocol":"interleaved_reps_alternating_order",""" +
      s""""docs_per_sec_${slotLabels(0)}":${f(nDocs / low.buildSec)},""" +
      s""""docs_per_sec_${slotLabels(1)}":${f(nDocs / high.buildSec)},""" +
      s""""docs_per_sec_${slotLabels(2)}":${f(nDocs / peak.buildSec)},""" +
      s""""build_secs_${slotLabels(0)}":${samples(low.buildSecs)},""" +
      s""""build_secs_${slotLabels(1)}":${samples(high.buildSecs)},""" +
      s""""build_secs_${slotLabels(2)}":${samples(peak.buildSecs)},""" +
      s""""scaling_pair":"${nLow}->${nHigh}",""" +
      s""""scaling_efficiency":${f(efficiency)},""" +
      s""""scaling_efficiency_basis":"median_of_${reps}_per_rep_paired_ratios",""" +
      s""""scaling_efficiency_samples":${samples(pairedEffs)},""" +
      s""""scaling_efficiency_of_medians":${f(effOfMedians)},""" +
      s""""rank_identical_across_levels":$rankIdentical,""" +
      s""""corpus_bytes":$corpusBytes,"postings_bytes":$postingsBytes,""" +
      s""""index_bytes_total":$indexBytes,$pipelineJson,$querySamplesJson,""" +
      s""""query_p50_ms_${slotLabels(2)}":${f(median(allQueryNames.map(peak.queryMs)))}}"""

    val md =
      s"""# BENCH — index-build throughput + BM25 query latency
         |
         |Protocol (BASELINE.md): identical deterministic corpus
         |($nDocs synthetic source files, seed 42, FIXTURES.md §1), same input
         |parquet at every level, shuffle partitions = 4·cores.
         |
         |**Noise protocol (round 5):** the three levels are INTERLEAVED —
         |each of the $reps reps builds once at every level in a fresh
         |session, level order alternating rep-to-rep — so this VM's ±30%
         |multi-minute drift lands on both criterion levels symmetrically
         |instead of biasing one block of back-to-back builds. The headline
         |efficiency is the median of PER-REP paired ratios (each rep's N
         |and 4N builds see the same VM state, so drift cancels inside the
         |ratio); the cross-rep efficiency-of-medians is reported alongside,
         |with every sample. Query latencies are per-rep medians of
         |$queryReps timed passes, reported as the median across reps.
         |
         || level | build sec (median) | samples | files/sec |
         ||---|---|---|---|
         || local[$nLow] (N) | ${f(low.buildSec)} | ${low.buildSecs.map(f).mkString(", ")} | ${f(nDocs / low.buildSec)} |
         || local[$nHigh] (4N) | ${f(high.buildSec)} | ${high.buildSecs.map(f).mkString(", ")} | ${f(nDocs / high.buildSec)} |
         || local[$nPeak] (peak) | ${f(peak.buildSec)} | ${peak.buildSecs.map(f).mkString(", ")} | ${f(nDocs / peak.buildSec)} |
         |
         |**Scaling efficiency (N→4N, $nLow→$nHigh cores):** ${f(efficiency)}
         |(target ≥ 0.8) — median of per-rep paired ratios
         |[${pairedEffs.map(f).mkString(", ")}]; efficiency of cross-rep
         |medians ${f(effOfMedians)}.
         |**Top-10 docIDs rank-identical across all levels and reps:** $rankIdentical
         |**Index size:** postings ${postingsBytes / 1048576} MB
         |(delta+varint blobs + block metadata) for a ${corpusBytes / 1048576} MB
         |parquet corpus — ${f(postingsBytes.toDouble / corpusBytes)}x; full index
         |incl. df/stats tables ${indexBytes / 1048576} MB.
         |
         |Why N=$nLow: all cores of this single VM share one memory system;
         |the build is string-heavy and stays memory-bandwidth-bound above
         |~8-16 threads (8→32 efficiency ≈ ${f((high.buildSec / peak.buildSec) / (nPeak.toDouble / nHigh))}
         |even after the round-2 allocation cut — scanner tokenizer +
         |sort-run tf counting — which lifted 8-core throughput ~1.5x and
         |made 32 cores scale past 8 at all; a pure-CPU probe
         |(`graft.tools.ScaleProbe`) scales 8→32 at 0.83). On a real cluster
         |the 4N step adds machines — memory bandwidth scales with executor
         |count — so the bandwidth-safe core range is the faithful single-box
         |proxy for executor scaling. The peak row shows absolute single-box
         |throughput at all $nPeak threads.
         |
         |## vs reference baseline (BASELINE.md)
         |
         |goSearch ingests one doc per HTTP request at 0.782 ms avg ⇒ ~1,279
         |files/sec on its single cloud node. This engine indexes
         |${f(nDocs / low.buildSec)} files/sec on TWO cores and
         |${f(nDocs / peak.buildSec)} files/sec on the whole box — ${
           f(nDocs / peak.buildSec / 1279.0)}x the reference's single-node ingest
         |throughput at the same data scale, while also persisting a
         |compressed, statistics-bearing index. Search: the reference answers
         |in ~0.8 ms because its radix tree is fully RAM-resident; the
         |rebuild's bounded equivalent is the driver-side posting-blob LRU
         |(64 MB default, version-invalidated on CRUD) — warm fast-path
         |queries run zero Spark jobs and land at tens of ms (BMW/decode
         |time over ~10^6 postings plus DataFrame overhead). Corpus-scale
         |candidate sets exceed the fast-path bound and take the fully
         |distributed plan, reported separately below (fast path off), which
         |pays Spark's per-job scheduling floor.
         |
         |## Pipeline-operator throughput (local[$nPeak], sf documents table)
         |
         || operator | wall sec | docs/sec | pairs found |
         ||---|---|---|---|
         |${pipeline.toSeq.sortBy(_._1).map { case (name, (sec, rows, nd)) =>
            s"| $name | ${f(sec)} | ${f(nd / sec)} | $rows |"
          }.mkString("\n|")}
         |
         |## BM25 top-10 query latency (warm, ms — median of $reps rep-medians, $queryReps passes each)
         |
         || query | local[$nLow] | local[$nHigh] | local[$nPeak] | $nPeak-core samples |
         ||---|---|---|---|---|
         |${(queryMix.map { case (name, q, bw, mode) =>
            s"| $name (`$q`${if (bw) ", prefix" else ""}, $mode) | ${f(low.queryMs(name))} | ${f(high.queryMs(name))} | ${f(peak.queryMs(name))} | ${peak.queryMsSamples(name).map(f).mkString(", ")} |"
          } :+ s"| wand3_distributed (fast path off) | ${f(low.queryMs("wand3_distributed"))} | ${f(high.queryMs("wand3_distributed"))} | ${f(peak.queryMs("wand3_distributed"))} | ${peak.queryMsSamples("wand3_distributed").map(f).mkString(", ")} |").mkString("\n|")}
         |
         |On `wand3_distributed`: it bypasses every driver cache by design
         |(fast path disabled), so its latency is dominated by Spark's
         |per-job scheduling floor (3 jobs: stats, shard scan+group-walk,
         |top-k) rather than by posting volume — it is expected to stay
         |roughly flat round-over-round and across core counts, and it is
         |the number that represents the corpus-scale (cache-miss) path
         |honestly.
         |""".stripMargin
    // BENCH_EXTRA.md carries hand-measured drill evidence (lifecycle,
    // curation, ...) that a bench re-run must not clobber
    val extraPath = java.nio.file.Paths.get("BENCH_EXTRA.md")
    val extra =
      if (java.nio.file.Files.exists(extraPath))
        "\n" + java.nio.file.Files.readString(extraPath)
      else ""
    java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH.md"), md + extra)

    println(json)
    } finally {
      // the generated corpus + three index copies are ~2.4 GB per run —
      // never leak them on the shared VM, success or failure (best-effort:
      // a delete error must not mask a bench failure)
      try {
        org.apache.hadoop.fs.FileSystem.getLocal(new org.apache.hadoop.conf.Configuration())
          .delete(new org.apache.hadoop.fs.Path(work), true); ()
      } catch { case _: Exception => () }
    }
  }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.isEmpty) 0.0 else s(s.length / 2)
  }
}
