package graft.tools

import graft.core.{CorpusDoc, IndexConfig}
import graft.corpus.CorpusGen
import graft.index.IndexStore
import graft.pipeline.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale drill for the PERSISTED incremental sweep: measures a full
  * persisted sweep over an n+10%-dup corpus, then an `add()` of a 1% dup
  * wave followed by an INCREMENTAL sweep (only the new segment gets
  * signatured; candidates are new × live through the stored signature
  * table), and verifies the incremental result equals a from-scratch full
  * sweep over the same final corpus. Prints `[drill]` lines; exits nonzero
  * on any mismatch. The full-vs-incremental wall-clock ratio is the number
  * that justifies persisting signatures at 100 TB: per-maintenance-run cost
  * becomes proportional to the NEW data, not the corpus. */
object IncSweepDrill {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("inc-sweep-drill")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[T](label: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[drill] $label: $sec%.1f s"); (r, sec)
    }

    val work = java.nio.file.Files.createTempDirectory("graft-incdrill").toString
    val base = CorpusGen.generate(spark, n, seed = 42, numRepos = 200)
    // dup id spaces start past the base ids at ANY n (fixed offsets
    // would collide once n reaches them)
    val off = math.max(n, 10000000L)
    val dups1 = base.filter($"doc_id" % 10 === 0)
      .map(d => d.copy(doc_id = d.doc_id + off,
        content = d.content + " graftdup graftdup"))
    base.unionByName(dups1).write.mode("overwrite").parquet(s"$work/corpus1")
    val corpus1 = spark.read.parquet(s"$work/corpus1").as[CorpusDoc]

    val store = new IndexStore(spark, s"$work/idx", IndexConfig(fields = Seq("content")))
    timed(s"build ${n + n / 10} docs")(store.createSegment(corpus1))
    val (sweptFull, tFull) = timed("FULL persisted sweep (signatures everything)")(
      Dedup.sweepIndexPersisted(store, minJaccard = 0.5))
    require(sweptFull >= n / 10, s"full sweep removed $sweptFull < ${n / 10}")

    // snapshot the post-phase-1 live corpus for the from-scratch control
    store.liveCorpus().write.mode("overwrite").parquet(s"$work/live1")
    val live1Count = spark.read.parquet(s"$work/live1").count()

    // 1% dup wave: near-copies of every 100th base doc, new ids
    val dups2 = base.filter($"doc_id" % 100 === 0)
      .map(d => d.copy(doc_id = d.doc_id + 2 * off,
        content = d.content + " graftdup2 graftdup2"))
    dups2.write.mode("overwrite").parquet(s"$work/dups2")
    val wave = spark.read.parquet(s"$work/dups2").as[CorpusDoc]
    val waveCount = wave.count()
    timed(s"add $waveCount docs")(store.add(wave))
    val (sweptInc, tInc) = timed("INCREMENTAL persisted sweep (new segment only)")(
      Dedup.sweepIndexPersisted(store, minJaccard = 0.5))
    println(f"[drill] full ${tFull}%.1f s vs incremental ${tInc}%.1f s -> " +
      f"${tFull / tInc}%.1fx on a ${100.0 * waveCount / live1Count}%.1f%% ingest wave")

    // control: from-scratch full sweep over the identical final corpus
    val control = new IndexStore(spark, s"$work/idx-control",
      IndexConfig(fields = Seq("content")))
    val corpus2 = spark.read.parquet(s"$work/live1").as[CorpusDoc]
      .unionByName(wave)
    control.createSegment(corpus2)
    val (sweptCtl, _) = timed("control: full sweep over the final corpus")(
      Dedup.sweepIndexPersisted(control, minJaccard = 0.5))
    val incLive = store.liveCorpus().select("doc_id").as[Long].collect().toSet
    val ctlLive = control.liveCorpus().select("doc_id").as[Long].collect().toSet
    require(incLive == ctlLive,
      s"incremental sweep diverged from full: only-inc=${(incLive -- ctlLive).take(5)}, " +
        s"only-full=${(ctlLive -- incLive).take(5)}")
    println(s"[drill] OK: incremental ($sweptInc swept) == from-scratch full " +
      s"($sweptCtl swept), ${incLive.size} live docs identical")

    // ---- maintenance carries (round 5): compact and merge must re-home
    // the signature tables + watermark, keeping every later sweep
    // wave-proportional ----

    // COMPACT folds the sweep tombstones and rebuilds the store; the carry
    // must leave the compacted segment signatured AND swept
    val (_, tCompact) = timed("compact (carries signatures + watermark)")(
      store.compact())
    require(store.stageDone(0, "minhash"),
      "compact dropped the signature tables")
    require(new graft.index.SimilarityIndex(store).unsweptSegs(0.5).isEmpty,
      "compact dropped the sweep watermark")
    val dups3 = base.filter($"doc_id" % 100 === 0)
      .map(d => d.copy(doc_id = d.doc_id + 3 * off,
        content = d.content + " graftdup3 graftdup3"))
    dups3.write.mode("overwrite").parquet(s"$work/dups3")
    store.add(spark.read.parquet(s"$work/dups3").as[CorpusDoc])
    val (swept3, tInc3) = timed("post-compact INCREMENTAL sweep (wave 3)")(
      Dedup.sweepIndexPersisted(store, minJaccard = 0.5))
    require(swept3 == waveCount,
      s"post-compact sweep removed $swept3 of $waveCount wave-3 dups")
    require(tInc3 < tFull / 2,
      f"post-compact incremental sweep ($tInc3%.1f s) lost wave-" +
        f"proportionality (full sweep was $tFull%.1f s) — compact dropped " +
        "the carried tables?")

    // MERGE between waves: fold two swept micro-segments; the carried
    // tables keep the NEXT sweep wave-proportional. The two waves carry
    // synthetic all-unique tokens (zero shared shingles with anything), so
    // their sweeps delete nothing and leave the store tombstone-free for
    // the merge after a second compact.
    timed("compact (fold wave-3 tombstones)")(store.compact())
    def novelWave(stem: String, offMul: Long) = base
      .filter($"doc_id" % 200 === 0)
      .map(d => d.copy(doc_id = d.doc_id + offMul * off,
        content = (1 to 24).map(j => s"$stem${d.doc_id}x$j").mkString(" ")))
    store.add(novelWave("novA", 5))
    require(Dedup.sweepIndexPersisted(store, minJaccard = 0.5) == 0)
    store.add(novelWave("novB", 6))
    require(Dedup.sweepIndexPersisted(store, minJaccard = 0.5) == 0)
    val novelCount = 2 * (n / 200 + (if (n % 200 != 0) 1 else 0))
    val (mergedId, tMerge) = timed("mergeSmallSegments (fold the two waves)")(
      store.mergeSmallSegments(maxDocs = 2 + n / 100))
    require(mergedId.isDefined, "merge did not fold the micro-segments")
    require(store.stageDone(mergedId.get, "minhash"),
      "merge dropped the carried signature table")
    require(new graft.index.SimilarityIndex(store).unsweptSegs(0.5).isEmpty,
      "merge dropped the sweep watermark")
    val dups4 = base.filter($"doc_id" % 100 === 0)
      .map(d => d.copy(doc_id = d.doc_id + 7 * off,
        content = d.content + " graftdup4 graftdup4"))
    dups4.write.mode("overwrite").parquet(s"$work/dups4")
    store.add(spark.read.parquet(s"$work/dups4").as[CorpusDoc])
    val (swept4, tInc4) = timed("post-merge INCREMENTAL sweep (wave 4)")(
      Dedup.sweepIndexPersisted(store, minJaccard = 0.5))
    require(swept4 == waveCount,
      s"post-merge sweep removed $swept4 of $waveCount wave-4 dups")
    require(tInc4 < tFull / 2,
      f"post-merge incremental sweep ($tInc4%.1f s) lost wave-" +
        f"proportionality (full sweep was $tFull%.1f s) — merge dropped " +
        "the carried tables?")
    val finalLive = store.liveCorpus().count()
    require(finalLive == live1Count + novelCount,
      s"final live $finalLive != ${live1Count + novelCount}")
    println(f"[drill] OK maintenance carries: compact ${tCompact}%.1f s, " +
      f"merge ${tMerge}%.1f s; post-compact sweep ${tInc3}%.1f s, " +
      f"post-merge sweep ${tInc4}%.1f s (full sweep ${tFull}%.1f s) — " +
      "maintenance never re-signatures the corpus")

    org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(work), true)
    spark.stop()
  }
}
