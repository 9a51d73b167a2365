package graft.index

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PERSISTED MinHash signature index riding the [[IndexStore]] segment
  * layout — maintained like postings, so dedup maintenance stops
  * re-signaturing the whole corpus per run:
  *
  * {{{
  * base/
  *   similarity.json              — pinned signature params + sweep watermark
  *   seg-<i>/minhash/             — (doc_id, sig: array<long>[numHashes]),
  *   seg-<i>/_checkpoints/minhash.json   one table per segment, written once
  * }}}
  *
  * Signatures are PURE PER-DOC functions (uncapped shingles → seeded
  * affine min-hashes), which is what makes them incrementally maintainable:
  * a new segment's signatures depend only on its own rows. [[ensure]]
  * computes exactly the missing segments' tables (through the store's
  * checkpointed stage machinery — same markers, lineage and per-partition
  * metrics as the core build stages); deletes need nothing (reads are
  * tombstone-filtered like [[IndexStore.liveCorpus]]); a merge/compact drops
  * the old segment dirs and the next `ensure` signatures only the merged
  * output. The params are pinned in `similarity.json` — mixing signatures
  * computed under different (numHashes, seed, k, field) would silently
  * break every Jaccard estimate, so a mismatch fails loudly.
  *
  * `similarity.json` also records the sweep WATERMARK (segment ids covered
  * by the last completed non-dry [[graft.pipeline.Dedup.sweepIndexPersisted]]):
  * an incremental sweep generates candidate pairs only for documents of
  * segments PAST the watermark (new docs vs the whole live corpus, via the
  * banded signature join) — pairs wholly inside the watermark were already
  * resolved by the sweep that set it. */
class SimilarityIndex(val store: IndexStore, val textField: String = "content",
                      val numHashes: Int = 64, val seed: Long = 42L,
                      val shingleK: Int = 3) {
  private val spark: SparkSession = store.spark
  private val hconf = spark.sparkContext.hadoopConfiguration
  private def metaPath = new Path(s"${store.baseDir}/similarity.json")
  private def fs = metaPath.getFileSystem(hconf)

  private final case class Meta(textField: String, numHashes: Int, seed: Long,
                                shingleK: Int, swept: Set[Int],
                                sweptMinJaccard: Option[Double])

  private def readMeta(): Option[Meta] = {
    if (!fs.exists(metaPath)) return None
    val in = fs.open(metaPath)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val n = new ObjectMapper().readTree(txt)
    val swept = Option(n.get("sweptSegs")).map(a =>
      (0 until a.size()).map(i => a.get(i).asInt()).toSet).getOrElse(Set.empty)
    Some(Meta(n.get("textField").asText(), n.get("numHashes").asInt(),
      n.get("seed").asLong(), n.get("shingleK").asInt(), swept,
      Option(n.get("sweptMinJaccard")).map(_.asDouble())))
  }

  private def writeMeta(swept: Set[Int], minJaccard: Option[Double]): Unit = {
    val minJ = minJaccard.map(j => s""","sweptMinJaccard":$j""").getOrElse("")
    val json =
      s"""{"textField":"$textField","numHashes":$numHashes,"seed":$seed,""" +
      s""""shingleK":$shingleK,"sweptSegs":${swept.toSeq.sorted.mkString("[", ",", "]")}$minJ}"""
    val out = fs.create(metaPath, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  private def checkParams(m: Meta): Unit =
    require(m.textField == textField && m.numHashes == numHashes &&
      m.seed == seed && m.shingleK == shingleK,
      s"similarity index at ${store.baseDir} was built with " +
        s"(field=${m.textField}, hashes=${m.numHashes}, seed=${m.seed}, " +
        s"k=${m.shingleK}); refusing to mix signatures with " +
        s"(field=$textField, hashes=$numHashes, seed=$seed, k=$shingleK) " +
        "— re-derive under one parameter set")

  /** Fails loudly on a parameter mismatch with the persisted config;
    * writes NOTHING (safe on a read-only store). */
  def validateParams(): Unit = readMeta().foreach(checkParams)

  /** The signature plan for one segment's stored corpus. */
  private def segSignaturePlan(segId: Int): DataFrame = {
    val corpus = spark.read.parquet(store.segPath(segId, "corpus"))
      .select(col("doc_id"), col(textField).as("text"))
    graft.pipeline.Dedup.minHashSignatures(
      graft.pipeline.Dedup.shingles(corpus, k = shingleK, maxShingleDf = 0),
      numHashes, seed)
  }

  /** Computes signature tables for every committed segment lacking one;
    * returns the segment ids that were signatured by THIS call. Existing
    * tables are never touched (stage markers) — the incremental contract. */
  def ensure(): Seq[Int] = {
    readMeta() match {
      case Some(m) => checkParams(m)
      case None => writeMeta(Set.empty, None)
    }
    val missing = store.segments.filterNot(s => store.stageDone(s.id, "minhash"))
    missing.foreach { seg =>
      store.runStage(seg.id, "minhash", Seq(s"seg-${seg.id}/corpus"), resume = true) {
        segSignaturePlan(seg.id)
      }
    }
    missing.map(_.id)
  }

  private val sigSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("sig", ArrayType(LongType))))

  /** All committed segments' signatures with a `seg` provenance column
    * (explicit schema: no inference job per segment). With
    * `transientMissing = false` (default), call [[ensure]] first — a
    * segment without its table fails loudly here. With it true, segments
    * lacking a table contribute their signature PLAN instead (recomputed
    * per action, nothing written) — the read-only shape a dry-run audit
    * needs. */
  def signatures(transientMissing: Boolean = false): DataFrame =
    store.segments.map { s =>
      if (transientMissing && !store.stageDone(s.id, "minhash"))
        segSignaturePlan(s.id).withColumn("seg", lit(s.id))
      else
        spark.read.schema(sigSchema).parquet(store.segPath(s.id, "minhash"))
          .withColumn("seg", lit(s.id))
    }.reduceOption(_ unionByName _)
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        sigSchema.add(StructField("seg", IntegerType))))

  /** Signatures of LIVE documents only — the same tombstone anti-join
    * semantics as [[IndexStore.liveCorpus]] (a doc deleted at or after its
    * segment's generation is filtered). */
  def liveSignatures(transientMissing: Boolean = false): DataFrame =
    tombstoneFilter(signatures(transientMissing))

  private def tombstoneFilter(df: DataFrame): DataFrame = {
    if (store.tombstoneCount() == 0L) return df
    val ts = store.tombstoneAgg()
    df.join(ts, df("doc_id") === ts("t_doc_id") &&
      df("seg") <= ts("t_max_seg"), "left_anti")
  }

  // ---------- SimHash tables (same lifecycle as the MinHash ones) ----------

  private val simHashSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("simhash", LongType)))

  private def segSimHashPlan(segId: Int): DataFrame =
    graft.pipeline.Dedup.simHashes(
      spark.read.parquet(store.segPath(segId, "corpus"))
        .select(col("doc_id"), col(textField).as("text")))

  /** Computes per-segment SimHash tables (`seg-<i>/simhash/`) for every
    * committed segment lacking one — the second persisted signature kind.
    * SimHash has no tunable parameters beyond the pinned analyzer/hash
    * family, but it DOES depend on `textField`, which the shared
    * similarity.json pins. */
  def ensureSimHash(): Seq[Int] = {
    readMeta() match {
      case Some(m) => checkParams(m)
      case None => writeMeta(Set.empty, None)
    }
    val missing = store.segments.filterNot(s => store.stageDone(s.id, "simhash"))
    missing.foreach { seg =>
      store.runStage(seg.id, "simhash", Seq(s"seg-${seg.id}/corpus"), resume = true) {
        segSimHashPlan(seg.id)
      }
    }
    missing.map(_.id)
  }

  /** All committed segments' SimHash values with `seg` provenance;
    * `transientMissing` mirrors [[signatures]]. */
  def simHashValues(transientMissing: Boolean = false): DataFrame =
    store.segments.map { s =>
      if (transientMissing && !store.stageDone(s.id, "simhash"))
        segSimHashPlan(s.id).withColumn("seg", lit(s.id))
      else
        spark.read.schema(simHashSchema).parquet(store.segPath(s.id, "simhash"))
          .withColumn("seg", lit(s.id))
    }.reduceOption(_ unionByName _)
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        simHashSchema.add(StructField("seg", IntegerType))))

  /** Live-document SimHash values (tombstone-filtered). */
  def liveSimHashes(transientMissing: Boolean = false): DataFrame =
    tombstoneFilter(simHashValues(transientMissing))

  /** Committed segments past the sweep watermark — the docs an incremental
    * sweep must pair against the whole live corpus. The watermark is ONLY
    * valid for the threshold it was swept at: a different `minJaccard`
    * changes which pairs count as duplicates, so the watermark is
    * discarded and every segment reports unswept (the next sweep is a full
    * one) — silently keeping it would under-delete after a policy
    * tightening. */
  def unsweptSegs(minJaccard: Double): Seq[Int] = {
    val meta = readMeta()
    val valid = meta.exists(_.sweptMinJaccard.contains(minJaccard))
    val swept = if (valid) meta.map(_.swept).getOrElse(Set.empty[Int])
                else Set.empty[Int]
    store.segments.map(_.id).filterNot(swept)
  }

  /** Advances the sweep watermark (recording its threshold) to every
    * currently committed segment. Called by the sweep AFTER its deletes
    * land; a dry run never advances (its findings were not applied, so the
    * segments are still unswept). */
  def markSwept(minJaccard: Double): Unit =
    writeMeta(store.segments.map(_.id).toSet, Some(minJaccard))
}
