package graft.index

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PERSISTED similarity signatures riding the [[IndexStore]] segment
  * layout — maintained like postings, so dedup maintenance stops
  * re-signaturing the whole corpus per run. Two signature kinds share the
  * lifecycle:
  *
  * {{{
  * base/
  *   similarity.json              — pinned field + per-kind params + sweep watermark
  *   seg-<i>/minhash/             — (doc_id, sig: array<long>[numHashes])
  *   seg-<i>/simhash/             — (doc_id, simhash: long)
  *   seg-<i>/_checkpoints/{minhash,simhash}.json   written once per segment
  * }}}
  *
  * Signatures are PURE PER-DOC functions (uncapped shingles → seeded
  * affine min-hashes; tf-weighted bit votes → 62-bit SimHash), which is
  * what makes them incrementally maintainable: a new segment's tables
  * depend only on its own rows. [[ensure]]/[[ensureSimHash]] compute
  * exactly the missing segments' tables (through the store's checkpointed
  * stage machinery — same markers, lineage and per-partition metrics as
  * the core build stages); deletes need nothing (reads are
  * tombstone-filtered like [[IndexStore.liveCorpus]]); a merge/compact
  * drops the old segment dirs and the next ensure signatures only the
  * merged output.
  *
  * `similarity.json` pins `textField` for BOTH kinds (mixing fields would
  * compare hashes of different content) and the MinHash parameters for the
  * MinHash tables only — SimHash has no tunable parameters, so a SimHash
  * scan neither records nor validates MinHash settings (and cannot poison
  * a store with defaults the MinHash side never used). It also records the
  * sweep WATERMARK (segment ids + threshold covered by the last completed
  * non-dry [[graft.pipeline.Dedup.sweepIndexPersisted]]): an incremental
  * sweep generates candidate pairs only for documents of segments PAST the
  * watermark — pairs wholly inside it were already resolved by the sweep
  * that set it. */
class SimilarityIndex(val store: IndexStore, val textField: String = "content",
                      val numHashes: Int = 64, val seed: Long = 42L,
                      val shingleK: Int = 3) {
  private val spark: SparkSession = store.spark
  private val hconf = spark.sparkContext.hadoopConfiguration
  private def metaPath = new Path(s"${store.baseDir}/similarity.json")
  private def fs = metaPath.getFileSystem(hconf)

  /** minhash = (numHashes, seed, shingleK), present once the MinHash side
    * has pinned its parameters. */
  private final case class Meta(textField: String,
                                minhash: Option[(Int, Long, Int)],
                                swept: Set[Int],
                                sweptMinJaccard: Option[Double])

  private def readMeta(): Option[Meta] = {
    if (!fs.exists(metaPath)) return None
    val in = fs.open(metaPath)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val n = new ObjectMapper().readTree(txt)
    val swept = Option(n.get("sweptSegs")).map(a =>
      (0 until a.size()).map(i => a.get(i).asInt()).toSet).getOrElse(Set.empty)
    // legacy layout (first generation of this file) kept the MinHash
    // params flat at the top level — adopt them as the minhash block, or a
    // legacy store would silently lose its parameter guard and get
    // re-pinned to whatever the next caller's defaults are
    val mh = Option(n.get("minhash")).map(b =>
        (b.get("numHashes").asInt(), b.get("seed").asLong(), b.get("shingleK").asInt()))
      .orElse(Option(n.get("numHashes")).map(nh =>
        (nh.asInt(), n.get("seed").asLong(), n.get("shingleK").asInt())))
    Some(Meta(n.get("textField").asText(), mh, swept,
      Option(n.get("sweptMinJaccard")).map(_.asDouble())))
  }

  private def writeMeta(m: Meta): Unit = {
    val minJ = m.sweptMinJaccard.map(j => s""","sweptMinJaccard":$j""").getOrElse("")
    val mh = m.minhash.map { case (nh, sd, k) =>
      s""","minhash":{"numHashes":$nh,"seed":$sd,"shingleK":$k}"""
    }.getOrElse("")
    val json =
      s"""{"textField":"${m.textField}",""" +
      s""""sweptSegs":${m.swept.toSeq.sorted.mkString("[", ",", "]")}$minJ$mh}"""
    val out = fs.create(metaPath, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  private def checkField(m: Meta): Unit =
    require(m.textField == textField,
      s"similarity index at ${store.baseDir} covers field '${m.textField}'; " +
        s"refusing to mix signatures over field '$textField' " +
        "— re-derive under one field")

  private def checkMinHash(m: Meta): Unit = {
    checkField(m)
    m.minhash.foreach { case (nh, sd, k) =>
      require(nh == numHashes && sd == seed && k == shingleK,
        s"similarity index at ${store.baseDir} was built with MinHash " +
          s"(hashes=$nh, seed=$sd, k=$k); refusing to mix signatures with " +
          s"(hashes=$numHashes, seed=$seed, k=$shingleK) " +
          "— re-derive under one parameter set")
    }
  }

  /** Fails loudly on a MinHash parameter mismatch with the persisted
    * config; writes NOTHING (safe on a read-only store). */
  def validateParams(): Unit = readMeta().foreach(checkMinHash)

  /** Field-only validation for the SimHash side; writes NOTHING. */
  def validateField(): Unit = readMeta().foreach(checkField)

  // ---------- shared per-kind stage-table lifecycle ----------

  /** Writes the per-segment table of one signature kind for every
    * committed segment lacking it; returns the freshly covered seg ids. */
  private def ensureKind(stage: String, plan: Int => DataFrame): Seq[Int] = {
    val missing = store.segments.filterNot(s => store.stageDone(s.id, stage))
    missing.foreach { seg =>
      store.runStage(seg.id, stage, Seq(s"seg-${seg.id}/corpus"), resume = true) {
        plan(seg.id)
      }
    }
    missing.map(_.id)
  }

  /** One kind's tables across all committed segments with a `seg`
    * provenance column (explicit schema: no inference job per segment).
    * With `transientMissing`, segments lacking a table contribute their
    * computation PLAN instead (recomputed per action, nothing written) —
    * the read-only shape dry-run audits need. */
  private def kindValues(stage: String, schema: StructType,
                         plan: Int => DataFrame,
                         transientMissing: Boolean): DataFrame =
    store.segments.map { s =>
      if (transientMissing && !store.stageDone(s.id, stage))
        plan(s.id).withColumn("seg", lit(s.id))
      else
        spark.read.schema(schema).parquet(store.segPath(s.id, stage))
          .withColumn("seg", lit(s.id))
    }.reduceOption(_ unionByName _)
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        schema.add(StructField("seg", IntegerType))))

  private def tombstoneFilter(df: DataFrame): DataFrame = {
    if (store.tombstoneCount() == 0L) return df
    val ts = store.tombstoneAgg()
    df.join(ts, df("doc_id") === ts("t_doc_id") &&
      df("seg") <= ts("t_max_seg"), "left_anti")
  }

  // ---------- MinHash tables ----------

  private val sigSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("sig", ArrayType(LongType))))

  /** The MinHash signature plan for one segment's stored corpus. */
  private def segSignaturePlan(segId: Int): DataFrame = {
    val corpus = spark.read.parquet(store.segPath(segId, "corpus"))
      .select(col("doc_id"), col(textField).as("text"))
    graft.pipeline.Dedup.minHashSignatures(
      graft.pipeline.Dedup.shingles(corpus, k = shingleK, maxShingleDf = 0),
      numHashes, seed)
  }

  /** Computes MinHash tables for every committed segment lacking one;
    * returns the segment ids that were signatured by THIS call. Pins the
    * MinHash parameters in the metadata on first use. */
  def ensure(): Seq[Int] = {
    readMeta() match {
      case Some(m) =>
        checkMinHash(m)
        if (m.minhash.isEmpty)
          writeMeta(m.copy(minhash = Some((numHashes, seed, shingleK))))
      case None =>
        writeMeta(Meta(textField, Some((numHashes, seed, shingleK)), Set.empty, None))
    }
    ensureKind("minhash", segSignaturePlan)
  }

  /** All committed segments' MinHash signatures; see [[kindValues]] for
    * `transientMissing`. */
  def signatures(transientMissing: Boolean = false): DataFrame =
    kindValues("minhash", sigSchema, segSignaturePlan, transientMissing)

  /** Signatures of LIVE documents only — the same tombstone anti-join
    * semantics as [[IndexStore.liveCorpus]] (a doc deleted at or after its
    * segment's generation is filtered). */
  def liveSignatures(transientMissing: Boolean = false): DataFrame =
    tombstoneFilter(signatures(transientMissing))

  // ---------- SimHash tables ----------

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
    * family; only `textField` is validated/pinned. */
  def ensureSimHash(): Seq[Int] = {
    readMeta() match {
      case Some(m) => checkField(m)
      case None => writeMeta(Meta(textField, None, Set.empty, None))
    }
    ensureKind("simhash", segSimHashPlan)
  }

  /** All committed segments' SimHash values; see [[kindValues]]. */
  def simHashValues(transientMissing: Boolean = false): DataFrame =
    kindValues("simhash", simHashSchema, segSimHashPlan, transientMissing)

  /** Live-document SimHash values (tombstone-filtered). */
  def liveSimHashes(transientMissing: Boolean = false): DataFrame =
    tombstoneFilter(simHashValues(transientMissing))

  // ---------- sweep watermark ----------

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
    * currently committed segment, preserving the rest of the metadata.
    * Called by the sweep AFTER its deletes land; a dry run never advances
    * (its findings were not applied, so the segments are still unswept). */
  def markSwept(minJaccard: Double): Unit = {
    val m = readMeta().getOrElse(Meta(textField, None, Set.empty, None))
    writeMeta(m.copy(swept = store.segments.map(_.id).toSet,
      sweptMinJaccard = Some(minJaccard)))
  }
}
