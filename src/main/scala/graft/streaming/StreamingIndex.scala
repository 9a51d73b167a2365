package graft.streaming

import graft.core.CorpusDoc
import graft.index.IndexStore
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY.md §7.6).
  *
  * The reference ingests documents push-per-HTTP-request and replicates each
  * mutation to the cluster (indexRoutes.go:66-89, clustering.go:521-542);
  * the Spark-native equivalent is micro-batch ingest: a file stream of
  * corpus rows where every micro-batch commits one index segment via
  * `foreachBatch` — visibility-on-commit replaces replication, and segment
  * search composes batches exactly like the reference's eventually-
  * consistent adds.
  */
object StreamingIndex {

  val corpusSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("repo", StringType),
    StructField("path", StringType), StructField("commit", StringType),
    StructField("lang", StringType), StructField("content", StringType)))

  /** Micro-batch incremental indexing: each micro-batch (here: one input
    * file, via maxFilesPerTrigger=1) becomes one committed segment.
    *
    * Replay-idempotent via CLAIM MARKERS: before building, the batch writes
    * `graft-batch-<id>` in the checkpoint dir recording the segment id it
    * claimed (max committed + 1 at claim time). A replayed batch reads its
    * marker back: marker present but uncommitted → resume that segment's
    * stage checkpoints; segment already in the manifest → verify it is
    * actually THIS batch (full-field fingerprint via
    * [[graft.index.IndexStore.segmentMatches]]) before skipping. The
    * verification closes a replay hole: if a batch crashes after writing
    * its marker but before the manifest commit, a non-stream `add()`
    * before the restart can commit its own segment under the claimed id —
    * skipping on id alone would silently drop the batch's documents. On
    * mismatch the batch re-claims a fresh id (persisted, so later replays
    * resolve identically). Remaining contract: no concurrent writer while
    * a batch is in flight (the reference's per-index mutation path is
    * single-writer too, clustering.go:521-542). */
  /** Default checkpoint location for [[indexStream]]: keyed to BOTH the
    * store and the input directory, because the checkpoint records which
    * input files THIS STORE has already ingested. Keyed to the input alone,
    * a second store fed from the same directory would find every file
    * already marked consumed and silently ingest nothing. The input path is
    * fully qualified before hashing so equivalent spellings (trailing
    * slash, relative vs absolute, bare vs file://) share one checkpoint. */
  def defaultCheckpointDir(inputDir: String, store: IndexStore): String = {
    def keyed(s: String): String = {
      val tag = java.security.MessageDigest.getInstance("SHA-256")
        .digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      s"${store.baseDir}.stream-$tag.checkpoint"
    }
    val conf = store.spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(inputDir)
    val canonical = keyed(p.getFileSystem(conf).makeQualified(p).toUri.toString)
    // a checkpoint keyed under the pre-canonicalization scheme (raw input
    // string) is still THIS (store, input) pair's — adopt it rather than
    // silently re-ingesting everything under the new key. The probed paths
    // derive from store.baseDir, which may live on a DIFFERENT filesystem
    // than the input (hdfs:// input feeding a file:// store), so each
    // existence probe resolves its own path's FileSystem.
    def exists(s: String): Boolean = {
      val cp = new org.apache.hadoop.fs.Path(s)
      cp.getFileSystem(conf).exists(cp)
    }
    val raw = keyed(inputDir)
    if (raw != canonical && !exists(canonical) && exists(raw)) raw
    else canonical
  }

  def indexStream(spark: SparkSession, inputDir: String, store: IndexStore,
                  checkpoint: Option[String] = None): StreamingQuery = {
    import spark.implicits._
    val checkpointDir = checkpoint.getOrElse(defaultCheckpointDir(inputDir, store))
    // pre-(input,store)-keying layout guard: a checkpoint at the OLD default
    // location with no keyed one is ambiguous — it may belong to this store
    // (resume it via `checkpoint`) or to a different store fed from the same
    // input (use a fresh dir). Either silent choice can duplicate or drop
    // documents, so demand the operator decide.
    if (checkpoint.isEmpty) {
      // legacy is input-derived, keyed is store-derived: resolve each probe
      // through its OWN path's FileSystem (they can differ)
      val legacy = new org.apache.hadoop.fs.Path(inputDir + ".checkpoint")
      val lfs = legacy.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val keyed = new org.apache.hadoop.fs.Path(checkpointDir)
      val kfs = keyed.getFileSystem(spark.sparkContext.hadoopConfiguration)
      require(!lfs.exists(legacy) || kfs.exists(keyed),
        s"found a pre-existing stream checkpoint at $legacy (the old input-keyed " +
          s"layout). Pass it explicitly as the checkpoint dir if this store is its " +
          s"original consumer, or pass a fresh dir to re-ingest into a new store.")
    }
    val fs = new org.apache.hadoop.fs.Path(checkpointDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def markerPath(batchId: Long) =
      new org.apache.hadoop.fs.Path(checkpointDir, s"graft-batch-$batchId")
    def readMarker(batchId: Long): Option[Int] = {
      val p = markerPath(batchId)
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toInt)
        finally in.close()
      }
    }
    def writeMarker(batchId: Long, segId: Int): Unit = {
      val out = fs.create(markerPath(batchId), true)
      try out.write(segId.toString.getBytes("UTF-8")) finally out.close()
    }
    spark.readStream
      .schema(corpusSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(inputDir)
      .as[CorpusDoc]
      .writeStream
      .foreachBatch { (batch: Dataset[CorpusDoc], batchId: Long) =>
        if (!batch.isEmpty) {
          val segId = readMarker(batchId).getOrElse {
            val claimed = store.segments.map(_.id).reduceOption(_ max _).getOrElse(-1) + 1
            writeMarker(batchId, claimed)
            claimed
          }
          if (!store.segments.exists(_.id == segId)) {
            // buildSegmentAt(resume) verifies ownership of any stage
            // checkpoints a crashed writer left at the claimed id and wipes
            // foreign ones — a replay can resume its OWN partial build but
            // never adopt another writer's documents
            store.buildSegmentAt(segId, batch, resume = true); ()
          } else if (!store.segmentMatches(segId, batch)) {
            // claim collision (see scaladoc): the committed segment under
            // our claimed id is NOT this batch — re-claim past it
            val fresh = store.segments.map(_.id).max + 1
            writeMarker(batchId, fresh)
            store.buildSegmentAt(fresh, batch, resume = true); ()
          }
        }
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .start()
  }

  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Watermarked tumbling-window aggregation over the events stream —
    * the canonical Structured Streaming windowed agg (1h windows per
    * event_type: count + sum(value)). `complete` output to a memory sink so
    * a bounded replay yields every window deterministically. */
  def windowedEventCounts(spark: SparkSession, eventsDir: String,
                          queryName: String): StreamingQuery = {
    spark.readStream
      .schema(eventsSchema)
      .parquet(eventsDir)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").cast("long").as("window_start"),
        col("event_type"), col("n"), round(col("sum_value"), 4).as("sum_value"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Append-mode, watermark-bounded variant of [[windowedEventCounts]]:
    * the scale-correct shape for a real stream. A window's aggregate is
    * emitted ONCE, when the watermark passes its end, and its state is then
    * purged — state size is bounded by (open windows × event types), not by
    * stream lifetime — and the sink is an append-only parquet directory,
    * never a driver-materialized table. The trade: windows still open at
    * the final watermark (end > max(ts) − 10 min) are not emitted until
    * more data arrives — inherent to append mode, and exactly the bound the
    * oracle query applies. (The complete/memory variant above is kept as
    * the deterministic full-window oracle surface.) */
  def windowedEventCountsAppend(spark: SparkSession, eventsDir: String,
                                outDir: String): StreamingQuery =
    spark.readStream
      .schema(eventsSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(eventsDir)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").cast("long").as("window_start"),
        col("event_type"), col("n"), round(col("sum_value"), 4).as("sum_value"))
      .writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", outDir + ".checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming exact dedup-on-ingest: `dropDuplicatesWithinWatermark` on
    * the event key — the production shape for a training-data ingest stream
    * that must not admit the same record twice (re-delivered files, at-least
    * -once upstreams). Per-key state is purged once the watermark passes
    * the key's first arrival + `delay`, so state is bounded by
    * (key arrival rate × delay), not stream lifetime. The driver query
    * replays the events file twice (every row a duplicate) with `delay`
    * spanning the synthetic ts range, so nothing is late and the sink holds
    * exactly one copy per event_id. */
  def dedupEventsStream(spark: SparkSession, eventsDir: String, outDir: String,
                        delay: String = "30 days"): StreamingQuery =
    spark.readStream
      .schema(eventsSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(eventsDir)
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("event_id")
      .select(col("event_id"), col("user_id"), col("event_type"),
        round(col("value"), 4).as("value"))
      .writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", outDir + ".checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()

  /** Stateful sessionization demo: flatMapGroupsWithState over user ids —
    * emits (user_id, n_events, total_value) per user with custom state,
    * the KeyValueGroupedDataset stateful-processing surface. */
  def userTotalsStream(spark: SparkSession, eventsDir: String,
                       queryName: String): StreamingQuery = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val events = spark.readStream.schema(eventsSchema).parquet(eventsDir)
      .select(col("user_id").as[Long], col("value").as[Double])
      .as[(Long, Double)]
    events.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Double), (Long, Long, Double)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (uid, rows, state: GroupState[(Long, Double)]) =>
          val (n0, v0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0; var v = v0
          rows.foreach { case (_, value) => n += 1; v += value }
          state.update((n, v))
          Iterator((uid, n, v))
      }
      .toDF("user_id", "n_events", "total_value")
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
