package graft.pipeline

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED IVF (inverted-file) ANN index over an embedding table — the
  * similarity analogue of the posting store: the quantizer is trained ONCE
  * and written down, and queries/maintenance load it instead of re-fitting
  * k-means per call (the reference persists its one index kind and never
  * rebuilds it per query, `indexing.go:575-602`; an ANN surface at 10^9
  * vectors deserves the same).
  *
  * Layout:
  * {{{
  * dir/centroids.json   — quantizer: nLists × dim doubles + seed (small)
  * dir/assignments/     — (vec_id, cv: array<double>) parquet,
  *   cell=<i>/            partitioned BY CELL: a query's nProbe cells map
  *                        to nProbe directories, so the scan physically
  *                        prunes to ~nProbe/nLists of the corpus
  * dir/tombstones/      — deleted vec_ids (appended; reads anti-join)
  * }}}
  *
  * Incremental `add` assigns new vectors to their nearest EXISTING
  * centroid with pure Column arithmetic (classic IVF maintenance — the
  * quantizer is frozen; cells drift only on an explicit re-`build`), so
  * growing the corpus never re-reads or re-clusters the existing
  * assignments. */
class IvfIndex private (val spark: SparkSession, val dir: String,
                        val centroids: Array[Array[Double]]) {

  private def tombstonePath = new Path(s"$dir/tombstones")
  private def fs =
    tombstonePath.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Restores the assignments dir from a [[compact]] crashed between its
    * two renames (cur missing, .old holding the only copy). Invoked by
    * EVERY reader and writer — without this, an `add()` on the crashed
    * state would silently recreate `assignments/` holding only the new
    * batch, and the next compact would delete the `.old` survivor. */
  private def recoverIfNeeded(): Unit = {
    val cur = new Path(s"$dir/assignments")
    val old = new Path(s"$dir/assignments.old")
    if (!fs.exists(cur) && fs.exists(old)) {
      if (!fs.rename(old, cur))
        sys.error(s"IvfIndex: recovery rename $old -> $cur failed")
    }
  }

  /** Raw stored assignments (including deleted rows — see [[live]]).
    * Explicit schema: a fully-compacted-away index is an EMPTY partitioned
    * dir, where schema inference would throw. */
  def assignments: DataFrame = {
    recoverIfNeeded()
    spark.read.schema(IvfIndex.assignSchema).parquet(s"$dir/assignments")
  }

  /** Assignments minus tombstoned vectors — what queries score. The
    * anti-join is the same delete strategy as the text store's: cell
    * tables are never rewritten in place. */
  def live: DataFrame =
    if (!fs.exists(tombstonePath)) assignments
    else {
      val ts = spark.read.parquet(tombstonePath.toString)
        .select(col("vec_id").as("t_vec_id")).distinct()
      assignments.join(ts, col("vec_id") === col("t_vec_id"), "left_anti")
    }

  /** Append new vectors `(vec_id, embedding)`, quantized against the
    * persisted centroids — touches only the new rows. Re-adding a deleted
    * id does NOT resurrect it (tombstones win); use fresh ids. */
  def add(vectors: DataFrame): Unit = {
    recoverIfNeeded()
    IvfIndex.assign(vectors, centroids)
      .write.mode(SaveMode.Append).partitionBy("cell")
      .parquet(s"$dir/assignments")
  }

  /** Tombstone vectors by id (one-column DataFrame, castable to long like
    * the store's bulk delete — the id set is never collected). Cell tables
    * are untouched; [[live]] filters at read time. Run [[compact]] when
    * the tombstone fraction makes the read-time anti-join worth folding. */
  def delete(ids: DataFrame): Unit =
    ids.select(col(ids.columns.head).cast("long").as("vec_id")).distinct()
      .write.mode(SaveMode.Append).parquet(tombstonePath.toString)

  /** Near-duplicate VECTOR sweep — the vector-index analogue of the text
    * store's dedup sweep: cosine-≥-tau pairs over the live vectors
    * (LSH-bucketed by default; `exact = true` runs the all-pairs oracle
    * shape for tiny corpora) → connected components → tombstone every
    * non-keeper (smallest vec_id per component). Victim ids stay a
    * DataFrame end to end; the component rounds and the victim pin ride
    * the SAME shared sweep tail as the text store
    * ([[graft.pipeline.Dedup]] `applySweepTo`): parquet pins under
    * `$dir/maintenance/` for applying sweeps, a write-free localCheckpoint
    * audit for `dryRun` with no explicit dir. Returns the number of
    * vectors swept. */
  def sweep(tau: Double, dryRun: Boolean = false, exact: Boolean = false,
            nBits: Int = 0, bands: Int = 0, seed: Long = 42L,
            maxBucketDf: Long = Similarity.DefaultMaxBucketDf,
            checkpointDir: Option[String] = None): Long = {
    val vecs = live.select(col("vec_id"), col("cv").as("embedding"))
    val pairs = Similarity.embeddingDupPairs(vecs, tau, exact = exact,
      nBits = nBits, bands = bands, dim = centroids.head.length, seed = seed,
      maxBucketDf = maxBucketDf)
    Dedup.applySweepTo(spark, dir, delete, pairs, dryRun, checkpointDir)
  }

  /** Folds tombstones into the cell tables: rewrites assignments from
    * [[live]] (quantizer untouched — cells cannot drift), then drops the
    * tombstone table. Crash-safe ordering like the text store's compact:
    * build aside → move current out → move new in → delete leftovers; a
    * crash at any point leaves either the original or both directories
    * recoverable, and tombstones are only removed once the swapped-in
    * tables no longer contain their rows. */
  def compact(): Unit = {
    val cur = new Path(s"$dir/assignments")
    val next = new Path(s"$dir/assignments.compact")
    val old = new Path(s"$dir/assignments.old")
    recoverIfNeeded()
    if (fs.exists(next)) fs.delete(next, true)
    if (fs.exists(old)) fs.delete(old, true)
    live.repartition(col("cell"))
      .write.mode(SaveMode.Overwrite).partitionBy("cell")
      .parquet(next.toString)
    if (!fs.rename(cur, old))
      sys.error(s"IvfIndex.compact: failed to move $cur aside")
    if (!fs.rename(next, cur)) {
      fs.rename(old, cur)
      sys.error(s"IvfIndex.compact: failed to move $next into place (restored)")
    }
    fs.delete(old, true)
    if (fs.exists(tombstonePath)) fs.delete(tombstonePath, true)
    ()
  }

  /** Top-k cosine neighbors from the persisted cells. When every query's
    * probe set is known small (the broadcast-guard bound), the probed cell
    * ids are collected (nQ × nProbe ints — trivially driver-safe at the
    * same bound that allows the broadcast) and pushed as a partition
    * filter, so the scan reads ONLY the probed cell directories.
    * Output: (qid, vec_id, cos, rank ≤ k). */
  def topK(queries: DataFrame, k: Int, nProbe: Int = 8,
           excludeSelf: Boolean = true,
           maxBroadcastQueries: Long = Similarity.DefaultMaxBroadcastQueries): DataFrame = {
    val small = Similarity.fitsBound(queries, maxBroadcastQueries)
    val probes = Similarity.probeCells(queries, centroids, nProbe)
    if (small) {
      // one extra evaluation of the (small) probes plan collects the probed
      // cell ids — nQ × nProbe ints, driver-safe at the same bound that
      // allows the broadcast — pushed as a partition filter so the scan
      // reads only the probed cell directories
      val cells = probes.select(col("cell")).distinct()
        .collect().map(_.getInt(0)).toSeq
      Similarity.ivfScoreFromProbes(broadcast(probes),
        live.filter(col("cell").isInCollection(cells)), k, excludeSelf)
    } else Similarity.ivfScoreFromProbes(probes, live, k, excludeSelf)
  }
}

object IvfIndex {

  /** Assignment-table schema (cell is the partition column). */
  private[pipeline] val assignSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("cv",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.types.StructField("cell",
        org.apache.spark.sql.types.IntegerType)))

  /** Nearest-centroid assignment as a pure Column plan (no MLlib at
    * query/maintenance time): argmin over the literal centroid set.
    * Output: (vec_id, cv, cell). */
  private[pipeline] def assign(vectors: DataFrame,
                               centroids: Array[Array[Double]]): DataFrame = {
    val v = vectors.select(col("vec_id"),
      col("embedding").cast("array<double>").as("cv"))
    val probes = centroids.zipWithIndex.map { case (c, i) =>
      struct(
        aggregate(zip_with(col("cv"), array(c.map(lit(_)): _*),
          (a, b) => (a - b) * (a - b)), lit(0.0), (acc, x) => acc + x).as("d"),
        lit(i).as("cell"))
    }
    v.withColumn("cell", array_sort(array(probes: _*)).getItem(0).getField("cell"))
  }

  /** Trains the quantizer on `corpus(vec_id, embedding)` (seeded MLlib
    * k-means; `nLists <= 0` → √n), persists centroids + cell-partitioned
    * assignments under `dir`, and returns the index RE-OPENED from disk —
    * everything the returned instance serves comes from the persisted
    * state, never from this JVM's fit. */
  def build(corpus: DataFrame, dir: String, nLists: Int = 0,
            seed: Long = 42L): IvfIndex = {
    val spark = corpus.sparkSession
    val (centroids, assigned) = Similarity.fitQuantizer(corpus, nLists, seed)
    assigned.repartition(col("cell"))
      .write.mode(SaveMode.Overwrite).partitionBy("cell")
      .parquet(s"$dir/assignments")
    val json = new ObjectMapper().createObjectNode()
    json.put("seed", seed)
    json.put("dim", centroids.head.length)
    val arr = json.putArray("centroids")
    centroids.foreach { c =>
      val row = arr.addArray(); c.foreach(row.add)
    }
    val p = new Path(s"$dir/centroids.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(json.toString.getBytes("UTF-8")) finally out.close()
    // a re-build starts a NEW index generation: tombstones of the previous
    // one must not suppress ids the fresh corpus legitimately holds.
    // Deleted LAST: an interrupted build then leaves tombstones that only
    // ever SUPPRESS (conservative) — deleting first would let a crash
    // resurrect deleted ids against the old tables. (The build itself is
    // not crash-atomic; re-run it after a failure.)
    val ts = new Path(s"$dir/tombstones")
    if (fs.exists(ts)) fs.delete(ts, true)
    open(spark, dir)
  }

  /** Opens a persisted index: loads the quantizer from centroids.json. */
  def open(spark: SparkSession, dir: String): IvfIndex = {
    val p = new Path(s"$dir/centroids.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val node = new ObjectMapper().readTree(txt).get("centroids")
    val centroids = (0 until node.size()).map { i =>
      val row = node.get(i)
      (0 until row.size()).map(j => row.get(j).asDouble()).toArray
    }.toArray
    new IvfIndex(spark, dir, centroids)
  }
}
