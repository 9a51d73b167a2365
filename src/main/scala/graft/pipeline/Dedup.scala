package graft.pipeline

import graft.analysis.Analyzer
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines:
  * exact, n-gram Jaccard, MinHash+LSH, SimHash. All are pure DataFrame
  * plans (codegen'd Column arithmetic; no UDFs) designed around the same
  * skew discipline as the index build: every self-join is keyed on bounded
  * buckets (shingle / band / bit-block), and hot keys can be frequency-capped.
  */
object Dedup {

  /** Salt count for [[exactGroups]]' bounded id sampling: a pathological
    * group is split across this many parallel sort partitions, so a
    * 10^8-copy group sorts ~1.5M rows per task instead of 10^8 in one. */
  private val ExactSampleSalts = 64

  /** Exact duplicate groups by content hash. Returns one row per duplicate
    * group: (content_sha, keep_id = min doc_id, n_dups). At any scale this
    * is one hash-aggregation — the canonical exact-dedup.
    *
    * The member id list is NOT in the default output: a pathological group
    * (10^8 copies of a boilerplate file — real in crawl data) would put
    * every member id into one reducer's aggregation buffer. Pass
    * `maxIdsPerGroup > 0` to add a `doc_ids_sample` column holding the
    * smallest `maxIdsPerGroup` ids per group, computed as a SALTED
    * two-phase bounded top-N: phase 1 row_numbers within
    * (content_sha, salt = id-hash mod [[ExactSampleSalts]]) partitions —
    * the hottest group's sort is split across the salts, so no single task
    * ever sorts the full group — and keeps each salt's smallest N; phase 2
    * merges the ≤ salts·N survivors per group and re-slices to N, so the
    * aggregation buffer is bounded by salts·N regardless of group size.
    * (keep_id/n_dups come straight off the unsalted hash-agg with partial
    * map-side combine — only the sample pays the extra exchange.) */
  def exactGroups(docs: DataFrame, textCol: String = "text",
                  maxIdsPerGroup: Int = 0): DataFrame = {
    val keyed = docs.select(sha2(col(textCol), 256).as("content_sha"), col("doc_id"))
    val stats = keyed.groupBy(col("content_sha"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
      .filter(col("n_dups") > 1)
    if (maxIdsPerGroup <= 0) stats
    else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("content_sha"), col("salt")).orderBy(col("doc_id"))
      val perSalt = keyed
        .withColumn("salt", pmod(xxhash64(col("doc_id")), lit(ExactSampleSalts)))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= maxIdsPerGroup)
      val samples = perSalt.groupBy(col("content_sha"))
        .agg(slice(sort_array(collect_list(col("doc_id"))), 1, maxIdsPerGroup)
          .as("doc_ids_sample"))
      stats.join(samples, Seq("content_sha"))
        .select(col("content_sha"), col("keep_id"), col("n_dups"),
          col("doc_ids_sample"))
    }
  }

  /** Default shingle document-frequency cap: a shingle shared by more docs
    * than this is boilerplate, not dedup signal, and its bucket join would
    * grow quadratically in its df. 1000 bounds any single shingle's pair
    * candidates to ~10^6 while sitting far above real shingle dfs on
    * organic text (the test corpora max out at 31 of 5500 docs). Pass 0 to
    * disable explicitly. */
  val DefaultMaxShingleDf: Long = 1000

  /** Distinct k-token shingles per document (docs shorter than k yield none).
    * Shingles are the join key of every near-dup candidate generation below;
    * `maxShingleDf` drops ubiquitous shingles (boilerplate headers) that
    * would otherwise quadratically blow up the candidate join at corpus
    * scale — the standard frequency-cap used by large dedup pipelines.
    * ON by default ([[DefaultMaxShingleDf]]); 0 disables. */
  def shingles(docs: DataFrame, textCol: String = "text", k: Int = 3,
               maxShingleDf: Long = DefaultMaxShingleDf): DataFrame = {
    val sh = shingleExpand(
      docs.select(col("doc_id"), Analyzer.tokens(col(textCol)).as("toks")), k)
    if (maxShingleDf <= 0) sh
    else {
      val hot = sh.groupBy(col("shingle")).agg(count(lit(1)).as("sdf"))
        .filter(col("sdf") > maxShingleDf).select("shingle")
      sh.join(hot, Seq("shingle"), "left_anti")
    }
  }

  /** Distinct k-token shingles from pre-tokenized rows `(doc_id, toks)` —
    * the expansion half of [[shingles]], split out so a caller that already
    * materialized the token arrays (e.g. [[contaminationReport]]'s
    * single-scan path) can shingle without re-reading the corpus.
    *
    * Deduplication happens PER DOC inside the row (`array_distinct` before
    * the explode): distinct (doc_id, shingle) pairs are exactly the
    * per-doc-distinct shingles because doc_id comes from the same row, so
    * the old frame-level `.distinct()` — a full exchange + aggregation of
    * the exploded shingle stream, paid by every consumer of this frame —
    * bought nothing the in-row dedup doesn't (guide §2.4: remove shuffles
    * outright). Result-identical as a set; map-side only. */
  private def shingleExpand(toksDf: DataFrame, k: Int): DataFrame =
    toksDf
      .filter(size(col("toks")) >= k)
      .select(col("doc_id"), explode(array_distinct(
        transform(sequence(lit(0), size(col("toks")) - k),
          i => concat_ws(" ", slice(col("toks"), i + lit(1), lit(k)))))).as("shingle"))

  /** Exact n-gram Jaccard similarity for all pairs sharing ≥1 shingle.
    * Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ minJaccard.
    * Plan: shingle self-join (bounded per shingle) → pair-count agg →
    * join per-doc shingle counts → Jaccard arithmetic. */
  def ngramJaccardPairs(docs: DataFrame, textCol: String = "text", k: Int = 3,
                        minJaccard: Double = 0.5,
                        maxShingleDf: Long = DefaultMaxShingleDf): DataFrame = {
    val sh = shingles(docs, textCol, k, maxShingleDf)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val a = sh.select(col("doc_id").as("id_a"), col("shingle"))
    val b = sh.select(col("doc_id").as("id_b"), col("shingle"))
    val inter = a.join(b, Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("c"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("n", "na"), Seq("id_a"))
      .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("n", "nb"), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (col("c").cast("double") / (col("na") + col("nb") - col("c"))).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** Union hot-shingle cap over RAW per-side shingle frames
    * `(train_id, shingle)` / `(bench_id, shingle)` — the cap is computed
    * over the UNION of both corpora (capping each side alone could drop a
    * shingle from one side only and mask a real overlap). */
  private def capCrossShingles(tSh0: DataFrame, bSh0: DataFrame,
                               maxShingleDf: Long): (DataFrame, DataFrame) = {
    if (maxShingleDf <= 0) (tSh0, bSh0)
    else {
      val hot = tSh0.select(col("shingle")).unionAll(bSh0.select(col("shingle")))
        .groupBy(col("shingle")).agg(count(lit(1)).as("sdf"))
        .filter(col("sdf") > maxShingleDf).select("shingle")
      (tSh0.join(hot, Seq("shingle"), "left_anti"),
        bSh0.join(hot, Seq("shingle"), "left_anti"))
    }
  }

  /** Core of the decontamination sweep, over PRECOMPUTED raw shingle
    * frames: `tSh0(train_id, shingle)`, `bSh0(bench_id, shingle)` (both
    * uncapped — the union cap is applied here so pairs and coverage see the
    * identical cap rule), plus `benchIds(bench_id)` anchoring coverage rows
    * for items too short to shingle. Returns `(pairs, coverage)` with the
    * schemas of [[contaminationPairs]] / [[contaminationCoverage]]. Callers
    * that want both results from one corpus scan should materialize the
    * inputs once — [[contaminationReport]] does exactly that. */
  def contaminationFrom(tSh0: DataFrame, bSh0: DataFrame, benchIds: DataFrame,
                        minContainment: Double = 0.8,
                        maxShingleDf: Long = DefaultMaxShingleDf): (DataFrame, DataFrame) = {
    // Only shingles the BENCH side holds can ever pair, and only they feed
    // the union df cap and the coverage denominators — restrict the
    // (corpus-scale) train side to them FIRST. The bench shingle set is
    // benchmark-sized, so the semi-join broadcasts and the train side
    // collapses to one map-side streaming pass: report cost becomes ∝
    // bench size plus a single read of the train shingles, instead of a
    // corpus-wide shuffle of every train shingle into the df aggregation.
    // Result-identical: a train row whose shingle the bench never mentions
    // contributes to no pair, no cap decision that matters, no coverage.
    val tRel = tSh0.join(bSh0.select(col("shingle")).distinct(),
      Seq("shingle"), "left_semi")
    val (t, b) = capCrossShingles(tRel, bSh0, maxShingleDf)
    val nb = b.groupBy(col("bench_id")).agg(count(lit(1)).as("nb"))
    val pairs = t.join(b, Seq("shingle"))
      .groupBy(col("train_id"), col("bench_id")).agg(count(lit(1)).as("c"))
      .join(nb, Seq("bench_id"))
      .select(col("train_id"), col("bench_id"),
        (col("c").cast("double") / col("nb")).as("containment"))
      .filter(col("containment") >= minContainment)
    val raw = bSh0.groupBy(col("bench_id")).agg(count(lit(1)).as("n_shingles"))
    val usable = b.groupBy(col("bench_id")).agg(count(lit(1)).as("n_usable"))
    // anchor on the bench TABLE's ids, not its shingles: an item under k
    // tokens yields no shingles at all and must still surface as (0, 0)
    val coverage = benchIds.distinct()
      .join(raw, Seq("bench_id"), "left")
      .join(usable, Seq("bench_id"), "left")
      .select(col("bench_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_usable"), lit(0L)).as("n_usable"))
    (pairs, coverage)
  }

  /** Single-scan decontamination: pairs AND coverage from ONE pass over
    * each corpus. The training corpus's shingle frame and the benchmark's
    * token arrays are materialized eagerly (`localCheckpoint`, memory-and-
    * disk), so consuming both returned frames never re-reads either input —
    * the 1-scan shape [[Curation.curate]] gives the per-doc operators,
    * applied to the cross-corpus sweep. At 10^9-doc training scale the
    * train shingle frame is the big one; it spills to local disk per
    * executor, which is still strictly cheaper than the second full
    * tokenize+shingle pass the separate entry points would pay. Returns
    * `(pairs, coverage)`. */
  def contaminationReport(train: DataFrame, bench: DataFrame,
                          textCol: String = "text", k: Int = 3,
                          minContainment: Double = 0.8,
                          maxShingleDf: Long = DefaultMaxShingleDf): (DataFrame, DataFrame) = {
    val tSh0 = shingles(train, textCol, k, maxShingleDf = 0)
      .select(col("doc_id").as("train_id"), col("shingle"))
      .localCheckpoint(true)
    // the bench side checkpoints its TOKEN arrays, not its shingles: both
    // the shingle expansion and the coverage anchor (ids incl. sub-k docs)
    // derive from the same materialized pass — bench is scanned once
    val bToks = bench
      .select(col("doc_id"), Analyzer.tokens(col(textCol)).as("toks"))
      .localCheckpoint(true)
    val bSh0 = shingleExpand(bToks, k)
      .select(col("doc_id").as("bench_id"), col("shingle"))
    val benchIds = bToks.select(col("doc_id").as("bench_id"))
    contaminationFrom(tSh0, bSh0, benchIds, minContainment, maxShingleDf)
  }

  /** Decontamination over the PERSISTED per-segment shingle tables
    * ([[graft.index.SimilarityIndex.ensureShingles]]): the training side
    * of the containment join reads stored `(doc_id, shingle)` rows instead
    * of re-tokenizing and re-shingling the corpus per report, so a
    * repeated report against a growing training corpus costs the one-time
    * signature pass for NEW segments plus work proportional to the (small)
    * benchmark side. Result identical to [[contaminationReport]] over the
    * same live rows — the stored tables hold the identical uncapped
    * per-doc shingles, and the union df cap is applied at read time by the
    * shared [[contaminationFrom]] core. `readOnly = true` writes nothing:
    * missing tables are computed transiently in-plan (the audit shape).
    * Returns `(pairs, coverage)`. */
  def contaminationReportPersisted(store: graft.index.IndexStore,
                                   bench: DataFrame,
                                   textField: String = "content",
                                   textCol: String = "text", k: Int = 3,
                                   minContainment: Double = 0.8,
                                   maxShingleDf: Long = DefaultMaxShingleDf,
                                   readOnly: Boolean = false): (DataFrame, DataFrame) = {
    val sim = new graft.index.SimilarityIndex(store, textField, shingleK = k)
    if (readOnly) sim.validateShingles() else { sim.ensureShingles(); () }
    // pinTransient: in read-only mode an UNSIGNED segment embeds the full
    // tokenize+shingle plan, consumed by several subtrees — pin it once
    // (write-free; fires only when a table is actually missing, and
    // BEFORE the tombstone join — see SimilarityIndex.liveKind). A
    // fully-covered store reads cheap parquet and is never pinned: the 2
    // streaming passes (df cap + containment join) beat copying a
    // corpus-scale table into executor storage.
    val tSh0 = sim.liveShingles(transientMissing = readOnly,
        pinTransient = readOnly)
      .select(col("doc_id").as("train_id"), col("shingle"))
    val bToks = bench
      .select(col("doc_id"), Analyzer.tokens(col(textCol)).as("toks"))
      .localCheckpoint(true)
    val bSh0 = shingleExpand(bToks, k)
      .select(col("doc_id").as("bench_id"), col("shingle"))
    val benchIds = bToks.select(col("doc_id").as("bench_id"))
    contaminationFrom(tSh0, bSh0, benchIds, minContainment, maxShingleDf)
  }

  /** Cross-corpus contamination: training docs whose n-gram overlap with a
    * BENCHMARK/EVAL item exceeds `minContainment` — the decontamination
    * sweep a training pipeline runs before release. Same shingle-bucketed
    * plan as [[ngramJaccardPairs]] but across two tables, and the metric is
    * CONTAINMENT of the benchmark side (|A∩B| / |benchmark shingles|), not
    * symmetric Jaccard: a huge training doc that embeds a whole benchmark
    * item must be caught regardless of its own size. The hot-shingle cap is
    * computed over the UNION of both corpora (capping each side alone could
    * drop a shingle from one side only and mask a real overlap); the
    * containment denominator is the benchmark's CAPPED shingle count.
    * Output: (train_id, bench_id, containment). Pair with
    * [[contaminationCoverage]] — items the cap (or a sub-k length) makes
    * undetectable report nothing here. */
  def contaminationPairs(train: DataFrame, bench: DataFrame,
                         textCol: String = "text", k: Int = 3,
                         minContainment: Double = 0.8,
                         maxShingleDf: Long = DefaultMaxShingleDf): DataFrame =
    contaminationFrom(
      shingles(train, textCol, k, 0).select(col("doc_id").as("train_id"), col("shingle")),
      shingles(bench, textCol, k, 0).select(col("doc_id").as("bench_id"), col("shingle")),
      bench.select(col("doc_id").as("bench_id")),
      minContainment, maxShingleDf)._1

  /** Per-benchmark-item shingle coverage under [[contaminationPairs]]'s
    * union hot-shingle cap. EVERY bench item is reported, including those
    * shorter than k tokens (zero shingles). An item with `n_usable = 0`
    * has nothing the sweep can match on — every shingle over the df cap
    * (corpus-ubiquitous boilerplate), or too short to shingle — and is
    * UNDETECTABLE; a decontamination pipeline must surface those instead
    * of silently reporting "no contamination" (at 10^9-doc scale a
    * boilerplate-only eval snippet is exactly the item that slips
    * through). Output: (bench_id, n_shingles, n_usable). The capped side
    * comes from the same [[contaminationFrom]] core the sweep uses — a
    * coverage report computed under a different cap rule than the sweep
    * would describe the wrong blind spots. Cost note: the union df cap
    * needs the train shingles, so running this alongside
    * [[contaminationPairs]] scans the training corpus twice — use
    * [[contaminationReport]] to get both results from one scan. */
  def contaminationCoverage(train: DataFrame, bench: DataFrame,
                            textCol: String = "text", k: Int = 3,
                            maxShingleDf: Long = DefaultMaxShingleDf): DataFrame =
    contaminationFrom(
      shingles(train, textCol, k, 0).select(col("doc_id").as("train_id"), col("shingle")),
      shingles(bench, textCol, k, 0).select(col("doc_id").as("bench_id"), col("shingle")),
      bench.select(col("doc_id").as("bench_id")),
      maxShingleDf = maxShingleDf)._2

  // ---------- MinHash + LSH ----------

  private val MersennePrime = (1L << 31) - 1 // 2^31-1

  /** Seeded affine hash family h_i(x) = (a_i·x + b_i) mod p, p = 2^31-1,
    * 1 ≤ a < p, 0 ≤ b < p. With x reduced below 2^31, every product fits a
    * signed 64-bit long — no overflow anywhere in codegen. */
  private[pipeline] def hashParams(numHashes: Int, seed: Long): Array[(Long, Long)] = {
    val rnd = new java.util.Random(seed)
    Array.fill(numHashes)(
      (1L + rnd.nextInt((MersennePrime - 1).toInt).toLong,
       rnd.nextInt(MersennePrime.toInt).toLong))
  }

  /** MinHash signatures: (doc_id, sig: array<long>[numHashes]).
    * One aggregation: min of each hash function over the doc's shingles —
    * numHashes parallel `min` aggregates, fully codegen'd, no UDF. */
  def minHashSignatures(sh: DataFrame, numHashes: Int = 64,
                        seed: Long = 42L): DataFrame = {
    val params = hashParams(numHashes, seed)
    val x = pmod(xxhash64(col("shingle")), lit(MersennePrime))
    val aggs = params.zipWithIndex.map { case ((aP, bP), i) =>
      min(pmod(lit(aP) * x + lit(bP), lit(MersennePrime))).as(s"h$i")
    }
    sh.groupBy(col("doc_id"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"),
        array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** LSH banding: (doc_id[, keepCols...], band, key) — docs sharing a
    * (band, key) bucket are near-dup candidates. bands·rowsPerBand must
    * equal signature size; `keepCols` ride through (e.g. segment
    * provenance for the incremental sweep). */
  def lshBuckets(sigs: DataFrame, bands: Int, rowsPerBand: Int,
                 keepCols: Seq[String] = Nil): DataFrame =
    sigs.select(col("doc_id") +: keepCols.map(col) :+ posexplode(
      transform(sequence(lit(0), lit(bands - 1)),
        bnd => xxhash64(slice(col("sig"), bnd * rowsPerBand + lit(1), lit(rowsPerBand))))): _*)
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "key")

  /** MinHash-LSH near-dup pairs, verified with exact Jaccard.
    * Candidate generation is the banded bucket self-join (each bucket is
    * small by construction); verification joins back to exact shingle
    * Jaccard restricted to the candidate pairs only. */
  def minHashLshPairs(docs: DataFrame, textCol: String = "text", k: Int = 3,
                      numHashes: Int = 64, bands: Int = 16,
                      minJaccard: Double = 0.5, seed: Long = 42L,
                      maxShingleDf: Long = DefaultMaxShingleDf): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val sh = shingles(docs, textCol, k, maxShingleDf)
    val sigs = minHashSignatures(sh, numHashes, seed)
    val buckets = lshBuckets(sigs, bands, numHashes / bands)
    val l = buckets.select(col("band"), col("key"), col("doc_id").as("id_a"))
    val r = buckets.select(col("band"), col("key"), col("doc_id").as("id_b"))
    val candidates = l.join(r, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    // verify candidates with exact Jaccard — shingle sets are built ONLY for
    // docs that appear in some candidate pair (left-semi to candidate ids):
    // at corpus scale the candidates are a vanishing fraction of all docs,
    // so collecting shingle sets for every doc would dominate the job.
    val candIds = candidates.select(col("id_a").as("doc_id"))
      .unionByName(candidates.select(col("id_b").as("doc_id"))).distinct()
    val sets = sh.join(candIds, Seq("doc_id"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(collect_set(col("shingle")).as("set"))
    candidates
      .join(sets.select(col("doc_id").as("id_a"), col("set").as("set_a")), Seq("id_a"))
      .join(sets.select(col("doc_id").as("id_b"), col("set").as("set_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("set_a"), col("set_b"))).cast("double") /
          size(array_union(col("set_a"), col("set_b")))).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  // ---------- duplicate-group clustering ----------

  /** Connected components over near-dup pairs — the step real dedup
    * pipelines run after pair generation: pairs → groups → keep one
    * canonical doc per group. Returns (doc_id, keep_id) for every doc in
    * some group, keep_id = smallest doc_id of its component.
    *
    * Min-label propagation with pointer doubling: each iteration takes the
    * min over (own label, neighbors' labels, label OF own label) — two
    * id-bucketed joins + one aggregation, no all-pairs shape. The
    * label-of-label hop halves the pointer depth every round, so a
    * component of diameter d converges in O(log d) iterations, not O(d) —
    * a 10^6-long chain of near-dup shards finishes in ~20 rounds. The loop
    * FAILS LOUDLY if `maxIters` is hit before a fixpoint (a silent exit
    * would return labels that are not the component minima).
    *
    * Lineage across iterations is truncated with `localCheckpoint` by
    * default; pass `checkpointDir` to persist each round as parquet under
    * that directory instead, so the computation survives executor loss on
    * a real cluster. The directory holds at most three fixed datasets
    * (edges + two alternating label rounds — bounded, not per-iteration);
    * the RETURNED frame reads the last round, so the caller owns the
    * directory's lifetime and deletes it after consuming the result.
    * (Deliberately NOT `df.checkpoint`: that mutates the context-global
    * checkpoint dir and leaks one never-cleaned snapshot per iteration.) */
  def dupGroups(pairs: DataFrame, maxIters: Int = 50,
                checkpointDir: Option[String] = None): DataFrame = {
    val spark = pairs.sparkSession
    def ckpt(df: DataFrame, name: String): DataFrame = checkpointDir match {
      case Some(dir) =>
        val path = s"$dir/$name"
        df.write.mode("overwrite").parquet(path)
        spark.read.parquet(path)
      case None => df.localCheckpoint(true)
    }
    // both edge directions via ONE explode over ONE copy of the pairs plan
    // — a self-union (pairs ∪ pairs.swapped) would duplicate the whole
    // upstream subplan, doubling its cost, and the duplicated exchanges
    // trip AQE's reuse into a mis-zipped join stage at scale ("Can't zip
    // RDDs with unequal numbers of partitions", observed at 200k docs with
    // the signature-join pair plan)
    val edges = ckpt(pairs
      .select(explode(array(
        struct(col("id_a").cast("long").as("src"), col("id_b").cast("long").as("dst")),
        struct(col("id_b").cast("long").as("src"), col("id_a").cast("long").as("dst"))))
        .as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct(), "edges")
    // labels start one propagation step in: label₀(id) = min(id, neighbors)
    // — the same grouping that would otherwise deduplicate the node list
    // computes the first round's min for free, so the common shallow
    // component (pairs/stars, the bulk of real dup corpora) converges with
    // changed == 0 on the FIRST loop iteration instead of the second.
    // Invariants unchanged: labels ≥ component min, monotonically
    // non-increasing, fixpoint = component minima.
    var labels = ckpt(edges.groupBy(col("src"))
      .agg(least(col("src"), min(col("dst"))).as("label"))
      .select(col("src").as("id"), col("label")), "labels-0")
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIters) {
      val neighborMin = edges.join(labels, edges("dst") === labels("id"))
        .groupBy(col("src")).agg(min(col("label")).as("nlabel"))
      // pointer doubling: the label of my current label (its component
      // representative may already point lower than any of my neighbors);
      // every label value is itself a node id, so this is a self-join
      val hop = labels.select(col("id").as("h_id"), col("label").as("hlabel"))
      // rounds alternate between two fixed paths so the write never
      // overwrites the parquet its own plan is reading
      val updated = ckpt(labels
        .join(neighborMin, labels("id") === neighborMin("src"), "left")
        .join(hop, labels("label") === hop("h_id"), "left")
        .select(col("id"), col("label"),
          least(col("label"),
            coalesce(col("nlabel"), col("label")),
            coalesce(col("hlabel"), col("label"))).as("next")),
        s"labels-${1 - iter % 2}")
      changed = updated.filter(col("next") < col("label")).count()
      labels = updated.select(col("id"), col("next").as("label"))
      iter += 1
    }
    require(changed == 0,
      s"dupGroups did not converge within $maxIters iterations " +
        s"($changed labels still changing) — labels would NOT be component " +
        "minima; raise maxIters")
    labels.select(col("id").as("doc_id"), col("label").as("keep_id"))
  }

  /** End-to-end near-duplicate sweep over an index store's LIVE corpus:
    * MinHash-LSH candidate pairs (exact-Jaccard verified) → connected
    * components → tombstone every doc that is not its group's keeper
    * (smallest doc_id), via the distributed bulk delete — the victim id
    * set is a DataFrame end to end and never touches the driver. Returns
    * the number of docs swept. `dryRun` counts without deleting (and
    * without writing unless `checkpointDir` opts into transient pins —
    * see [[applySweepTo]]).
    *
    * This is the pipeline the reference never had but a training-data
    * corpus needs: dedup feeding index maintenance at table scale. */
  def sweepIndex(store: graft.index.IndexStore, minJaccard: Double = 0.9,
                 textField: String = "content", dryRun: Boolean = false,
                 checkpointDir: Option[String] = None): Long = {
    val docs = store.liveCorpus().select(col("doc_id"), col(textField))
    val pairs = minHashLshPairs(docs, textCol = textField, minJaccard = minJaccard)
    applySweep(store, pairs, dryRun, checkpointDir)
  }

  /** Incremental near-dup sweep over the PERSISTED signature index
    * ([[graft.index.SimilarityIndex]]): signatures exist per segment and
    * are computed exactly once, so a sweep after an `add()` signatures
    * ONLY the new segment and generates candidates as (new docs) × (live
    * corpus) through the banded signature join — never re-reading, let
    * alone re-signaturing, the already-swept corpus. Candidate pairs are
    * verified with exact Jaccard restricted to candidate docs (uncapped
    * shingles — the same pure per-doc semantics the signatures use), then
    * clustered and bulk-deleted like [[sweepIndex]].
    *
    * Equals a full sweep whenever previous sweeps ran at the same
    * (minJaccard, textField): the watermarked corpus is internally
    * dup-free, so every surviving duplicate pair involves a new doc. The
    * FIRST call (empty watermark) IS the full sweep. Returns the number of
    * docs swept; `dryRun` counts without deleting, leaves the watermark
    * untouched, and computes missing signature tables transiently in-plan.
    * A dry run without `checkpointDir` also WRITES NOTHING (auditor-safe);
    * supplying the dir opts into [[applySweepTo]]'s transient parquet pins
    * for scale-safe dry audits. */
  def sweepIndexPersisted(store: graft.index.IndexStore,
                          minJaccard: Double = 0.9,
                          textField: String = "content",
                          dryRun: Boolean = false,
                          checkpointDir: Option[String] = None,
                          numHashes: Int = 64, bands: Int = 16): Long = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val sim = new graft.index.SimilarityIndex(store, textField, numHashes)
    // a DRY run must stay read-only (an auditor may lack write access):
    // missing signature tables are computed transiently in-plan instead of
    // persisted, and the watermark/metadata are untouched
    if (dryRun) sim.validateParams() else { sim.ensure(); () }
    // a threshold change invalidates the watermark (sweepScope returns
    // everything unswept) — the sweep silently degrades to a FULL one,
    // never to an under-deleting incremental one. coveredIds is captured
    // HERE: a segment committed by another writer while the candidate join
    // runs was never paired and must stay outside the watermark.
    val (freshIds, coveredIds) = sim.sweepScope(minJaccard)
    if (freshIds.isEmpty) return 0L
    // dry runs compute missing signatures transiently; the frame appears
    // on BOTH sides of the banded self-join, so pin it in executor memory
    // (write-free) rather than tokenize+hash the unsigned segments twice
    val sigs = sim.liveSignatures(transientMissing = dryRun)
    if (dryRun) sigs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val pairs = persistedSweepPairs(store, sigs, freshIds, minJaccard,
        textField, numHashes, bands)
      val n = applySweep(store, pairs, dryRun, checkpointDir)
      if (!dryRun) sim.markSwept(minJaccard, coveredIds)
      n
    } finally {
      if (dryRun) { sigs.unpersist(); () }
    }
  }

  /** Candidate generation + exact-Jaccard verification of the persisted
    * sweep over a prepared live-signature frame `sigs(doc_id, sig, seg)`,
    * exposed for plan audits: banded signature self-join restricted to
    * pairs touching a fresh segment, then verification over candidate docs
    * only (live corpus semi-joined BEFORE tokenizing, so the verify pass
    * reads candidate rows, not the whole store). */
  private[graft] def persistedSweepPairs(store: graft.index.IndexStore,
      sigs: DataFrame, freshIds: Seq[Int],
      minJaccard: Double, textField: String, numHashes: Int, bands: Int): DataFrame = {
    val buckets = lshBuckets(sigs, bands, numHashes / bands, keepCols = Seq("seg"))
    val fresh = buckets.filter(col("seg").isInCollection(freshIds))
      .select(col("band"), col("key"), col("doc_id").as("id_x"))
    val all = buckets.select(col("band"), col("key"), col("doc_id").as("id_y"))
    val cand = fresh.join(all, Seq("band", "key"))
      .filter(col("id_x") =!= col("id_y"))
      .select(least(col("id_x"), col("id_y")).as("id_a"),
        greatest(col("id_x"), col("id_y")).as("id_b"))
      .distinct()
    val candIds = cand.select(col("id_a").as("doc_id"))
      .unionByName(cand.select(col("id_b").as("doc_id"))).distinct()
    val candDocs = store.liveCorpus().select(col("doc_id"), col(textField).as("text"))
      .join(candIds, Seq("doc_id"), "left_semi")
    val sets = shingles(candDocs, maxShingleDf = 0)
      .groupBy(col("doc_id")).agg(collect_set(col("shingle")).as("set"))
    cand
      .join(sets.select(col("doc_id").as("id_a"), col("set").as("set_a")), Seq("id_a"))
      .join(sets.select(col("doc_id").as("id_b"), col("set").as("set_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("set_a"), col("set_b"))).cast("double") /
          size(array_union(col("set_a"), col("set_b")))).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** Shared tail of the sweep pipelines: pairs → connected components →
    * distributed bulk delete of every non-keeper. The sweep only ever
    * creates (and afterwards removes) a GENERATED `graft-sweep-*`
    * subdirectory inside the checkpoint dir — pointing the option at a
    * pre-existing or shared directory must never destroy its other
    * contents. With no dir supplied, the subdirectory goes under the
    * store's own `maintenance/` — the sweep rounds are ALWAYS pinned as
    * parquet, never `localCheckpoint`: parquet pins survive executor loss
    * on a real cluster, and `localCheckpoint`'s `Dataset.rdd`
    * materialization statically zips join stages that adaptive execution
    * would have re-planned (observed at 200k docs: "Can't zip RDDs with
    * unequal numbers of partitions" from a sweep-pair plan that every
    * normal action executes fine). */
  private def applySweep(store: graft.index.IndexStore, pairs: DataFrame,
                         dryRun: Boolean, checkpointDir: Option[String]): Long =
    applySweepTo(store.spark, store.baseDir, store.delete, pairs, dryRun,
      checkpointDir)

  /** The sweep tail generalized over the index being maintained: pairs →
    * components → pinned victims → bulk delete. Shared by the text store
    * and [[IvfIndex.sweep]] so the crash/dry-run discipline cannot drift.
    * A dry run never deletes and, by DEFAULT, never writes — an auditor
    * may have read-only access — so without a `checkpointDir` it pins the
    * component rounds with `localCheckpoint` (write-free, but its
    * `Dataset.rdd` materialization statically zips join stages AQE would
    * re-plan — the 200k-doc failure recorded on [[dupGroups]] — and the
    * pins die with a lost executor, so the write-free audit is a
    * SMALL-STORE convenience). Passing `checkpointDir` to a dry run opts
    * OUT of the zero-write guarantee to buy the scale-safe shape: rounds
    * pin as parquet under a generated `graft-sweep-*` subdirectory that is
    * removed before returning — transient writes, durable execution.
    * Every APPLYING sweep pins as parquet (survives executor loss; it
    * writes tombstones anyway). A killed applying sweep can leave a
    * graft-sweep-* dir behind; it is inert and safe to delete. */
  private[pipeline] def applySweepTo(spark: org.apache.spark.sql.SparkSession,
      baseDir: String, deleteFn: DataFrame => Unit, pairs: DataFrame,
      dryRun: Boolean, checkpointDir: Option[String]): Long = {
    if (dryRun && checkpointDir.isEmpty)
      return dupGroups(pairs)
        .filter(col("doc_id") =!= col("keep_id"))
        .count()
    val runDir = s"${checkpointDir.getOrElse(s"$baseDir/maintenance")}" +
      s"/graft-sweep-${java.util.UUID.randomUUID().toString.take(8)}"
    // pin the victim set: the delete's semi-join and the count below must
    // not re-run the whole dedup pipeline (and a concurrent-ish re-read of
    // the index inside the delete must see a FIXED victim list)
    val victims0 = dupGroups(pairs, checkpointDir = Some(runDir))
      .filter(col("doc_id") =!= col("keep_id")).select("doc_id")
    victims0.write.mode("overwrite").parquet(s"$runDir/victims")
    val victims = spark.read.parquet(s"$runDir/victims")
    try {
      val n = victims.count()
      if (!dryRun && n > 0) deleteFn(victims)
      n
    } finally {
      // the sweep is the consuming caller of dupGroups' checkpoint contract:
      // once the victim set has been applied, the generated subdirectory's
      // datasets (edges / label rounds / victims) are garbage — remove ONLY
      // that subdirectory, never the caller's directory itself
      val path = new org.apache.hadoop.fs.Path(runDir)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(path, true); ()
    }
  }

  // ---------- SimHash ----------

  /** SimHash width: 62 bits = two seeded 31-bit [[graft.functions.PortableHash]]
    * lanes — chosen over xxhash64 so the whole SimHash pipeline has an exact
    * DuckDB oracle twin (the two extra bits buy nothing at these distances). */
  val SimHashBits: Int = 62

  /** 62-bit SimHash per doc from tf-weighted token hash bit votes.
    * Plan: token rows → 62 conditional ±1 sums (codegen'd) → bit assembly.
    *
    * Votes are summed straight off the TOKEN stream (±1 per occurrence):
    * Σ_occurrences ±1 = Σ_terms ±tf exactly, so the old per-(doc, term) tf
    * pre-aggregation — a full exchange of the token rows before the per-doc
    * vote aggregation — is pure overhead (guide §2.4); the per-doc partial
    * aggregation reduces the token stream map-side either way. The hash is
    * computed per occurrence instead of per distinct term (cheap codegen'd
    * Column arithmetic vs a whole shuffle). Bit-identical hashes. */
  def simHashes(docs: DataFrame, textCol: String = "text"): DataFrame = {
    import graft.functions.PortableHash
    val toks = docs
      .select(col("doc_id"), explode(Analyzer.tokens(col(textCol))).as("term"))
      .withColumn("th", PortableHash.hash(col("term"), 1L)
        .bitwiseOR(shiftleft(PortableHash.hash(col("term"), 2L), 31)))
    val votes = (0 until SimHashBits).map { i =>
      sum(when(shiftright(col("th"), i).bitwiseAND(lit(1L)) === 1L, lit(1L))
        .otherwise(lit(-1L))).as(s"v$i")
    }
    toks.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
      .select(col("doc_id"),
        (0 until SimHashBits).map(i =>
          when(col(s"v$i") > 0, lit(1L << i)).otherwise(lit(0L)))
          .reduce(_.bitwiseOR(_)).as("simhash"))
  }

  /** Default per-bucket document-frequency cap for SimHash candidate
    * generation — the [[DefaultMaxShingleDf]] discipline applied to block
    * buckets: a bucket shared by more docs than this would make the bucket
    * self-join quadratic in its size. Sits far above organic bucket sizes
    * on the key widths chosen below (≥ ~13.8 key bits at every maxDist);
    * a bucket this hot means degenerately-clustered hashes (e.g. mass
    * boilerplate), which exact-dedup should have removed first. Pass 0 to
    * disable. */
  val DefaultMaxBlockDf: Long = 100000

  /** Near-dup pairs by SimHash Hamming distance ≤ maxDist (Manku et al.
    * block-permutation scheme), candidates verified with bit_count(xor).
    *
    * Key scheme: a pair within Hamming distance maxDist has differing bits
    * in at most maxDist blocks. With nBlocks = maxDist+1 (single-block
    * keys) pigeonhole leaves ≥ 1 clean block; with nBlocks = maxDist+2 it
    * leaves ≥ 2, so keys can be PAIRS of blocks — double the key bits.
    * Single-block keys collapse below ~12 bits for maxDist ≥ 5 (≤ 4096
    * distinct values: at 10^9 docs EVERY bucket is hot and the join goes
    * quadratic), so wide distances switch to the pair scheme:
    * C(maxDist+2, 2) keys per doc, each ≥ ~13.8 bits. Both schemes have
    * pigeonhole-GUARANTEED recall — the result equals a brute-force
    * Hamming scan exactly. */
  def simHashPairs(docs: DataFrame, textCol: String = "text",
                   maxDist: Int = 3,
                   maxBlockDf: Long = DefaultMaxBlockDf): DataFrame =
    simHashPairsFromHashes(simHashes(docs, textCol), maxDist, maxBlockDf)

  /** SimHash near-dup pairs over an index store's LIVE corpus from the
    * PERSISTED per-segment SimHash tables
    * ([[graft.index.SimilarityIndex.ensureSimHash]]): hashes are computed
    * once per segment and stored, so a repeated pair scan (the per-ingest
    * dup-monitoring shape) reads longs instead of re-tokenizing and
    * re-voting 62 bit sums over the corpus. Result identical to
    * [[simHashPairs]] over the same live rows (pigeonhole-complete block
    * keys → equals the brute-force Hamming scan). `readOnly = true` writes
    * nothing: missing tables are computed transiently in-plan (recomputed
    * per action — the audit shape for a store the caller cannot write). */
  def simHashPairsPersisted(store: graft.index.IndexStore, maxDist: Int = 3,
                            textField: String = "content",
                            maxBlockDf: Long = DefaultMaxBlockDf,
                            readOnly: Boolean = false): DataFrame = {
    val sim = new graft.index.SimilarityIndex(store, textField)
    if (readOnly) sim.validateField() else { sim.ensureSimHash(); () }
    // the hash frame feeds the hot-bucket aggregation AND both sides of
    // the block self-join; in read-only mode an unsigned segment embeds
    // the full tokenize+vote plan — pinTransient pins it once (write-free;
    // only when a table is actually missing, and before the tombstone
    // join — see SimilarityIndex.liveKind)
    val hs = sim.liveSimHashes(transientMissing = readOnly,
        pinTransient = readOnly)
      .select(col("doc_id"), col("simhash"))
    simHashPairsFromHashes(hs, maxDist, maxBlockDf)
  }

  private[graft] def simHashPairsFromHashes(hs: DataFrame, maxDist: Int,
                                               maxBlockDf: Long): DataFrame = {
    require(maxDist >= 1 && maxDist <= 7, "maxDist must be in [1, 7]")
    simHashCandidates(hs, maxDist, maxBlockDf)
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  /** Bucketed candidate pairs (id_a < id_b, with both simhashes), BEFORE
    * the Hamming verification filter — exposed for bucket-size tests. */
  private[graft] def simHashCandidates(hs: DataFrame, maxDist: Int,
                                          maxBlockDf: Long): DataFrame = {
    val pairScheme = SimHashBits / (maxDist + 1) < 12
    val nBlocks = if (pairScheme) maxDist + 2 else maxDist + 1
    val bounds = (0 to nBlocks).map(i => i * SimHashBits / nBlocks) // bit offsets
    val blockVals = (0 until nBlocks).map { bl =>
      val lo = bounds(bl); val width = bounds(bl + 1) - lo
      val mask = if (width >= 64) -1L else (1L << width) - 1
      shiftright(col("simhash"), lo).bitwiseAND(lit(mask))
    }
    // pair-scheme key: both block values packed into one long (block widths
    // are ≤ 16 bits whenever the pair scheme is active)
    val keyCols: Seq[Column] =
      if (!pairScheme) blockVals
      else for { i <- 0 until nBlocks; j <- (i + 1) until nBlocks }
        yield shiftleft(blockVals(i), 16).bitwiseOR(blockVals(j))
    val blocks0 = hs.select(col("doc_id"), col("simhash"),
        posexplode(array(keyCols: _*)))
      .withColumnRenamed("pos", "block").withColumnRenamed("col", "bval")
    // hot-bucket guard: buckets above the df cap are dropped from candidate
    // generation (same discipline as maxShingleDf; recall on pairs whose
    // ONLY agreeing key was a capped bucket is sacrificed knowingly)
    val blocks =
      if (maxBlockDf <= 0) blocks0
      else {
        val hot = blocks0.groupBy(col("block"), col("bval"))
          .agg(count(lit(1)).as("bdf")).filter(col("bdf") > maxBlockDf)
          .select("block", "bval")
        blocks0.join(hot, Seq("block", "bval"), "left_anti")
      }
    val l = blocks.select(col("block"), col("bval"),
      col("doc_id").as("id_a"), col("simhash").as("sh_a"))
    val r = blocks.select(col("block"), col("bval"),
      col("doc_id").as("id_b"), col("simhash").as("sh_b"))
    l.join(r, Seq("block", "bval"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
  }
}
