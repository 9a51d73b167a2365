package graft.search

import graft.analysis.Analyzer
import graft.core._
import graft.index.{IndexStore, PostingCodec}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Query modes. The reference's multi-term search is disjunctive
  * accumulation (OR, indexing.go:385-493); AND is the intersection variant
  * the north rule's WAND path assumes; Wand is AND/OR-equivalent top-k with
  * block-max pruning. */
/** Driver-side per-(field, term) query statistics. */
final case class TermStat(field: String, term: String, df: Long,
                          idf: Double, avgdl: Double)

sealed trait SearchMode
object SearchMode {
  case object Or extends SearchMode
  case object And extends SearchMode
  case object Wand extends SearchMode // OR semantics + block-max pruning
}

/** BM25 top-k search over an [[IndexStore]] (SURVEY.md §A.4 pinned scorer).
  *
  * Plan shape (exhaustive path):
  *   postings scan (parquet min/max pruned to the query terms / prefix range)
  *   → blob decode (flatMap) → tombstone anti-filter → broadcast join with
  *   the per-(field,term) idf + per-field avgdl stats (tiny, driver-built)
  *   → per-row BM25 contribution (pure Column arithmetic, codegen'd)
  *   → groupBy(doc_id) sum (partial agg map-side; cardinality ≤ matched docs)
  *   → orderBy(score desc, doc_id).limit(k) ⇒ TakeOrderedAndProjectExec —
  *   no global sort is ever materialized.
  *
  * The only shuffle is the final groupBy(doc_id) over matched postings —
  * the same irreducible "accumulate per doc" the reference does in a hash
  * map (indexing.go:380, 407-419), here distributed and spill-safe.
  */
class SearchEngine(val store: IndexStore) {
  import store.spark.implicits._

  private def spark: SparkSession = store.spark
  private def bm25: Bm25Params = store.cfg.bm25

  /** Decoded posting rows for the given shard subset — via the native
    * Catalyst generator [[graft.functions.PostingExplode]]: the blob is
    * consumed straight from the UnsafeRow inside GenerateExec, with no typed
    * encoder round-trip. */
  def decode(shards: DataFrame): DataFrame =
    shards.select($"field", $"term", $"seg",
      graft.functions.GraftFunctions.posting_explode($"blob"))

  /** Expands a `beginsWith` prefix to concrete index terms via a range scan
    * on the term-sorted df table — the analogue of the reference's radix
    * `WalkPrefix` with its 100-subtree cap (indexing.go:773-785). */
  def expandPrefix(prefix: String, fields: Seq[String], cap: Int = 100): Seq[(String, String)] = {
    // an empty prefix would "match" cap arbitrary terms — reject loudly
    // (search() never passes one; tokenization drops empty terms)
    require(prefix.nonEmpty, "prefix must be non-empty")
    cachedExpansion("p", prefix, fields, cap) {
      val lo = prefix.toLowerCase
      // Range pruning needs a successor string upper-bounding every
      // lo-prefixed term in UTF-8 (code point) order. Incrementing the
      // final UTF-16 unit is only order-preserving while it stays strictly
      // below the surrogate range; prefixes ending at U+D7FF or above
      // (incl. astral prefixes, whose last unit is a low surrogate, and
      // U+FFFF-adjacent chars) fall back to an unpruned startswith scan —
      // correct, just not min/max-pruned, and vanishingly rare.
      val pred =
        if (lo.nonEmpty && lo.last < 0xD7FF.toChar) {
          val hi = lo.init + (lo.last + 1).toChar
          $"term" >= lo && $"term" < hi
        } else $"term".startsWith(lo)
      cachedTermDf()
        .filter($"field".isInCollection(fields) && pred)
        .select($"field", $"term").orderBy($"term", $"field").limit(cap)
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    }
  }

  /** Fuzzy term expansion (reference FuzzySearch, indexing.go:689-709):
    * walk the dictionary subtree of the query's first character and keep
    * terms containing every character of the query. As a term-dictionary
    * range scan + character-containment filter, it needs no extra index.
    * Capped at `cap` terms in deterministic (term, field) order — the same
    * bound the prefix walk applies — so a one-letter fuzzy query against a
    * corpus-scale dictionary never collects an unbounded term list to the
    * driver. */
  def expandFuzzy(key: String, fields: Seq[String], cap: Int = 100): Seq[(String, String)] = {
    val k = key.toLowerCase
    if (k.isEmpty) return Seq.empty
    cachedExpansion("f", k, fields, cap) {
      val lo = k.substring(0, 1)
      val hi = (k.charAt(0) + 1).toChar.toString
      val containsAll = k.distinct.map(c => $"term".contains(c.toString))
        .reduce(_ && _)
      cachedTermDf()
        .filter($"field".isInCollection(fields) && $"term" >= lo && $"term" < hi)
        .filter(containsAll)
        .select($"field", $"term")
        .orderBy($"term", $"field").limit(cap)
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    }
  }

  /** Version-invalidated LRU for prefix/fuzzy expansions (≤ cap pairs per
    * entry) — warm expanding queries need no dictionary-scan job. */
  private val expandCache =
    new java.util.LinkedHashMap[(String, String, Seq[String], Int), Seq[(String, String)]](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, String, Seq[String], Int), Seq[(String, String)]]): Boolean =
        size() > 4096
    }

  private def cachedExpansion(kind: String, key: String, fields: Seq[String], cap: Int)(
      compute: => Seq[(String, String)]): Seq[(String, String)] = {
    refreshIfStale()
    val ck = (kind, key, fields, cap)
    val (tok, cached) = synchronized { (cacheToken, expandCache.get(ck)) }
    if (cached != null) cached
    else {
      val v = compute // dictionary scan outside the monitor
      synchronized {
        if (cacheToken == tok && expandCache.get(ck) == null) expandCache.put(ck, v)
      }
      v
    }
  }

  /** Fuzzy search: expand each query token with [[expandFuzzy]], then score
    * the matched terms with the standard BM25 accumulation. */
  def searchFuzzy(query: String, fields: Seq[String] = CorpusDoc.Fields,
                  k: Int = 100): DataFrame = {
    val qTerms = Analyzer.tokenize(query).distinct.sorted.toSeq
    val matched = qTerms.flatMap(t => expandFuzzy(t, fields)).distinct
    exhaustive(qTerms, matched, fields, k, SearchMode.Or)
  }

  /** Full search entry point mirroring the reference API
    * (`POST /index/search` body {Query, Fields, BeginsWith},
    * indexRoutes.go:13-17): analyze the query with the same analyzer as the
    * index (indexing.go:384), match terms exactly or by prefix, score with
    * pinned BM25, return top-k (doc_id, score). */
  def search(query: String, fields: Seq[String] = CorpusDoc.Fields,
             beginsWith: Boolean = false, k: Int = 100,
             mode: SearchMode = SearchMode.Or,
             boosts: Map[String, Double] = Map.empty): DataFrame = {
    val qTerms = Analyzer.tokenize(query).distinct.sorted.toSeq
    if (qTerms.isEmpty) return spark.emptyDataset[Hit].toDF()
    require(!(mode == SearchMode.And && beginsWith && qTerms.size > 64),
      "AND + prefix supports at most 64 query terms")
    // a negative boost would flip idf's sign and invert WAND's upper bounds
    // into lower bounds, silently breaking pruning
    require(boosts.values.forall(_ >= 0.0), s"boosts must be >= 0: $boosts")
    // .distinct: overlapping prefix expansions (e.g. "cl cla" both matching
    // "class") must contribute one (field, term) pair, not two — a duplicate
    // would double-count that term's BM25 contribution in the distributed
    // join path. Each pair keeps the bit(s) of the QUERY term(s) it expands
    // from, so AND semantics stay "every query term has ≥1 matched
    // expansion" under prefix expansion.
    val qIdx: Map[String, Int] = qTerms.zipWithIndex.toMap
    val matchedSrc: Seq[(String, String, String)] =
      if (beginsWith)
        qTerms.flatMap(t => expandPrefix(t, fields).map { case (f, mt) => (f, mt, t) })
      else fields.flatMap(f => qTerms.map(t => (f, t, t)))
    val matched: Seq[(String, String)] =
      matchedSrc.map { case (f, t, _) => (f, t) }.distinct
    val srcBit: Map[(String, String), Long] =
      matchedSrc.groupBy { case (f, t, _) => (f, t) }
        .map { case (key, vs) =>
          key -> vs.map(v => 1L << (qIdx(v._3) % 64)).reduce(_ | _) }
    mode match {
      // WAND needs a per-executor tombstone lookup; past the driver-map
      // bound its pruning advantage is gone anyway (upper bounds ignore
      // deletions), so fall back to the exhaustive OR plan — identical
      // top-k semantics, anti-join tombstone filtering.
      case SearchMode.Wand if tombstonesSmall =>
        new WandExecutor(this).search(qTerms, matched, fields, k, boosts)
      case SearchMode.Wand =>
        exhaustive(qTerms, matched, fields, k, SearchMode.Or, boosts, srcBit)
      case _ =>
        exhaustive(qTerms, matched, fields, k, mode, boosts, srcBit)
    }
  }

  /** Top-k hits hydrated with the stored documents (reference loads the ≤100
    * hit docs from disk, indexing.go:534-537); broadcast join on ≤k ids. */
  def searchDocs(query: String, fields: Seq[String] = CorpusDoc.Fields,
                 beginsWith: Boolean = false, k: Int = 100,
                 mode: SearchMode = SearchMode.Or,
                 boosts: Map[String, Double] = Map.empty): DataFrame = {
    val hits = search(query, fields, beginsWith, k, mode, boosts)
    store.liveCorpus().join(broadcast(hits), Seq("doc_id"))
      .orderBy(desc("score"), asc("doc_id"))
  }

  // ---------- per-store-version caches ----------
  // fieldStats / tombstones / the unioned table plans are re-read only when
  // the store's version token changes (any segment commit or tombstone).
  // This removes 3-4 driver-side jobs + file listings from EVERY query —
  // the reference pays none of these because its index lives in RAM.

  private var cacheToken: String = null
  private var fieldStatsC: Map[String, (Long, Long)] = Map.empty
  private var tombstoneC: Map[Long, Int] = Map.empty
  private var tombSmallC: Boolean = true
  private var postingsC: DataFrame = _
  private var termDfC: DataFrame = _

  private def refreshIfStale(): Unit = synchronized {
    val t = store.versionToken()
    if (t != cacheToken) {
      fieldStatsC = store.fieldStats()
      // size-guard the driver tombstone map: past the configured bound the
      // map is never collected — anti-joins run against the tombstone table
      // instead (a bulk delete of 10^9 ids must not OOM the driver)
      tombSmallC = store.tombstoneCount() <= store.cfg.maxDriverTombstones
      tombstoneC = if (tombSmallC) store.tombstoneMap() else Map.empty
      postingsC = store.postings()
      termDfC = store.termDf()
      blobCache.clear()
      blobCacheSize = 0L
      dfCache.clear()
      expandCache.clear()
      cacheToken = t
    }
  }

  // ---------- driver posting-blob cache ----------
  // Bounded LRU of collected shard rows per (field, term) — the driver fast
  // paths' analogue of the reference's all-in-RAM radix tree (its postings
  // are always resident, indexing.go:130-139). Only lists small enough for
  // the fast paths ever reach here; a repeat query over cached terms runs
  // ZERO Spark jobs. Invalidated wholesale when the store version changes.

  private type ShardRow = (String, String, Int, Long, Array[Byte], Array[Byte])
  private val blobCache =
    new java.util.LinkedHashMap[(String, String), Array[ShardRow]](64, 0.75f, true)
  private var blobCacheSize = 0L
  private def rowBytes(r: ShardRow): Long =
    (if (r._5 == null) 0 else r._5.length).toLong + r._6.length + 64

  private def collectRows(pairs: Seq[(String, String)]): Array[ShardRow] =
    matchedShards(pairs)
      .select($"field", $"term", $"seg", $"shard", $"blocks", $"blob")
      .as[ShardRow].collect()

  /** Shard rows for the matched pairs, served from the LRU where possible.
    * Rows fetched by this call are returned even if eviction (or a version
    * change) keeps them out of the cache — a query never loses its own
    * data. The Spark collect for misses runs OUTSIDE the engine monitor so
    * one cold query cannot serialize every other query on this engine;
    * inserts re-check the version token (never poison a newer cache).
    *
    * Version consistency: cache hits are captured under one version token
    * and the miss collect runs unlocked, so a concurrent CRUD (notably a
    * compact() that renumbers segments) landing in between would hand one
    * query rows from TWO store versions. If the token moved while misses
    * were fetched, the whole fetch (hits + misses) is retried once from the
    * new version; a second concurrent bump is accepted (bounded retry —
    * CRUD is rare relative to queries, and the tombstone filter still
    * guards deletes either way). */
  private[search] def fetchShardRows(matched0: Seq[(String, String)]): Array[ShardRow] = {
    // dedupe: a duplicated pair would double-score its term
    val matched = matched0.distinct
    refreshIfStale()
    if (store.cfg.driverBlobCacheBytes <= 0) return collectRows(matched)
    def attempt(retriesLeft: Int): Array[ShardRow] = {
      val (tok, hits, missKeys) = synchronized {
        val h = Map.newBuilder[(String, String), Array[ShardRow]]
        val m = Seq.newBuilder[(String, String)]
        matched.foreach { key =>
          val c = blobCache.get(key)
          if (c != null) h += key -> c else m += key
        }
        (cacheToken, h.result(), m.result())
      }
      val fetched: Map[(String, String), Array[ShardRow]] =
        if (missKeys.isEmpty) Map.empty
        else collectRows(missKeys).groupBy(r => (r._1, r._2))
      if (missKeys.nonEmpty) synchronized {
        if (cacheToken == tok) {
          missKeys.foreach { key =>
            if (blobCache.get(key) == null) { // racing filler may have won
              val rows = fetched.getOrElse(key, Array.empty[ShardRow])
              blobCache.put(key, rows)
              blobCacheSize += rows.iterator.map(rowBytes).sum
            }
          }
          val it = blobCache.entrySet().iterator()
          while (blobCacheSize > store.cfg.driverBlobCacheBytes && it.hasNext) {
            val e = it.next()
            blobCacheSize -= e.getValue.iterator.map(rowBytes).sum
            it.remove()
          }
        }
      }
      val mixedVersions = missKeys.nonEmpty && hits.nonEmpty && {
        refreshIfStale()
        synchronized { cacheToken != tok }
      }
      if (mixedVersions && retriesLeft > 0) attempt(retriesLeft - 1)
      else matched.iterator.flatMap(k =>
        hits.getOrElse(k, fetched.getOrElse(k, Array.empty[ShardRow]))).toArray
    }
    attempt(1)
  }

  private[search] def cachedPostings(): DataFrame = { refreshIfStale(); postingsC }
  private[search] def cachedTermDf(): DataFrame = { refreshIfStale(); termDfC }
  private[search] def cachedTombstones(): Map[Long, Int] = { refreshIfStale(); tombstoneC }
  /** Whether the tombstone set fits the driver-map bound; when false, every
    * query path uses distributed anti-joins and WAND falls back to the
    * exhaustive plan. */
  def tombstonesSmall: Boolean = { refreshIfStale(); tombSmallC }

  // ---------- scoring internals ----------

  /** idf + avgdl + df statistics for the matched (field, term) pairs,
    * computed on the driver (≤ |fields|·|terms| rows) and broadcast.
    *
    * Per-field boosts scale idf here, at the single source of scoring
    * statistics: every downstream path (Column arithmetic, driver
    * accumulation, WAND global/block upper bounds and contributions) is
    * linear in idf, so one multiplication boosts them all consistently —
    * WAND pruning stays safe because bounds scale with contributions. */
  private[search] def termStats(matched0: Seq[(String, String)],
                                boosts: Map[String, Double] = Map.empty): Seq[TermStat] = {
    refreshIfStale()
    val matched = matched0.distinct // one stat row per pair, always
    val fstats = fieldStatsC
    val dfMap = fetchDfs(matched)
    matched.flatMap { case (f, t) =>
      dfMap.get((f, t)).filter(_ > 0).flatMap { df =>
        fstats.get(f).collect { case (n, sumDl) if n > 0 =>
          val boost = boosts.getOrElse(f, 1.0)
          val idf = boost * math.log(1.0 + (n - df + 0.5) / (df + 0.5))
          val avgdl = sumDl.toDouble / n
          TermStat(f, t, df, idf, avgdl)
        }
      }
    }
  }

  /** Per-(field, term) dfs with a version-invalidated LRU (8-byte values —
    * the bound is entry count). Misses fetch in one pruned scan; absent
    * pairs are negative-cached as 0 so repeated misses cost nothing. A warm
    * repeat query thus needs no Spark job for its statistics. */
  private val dfCache = new java.util.LinkedHashMap[(String, String), java.lang.Long](1024, 0.75f, true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[(String, String), java.lang.Long]): Boolean = size() > (1 << 17)
  }

  private def fetchDfs(matched: Seq[(String, String)]): Map[(String, String), Long] = {
    val (tok, hits, missKeys) = synchronized {
      val h = Map.newBuilder[(String, String), Long]
      val m = Seq.newBuilder[(String, String)]
      matched.distinct.foreach { key =>
        val c = dfCache.get(key)
        if (c != null) h += key -> c.longValue else m += key
      }
      (cacheToken, h.result(), m.result())
    }
    if (missKeys.isEmpty) hits
    else {
      // dictionary scan outside the monitor (see fetchShardRows)
      val fieldsTouched = missKeys.map(_._1).distinct
      val terms = missKeys.map(_._2).distinct
      val fetched = cachedTermDf()
        .filter($"field".isInCollection(fieldsTouched) && $"term".isInCollection(terms))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      synchronized {
        if (cacheToken == tok) missKeys.foreach { key =>
          dfCache.put(key, java.lang.Long.valueOf(fetched.getOrElse(key, 0L)))
        }
      }
      hits ++ missKeys.map(key => key -> fetched.getOrElse(key, 0L))
    }
  }

  private[search] def tombstoneFiltered(decoded: DataFrame): DataFrame = {
    refreshIfStale()
    if (tombSmallC) {
      val ts = tombstoneC
      if (ts.isEmpty) decoded
      else {
        val tsDF = broadcast(ts.toSeq.toDF("t_doc_id", "t_max_seg"))
        decoded.join(tsDF,
          decoded("doc_id") === tsDF("t_doc_id") && decoded("seg") <= tsDF("t_max_seg"),
          "left_anti")
      }
    } else {
      // past the driver bound: distributed anti-join against the aggregated
      // tombstone table (shuffled, spill-safe — never materialized anywhere)
      val tsDF = store.tombstoneAgg()
      decoded.join(tsDF,
        decoded("doc_id") === tsDF("t_doc_id") && decoded("seg") <= tsDF("t_max_seg"),
        "left_anti")
    }
  }

  /** Selects only the shards of the matched terms — equality pushdown on the
    * (field, term)-sorted postings table. */
  def matchedShards(matched0: Seq[(String, String)]): DataFrame = {
    val matched = matched0.distinct // duplicates would fool the cross-product check
    val all = cachedPostings()
    if (all.isEmpty) return all
    val fields = matched.map(_._1).distinct
    val terms = matched.map(_._2).distinct
    // two parquet-pushable IN filters bound the scan
    val bounded = all.filter(
      $"field".isInCollection(fields) && $"term".isInCollection(terms))
    // when the matched set IS the fields × terms cross product (every
    // non-prefix query), the IN filters are already exact — skip the
    // broadcast semi-join and its exchange/job. Prefix expansion, where
    // matched terms differ per field, still enforces the exact pair set.
    if (matched.size.toLong == fields.size.toLong * terms.size) bounded
    else {
      val pairs = broadcast(matched.toDF("field", "term"))
      bounded.join(pairs, Seq("field", "term"), "left_semi")
    }
  }

  private def exhaustive(qTerms: Seq[String], matched: Seq[(String, String)],
                         fields: Seq[String], k: Int, mode: SearchMode,
                         boosts: Map[String, Double] = Map.empty,
                         srcBit: Map[(String, String), Long] = Map.empty): DataFrame = {
    if (matched.isEmpty) return spark.emptyDataset[Hit].toDF()
    val stats = termStats(matched, boosts)
    if (stats.isEmpty) return spark.emptyDataset[Hit].toDF()
    // AND intersection mask: bit(s) of the query term(s) each matched pair
    // expands from — identity when no expansion happened
    val bitOf: Map[(String, String), Long] =
      if (mode != SearchMode.And) Map.empty
      else if (srcBit.nonEmpty) srcBit
      else {
        val qIdx = qTerms.zipWithIndex.toMap
        matched.map(p => p -> (1L << (qIdx.getOrElse(p._2, 0) % 64))).toMap
      }
    // small-query fast path (same bound as WAND): accumulate on the driver
    // from one pruned scan instead of decode+shuffle+agg jobs. Requires the
    // driver-side tombstone map, so it is skipped past the tombstone bound;
    // AND tracking uses a 64-bit term mask, so wider AND queries distribute.
    if (stats.map(_.df).sum * 8 <= store.cfg.driverWandMaxBytes && tombstonesSmall
        && (mode != SearchMode.And || qTerms.size <= 64))
      return driverExhaustive(qTerms, matched, stats, k, mode, bitOf)
    val statsDF = broadcast(
      stats.map(s => (s.field, s.term, s.idf, s.avgdl,
          bitOf.getOrElse((s.field, s.term), 0L)))
        .toDF("field", "term", "idf", "avgdl", "tbit"))
    // Attach the per-term stats to the SHARD rows (one row per (field,
    // term, seg, shard) — vocabulary-sized) and explode AFTERWARDS, so the
    // broadcast hash join hashes two string keys once per shard row, not
    // once per decoded posting, and the per-posting stream carries three
    // doubles + seg instead of two strings (guide §3.3: "explode before a
    // join multiplies the shuffle; join first on the un-exploded key and
    // explode after"). Contribution values are identical per posting; only
    // the plan order changes.
    val rows = tombstoneFiltered(
      matchedShards(matched).join(statsDF, Seq("field", "term"))
        .select($"seg", $"idf", $"avgdl", $"tbit",
          graft.functions.GraftFunctions.posting_explode($"blob")))
    val k1 = lit(bm25.k1); val b = lit(bm25.b)
    val contrib = rows
      .withColumn("part",
        $"idf" * ($"tf" * (k1 + lit(1.0))) /
          ($"tf" + k1 * (lit(1.0) - b + b * $"dl" / $"avgdl")))
    // OR mode needs only the score sum. AND tracks the distinct-term set as
    // a bit_or mask — one shuffle, unlike countDistinct, whose distinct
    // rewrite inserts a second aggregate exchange on (doc_id, term).
    val filtered = mode match {
      case SearchMode.And if qTerms.size <= 64 =>
        contrib.groupBy($"doc_id")
          .agg(sum($"part").as("score"), bit_or($"tbit").as("mask"))
          .filter(bit_count($"mask") === lit(qTerms.size))
      case SearchMode.And =>
        contrib.groupBy($"doc_id")
          .agg(sum($"part").as("score"), countDistinct($"term").as("mterms"))
          .filter($"mterms" === lit(qTerms.size.toLong))
      case _ =>
        contrib.groupBy($"doc_id").agg(sum($"part").as("score"))
    }
    filtered.select($"doc_id", $"score")
      .orderBy(desc("score"), asc("doc_id")).limit(k)
  }

  /** Driver-side exhaustive scoring for small candidate sets: collects the
    * pruned shard rows, decodes and accumulates per-doc scores in ascending
    * (field, term) order — the exact summation order of the oracle scorer,
    * so scores are bit-identical to it (the distributed path sums in
    * shuffle order and matches within fp tolerance).
    *
    * The inner loop is allocation-free: varints are decoded inline (no
    * tuple materialization) into a primitive open-addressing accumulator
    * ([[DriverScoreMap]]); AND-mode distinct-term tracking is a bitmask.
    * The previous HashMap[Long, Double] + Set[String] version spent ~3x
    * this path's runtime on boxing. */
  private def driverExhaustive(qTerms: Seq[String], matched: Seq[(String, String)],
                               stats: Seq[TermStat], k: Int, mode: SearchMode,
                               bitOf: Map[(String, String), Long]): DataFrame = {
    val statsMap = stats.map(s => (s.field, s.term) -> s).toMap
    // rows BEFORE tombstones: if a concurrent delete lands between the two
    // reads, the tombstone map is the newer of the pair and the deleted doc
    // is still filtered (the reverse order could resurface it)
    //
    // SHARD-major sort: shard groups hold pairwise-disjoint docId ranges
    // (shard = docId / span), so contiguous shard runs are independent
    // scoring units executed CONCURRENTLY on the driver pool below —
    // within a run the (f, t, seg) order is exactly the old global
    // (f, t, shard, seg) order restricted to that shard's docs, so every
    // doc's contributions still sum in ascending (field, term) order and
    // scores stay bit-identical to the oracle scorer.
    val rows = fetchShardRows(matched)
      .sortBy { case (f, t, seg, shard, _, _) => (shard, f, t, seg) }
    val tomb = cachedTombstones()
    val and = mode == SearchMode.And
    val est = math.min(stats.map(_.df).sum, 1L << 21).toInt
    val k1 = bm25.k1; val b = bm25.b
    val noTomb = tomb.isEmpty
    val want = qTerms.size
    // contiguous shard-run boundaries
    val starts = scala.collection.mutable.ArrayBuffer(0)
    var ri = 1
    while (ri < rows.length) {
      if (rows(ri)._4 != rows(ri - 1)._4) starts += ri
      ri += 1
    }
    val nUnits = if (rows.isEmpty) 0 else starts.length
    // One unit: accumulate its shard's postings into a private map, filter
    // (AND mask), and return its local top-k. Per-unit map pre-sizing uses
    // the unit's blob bytes (≥ 3 bytes per posting ⇒ bytes/3 bounds its
    // distinct docs) instead of the global Σdf — the old single global
    // accumulator pre-sized from Σdf to avoid ~7 re-hashes per hot query;
    // the same reasoning applies per unit with the tighter local bound.
    def scoreUnit(u: Int): BoundedHitHeap = {
      val from = starts(u)
      val until = if (u + 1 < nUnits) starts(u + 1) else rows.length
      var bytes = 0L
      var i = from
      while (i < until) { bytes += rows(i)._6.length; i += 1 }
      val estU = math.min(est.toLong, bytes / 3 + 16).toInt
      val acc = new DriverScoreMap(math.max(estU * 10 / 7, 1 << 10))
      i = from
      while (i < until) {
        val (f, t, seg, _, _, blob) = rows(i)
        statsMap.get((f, t)).foreach { st =>
          val idf = st.idf
          val avgdl = st.avgdl
          val bit = if (and) bitOf.getOrElse((f, t), 0L) else 0L
          var p = 0
          var prevDoc = 0L
          while (p < blob.length) {
            // inline LEB128 × 3: docId delta, tf, dl
            var v = 0L; var shift = 0; var by = 0
            do { by = blob(p) & 0xff; v |= (by & 0x7fL) << shift; shift += 7; p += 1 }
            while ((by & 0x80) != 0)
            val d = prevDoc + v
            prevDoc = d
            v = 0L; shift = 0
            do { by = blob(p) & 0xff; v |= (by & 0x7fL) << shift; shift += 7; p += 1 }
            while ((by & 0x80) != 0)
            val tf = v.toDouble
            v = 0L; shift = 0
            do { by = blob(p) & 0xff; v |= (by & 0x7fL) << shift; shift += 7; p += 1 }
            while ((by & 0x80) != 0)
            val dl = v.toDouble
            if (noTomb || !tomb.get(d).exists(seg <= _)) {
              // EXACT expression shape of OracleScorer / the Column plan —
              // re-associating it would break bit-identity with both
              val part = idf * (tf * (k1 + 1.0)) /
                (tf + k1 * (1.0 - b + b * dl / avgdl))
              acc.add(d, part, bit)
            }
          }
        }
        i += 1
      }
      val h = new BoundedHitHeap(k)
      acc.foreach { (d, s, m) =>
        if (!and || java.lang.Long.bitCount(m) == want) h.offer(d, s)
      }
      h
    }
    // Disjoint doc ranges ⇒ merged per-unit top-ks equal the global top-k
    // under the (score desc, docId asc) total order. Pool size = the
    // session's defaultParallelism (never a hard-coded core count); the
    // single-unit / single-core case runs inline with zero pool overhead —
    // the previous sequential behavior exactly.
    val par = math.max(1, spark.sparkContext.defaultParallelism)
    val heap = new BoundedHitHeap(k)
    if (nUnits <= 1 || par <= 1) {
      var u = 0
      while (u < nUnits) {
        scoreUnit(u).result().foreach { case (d, s) => heap.offer(d, s) }
        u += 1
      }
    } else {
      val pool = DriverPool(par)
      val futs = (0 until nUnits).map { u =>
        pool.submit(new java.util.concurrent.Callable[BoundedHitHeap] {
          def call(): BoundedHitHeap = scoreUnit(u)
        })
      }
      futs.foreach(_.get().result().foreach { case (d, s) => heap.offer(d, s) })
    }
    // already (score desc, doc_id asc)-sorted and ≤ k: plain LocalRelation
    heap.result().toDF("doc_id", "score")
  }
}
