package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the exact baseline, and a random-hyperplane
  * LSH-bucketed variant as the scale path (candidates bounded per bucket,
  * no full cross join).
  *
  * All vector math is Catalyst HOF arithmetic (`zip_with` + `aggregate`) in
  * double precision — codegen'd, UDF-free, deterministic left-to-right
  * summation (matches any sequential oracle).
  */
object Similarity {

  /** Σ aᵢ·bᵢ with left-to-right accumulation. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Exact brute-force top-k cosine neighbors for each query vector.
    * Plan: broadcast the (small) query set against the corpus — an embarrass-
    * ingly parallel map over corpus partitions — then per-query top-k via
    * window row_number (partial top-k per partition under AQE).
    * Output: (qid, vec_id, cos, rank). */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     excludeSelf: Boolean = true,
                     maxBroadcastQueries: Long = DefaultMaxBroadcastQueries): DataFrame = {
    val q = maybeBroadcast(queries.select(col("vec_id").as("qid"),
      asDouble(col("embedding")).as("qv")), queries, maxBroadcastQueries)
    val c = corpus.select(col("vec_id"), asDouble(col("embedding")).as("cv"))
    val scored = c.join(q,
        if (excludeSelf) col("qid") =!= col("vec_id") else lit(true))
      .select(col("qid"), col("vec_id"), cosine(col("qv"), col("cv")).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(desc("cos"), asc("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Seeded random hyperplanes: nBits × dim doubles (driver-side literals,
    * broadcast inside the plan as array literals). */
  private[graft] def hyperplanes(nBits: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(nBits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-random-projection signature: one long with nBits sign bits
    * (≤ 64 — wider schemes use [[bandKeyCols]] directly, which never packs
    * more than one band into a long). */
  def lshSignature(v: Column, planes: Array[Array[Double]]): Column = {
    require(planes.length <= 64, "lshSignature packs into one long; use bandKeyCols")
    planes.zipWithIndex.map { case (p, i) =>
      val proj = dot(v, array(p.map(lit(_)): _*))
      when(proj >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
  }

  /** Per-band sign-projection keys: band `b`'s key is built from ITS OWN
    * `nBits/bands` hyperplanes, so the total plane count is unbounded by
    * any single long's width (the packed-signature shortcut caps a scheme
    * at 64 bits — too few for scale-safe keys × enough bands, see
    * [[DefaultLshBits]]). */
  private[pipeline] def bandKeyCols(v: Column, planes: Array[Array[Double]],
                                    bands: Int): Seq[Column] = {
    val bits = planes.length / bands
    require(bits <= 64,
      s"band keys pack into one long: $bits bits/band (${planes.length} " +
        s"planes / $bands bands) would alias shift counts mod 64")
    (0 until bands).map { b =>
      (0 until bits).map { i =>
        val proj = dot(v, array(planes(b * bits + i).map(lit(_)): _*))
        when(proj >= 0, lit(1L << i)).otherwise(lit(0L))
      }.reduce(_.bitwiseOR(_))
    }
  }

  /** Widest sign-projection scheme a tau-blind caller gets: 24 bands ×
    * 16-bit keys (384 planes). Key width is the SCALE knob: a band key
    * space of 2^16 holds the expected bucket size at 10^9 vectors to ~15k
    * (under the [[DefaultMaxBucketDf]] cap), where the 4-bit keys of a
    * 16-bit/4-band scheme put EVERY vector into one of 16 buckets per
    * band — a guaranteed-quadratic self-join at any real corpus size.
    * Band count is the RECALL knob: P[some band agrees] at cosine τ is
    * 1 − (1 − (1 − θ/π)^bits)^bands with θ = arccos τ. [[lshTopK]] (which
    * has no τ) uses this scheme as-is — ≈ 0.99 candidate recall at
    * τ = 0.95; τ-aware callers ([[embeddingDupPairs]]) derive the band
    * count from τ via [[bandsFor]] instead, capped here. */
  val DefaultLshBits: Int = 384

  /** Band cap for [[DefaultLshBits]] and [[bandsFor]]. */
  val DefaultLshBands: Int = 24

  /** Candidate-recall floor [[bandsFor]] sizes the default scheme to. */
  val DefaultLshRecall: Double = 0.98

  /** Bands of 16-bit keys needed for candidate recall ≥ `target` at
    * cosine `tau` — the inversion of the band-agreement formula on
    * [[DefaultLshBits]], capped at [[DefaultLshBands]]. The map-side
    * projection cost is linear in the band count, so sizing it to the
    * threshold makes near-exact sweeps (τ ≈ 0.999 → 3 bands) ~8× cheaper
    * than the flat cap while τ = 0.95 sweeps still get 20 bands
    * (recall ≈ 0.98); below τ ≈ 0.93 the cap binds and recall degrades —
    * callers hunting LOOSE similarity should pass their own scheme (or
    * use [[IvfIndex]], whose probe search has no banding recall cliff). */
  private[graft] def bandsFor(tau: Double,
                              target: Double = DefaultLshRecall): Int = {
    val p = 1.0 - math.acos(math.max(-1.0, math.min(1.0, tau))) / math.Pi
    val pKey = math.pow(p, 16)
    if (pKey >= 1.0 - 1e-12) 1
    else {
      val b = math.ceil(math.log1p(-target) / math.log1p(-pKey))
      math.max(1, math.min(DefaultLshBands, b.toInt))
    }
  }

  /** Default per-bucket df cap for LSH candidate generation — the
    * [[Dedup.DefaultMaxBlockDf]] discipline applied to sign-projection
    * buckets: a (band, key) bucket shared by more vectors than this would
    * make the bucket self-join quadratic in its size (10^5 ⇒ ≤ 10^10 pair
    * candidates from one bucket — already the ceiling). A bucket this hot
    * under 16-bit keys means degenerately clustered vectors (mass-duplicate
    * embeddings), which exact dedup should have removed first; recall on
    * pairs whose ONLY agreeing band was a capped bucket is sacrificed
    * knowingly. Pass 0 to disable. */
  val DefaultMaxBucketDf: Long = 100000

  /** `(band, bkey, <id>, <vec>)` bucket rows for a vector frame, hot
    * buckets dropped past `maxBucketDf` — the shared candidate-generation
    * front half of [[lshTopK]] and [[embeddingDupPairs]], exposed for
    * bucket-size audits.
    *
    * Evaluation-count note: the nBits dim-wide dot products are the
    * dominant cost. The plan stays LAZY (no checkpoint/persist here: an
    * eager pin would launch corpus-scale work at plan-construction time,
    * leak CacheManager entries with no owner to unpersist, and
    * `localCheckpoint`'s `Dataset.rdd` materialization statically zips
    * join stages AQE would re-plan — the exact failure recorded in
    * [[Dedup.applySweepTo]]'s history). The projection is evaluated by the
    * hot-bucket aggregation and once by the candidate join (whose two
    * self-join sides canonicalize to one reused exchange) — ~2 passes; a
    * caller repeating many actions over one corpus should persist its own
    * vector frame. */
  private[graft] def lshBucketRows(df: DataFrame, idAs: String, vAs: String,
      planes: Array[Array[Double]], bands: Int,
      maxBucketDf: Long): DataFrame = {
    // the hot-bucket cap composed with NARROW keys silently annihilates a
    // corpus: b-bit keys give 2^b buckets/band, so any corpus past
    // 2^b × maxBucketDf rows has EVERY bucket hot and the anti-join drops
    // all of it — zero candidates, no error. 8 bits × the default cap
    // floors that cliff at 25.6M rows/band; callers pinning narrower keys
    // (tiny recall-gate corpora) must disable the cap explicitly.
    require(maxBucketDf <= 0 || planes.length / bands >= 8,
      s"${planes.length / bands}-bit band keys with a hot-bucket cap " +
        s"($maxBucketDf) can silently drop the whole corpus; widen the " +
        "keys or pass maxBucketDf = 0")
    val v = asDouble(col("embedding"))
    val rows = df.select(col("vec_id").as(idAs), v.as(vAs),
        array(bandKeyCols(v, planes, bands): _*).as("keys"))
      .select(col(idAs), col(vAs), posexplode(col("keys")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bkey")
    if (maxBucketDf <= 0) rows
    else {
      val hot = rows.groupBy(col("band"), col("bkey"))
        .agg(count(lit(1)).as("bdf")).filter(col("bdf") > maxBucketDf)
        .select("band", "bkey")
      rows.join(hot, Seq("band", "bkey"), "left_anti")
    }
  }

  /** LSH-bucketed approximate top-k: vectors are bucketed by `bands`
    * sign-projection band keys ([[bandKeyCols]]); each query only scores
    * vectors sharing ≥1 band bucket. Recall is tunable via nBits/bands
    * (see [[DefaultLshBits]] for the math); `maxBucketDf` caps hot
    * buckets (computed over the CORPUS side — queries in a capped bucket
    * knowingly lose those candidates), so the join never goes quadratic.
    * Output: (qid, vec_id, cos, rank ≤ k). */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nBits: Int = DefaultLshBits, bands: Int = DefaultLshBands,
              dim: Int = 64, seed: Long = 42L, excludeSelf: Boolean = true,
              maxBroadcastQueries: Long = DefaultMaxBroadcastQueries,
              maxBucketDf: Long = DefaultMaxBucketDf): DataFrame = {
    require(nBits % bands == 0, "bands must divide nBits")
    val planes = hyperplanes(nBits, dim, seed)
    // the query side is never capped: its buckets are bounded by the query
    // batch itself, and dropping a query's bucket would silently drop the
    // query; the corpus-side cap is what bounds the join
    // the broadcast payload is the EXPLODED bucket frame — queries × bands
    // rows, each carrying the full query vector — so the row bound shrinks
    // with the band count (the 24-band default would otherwise inflate a
    // "10^4 queries" broadcast 6× past the constant's sizing rationale)
    val qb = maybeBroadcast(
      lshBucketRows(queries, "qid", "qv", planes, bands, maxBucketDf = 0),
      queries, maxBroadcastQueries / math.max(bands, 1))
    val cb = lshBucketRows(corpus, "vec_id", "cv", planes, bands, maxBucketDf)
    val cand = cb.join(qb, Seq("band", "bkey"))
      .filter(if (excludeSelf) col("qid") =!= col("vec_id") else lit(true))
      .select(col("qid"), col("vec_id"), col("qv"), col("cv"))
      .dropDuplicates("qid", "vec_id")
    val scored = cand.select(col("qid"), col("vec_id"),
      cosine(col("qv"), col("cv")).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(desc("cos"), asc("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Query-vector count above which the probe side of an IVF/LSH join is
    * no longer broadcast: a probe row carries the full query vector, so an
    * unbounded `broadcast()` hint on a 10^7-query batch would OOM every
    * executor. Past the bound the join runs shuffled (the planner's
    * choice), which is exactly right for batch-ANN jobs where the query
    * side is itself corpus-sized. 10^4 probe rows × ~0.5 KB/row stays in
    * the single-digit MB; joins that EXPLODE the query side (one row per
    * band in [[lshTopK]]) divide this bound by the expansion factor so the
    * bound counts broadcast rows, not pre-explosion queries. */
  val DefaultMaxBroadcastQueries: Long = 10000L

  /** True when `queries` provably holds at most `bound` rows — counted
    * with a `limit(bound+1)` scan, so the guard never pays a full count of
    * a huge query table. A bound at or past Int.MaxValue means "always
    * broadcast" (the caller opted out of the guard) — naively adding 1
    * would overflow the Int limit and invert the decision. */
  private[pipeline] def fitsBound(queries: DataFrame, bound: Long): Boolean =
    if (bound <= 0) false
    else bound >= Int.MaxValue ||
      queries.limit(bound.toInt + 1).count() <= bound

  private def maybeBroadcast(df: DataFrame, queries: DataFrame, bound: Long): DataFrame =
    if (fitsBound(queries, bound)) broadcast(df) else df

  /** nLists ≈ √n — the standard IVF sizing (cells and per-cell scan cost
    * balance at the square root). */
  def defaultNLists(n: Long): Int =
    math.max(1, math.round(math.sqrt(n.toDouble)).toInt)

  /** Per-query nProbe nearest centroids via Column arithmetic over the
    * (tiny, literal) centroid set — no driver round-trip per query.
    * Output: (qid, qv, cell), one row per (query, probed cell). */
  private[pipeline] def probeCells(queries: DataFrame,
      centroids: Array[Array[Double]], nProbe: Int): DataFrame = {
    def l2(q: Column, cent: Array[Double]): Column =
      aggregate(zip_with(q, array(cent.map(lit(_)): _*), (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, v) => acc + v)
    val distCells = array(centroids.zipWithIndex.map { case (c, i) =>
      struct(l2(col("qv"), c).as("d"), lit(i).as("cell"))
    }: _*)
    queries.select(col("vec_id").as("qid"), asDouble(col("embedding")).as("qv"))
      .withColumn("probe", explode(slice(array_sort(distCells), 1, nProbe)))
      .select(col("qid"), col("qv"), col("probe.cell").as("cell"))
  }

  /** Scoring tail over PREPARED probes `(qid, qv, cell)` — the caller owns
    * the broadcast decision and any cell pruning of `assigned`. */
  private[pipeline] def ivfScoreFromProbes(probes: DataFrame, assigned: DataFrame,
      k: Int, excludeSelf: Boolean): DataFrame = {
    val scored = assigned.join(probes, Seq("cell"))
      .filter(if (excludeSelf) col("qid") =!= col("vec_id") else lit(true))
      .select(col("qid"), col("vec_id"), cosine(col("qv"), col("cv")).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(desc("cos"), asc("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Scoring tail shared by the ad-hoc [[ivfTopK]] and the persisted
    * [[IvfIndex]]: join probes to cell assignments `(vec_id, cv, cell)`,
    * cosine, per-query top-k. */
  private[pipeline] def ivfScore(queries: DataFrame, assigned: DataFrame,
      centroids: Array[Array[Double]], k: Int, nProbe: Int,
      excludeSelf: Boolean, maxBroadcastQueries: Long): DataFrame =
    ivfScoreFromProbes(
      maybeBroadcast(probeCells(queries, centroids, nProbe), queries, maxBroadcastQueries),
      assigned, k, excludeSelf)

  /** IVF (inverted-file) ANN: k-means coarse quantizer (MLlib KMeans,
    * seeded) partitions the corpus into nLists cells; a query scores only
    * the vectors of its nProbe nearest cells. The classic
    * recall/throughput-tunable scale path: the candidate join is keyed on
    * cell id, touching ~nProbe/nLists of the corpus per query.
    * `nLists <= 0` derives the standard √n sizing. This variant re-fits
    * the quantizer per call — for repeated querying or incremental
    * corpora, persist it once with [[IvfIndex]] instead.
    * Output: (qid, vec_id, cos, rank ≤ k). */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nLists: Int = 0, nProbe: Int = 4,
              seed: Long = 42L, excludeSelf: Boolean = true,
              maxBroadcastQueries: Long = DefaultMaxBroadcastQueries): DataFrame = {
    val (centroids, assigned) = fitQuantizer(corpus, nLists, seed)
    ivfScore(queries, assigned, centroids, k, nProbe, excludeSelf, maxBroadcastQueries)
  }

  /** Trains the seeded k-means coarse quantizer and assigns every corpus
    * vector to its cell. Returns (centroids, assignments(vec_id, cv, cell)). */
  private[pipeline] def fitQuantizer(corpus: DataFrame, nLists: Int,
      seed: Long): (Array[Array[Double]], DataFrame) = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val withVec = corpus.select(col("vec_id"), asDouble(col("embedding")).as("emb"))
      .withColumn("features", array_to_vector(col("emb")))
    val lists = if (nLists > 0) nLists else defaultNLists(withVec.count())
    val model = new KMeans().setK(lists).setSeed(seed).setMaxIter(10)
      .fit(withVec)
    val assigned = model.transform(withVec)
      .select(col("vec_id"), col("emb").as("cv"), col("prediction").as("cell"))
    (model.clusterCenters.map(_.toArray), assigned)
  }

  /** `(nBits, bands)` for a possibly half-pinned caller scheme, resolved
    * so 16-bit keys are preserved: `nBits` alone fixes the plane budget
    * (bands = nBits/16 — a legacy `nBits = 192` call still means
    * 12 × 16-bit, NOT [[bandsFor]]`(tau)` bands of whatever width makes
    * the division work, which could silently widen keys past per-band
    * usefulness or even the 64-bit pack); `bands` alone sizes the budget
    * to it; neither → [[bandsFor]]`(tau)` × 16-bit. */
  private[graft] def resolveScheme(tau: Double, nBits: Int,
                                   bands: Int): (Int, Int) = {
    // a small nBits-only pin is AMBIGUOUS: under pre-adaptive defaults
    // nBits=16 meant several narrow-key bands, while the 16-bit-key rule
    // here would yield ONE band (candidate recall ~0.18 at tau=0.95) —
    // neither silent reading is defensible, so demand an explicit bands
    require(bands > 0 || nBits == 0 || nBits >= 64,
      s"nBits=$nBits without bands is ambiguous (one 16-bit-key band " +
        "would crater recall); pin bands explicitly for schemes under 64 planes")
    val useBands =
      if (bands > 0) bands
      else if (nBits > 0) math.max(1, nBits / 16)
      else bandsFor(tau)
    val useBits = if (nBits > 0) nBits else useBands * 16
    require(useBits % useBands == 0, "bands must divide nBits")
    (useBits, useBands)
  }

  /** Embedding near-duplicate pairs: all (a < b) with cosine ≥ tau,
    * bucketed by sign-projection band keys so the pair join is not a cross
    * product — by default [[bandsFor]]`(tau)` bands of 16-bit keys (pass
    * `nBits`/`bands` > 0 to pin a scheme; see [[DefaultLshBits]] for the
    * key-width/recall math) with hot buckets df-capped
    * ([[DefaultMaxBucketDf]]), the same candidate-generation discipline as
    * every other self-join in [[Dedup]]. `exact = true` falls back to the
    * full O(n²) join (tiny inputs / oracle parity). */
  def embeddingDupPairs(corpus: DataFrame, tau: Double,
                        exact: Boolean = false, nBits: Int = 0,
                        bands: Int = 0, dim: Int = 64,
                        seed: Long = 42L,
                        maxBucketDf: Long = DefaultMaxBucketDf): DataFrame = {
    if (exact) {
      val a = corpus.select(col("vec_id").as("id_a"), asDouble(col("embedding")).as("va"))
      val b = corpus.select(col("vec_id").as("id_b"), asDouble(col("embedding")).as("vb"))
      a.join(b, col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), cosine(col("va"), col("vb")).as("cos"))
        .filter(col("cos") >= tau)
    } else {
      val (useBits, useBands) = resolveScheme(tau, nBits, bands)
      val planes = hyperplanes(useBits, dim, seed)
      val bucketed = lshBucketRows(corpus, "vec_id", "v", planes, useBands,
        maxBucketDf)
      val l = bucketed.select(col("band"), col("bkey"), col("vec_id").as("id_a"), col("v").as("va"))
      val r = bucketed.select(col("band"), col("bkey"), col("vec_id").as("id_b"), col("v").as("vb"))
      l.join(r, Seq("band", "bkey"))
        .filter(col("id_a") < col("id_b"))
        .dropDuplicates("id_a", "id_b")
        .select(col("id_a"), col("id_b"), cosine(col("va"), col("vb")).as("cos"))
        .filter(col("cos") >= tau)
    }
  }
}
