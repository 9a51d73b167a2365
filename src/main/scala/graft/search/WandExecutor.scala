package graft.search

import graft.core._
import graft.index.PostingCodec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed Block-Max WAND top-k (SURVEY.md §7.2 M4; north rule:
  * "posting-list intersection with block-max WAND pruning and a bounded
  * min-heap per partition merged via a final top-k reduce").
  *
  * Parallelism model: posting shards are docId-range disjoint, so
  * repartitioning the matched shards ON `shard` colocates, for each docId
  * range, every query term's postings in one task. Each task runs classic
  * BMW (Broder et al. WAND + Ding/Suel block-max bounds) over its shards
  * with ONE bounded min-heap shared across the task's shards — the heap
  * threshold θ only tightens as the task progresses, so pruning is safe, and
  * partitions prune independently starting from θ=0. The driver merges the
  * ≤ k·partitions candidates with a final top-k — at k=10..100 this merge is
  * trivially small at any corpus scale.
  *
  * Small-query fast path: when Σ df(t) (known on the driver from the stats
  * lookup) bounds the candidate volume under `IndexConfig.driverWandMaxBytes`,
  * the pruned blob rows are collected and BMW runs on the driver — one scan
  * job instead of scan+shuffle+reduce. Hot-term queries at corpus scale
  * exceed the bound and stay fully distributed (the query-coordinator
  * pattern of real search engines).
  *
  * Determinism: at full evaluation a doc's contributions are summed in
  * ascending (field, term) cursor order — the same order the single-node
  * oracle scorer uses — so scores are bit-identical and ranks exact
  * (SURVEY.md §7.4 float determinism).
  */
class WandExecutor(engine: SearchEngine) {
  import engine.store.spark.implicits._

  private val bm25 = engine.store.cfg.bm25

  def search(qTerms: Seq[String], matched: Seq[(String, String)],
             fields: Seq[String], k: Int,
             boosts: Map[String, Double] = Map.empty): DataFrame = {
    val spark = engine.store.spark
    if (matched.isEmpty) return spark.emptyDataset[Hit].toDF()
    val stats = engine.termStats(matched, boosts)
    if (stats.isEmpty) return spark.emptyDataset[Hit].toDF()
    val statsMap = stats.map(s => (s.field, s.term) -> (s.idf, s.avgdl)).toMap
    val k1 = bm25.k1; val b = bm25.b; val kk = k

    def runShardGroups(
        rows: Iterable[(String, String, Int, Long, Array[Byte], Array[Byte])],
        tomb: Map[Long, Int], heap: BoundedHitHeap): Unit =
      rows.groupBy(_._4).toSeq.sortBy(_._1).foreach { case (_, group) =>
        val cursors = group.toSeq
          .flatMap { case (f, t, seg, _, blocks, blob) =>
            statsMap.get((f, t)).map { case (idf, avgdl) =>
              new TermCursor(f, t, seg, idf, avgdl, k1, b,
                new PostingCodec.Cursor(blob, PostingCodec.decodeBlocks(blocks)))
            }
          }
          .sortBy(c => (c.field, c.term, c.seg)).toArray
        if (cursors.nonEmpty) WandExecutor.runWand(cursors, tomb, heap)
      }

    // ~8 bytes/posting is conservative for the varint triplets + block meta
    val estBytes = stats.map(_.df).sum * 8
    if (estBytes <= engine.store.cfg.driverWandMaxBytes) {
      // blob rows come from the engine's LRU — a warm repeat query runs
      // zero Spark jobs, mirroring the reference's resident-index serving.
      // heap.result() is already (score desc, doc_id asc)-sorted and ≤ k,
      // so the result is a plain LocalRelation (collect needs no job).
      val heap = new BoundedHitHeap(kk)
      runShardGroups(engine.fetchShardRows(matched), engine.cachedTombstones(), heap)
      heap.result().toDF("doc_id", "score")
    } else {
      val shardRows = engine.matchedShards(matched)
        .select($"field", $"term", $"seg", $"shard", $"blocks", $"blob")
        .as[(String, String, Int, Long, Array[Byte], Array[Byte])]
      val statsB = spark.sparkContext.broadcast(statsMap)
      val tombB = spark.sparkContext.broadcast(engine.cachedTombstones())
      // Hash-exchange on shard colocates each docId range's term lists, then
      // a partition-local sort on shard lets the task STREAM one shard group
      // at a time (the same group-walk pattern as ShardEncoder): task memory
      // is one shard's matched rows (≤ |matched| × |segments|), never the
      // whole shuffle partition — a hot term's partition at 100× scale would
      // otherwise hold hundreds of MB of blobs as JVM objects.
      val partials = shardRows
        .repartition(col("shard"))
        .sortWithinPartitions("shard")
        .mapPartitions { rows =>
          val st = statsB.value
          val tomb = tombB.value
          val heap = new BoundedHitHeap(kk)
          val group = new scala.collection.mutable.ArrayBuffer[
            (String, String, Int, Long, Array[Byte], Array[Byte])]()
          var curShard = Long.MinValue
          def flush(): Unit = if (group.nonEmpty) {
            val cursors = group.iterator.flatMap { case (f, t, seg, _, blocks, blob) =>
              st.get((f, t)).map { case (idf, avgdl) =>
                new TermCursor(f, t, seg, idf, avgdl, k1, b,
                  new PostingCodec.Cursor(blob, PostingCodec.decodeBlocks(blocks)))
              }
            }.toArray.sortBy(c => (c.field, c.term, c.seg))
            if (cursors.nonEmpty) WandExecutor.runWand(cursors, tomb, heap)
            group.clear()
          }
          rows.foreach { r =>
            if (r._4 != curShard) { flush(); curShard = r._4 }
            group += r
          }
          flush()
          heap.result().iterator
        }.toDF("doc_id", "score")
      partials.orderBy(desc("score"), asc("doc_id")).limit(k)
    }
  }
}

private[search] object WandExecutor {

  /** Block-max WAND main loop over one shard's cursors. Static so the
    * mapPartitions closure never captures the SparkSession. */
  def runWand(cursors: Array[TermCursor], tomb: Map[Long, Int],
              heap: BoundedHitHeap): Unit = {
    cursors.foreach(_.init())
    val order: Array[TermCursor] = cursors.filter(!_.exhausted)
    if (order.isEmpty) return
    var continue = true
    while (continue) {
      java.util.Arrays.sort(order, (a: TermCursor, c: TermCursor) =>
        java.lang.Long.compare(a.docId, c.docId))
      val theta = heap.threshold
      // pivot: smallest prefix whose summed global upper bounds exceed θ.
      // globalUB is a STRICT upper bound (tf-norm < k1+1), so score==θ docs
      // are never pruned here — exact ties stay eligible for the docId
      // tiebreak.
      var acc = 0.0
      var pivotIdx = -1
      var i = 0
      while (i < order.length && pivotIdx < 0) {
        if (!order(i).exhausted) {
          acc += order(i).globalUB
          if (acc > theta) pivotIdx = i
        }
        i += 1
      }
      if (pivotIdx < 0 || order(pivotIdx).exhausted) {
        continue = false
      } else {
        val pivotDoc = order(pivotIdx).docId
        // Block-max refinement over ALL cursors that could contribute to
        // pivotDoc (including equal-docId cursors beyond the pivot index),
        // using shallow pointers into block metadata — nothing is decoded.
        // Strict <: block bounds are attainable, and an exactly-tied doc
        // with smaller docId must still be evaluated for the tiebreak.
        var blockUB = 0.0
        var j = 0
        while (j < order.length) {
          if (!order(j).exhausted && order(j).docId <= pivotDoc)
            blockUB += order(j).shallowUB(pivotDoc)
          j += 1
        }
        if (blockUB < theta) {
          // pivotDoc cannot enter the heap; docs < pivotDoc were already
          // excluded by the pivot invariant — skip everything ≤ pivotDoc.
          // advanceTo skips at block granularity internally.
          var n = 0
          while (n < order.length) {
            if (!order(n).exhausted && order(n).docId <= pivotDoc)
              order(n).advanceTo(pivotDoc + 1)
            n += 1
          }
        } else if (order(0).docId == pivotDoc) {
          // full evaluation: sum live contributions in stable cursor order
          var score = 0.0
          var anyLive = false
          var e = 0
          while (e < cursors.length) {
            val c = cursors(e)
            if (!c.exhausted && c.docId == pivotDoc) {
              val deleted = tomb.get(pivotDoc).exists(c.seg <= _)
              if (!deleted) { score += c.contribution; anyLive = true }
            }
            e += 1
          }
          if (anyLive) heap.offer(pivotDoc, score)
          var e2 = 0
          while (e2 < cursors.length) {
            val c = cursors(e2)
            if (!c.exhausted && c.docId == pivotDoc) c.advanceTo(pivotDoc + 1)
            e2 += 1
          }
        } else {
          // advance the highest-UB cursor positioned before the pivot
          var best = -1
          var bestUB = -1.0
          var m = 0
          while (m < pivotIdx) {
            if (!order(m).exhausted && order(m).docId < pivotDoc && order(m).globalUB > bestUB) {
              best = m; bestUB = order(m).globalUB
            }
            m += 1
          }
          if (best < 0) best = 0
          order(best).advanceTo(pivotDoc)
        }
        if (order.forall(_.exhausted)) continue = false
      }
    }
  }
}

/** One query term's posting cursor with BM25 bounds. */
private[search] final class TermCursor(
    val field: String, val term: String, val seg: Int,
    idf: Double, avgdl: Double, k1: Double, b: Double,
    val cursor: PostingCodec.Cursor) {

  def init(): Unit = { cursor.next(); () }
  def exhausted: Boolean = cursor.isExhausted
  def docId: Long = cursor.docId
  def advanceTo(target: Long): Boolean = cursor.advanceTo(target)

  /** tf-normalization is strictly < (k1+1), so idf·(k1+1) is a strict upper
    * bound on any contribution. */
  val globalUB: Double = idf * (k1 + 1.0)

  /** Tight bound on this cursor's contribution to `target`, from the
    * (maxTf, minDl) metadata of the block that would contain it; 0 when the
    * list provably lacks `target`. Valid because tf/(tf+c) is increasing in
    * tf and decreasing in dl. */
  def shallowUB(target: Long): Double =
    cursor.blockFor(target) match {
      case None => 0.0
      case Some(blk) =>
        val tf = blk.maxTf.toDouble
        val dl = blk.minDl.toDouble
        idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
    }

  def contribution: Double = {
    val tf = cursor.tf.toDouble
    val dl = cursor.dl.toDouble
    idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
  }
}

/** Bounded min-heap of (doc_id, score) — keeps the k best under the order
  * (score desc, doc_id asc). */
private[search] final class BoundedHitHeap(k: Int) {
  // Ordering by (-score, docId) ascending = best-first; PriorityQueue
  // dequeues the MAX under it = the worst kept hit, which is the evictee.
  private val ord = Ordering.by[(Long, Double), (Double, Long)] {
    case (d, s) => (-s, d)
  }
  private val pq = scala.collection.mutable.PriorityQueue.empty[(Long, Double)](ord)

  /** Current pruning threshold θ: worst kept score once full, else 0. */
  def threshold: Double = if (pq.size < k) 0.0 else pq.head._2

  def offer(docId: Long, score: Double): Unit = {
    if (k <= 0) return
    if (pq.size < k) pq.enqueue((docId, score))
    else {
      val worst = pq.head
      if (score > worst._2 || (score == worst._2 && docId < worst._1)) {
        pq.dequeue(); pq.enqueue((docId, score))
      }
    }
  }

  def result(): Seq[(Long, Double)] = pq.toSeq.sortBy { case (d, s) => (-s, d) }
}
