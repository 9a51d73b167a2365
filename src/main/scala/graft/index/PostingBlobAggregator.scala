package graft.index

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable.ArrayBuffer

/** Input row for the posting-blob aggregation: one (doc, tf, dl) occurrence
  * of the grouping key (field, term, shard). */
final case class PostingIn(doc_id: Long, tf: Int, dl: Int)

/** Aggregation result: the encoded shard-local posting list. `sum_tf` lets
  * per-field total token counts (avgdl) be derived from the shard table
  * without decoding blobs. */
final case class EncodedPostings(
    count: Long,
    sum_tf: Long,
    max_tf: Int,
    blocks: Array[Byte],
    blob: Array[Byte]
)

/** Typed `Aggregator` that turns the (doc_id, tf, dl) rows of one
  * (field, term, shard) group into a delta+varint compressed posting blob
  * with block-max metadata (SURVEY.md §7.2 M2, §7.3).
  *
  * Registered via `functions.udaf` so it participates in the relational
  * `groupBy(field, term, shard).agg(...)` plan — Catalyst runs it as a
  * partial+final aggregate: partial buffers accumulate map-side, merge
  * happens after the single shuffle on the grouping key, and `finish`
  * sorts by docId exactly once per group. Sorting in `finish` (rather than
  * keeping buffers sorted) keeps reduce() O(1) per row.
  *
  * This replaces the reference's per-insert radix-tree + OrderedMap upsert
  * (indexing.go:731-762) with a batch-oriented, shuffle-friendly build.
  */
object PostingBlobAggregator
    extends Aggregator[PostingIn, ArrayBuffer[PostingIn], EncodedPostings] {

  override def zero: ArrayBuffer[PostingIn] = ArrayBuffer.empty

  override def reduce(b: ArrayBuffer[PostingIn], a: PostingIn): ArrayBuffer[PostingIn] = {
    b += a; b
  }

  override def merge(b1: ArrayBuffer[PostingIn], b2: ArrayBuffer[PostingIn]): ArrayBuffer[PostingIn] = {
    b1 ++= b2; b1
  }

  override def finish(buf: ArrayBuffer[PostingIn]): EncodedPostings = {
    val arr = buf.toArray
    java.util.Arrays.sort(arr, (x: PostingIn, y: PostingIn) => java.lang.Long.compare(x.doc_id, y.doc_id))
    val triplets = new Array[(Long, Int, Int)](arr.length)
    var i = 0
    var maxTf = 0
    var sumTf = 0L
    while (i < arr.length) {
      val p = arr(i)
      triplets(i) = (p.doc_id, p.tf, p.dl)
      if (p.tf > maxTf) maxTf = p.tf
      sumTf += p.tf
      i += 1
    }
    val (blocks, blob) = PostingCodec.encode(triplets)
    EncodedPostings(arr.length.toLong, sumTf, maxTf, blocks, blob)
  }

  override def bufferEncoder: Encoder[ArrayBuffer[PostingIn]] =
    Encoders.kryo[ArrayBuffer[PostingIn]]

  override def outputEncoder: Encoder[EncodedPostings] =
    Encoders.product[EncodedPostings]
}
