package graft.index

import scala.collection.mutable.ArrayBuffer

/** Delta + varint codec for docId-sorted posting lists, with block-max
  * metadata for WAND pruning (SURVEY.md §7.2 M2).
  *
  * The reference keeps postings as insertion-ordered string-keyed map entries
  * (`"tfScore#docID"` → docLen, reference: indexing.go:130-139) — pointer-heavy
  * and uncompressed. The rebuild packs each (term, shard) posting run into a
  * single binary blob:
  *
  *   blob   = repeat( varint(docId - prevDocId), varint(tf), varint(dl) )
  *   blocks = repeat( varint(firstDocId - prevFirst), varint(lastDocId - firstDocId),
  *                    varint(maxTf), varint(minDl), varint(byteOffsetDelta),
  *                    varint(count) )                       // one per ≤128 postings
  *
  * docId-sorted delta encoding makes intersections and WAND skipping cheap and
  * gives ~1 byte/posting for dense lists; block metadata stores (maxTf, minDl)
  * rather than a precomputed max *score* so the BM25 upper bound can be formed
  * with the live avgdl at query time (tf/(tf+c) is increasing in tf and
  * decreasing in dl, so (maxTf, minDl) dominates every posting in the block).
  */
object PostingCodec {

  val BlockSize = 128

  final case class BlockMeta(
      firstDocId: Long,
      lastDocId: Long,
      maxTf: Int,
      minDl: Int,
      offset: Int, // byte offset of the block's first posting in the blob
      count: Int
  )

  // ---- varint primitives (unsigned LEB128) ----

  @inline def writeVarint(buf: ArrayBuffer[Byte], value: Long): Unit = {
    var v = value
    require(v >= 0, s"varint requires non-negative value, got $v")
    while ((v & ~0x7fL) != 0) {
      buf += ((v & 0x7f) | 0x80).toByte
      v >>>= 7
    }
    buf += v.toByte
  }

  /** Reads one varint starting at `pos(0)`; advances `pos(0)`. */
  @inline def readVarint(bytes: Array[Byte], pos: Array[Int]): Long = {
    var result = 0L
    var shift = 0
    var i = pos(0)
    var b = 0
    do {
      b = bytes(i) & 0xff
      result |= (b & 0x7fL) << shift
      shift += 7
      i += 1
    } while ((b & 0x80) != 0)
    pos(0) = i
    result
  }

  // ---- encode ----

  /** Encodes docId-sorted (docId, tf, dl) triplets.
    * @return (blockMetaBytes, blobBytes) */
  def encode(postings: Array[(Long, Int, Int)]): (Array[Byte], Array[Byte]) = {
    val blob = new ArrayBuffer[Byte](postings.length * 4)
    val blocks = new ArrayBuffer[Byte](postings.length / BlockSize * 8 + 16)
    var prevDoc = 0L
    var prevBlockFirst = 0L
    var prevOffset = 0
    var first = true
    var i = 0
    while (i < postings.length) {
      val blockEnd = math.min(i + BlockSize, postings.length)
      val blockOffset = blob.length
      val firstDoc = postings(i)._1
      var maxTf = 0
      var minDl = Int.MaxValue
      var j = i
      while (j < blockEnd) {
        val (d, tf, dl) = postings(j)
        require(if (first) d >= 0 else d > prevDoc,
          s"postings must be strictly docId-sorted: $d after $prevDoc")
        first = false
        writeVarint(blob, d - prevDoc)
        writeVarint(blob, tf.toLong)
        writeVarint(blob, dl.toLong)
        prevDoc = d
        if (tf > maxTf) maxTf = tf
        if (dl < minDl) minDl = dl
        j += 1
      }
      writeVarint(blocks, firstDoc - prevBlockFirst)
      writeVarint(blocks, prevDoc - firstDoc) // lastDocId delta
      writeVarint(blocks, maxTf.toLong)
      writeVarint(blocks, minDl.toLong)
      writeVarint(blocks, (blockOffset - prevOffset).toLong)
      writeVarint(blocks, (blockEnd - i).toLong)
      prevBlockFirst = firstDoc
      prevOffset = blockOffset
      i = blockEnd
    }
    (blocks.toArray, blob.toArray)
  }

  // ---- decode ----

  def decodeBlocks(blocks: Array[Byte]): Array[BlockMeta] = {
    val out = new ArrayBuffer[BlockMeta]()
    val pos = Array(0)
    var prevFirst = 0L
    var prevOffset = 0
    while (pos(0) < blocks.length) {
      val first = prevFirst + readVarint(blocks, pos)
      val last = first + readVarint(blocks, pos)
      val maxTf = readVarint(blocks, pos).toInt
      val minDl = readVarint(blocks, pos).toInt
      val offset = prevOffset + readVarint(blocks, pos).toInt
      val count = readVarint(blocks, pos).toInt
      out += BlockMeta(first, last, maxTf, minDl, offset, count)
      prevFirst = first
      prevOffset = offset
    }
    out.toArray
  }

  /** Full sequential decode (exhaustive scoring path / tests). */
  def decodeAll(blob: Array[Byte]): Array[(Long, Int, Int)] = {
    val out = new ArrayBuffer[(Long, Int, Int)]()
    val pos = Array(0)
    var prevDoc = 0L
    while (pos(0) < blob.length) {
      val d = prevDoc + readVarint(blob, pos)
      val tf = readVarint(blob, pos).toInt
      val dl = readVarint(blob, pos).toInt
      out += ((d, tf, dl))
      prevDoc = d
    }
    out.toArray
  }

  /** Block-skipping cursor over one encoded posting list — the WAND driver.
    * Supports `advanceTo(docId)`: first seeks at block granularity using the
    * block metadata (decoding nothing), then decodes within the target block.
    */
  final class Cursor(blob: Array[Byte], blockMeta: Array[BlockMeta]) {
    private var blockIdx = 0
    private var inBlock = 0 // postings consumed in current block
    private val pos = Array(0)
    private var prevDoc = 0L
    private var curDoc = -1L
    private var curTf = 0
    private var curDl = 0
    private var exhausted = blockMeta.isEmpty

    if (!exhausted) loadBlock(0)

    private def loadBlock(bi: Int): Unit = {
      blockIdx = bi
      inBlock = 0
      pos(0) = blockMeta(bi).offset
      // deltas within the blob are global (relative to previous posting even
      // across blocks); the block's firstDocId lets us re-seed the prefix sum:
      // the first delta in a block is (firstDocId - lastDocIdOfPrevBlock), so
      // seed prevDoc with the previous block's lastDocId.
      prevDoc = if (bi == 0) 0L else blockMeta(bi - 1).lastDocId
    }

    /** Advances to the next posting; returns false when exhausted. */
    def next(): Boolean = {
      if (exhausted) return false
      if (inBlock >= blockMeta(blockIdx).count) {
        if (blockIdx + 1 >= blockMeta.length) { exhausted = true; curDoc = Long.MaxValue; return false }
        loadBlock(blockIdx + 1)
      }
      curDoc = prevDoc + readVarint(blob, pos)
      curTf = readVarint(blob, pos).toInt
      curDl = readVarint(blob, pos).toInt
      prevDoc = curDoc
      inBlock += 1
      true
    }

    /** Positions the cursor at the first posting with docId >= target.
      * Returns false if no such posting exists. Requires the cursor to have
      * been advanced at least once (call next() first). */
    def advanceTo(target: Long): Boolean = {
      if (exhausted) return false
      if (curDoc >= target) return true
      // block-level skip
      if (blockMeta(blockIdx).lastDocId < target) {
        var bi = blockIdx + 1
        while (bi < blockMeta.length && blockMeta(bi).lastDocId < target) bi += 1
        if (bi >= blockMeta.length) { exhausted = true; curDoc = Long.MaxValue; return false }
        loadBlock(bi)
        if (!next()) return false
      }
      while (curDoc < target) if (!next()) return false
      true
    }

    def docId: Long = curDoc
    def tf: Int = curTf
    def dl: Int = curDl
    def isExhausted: Boolean = exhausted
    def currentBlock: BlockMeta = blockMeta(blockIdx)

    /** Max docId of the current block (WAND shallow-advance bound). */
    def blockLastDocId: Long =
      if (exhausted) Long.MaxValue else blockMeta(blockIdx).lastDocId

    /** Shallow pointer: the block that could contain `target` (searched from
      * the current block forward, metadata only — nothing is decoded).
      * None if `target` cannot appear at or after the cursor position. */
    def blockFor(target: Long): Option[BlockMeta] = {
      if (exhausted) return None
      var bi = blockIdx
      while (bi < blockMeta.length && blockMeta(bi).lastDocId < target) bi += 1
      if (bi >= blockMeta.length) None
      else if (blockMeta(bi).firstDocId > target) None // gap: target absent
      else Some(blockMeta(bi))
    }

    /** Allocation-free shallow pointer (the WAND inner loop calls this once
      * per refinement per cursor — an Option per call was measurable):
      * index of the first not-yet-passed block whose lastDocId ≥ `target`,
      * or -1 when `target` falls past every remaining block. Unlike
      * [[blockFor]] the GAP case (block.firstDocId > target) still returns
      * the index — the caller reads the boundary fields to distinguish it. */
    def blockIndexFor(target: Long): Int = {
      if (exhausted) return -1
      var bi = blockIdx
      while (bi < blockMeta.length && blockMeta(bi).lastDocId < target) bi += 1
      if (bi >= blockMeta.length) -1 else bi
    }

    def blockFirstDocId(bi: Int): Long = blockMeta(bi).firstDocId
    def blockLastDocIdAt(bi: Int): Long = blockMeta(bi).lastDocId
    def blockMaxTf(bi: Int): Int = blockMeta(bi).maxTf
    def blockMinDl(bi: Int): Int = blockMeta(bi).minDl
  }
}
