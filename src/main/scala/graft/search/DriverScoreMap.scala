package graft.search

/** Open-addressing docId → (score, termMask) accumulator for the driver
  * fast paths. Parallel primitive arrays (no boxing, no per-entry objects):
  * the driver-exhaustive path touches one entry per posting of a hot term's
  * list, so a Scala HashMap's Long/Double boxing dominated its runtime.
  *
  * Keys are non-negative docIds; EMPTY = -1. Linear probing, ×2 growth at
  * 0.7 load. `mask` tracks which query-term bits contributed (AND mode,
  * ≤ 64 terms — wider AND queries use the distributed plan instead).
  */
private[graft] final class DriverScoreMap(initialCapacity: Int = 1 << 12) {
  private var cap = Integer.highestOneBit(math.max(initialCapacity, 16) * 2 - 1)
  private var keys = Array.fill[Long](cap)(-1L)
  private var scores = new Array[Double](cap)
  private var masks = new Array[Long](cap)
  private var n = 0

  @inline private def idx(key: Long, c: Int): Int =
    // Stafford mix13 finalizer — docIds are often sequential, spread them
    (java.lang.Long.hashCode(
      (key ^ (key >>> 31)) * 0x7fb5d329728ea185L) & (c - 1))

  def add(key: Long, delta: Double, bit: Long): Unit = {
    var i = idx(key, cap)
    while (true) {
      val k = keys(i)
      if (k == key) {
        scores(i) += delta; masks(i) |= bit; return
      } else if (k == -1L) {
        keys(i) = key; scores(i) = delta; masks(i) = bit
        n += 1
        if (n * 10 > cap * 7) grow()
        return
      } else i = (i + 1) & (cap - 1)
    }
  }

  private def grow(): Unit = {
    val oldKeys = keys; val oldScores = scores; val oldMasks = masks
    cap <<= 1
    keys = Array.fill[Long](cap)(-1L)
    scores = new Array[Double](cap)
    masks = new Array[Long](cap)
    var i = 0
    while (i < oldKeys.length) {
      val k = oldKeys(i)
      if (k != -1L) {
        var j = idx(k, cap)
        while (keys(j) != -1L) j = (j + 1) & (cap - 1)
        keys(j) = k; scores(j) = oldScores(i); masks(j) = oldMasks(i)
      }
      i += 1
    }
  }

  def size: Int = n

  /** Visits every live entry. */
  def foreach(f: (Long, Double, Long) => Unit): Unit = {
    var i = 0
    while (i < cap) {
      if (keys(i) != -1L) f(keys(i), scores(i), masks(i))
      i += 1
    }
  }
}
