package graft.index

import graft.taxa.Taxonomy

/** Broadcastable minimizer -> LCA-taxon lookup tables for the in-memory
  * classification path (see [[MinimizerIndex.classifyInMemory]]).
  *
  * Open addressing over plain arrays: ~13 bytes/record narrow, ~21 wide, at
  * load factor <= 0.5 — a 50M-record index broadcasts at well under 2 GB.
  * An explicit used[] bitmap instead of a key sentinel: minimizer priorities
  * span the full Long range (0 and -1 are both legal keys).
  */
final class LongTaxonMap private (used: Array[Boolean], keys: Array[Long],
    vals: Array[Int]) extends KeyTaxonTable {

  /** Width-normalized probe ([[KeyTaxonTable]]): only the first word is a
    * key at width 1. */
  @inline override def get(a: Long, b: Long, c: Long, d: Long): Int = get(a)

  @inline def get(key: Long): Int = {
    val cap = keys.length
    var i = java.lang.Long.hashCode(key * 0x9e3779b97f4a7c15L) & (cap - 1)
    while (true) {
      if (!used(i)) return Taxonomy.NONE
      if (keys(i) == key) return vals(i)
      i = (i + 1) & (cap - 1)
    }
    Taxonomy.NONE
  }
  def size: Int = used.count(identity)

  /** Measured table footprint: the three backing arrays (1 + 8 + 4
    * bytes/slot) plus array headers — the number the CLI reports so the
    * record-count auto-pick heuristic is observable memory accounting. */
  def byteSize: Long = 13L * keys.length + 3 * 16
}

object LongTaxonMap {
  /** Power-of-2 capacity >= 2n, computed in Long then bounded: beyond 2^28
    * records the table alone is multiple GB and the arithmetic would
    * overflow Int — fail loudly toward the join path instead. */
  private[index] def capacityFor(n: Int): Int = {
    require(n <= (1 << 28),
      s"in-memory classification table too large ($n records) — " +
        "use the bucketed-join classify path for indexes this size")
    java.lang.Long.highestOneBit(math.max(16L, n.toLong * 2) * 2).toInt
  }

  /** Predicted table bytes for a record count (the same capacity rule as
    * the real build), BEFORE anything is collected — lets the CLI auto-pick
    * log a memory figure from the build-stamped record count alone.
    * Returns None when the count exceeds the hard table bound. */
  def estimatedBytes(records: Long, wide: Boolean): Option[Long] =
    if (records > (1 << 28)) None
    else {
      val cap = java.lang.Long.highestOneBit(math.max(16L, records * 2) * 2)
      Some(cap * (if (wide) 21L else 13L) + (if (wide) 4 else 3) * 16L)
    }

  def apply(kv: Array[(Long, Int)]): LongTaxonMap = {
    val cap = capacityFor(kv.length)
    val used = new Array[Boolean](cap)
    val keys = new Array[Long](cap)
    val vals = new Array[Int](cap)
    for ((k, v) <- kv) {
      var i = java.lang.Long.hashCode(k * 0x9e3779b97f4a7c15L) & (cap - 1)
      while (used(i) && keys(i) != k) i = (i + 1) & (cap - 1)
      used(i) = true; keys(i) = k; vals(i) = v
    }
    new LongTaxonMap(used, keys, vals)
  }
}

/** Two-long-key variant for wide (m > 32) indexes. */
final class WideTaxonMap private (used: Array[Boolean], keysHi: Array[Long],
    keysLo: Array[Long], vals: Array[Int]) extends KeyTaxonTable {

  /** Width-normalized probe ([[KeyTaxonTable]]): two key words at width 2. */
  @inline override def get(a: Long, b: Long, c: Long, d: Long): Int = get(a, b)

  @inline def get(hi: Long, lo: Long): Int = {
    val cap = keysHi.length
    var i = java.lang.Long.hashCode(
      (hi * 0x9e3779b97f4a7c15L) ^ (lo * 0xbf58476d1ce4e5b9L)) & (cap - 1)
    while (true) {
      if (!used(i)) return Taxonomy.NONE
      if (keysHi(i) == hi && keysLo(i) == lo) return vals(i)
      i = (i + 1) & (cap - 1)
    }
    Taxonomy.NONE
  }

  /** Measured footprint: four backing arrays (1 + 8 + 8 + 4 bytes/slot)
    * plus headers — see [[LongTaxonMap.byteSize]]. */
  def byteSize: Long = 21L * keysHi.length + 4 * 16
}

object WideTaxonMap {
  def apply(kv: Array[(Long, Long, Int)]): WideTaxonMap = {
    val cap = LongTaxonMap.capacityFor(kv.length)
    val used = new Array[Boolean](cap)
    val keysHi = new Array[Long](cap)
    val keysLo = new Array[Long](cap)
    val vals = new Array[Int](cap)
    for ((h, l, v) <- kv) {
      var i = java.lang.Long.hashCode(
        (h * 0x9e3779b97f4a7c15L) ^ (l * 0xbf58476d1ce4e5b9L)) & (cap - 1)
      while (used(i) && !(keysHi(i) == h && keysLo(i) == l)) i = (i + 1) & (cap - 1)
      used(i) = true; keysHi(i) = h; keysLo(i) = l; vals(i) = v
    }
    new WideTaxonMap(used, keysHi, keysLo, vals)
  }
}
