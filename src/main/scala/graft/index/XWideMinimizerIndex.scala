package graft.index

import org.apache.spark.broadcast.Broadcast
import graft.kmers.{XWidePriority, XWideScanner}
import graft.taxa.Taxonomy

/** Extra-wide minimizer index (m in [65, 128]): records carry
  * `idLongs = ceil(m/32)` key columns (id1..id3 or id1..id4) — the
  * reference's column scheme at widths 3 and 4 (behavioral spec: reference
  * kmers/KmerKeyedIndex.scala:27-55; the arity-matched emission mirrors
  * reference slacken/Minimizers.scala:44-75, which switches on numIdColumns
  * the same way). The whole Dataset-level pipeline lives in
  * [[LongKeyIndex]]; this class contributes the n-word scanner kernel and
  * the flattened n-long broadcast table. */
final class XWideMinimizerIndex(k: Int, m: Int,
    override val bcTax: Broadcast[Taxonomy],
    spaces: Int = 0, demoted: Array[Long] = Array.emptyLongArray)
    extends LongKeyIndex {

  val scanner = new XWideScanner(k,
    new XWidePriority(m, spaces = spaces, demoted = demoted))

  /** 3 for m in [65, 96], 4 for [97, 128]. */
  val idLongs: Int = scanner.words

  override def words: Int = idLongs

  override def kOf: Int = k

  override def scanKeyed(segment: CharSequence): Iterator[KeyedSupermer] =
    scanner.scan(segment).map { sm =>
      KeyedSupermer(sm.ids(0), sm.ids(1), sm.start, sm.kmers,
        k3 = sm.ids(2), k4 = if (idLongs == 4) sm.ids(3) else 0L)
    }

  override protected def buildTable(flat: Array[Long], taxa: Array[Int])
      : KeyTaxonTable = XWideTaxonMap(flat, taxa, idLongs)

  override protected def sidecarParams(buckets: Int): IndexParams =
    IndexParams(k = k, m = m, spaces = spaces, buckets = buckets,
      demoted = if (demoted.isEmpty) None else Some(demoted))
}

/** Open-addressing n-long-key -> taxon table for the extra-wide in-memory
  * path: flattened key words (keys(i*n .. i*n+n-1)), explicit used[] — the
  * [[WideTaxonMap]] design at idLongs 3 and 4. Lookups take the four
  * normalized words (id4 = 0 at n = 3, which round-trips because build
  * stores the same padding). */
final class XWideTaxonMap private (used: Array[Boolean], keys: Array[Long],
    vals: Array[Int], n: Int) extends KeyTaxonTable {

  @inline def get(a: Long, b: Long, c: Long, d: Long): Int = {
    val cap = used.length
    var i = XWideTaxonMap.hash4(a, b, c, d, n) & (cap - 1)
    while (true) {
      if (!used(i)) return Taxonomy.NONE
      if (XWideTaxonMap.same(keys, i * n, a, b, c, d, n)) return vals(i)
      i = (i + 1) & (cap - 1)
    }
    Taxonomy.NONE
  }

  /** Measured footprint: used + n key words + taxon per slot, plus
    * headers. */
  def byteSize: Long = (1L + 8L * n + 4L) * used.length + (n + 2) * 16L
}

object XWideTaxonMap {
  /** ONE hash and ONE key-equality definition shared by build and probe —
    * a divergence between the two would make every lookup miss. */
  @inline private def hash4(a: Long, b: Long, c: Long, d: Long, n: Int): Int = {
    var h = (a * 0x9e3779b97f4a7c15L) ^ (b * 0xbf58476d1ce4e5b9L)
    h = (h * 0x9e3779b97f4a7c15L) ^ (c * 0xbf58476d1ce4e5b9L)
    if (n == 4) h = (h * 0x9e3779b97f4a7c15L) ^ (d * 0xbf58476d1ce4e5b9L)
    java.lang.Long.hashCode(h)
  }

  @inline private def same(keys: Array[Long], o: Int, a: Long, b: Long,
      c: Long, d: Long, n: Int): Boolean =
    keys(o) == a && keys(o + 1) == b && keys(o + 2) == c &&
      (n == 3 || keys(o + 3) == d)

  /** Build from flattened keys (rows*n words) and per-row taxa. */
  def apply(flat: Array[Long], taxa: Array[Int], n: Int): XWideTaxonMap = {
    require(n == 3 || n == 4, s"idLongs must be 3 or 4, got $n")
    val rows = taxa.length
    val cap = LongTaxonMap.capacityFor(rows)
    val used = new Array[Boolean](cap)
    val keys = new Array[Long](cap * n)
    val vals = new Array[Int](cap)
    var r = 0
    while (r < rows) {
      val a = flat(r * n); val b = flat(r * n + 1); val c = flat(r * n + 2)
      val d = if (n == 4) flat(r * n + 3) else 0L
      var i = hash4(a, b, c, d, n) & (cap - 1)
      while (used(i) && !same(keys, i * n, a, b, c, d, n))
        i = (i + 1) & (cap - 1)
      used(i) = true
      System.arraycopy(flat, r * n, keys, i * n, n)
      vals(i) = taxa(r)
      r += 1
    }
    new XWideTaxonMap(used, keys, vals, n)
  }
}
