package graft.kmers

import scala.collection.mutable.ArrayBuffer

/** Wide-minimizer kernel: m in [33, 64], minimizers packed as two longs
  * (hi = first m-32 bases, lo = last 32). The m<=32 single-Long scanner
  * remains the fast specialization (the reference specializes by key width
  * the same way, kmers/util/KmerTable.scala:337-486); this path completes
  * the parameter space. Priorities compare as unsigned (hi, lo) pairs.
  */
final case class WideSupermer(minHi: Long, minLo: Long, start: Int, kmers: Int)

/** Canonical XOR ordering over two-long m-mers (Kraken 2 mask replicated on
  * both words, truncated to the populated bits of hi). */
final class WideRandomXorPriority(val width: Int,
    xorMask: Long = RandomXorPriority.DEFAULT_MASK,
    val canonical: Boolean = true) extends Serializable {
  require(width >= 33 && width <= 64, s"wide width must be in [33,64], got $width")

  val hiBases: Int = width - 32
  val hiMask: Long = Dna.merMask(hiBases)
  private val maskHi = xorMask & hiMask
  private val maskLo = xorMask

  /** Priority of the m-mer (hi, lo): canonicalize then XOR. Returns via the
    * 2-element out array to avoid allocation in the scan loop. */
  def priorityOf(hi: Long, lo: Long, out: Array[Long]): Unit = {
    var h = hi; var l = lo
    if (canonical) {
      val (ch, cl) = WideRandomXorPriority.rc(h, l, hiBases)
      if (WideRandomXorPriority.unsignedLess(ch, cl, h, l)) { h = ch; l = cl }
    }
    out(0) = (h ^ maskHi) & hiMask
    out(1) = l ^ maskLo
  }
}

object WideRandomXorPriority {
  /** Reverse complement of a two-long packed mer with hiBases bases in hi. */
  def rc(hi: Long, lo: Long, hiBases: Int): (Long, Long) = {
    val loBases = 32
    val rcLo = Dna.reverseComplement(lo, loBases) // becomes the leading part
    val rcHi = if (hiBases > 0) Dna.reverseComplement(hi, hiBases) else 0L
    // rc(mer) = rc(lo) ++ rc(hi): repack into (hiBases, 32) split
    var nh = 0L; var nl = 0L
    var idx = 0
    val total = hiBases + 32
    def baseAt(pos: Int): Long =
      if (pos < loBases) (rcLo >>> (2 * (loBases - 1 - pos))) & 3L
      else (rcHi >>> (2 * (hiBases - 1 - (pos - loBases)))) & 3L
    while (idx < hiBases) { nh = (nh << 2) | baseAt(idx); idx += 1 }
    while (idx < total) { nl = (nl << 2) | baseAt(idx); idx += 1 }
    (nh, nl)
  }

  @inline def unsignedLess(h1: Long, l1: Long, h2: Long, l2: Long): Boolean = {
    val c = java.lang.Long.compareUnsigned(h1, h2)
    c < 0 || (c == 0 && java.lang.Long.compareUnsigned(l1, l2) < 0)
  }
}

/** Super-mer extraction for wide minimizers: same rolling-scan + monotonic
  * deque structure as the narrow scanner, with two-word mer state and
  * pairwise unsigned priority comparison. */
final class WideSupermerScanner(val k: Int, val priority: WideRandomXorPriority)
    extends Serializable {
  require(k >= priority.width, s"k=$k must be >= m=${priority.width}")
  val m: Int = priority.width

  def scan(segment: CharSequence): Iterator[WideSupermer] = {
    val L = segment.length
    if (L < k) return Iterator.empty
    val out = new ArrayBuffer[WideSupermer](2 * L / math.max(1, k - m + 1) + 2)

    val hiBases = m - 32
    val hiMask = Dna.merMask(hiBases)
    val window = k - m + 1
    val cap = window + 1
    val posRing = new Array[Int](cap)
    val priHiRing = new Array[Long](cap)
    val priLoRing = new Array[Long](cap)
    var head = 0
    var tail = 0

    var merHi = 0L
    var merLo = 0L
    val pri = new Array[Long](2)
    var curHi = 0L; var curLo = 0L
    var curStart = 0
    var curKmers = 0
    var i = 0
    while (i < L) {
      // two-word rolling push
      merHi = ((merHi << 2) | (merLo >>> 62)) & hiMask
      merLo = (merLo << 2) | Dna.code(segment.charAt(i))
      if (i >= m - 1) {
        priority.priorityOf(merHi, merLo, pri)
        while (tail != head && {
          val prev = (tail + cap - 1) % cap
          WideRandomXorPriority.unsignedLess(pri(0), pri(1),
            priHiRing(prev), priLoRing(prev))
        }) tail = (tail + cap - 1) % cap
        posRing(tail) = i; priHiRing(tail) = pri(0); priLoRing(tail) = pri(1)
        tail = (tail + 1) % cap
        if (i >= k - 1) {
          while (posRing(head) < i - (k - m)) head = (head + 1) % cap
          val minHi = priHiRing(head); val minLo = priLoRing(head)
          val kmerIdx = i - (k - 1)
          if (curKmers == 0) {
            curHi = minHi; curLo = minLo; curStart = kmerIdx; curKmers = 1
          } else if (minHi == curHi && minLo == curLo) curKmers += 1
          else {
            out += WideSupermer(curHi, curLo, curStart, curKmers)
            curHi = minHi; curLo = minLo; curStart = kmerIdx; curKmers = 1
          }
        }
      }
      i += 1
    }
    if (curKmers > 0) out += WideSupermer(curHi, curLo, curStart, curKmers)
    out.iterator
  }
}
