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
  * both words, truncated to the populated bits of hi), with optional spaced
  * seed: `spaces` base positions cleared from the priority, one position
  * apart starting from the second-from-last — the same scheme as the narrow
  * [[SpacedSeedPriority]], extended across the word boundary (behavioral
  * spec: reference kmers/minimizer/MinimizerPriorities.scala:282-321, which
  * applies spacing at any width). */
final class WideRandomXorPriority(val width: Int,
    xorMask: Long = RandomXorPriority.DEFAULT_MASK,
    val canonical: Boolean = true,
    val spaces: Int = 0,
    demoted: Array[Long] = Array.emptyLongArray) extends Serializable {
  require(width >= 33 && width <= 64, s"wide width must be in [33,64], got $width")
  require(spaces >= 0 && spaces <= width / 2,
    s"spaces=$spaces too large for width $width")
  require(demoted.length % 2 == 0, "demoted pairs must be interleaved (hi, lo)")

  val hiBases: Int = width - 32
  val hiMask: Long = Dna.merMask(hiBases)
  private val maskHi = xorMask & hiMask
  private val maskLo = xorMask

  /** Priority bits to KEEP after spacing: base position p (0 = rightmost)
    * lives in lo for p < 32, in hi for p >= 32; position 2i+1 is cleared for
    * each i in [0, spaces). */
  private val spaceLo: Long = WideRandomXorPriority.spaceMaskLo(spaces)
  private val spaceHi: Long = WideRandomXorPriority.spaceMaskHi(spaces) & hiMask

  // shift between the (hiBases, 32) split and a 64+2*hiBases-bit value;
  // used by the O(1) reverse complement below
  private val hiShift = 2 * hiBases

  private val DEMOTE: Long = 1L << 63

  /** At width <= 63 the demote flag rides in bit 63 of the hi priority word
    * (above every populated priority bit, so plain unsigned comparison sorts
    * demoted m-mers last AND the flag survives into the stored index keys).
    * At width 64 every hi bit is a priority bit, so the flag is reported
    * out-of-band in out(2) instead and compared first via [[WideRandomXorPriority.priLess]]. */
  private val demoteInBand: Boolean = width <= 63

  // open-addressing (hi, lo) set with an explicit used[] — no Long sentinel
  // is safe at width 64, where hi spans the full word and e.g. the
  // self-reverse-complement mer T^32 A^32 has a legal canonical hi of -1L
  @transient private lazy val table: (Array[Boolean], Array[Long], Array[Long]) = {
    val n = demoted.length / 2
    val cap = Integer.highestOneBit(math.max(8, n * 2) * 2)
    val used = new Array[Boolean](cap)
    val hiT = new Array[Long](cap)
    val loT = new Array[Long](cap)
    var p = 0
    while (p < n) {
      val h = demoted(2 * p); val l = demoted(2 * p + 1)
      var i = java.lang.Long.hashCode(
        (h * 0x9e3779b97f4a7c15L) ^ (l * 0xbf58476d1ce4e5b9L)) & (cap - 1)
      while (used(i) && !(hiT(i) == h && loT(i) == l)) i = (i + 1) & (cap - 1)
      used(i) = true; hiT(i) = h; loT(i) = l
      p += 1
    }
    (used, hiT, loT)
  }

  @inline private def isDemoted(h: Long, l: Long): Boolean = {
    if (demoted.isEmpty) return false
    val (used, hiT, loT) = table
    val cap = hiT.length
    var i = java.lang.Long.hashCode(
      (h * 0x9e3779b97f4a7c15L) ^ (l * 0xbf58476d1ce4e5b9L)) & (cap - 1)
    while (true) {
      if (!used(i)) return false
      if (hiT(i) == h && loT(i) == l) return true
      i = (i + 1) & (cap - 1)
    }
    false
  }

  /** Priority of the m-mer (hi, lo): canonicalize, XOR, space, demote.
    * Returns via the 3-element out array — (hi, lo, demotion rank); compare
    * two priorities with [[WideRandomXorPriority.priLess]]. The whole
    * computation is allocation-free (the scan loop calls this once per base
    * at 100 TB scale). */
  def priorityOf(hi: Long, lo: Long, out: Array[Long]): Unit = {
    var h = hi; var l = lo
    if (canonical) {
      // rc(mer) = rc(lo-word) ++ rc(hi-word) repacked into the (hiBases, 32)
      // split: with rl/rh the per-word reverse complements, the concatenated
      // value is rl * 2^(2*hiBases) + rh, so the new split is pure shifts —
      // O(1) and no tuple, unlike a per-base repack
      val rl = Dna.reverseComplement(lo, 32)
      val rh = if (hiBases > 0) Dna.reverseComplement(hi, hiBases) else 0L
      val ch = rl >>> (64 - hiShift)
      val cl = (if (hiShift == 64) 0L else rl << hiShift) | rh
      if (WideRandomXorPriority.unsignedLess(ch, cl, h, l)) { h = ch; l = cl }
    }
    // the sampled most-frequent m-mers sort after everything else: in-band
    // (width <= 63) via the demote bit above every populated hi-priority
    // bit; at width 64 via the out-of-band rank in out(2)
    val dem = isDemoted(h, l)
    out(0) = (((h ^ maskHi) & hiMask) & spaceHi) |
      (if (dem && demoteInBand) DEMOTE else 0L)
    out(1) = (l ^ maskLo) & spaceLo
    out(2) = if (dem && !demoteInBand) 1L else 0L
  }
}

object WideRandomXorPriority {
  /** Low-word KEEP mask for s spaced positions (base positions 2i+1 < 32). */
  def spaceMaskLo(s: Int): Long = {
    var m = -1L
    var i = 0
    while (i < s) {
      val pos = 2 * i + 1
      if (pos < 32) m &= ~(3L << (2 * pos))
      i += 1
    }
    m
  }

  /** High-word KEEP mask for s spaced positions (base positions 2i+1 >= 32). */
  def spaceMaskHi(s: Int): Long = {
    var m = -1L
    var i = 0
    while (i < s) {
      val pos = 2 * i + 1
      if (pos >= 32) m &= ~(3L << (2 * (pos - 32)))
      i += 1
    }
    m
  }

  /** Reverse complement of a two-long packed mer with hiBases bases in hi.
    * O(1): per-word bit-reversal plus a shift repack (see priorityOf). */
  def rc(hi: Long, lo: Long, hiBases: Int): (Long, Long) = {
    val s = 2 * hiBases
    val rl = Dna.reverseComplement(lo, 32)
    val rh = if (hiBases > 0) Dna.reverseComplement(hi, hiBases) else 0L
    val nh = if (s == 0) 0L else rl >>> (64 - s)
    val nl = (if (s == 64) 0L else rl << s) | rh
    (nh, nl)
  }

  @inline def unsignedLess(h1: Long, l1: Long, h2: Long, l2: Long): Boolean = {
    val c = java.lang.Long.compareUnsigned(h1, h2)
    c < 0 || (c == 0 && java.lang.Long.compareUnsigned(l1, l2) < 0)
  }

  /** Full priority order over (hi, lo, demotion rank) triples as produced by
    * [[WideRandomXorPriority.priorityOf]]: demotion rank first (a width-64
    * demoted m-mer sorts after every non-demoted one; at width <= 63 both
    * ranks are 0 and the in-band demote bit decides), then unsigned (hi, lo). */
  @inline def priLess(h1: Long, l1: Long, d1: Long,
      h2: Long, l2: Long, d2: Long): Boolean =
    d1 < d2 || (d1 == d2 && unsignedLess(h1, l1, h2, l2))
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
    val priDemRing = new Array[Long](cap)
    var head = 0
    var tail = 0

    var merHi = 0L
    var merLo = 0L
    val pri = new Array[Long](3)
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
          WideRandomXorPriority.priLess(pri(0), pri(1), pri(2),
            priHiRing(prev), priLoRing(prev), priDemRing(prev))
        }) tail = (tail + cap - 1) % cap
        posRing(tail) = i; priHiRing(tail) = pri(0); priLoRing(tail) = pri(1)
        priDemRing(tail) = pri(2)
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
