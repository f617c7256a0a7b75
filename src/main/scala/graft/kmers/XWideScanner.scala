package graft.kmers

import scala.collection.mutable.ArrayBuffer

/** Extra-wide minimizer kernel: m in [65, 128], minimizers packed as
  * `words = ceil(m/32)` longs (word 0 = the leading `m - 32*(words-1)`
  * bases right-aligned, each following word 32 bases) — the same key
  * layout generalized from the two-word [[WideScanner]] and matching the
  * reference's idLongs = ceil(m/32) column scheme up to its 4-long maximum
  * (behavioral spec: reference kmers/KmerKeyedIndex.scala:27-55; arity-
  * matched extraction reference slacken/Minimizers.scala:44-75). The
  * m <= 32 single-long and m <= 64 two-long scanners remain the fast
  * specializations; this path completes the reference's parameter space.
  * Priorities compare as unsigned word sequences, demotion rank first.
  */
final case class XWideSupermer(ids: Array[Long], start: Int, kmers: Int)

/** Canonical XOR ordering over n-long m-mers: the Kraken 2 toggle mask
  * replicated on every word (word 0 truncated to its populated bits),
  * optional spaced seed (`spaces` base positions cleared one apart from the
  * second-from-last — the [[WideRandomXorPriority]] scheme continued across
  * word boundaries), optional frequency demotion. The demote flag rides
  * in-band in bit 63 of word 0 when the top word has a spare bit
  * (topBases <= 31); at topBases = 32 (m = 96, 128) it is reported
  * out-of-band in the rank slot and compared first, exactly like the
  * two-word width-64 case. */
final class XWidePriority(val width: Int,
    xorMask: Long = RandomXorPriority.DEFAULT_MASK,
    val canonical: Boolean = true,
    val spaces: Int = 0,
    demoted: Array[Long] = Array.emptyLongArray) extends Serializable {
  require(width >= 65 && width <= 128,
    s"extra-wide width must be in [65,128], got $width")
  require(spaces >= 0 && spaces <= width / 2,
    s"spaces=$spaces too large for width $width")

  /** Number of key words: 3 for m in [65,96], 4 for [97,128]. */
  val words: Int = (width + 31) / 32
  require(demoted.length % words == 0,
    s"demoted entries must be $words interleaved longs each")

  val topBases: Int = width - 32 * (words - 1)
  val topMask: Long = Dna.merMask(topBases)
  private val demoteInBand: Boolean = topBases <= 31
  private val DEMOTE: Long = 1L << 63

  /** Per-word XOR masks (word 0 truncated) and spaced-seed KEEP masks: base
    * position p (0 = rightmost) lives in word `words-1 - p/32` at bit
    * offset `2*(p%32)`; position 2i+1 is cleared for i in [0, spaces). */
  private val priMask: Array[Long] = Array.tabulate(words)(w =>
    if (w == 0) xorMask & topMask else xorMask)
  private val spaceMask: Array[Long] = {
    val m = XWidePriority.spaceKeepMasks(width, spaces)
    m(0) &= topMask
    m
  }

  // open-addressing n-word set with an explicit used[] (no Long sentinel is
  // safe: at topBases = 32 every word spans its full range)
  @transient private lazy val table: (Array[Boolean], Array[Long]) = {
    val n = demoted.length / words
    val cap = Integer.highestOneBit(math.max(8, n * 2) * 2)
    val used = new Array[Boolean](cap)
    val keys = new Array[Long](cap * words)
    var p = 0
    while (p < n) {
      var i = hashOf(demoted, p * words) & (cap - 1)
      while (used(i) && !sameKey(keys, i * words, demoted, p * words))
        i = (i + 1) & (cap - 1)
      used(i) = true
      System.arraycopy(demoted, p * words, keys, i * words, words)
      p += 1
    }
    (used, keys)
  }

  @inline private def hashOf(a: Array[Long], off: Int): Int = {
    var h = 0L
    var w = 0
    while (w < words) {
      h = (h * 0x9e3779b97f4a7c15L) ^ (a(off + w) * 0xbf58476d1ce4e5b9L)
      w += 1
    }
    java.lang.Long.hashCode(h)
  }

  @inline private def sameKey(a: Array[Long], ao: Int, b: Array[Long],
      bo: Int): Boolean = {
    var w = 0
    while (w < words) {
      if (a(ao + w) != b(bo + w)) return false
      w += 1
    }
    true
  }

  @inline private def isDemoted(mer: Array[Long]): Boolean = {
    if (demoted.isEmpty) return false
    val (used, keys) = table
    val cap = used.length
    var i = hashOf(mer, 0) & (cap - 1)
    while (true) {
      if (!used(i)) return false
      if (sameKey(keys, i * words, mer, 0)) return true
      i = (i + 1) & (cap - 1)
    }
    false
  }

  /** Shift the n-word accumulator left by `bits` (2..64) and OR `v` into
    * the low word — the repack primitive of the O(words) reverse
    * complement below. */
  @inline private def appendBits(acc: Array[Long], v: Long, bits: Int): Unit = {
    var i = 0
    if (bits == 64) {
      while (i < words - 1) { acc(i) = acc(i + 1); i += 1 }
      acc(words - 1) = v
    } else {
      while (i < words - 1) {
        acc(i) = (acc(i) << bits) | (acc(i + 1) >>> (64 - bits))
        i += 1
      }
      acc(words - 1) = (acc(words - 1) << bits) | v
    }
  }

  /** Reverse complement of an n-word mer into `dst`: per-word bit-reversal
    * plus shift repacks — O(words^2) word ops, no per-base loop (the
    * generalization of the two-word O(1) trick). rc(mer) = rc(last word)
    * ++ ... ++ rc(word 0), repacked right-aligned. */
  def reverseComplementInto(src: Array[Long], dst: Array[Long]): Unit = {
    java.util.Arrays.fill(dst, 0L)
    var s = words - 1
    while (s >= 1) {
      appendBits(dst, Dna.reverseComplement(src(s), 32), 64)
      s -= 1
    }
    appendBits(dst, Dna.reverseComplement(src(0), topBases), 2 * topBases)
    dst(0) &= topMask
  }

  @inline private def unsignedLess(a: Array[Long], b: Array[Long]): Boolean =
    XWidePriority.unsignedLess(a, b)

  /** Priority of `mer` into `out` (length words + 1; the last slot is the
    * out-of-band demotion rank): canonicalize (via the caller-provided
    * scratch word array), XOR, space, demote. Allocation-free. */
  def priorityOf(mer: Array[Long], rcBuf: Array[Long],
      out: Array[Long]): Unit = {
    var src = mer
    if (canonical) {
      reverseComplementInto(mer, rcBuf)
      if (unsignedLess(rcBuf, mer)) src = rcBuf
    }
    val dem = isDemoted(src)
    var w = 0
    while (w < words) {
      out(w) = (src(w) ^ priMask(w)) & spaceMask(w)
      w += 1
    }
    if (dem && demoteInBand) out(0) |= DEMOTE
    out(words) = if (dem && !demoteInBand) 1L else 0L
  }
}

object XWidePriority {
  /** Unsigned word-lexicographic order over equal-length word arrays. */
  @inline def unsignedLess(a: Array[Long], b: Array[Long]): Boolean = {
    var w = 0
    while (w < a.length) {
      val c = java.lang.Long.compareUnsigned(a(w), b(w))
      if (c != 0) return c < 0
      w += 1
    }
    false
  }

  /** Per-word KEEP masks for `spaces` spaced positions at width m (base
    * position p = 2i+1, 0 = rightmost; word `words-1 - p/32`, bit offset
    * `2*(p%32)`). All-ones base, NO top-word truncation — respace needs the
    * untruncated form to preserve an in-band demote flag, exactly like
    * [[WideRandomXorPriority.spaceMaskHi]]. */
  def spaceKeepMasks(m: Int, spaces: Int): Array[Long] = {
    val words = (m + 31) / 32
    val out = Array.fill(words)(-1L)
    var i = 0
    while (i < spaces) {
      val p = 2 * i + 1
      out(words - 1 - p / 32) &= ~(3L << (2 * (p % 32)))
      i += 1
    }
    out
  }

  /** Full priority order over flattened (words..., rank) slot groups:
    * demotion rank first, then unsigned word-lexicographic — the n-word
    * generalization of [[WideRandomXorPriority.priLess]]. */
  @inline def priLess(a: Array[Long], ao: Int, b: Array[Long], bo: Int,
      words: Int): Boolean = {
    val ra = a(ao + words); val rb = b(bo + words)
    if (ra != rb) return ra < rb
    var w = 0
    while (w < words) {
      val c = java.lang.Long.compareUnsigned(a(ao + w), b(bo + w))
      if (c != 0) return c < 0
      w += 1
    }
    false
  }
}

/** Super-mer extraction for extra-wide minimizers: the same rolling-scan +
  * monotonic deque structure as the narrow and two-word scanners, with
  * n-word mer state in flat ring buffers (no per-push allocation). */
final class XWideScanner(val k: Int, val priority: XWidePriority)
    extends Serializable {
  require(k >= priority.width, s"k=$k must be >= m=${priority.width}")
  val m: Int = priority.width
  val words: Int = priority.words

  def scan(segment: CharSequence): Iterator[XWideSupermer] = {
    val L = segment.length
    if (L < k) return Iterator.empty
    val n = words
    val slots = n + 1
    val out = new ArrayBuffer[XWideSupermer](2 * L / math.max(1, k - m + 1) + 2)

    val topMask = priority.topMask
    val window = k - m + 1
    val cap = window + 1
    val posRing = new Array[Int](cap)
    val priRing = new Array[Long](cap * slots)
    var head = 0
    var tail = 0

    val mer = new Array[Long](n)
    val rcBuf = new Array[Long](n)
    val pri = new Array[Long](slots)
    val cur = new Array[Long](slots)
    var curStart = 0
    var curKmers = 0

    @inline def sameAsCur(a: Array[Long], off: Int): Boolean = {
      var w = 0
      while (w < slots) {
        if (a(off + w) != cur(w)) return false
        w += 1
      }
      true
    }

    var i = 0
    while (i < L) {
      // n-word rolling push
      var w = 0
      while (w < n - 1) {
        mer(w) = (mer(w) << 2) | (mer(w + 1) >>> 62)
        w += 1
      }
      mer(0) &= topMask
      mer(n - 1) = (mer(n - 1) << 2) | Dna.code(segment.charAt(i))
      if (i >= m - 1) {
        priority.priorityOf(mer, rcBuf, pri)
        while (tail != head && {
          val prev = (tail + cap - 1) % cap
          XWidePriority.priLess(pri, 0, priRing, prev * slots, n)
        }) tail = (tail + cap - 1) % cap
        posRing(tail) = i
        System.arraycopy(pri, 0, priRing, tail * slots, slots)
        tail = (tail + 1) % cap
        if (i >= k - 1) {
          while (posRing(head) < i - (k - m)) head = (head + 1) % cap
          val kmerIdx = i - (k - 1)
          if (curKmers == 0) {
            System.arraycopy(priRing, head * slots, cur, 0, slots)
            curStart = kmerIdx; curKmers = 1
          } else if (sameAsCur(priRing, head * slots)) curKmers += 1
          else {
            out += XWideSupermer(java.util.Arrays.copyOf(cur, n), curStart, curKmers)
            System.arraycopy(priRing, head * slots, cur, 0, slots)
            curStart = kmerIdx; curKmers = 1
          }
        }
      }
      i += 1
    }
    if (curKmers > 0)
      out += XWideSupermer(java.util.Arrays.copyOf(cur, n), curStart, curKmers)
    out.iterator
  }
}
