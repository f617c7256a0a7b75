package graft.kmers

/** Minimizer orderings over packed m-mers (m <= 32). A priority is itself a
  * packed Long; *smaller unsigned value = higher priority*. Behavioral spec
  * from the reference (kmers/minimizer/MinimizerPriorities.scala:93-321) and
  * the published Kraken 2 minimizer scheme; representation is our own
  * (right-aligned single Long rather than left-aligned Long arrays).
  */
sealed trait MinimizerPriority extends Serializable {
  /** Minimizer width m. */
  def width: Int
  /** Priority of the m-mer (smaller unsigned = higher priority). */
  def priorityOf(mer: Long): Long
  /** Representative m-mer for a priority (inverse where defined). */
  def merFor(priority: Long): Long
}

/** XOR with a pseudo-random toggle mask, optionally on the canonical
  * (strand-independent) form. With the Kraken 2 toggle mask and canonical=true
  * this is the Kraken 2 ordering. */
final case class RandomXorPriority(width: Int, xorMask: Long = RandomXorPriority.DEFAULT_MASK,
    canonical: Boolean = true) extends MinimizerPriority {
  require(width >= 1 && width <= 32, s"width must be in [1,32], got $width")

  private val mask = xorMask & Dna.merMask(width)

  override def priorityOf(mer: Long): Long =
    (if (canonical) Dna.canonical(mer, width) else mer) ^ mask

  override def merFor(priority: Long): Long = priority ^ mask
}

object RandomXorPriority {
  /** Kraken 2's published toggle mask (reference: kmers/minimizer/package.scala:30-32). */
  val DEFAULT_MASK: Long = 0xe37e28c4271b5a2dL
}

/** Spaced-seed wrapper: zero out s nucleotide positions of the inner priority,
  * one position apart, starting from the second-from-last position. E.g.
  * width=9, s=3: positions 1,3,5 from the right are cleared.
  * (Behavioral spec: reference MinimizerPriorities.scala:282-321.) */
final case class SpacedSeedPriority(s: Int, inner: MinimizerPriority) extends MinimizerPriority {
  require(s <= inner.width / 2, s"s=$s too large for width ${inner.width}")

  val width: Int = inner.width

  /** Bits to KEEP: everything except positions 2i+1 (i in [0,s)) from the right. */
  private val spaceMask: Long = {
    var m = Dna.merMask(width)
    var i = 0
    while (i < s) {
      m &= ~(3L << (2 * (2 * i + 1)))
      i += 1
    }
    m
  }

  override def priorityOf(mer: Long): Long = inner.priorityOf(mer) & spaceMask

  override def merFor(priority: Long): Long = inner.merFor(priority)
}

/** Frequency-informed ordering: the `demoted` m-mers (canonical form; in
  * practice the sampled most-frequent of the library) order AFTER every
  * non-demoted m-mer, so they are only chosen as minimizers when a window
  * holds no alternative — the skew killer behind the reference's sampled
  * frequency orderings (MinimizerPriorities.scala:93-280 MinTable),
  * re-expressed as a demotion set over the inner ordering so it works at
  * any m <= 31 with no 4^m table. Within each class the inner ordering
  * breaks ties, preserving its uniformity.
  *
  * The demotion test runs once per m-mer position in the scan hot loop: an
  * open-addressing long set (built lazily per task, ~0.5 load factor), no
  * boxing, no allocation per probe.
  */
final case class FrequencyPriority(demoted: Array[Long], inner: MinimizerPriority)
    extends MinimizerPriority {
  // the demote flag needs a bit above the inner priority's 2m bits
  require(inner.width <= 31, s"frequency ordering needs m <= 31, got ${inner.width}")

  val width: Int = inner.width

  private val DEMOTE: Long = 1L << 63

  // EMPTY = -1 is safe: canonical m-mers for m <= 31 occupy <= 62 bits
  @transient private lazy val table: Array[Long] = {
    val cap = Integer.highestOneBit(math.max(8, demoted.length * 2) * 2)
    val t = Array.fill(cap)(-1L)
    for (x <- demoted) {
      var i = java.lang.Long.hashCode(x * 0x9e3779b97f4a7c15L) & (cap - 1)
      while (t(i) != -1L && t(i) != x) i = (i + 1) & (cap - 1)
      t(i) = x
    }
    t
  }

  @inline private def isDemoted(x: Long): Boolean = {
    val cap = table.length
    var i = java.lang.Long.hashCode(x * 0x9e3779b97f4a7c15L) & (cap - 1)
    while (true) {
      val v = table(i)
      if (v == x) return true
      if (v == -1L) return false
      i = (i + 1) & (cap - 1)
    }
    false
  }

  override def priorityOf(mer: Long): Long = {
    val p = inner.priorityOf(mer)
    if (isDemoted(Dna.canonical(mer, width))) p | DEMOTE else p
  }

  override def merFor(priority: Long): Long = inner.merFor(priority & ~DEMOTE)
}

/** Explicit table ordering: rank of each m-mer given by position in
  * `byPriority` (for small m; supports arbitrary custom orderings). */
final case class TablePriority(byPriority: Array[Int], width: Int) extends MinimizerPriority {
  require(width <= 15, "table orderings supported up to m=15")

  @transient private lazy val rankOf: Array[Int] = {
    val r = Array.fill(1 << (2 * width))(-1)
    var p = 0
    while (p < byPriority.length) { r(byPriority(p)) = p; p += 1 }
    r
  }

  /** m-mers not in the table get the worst (maximal) priority. */
  override def priorityOf(mer: Long): Long = {
    val r = rankOf(mer.toInt)
    if (r < 0) -1L else r.toLong
  }

  override def merFor(priority: Long): Long = byPriority(priority.toInt).toLong
}
