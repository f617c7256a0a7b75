package graft.kmers

import scala.collection.mutable.ArrayBuffer

/** A run of consecutive k-mers sharing one minimizer within a fragment.
  * @param minimizer the minimizer *priority* value (the index join key)
  * @param start     0-based offset of the first k-mer's first base in the segment
  * @param kmers     number of consecutive k-mers in the run
  */
final case class Supermer(minimizer: Long, start: Int, kmers: Int)

/** Single-pass super-mer extraction: rolling 2-bit m-mer encoding + monotonic
  * deque sliding-window minimum (the classic O(n) minimizer algorithm;
  * behavioral spec from the reference ShiftScanner, PosRankWindow and
  * MinSplitter in kmers/minimizer — re-implemented for right-aligned Long
  * m-mers).
  *
  * Executor-local: invoked from flatMap/mapPartitions, never shuffled.
  * Ties take the leftmost minimal m-mer (Kraken 2 behavior).
  */
final class SupermerScanner(val k: Int, val priority: MinimizerPriority) extends Serializable {
  require(k >= priority.width, s"k=$k must be >= m=${priority.width}")
  val m: Int = priority.width

  /** Scan one ACGT-only segment (no ambiguous bases) of length >= k. */
  def scan(segment: CharSequence): Iterator[Supermer] = {
    val L = segment.length
    if (L < k) return Iterator.empty
    val out = new ArrayBuffer[Supermer](2 * L / math.max(1, k - m + 1) + 2)

    val mask = Dna.merMask(m)
    val window = k - m + 1          // m-mers per k-mer window
    val cap = window + 1            // ring capacity
    val posRing = new Array[Int](cap)
    val priRing = new Array[Long](cap)
    var head = 0                    // deque front index (inclusive)
    var tail = 0                    // deque back index (exclusive)

    var mer = 0L
    var curMin = 0L                 // current supermer's minimizer value
    var curStart = 0                // current supermer's first k-mer index
    var curKmers = 0
    var i = 0
    while (i < L) {
      mer = ((mer << 2) | Dna.code(segment.charAt(i))) & mask
      if (i >= m - 1) {
        val pri = priority.priorityOf(mer)
        // monotonic deque push: strict pop keeps leftmost on ties
        while (tail != head && java.lang.Long.compareUnsigned(priRing((tail + cap - 1) % cap), pri) > 0)
          tail = (tail + cap - 1) % cap
        posRing(tail) = i; priRing(tail) = pri
        tail = (tail + 1) % cap
        if (i >= k - 1) {
          // evict m-mers that fell out of this k-mer's window
          while (posRing(head) < i - (k - m)) head = (head + 1) % cap
          val minPri = priRing(head)
          val kmerIdx = i - (k - 1)
          if (curKmers == 0) { curMin = minPri; curStart = kmerIdx; curKmers = 1 }
          else if (minPri == curMin) curKmers += 1
          else {
            out += Supermer(curMin, curStart, curKmers)
            curMin = minPri; curStart = kmerIdx; curKmers = 1
          }
        }
      }
      i += 1
    }
    if (curKmers > 0) out += Supermer(curMin, curStart, curKmers)
    out.iterator
  }
}

/** Maximal valid/ambiguous segmentation of a raw sequence.
  * @param seq   the segment text (empty for ambiguous runs — only length matters)
  * @param pos   0-based offset within the fragment
  * @param valid whether the run is ACGT-only
  */
final case class SeqRun(seq: String, pos: Int, valid: Boolean)

object SupermerScanner {
  /** Split a sequence into maximal runs of valid (ACGT/U) vs ambiguous chars.
    * Concatenation of runs restores the original sequence. */
  def splitByAmbiguity(sequence: String): Iterator[SeqRun] = new Iterator[SeqRun] {
    private var i = 0
    override def hasNext: Boolean = i < sequence.length
    override def next(): SeqRun = {
      val start = i
      val valid = Dna.isValid(sequence.charAt(i))
      while (i < sequence.length && Dna.isValid(sequence.charAt(i)) == valid) i += 1
      SeqRun(sequence.substring(start, i), start, valid)
    }
  }
}
