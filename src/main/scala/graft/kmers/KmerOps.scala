package graft.kmers

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed k-mer counting (k <= 64, canonical) — the capability behind
  * the reference's index statistics and golden-number tests (distinct k-mer
  * counts per taxon cross-checked with KMC3/Discount; BASELINE.md).
  *
  * k-mers are materialized as two packed longs (hi, lo) only inside the
  * counting queries; classification never materializes k-mers.
  */
object KmerOps {

  /** Emit the canonical (hi, lo) encoding of every valid k-mer in `seq`.
    * hi holds the first (k-32) bases for k > 32 (0 otherwise); lo the rest.
    * Canonical = unsigned-min(forward, reverse complement) on (hi, lo). */
  def canonicalKmers(seq: String, k: Int): Iterator[(Long, Long)] = {
    require(k >= 1 && k <= 64, s"k must be in [1,64], got $k")
    SupermerScanner.splitByAmbiguity(seq).flatMap { run =>
      if (!run.valid || run.seq.length < k) Iterator.empty
      else new Iterator[(Long, Long)] {
        private val s = run.seq
        private val hiBases = math.max(0, k - 32)
        private val loBases = k - hiBases
        private val loMask = Dna.merMask(loBases)
        private val hiMask = Dna.merMask(hiBases)
        private var hi = 0L
        private var lo = 0L
        private var i = 0
        // prime the first k-1 bases
        while (i < k - 1) { push(Dna.code(s.charAt(i))); i += 1 }
        private def push(c: Int): Unit = {
          if (hiBases > 0) {
            hi = ((hi << 2) | (lo >>> (2 * (loBases - 1)))) & hiMask
          }
          lo = ((lo << 2) | c) & loMask
        }
        override def hasNext: Boolean = i < s.length
        override def next(): (Long, Long) = {
          push(Dna.code(s.charAt(i))); i += 1
          // reverse complement of the 2-long k-mer: RC lo and hi separately,
          // then swap/realign across the boundary
          val rcFull = reverseComplement2(hi, lo)
          if (unsignedLess(rcFull._1, rcFull._2, hi, lo)) rcFull else (hi, lo)
        }
        private def reverseComplement2(h: Long, l: Long): (Long, Long) = {
          if (hiBases == 0) (0L, Dna.reverseComplement(l, loBases))
          else {
            // treat as one k-base string: rc(lo) becomes the new high part
            val rcLo = Dna.reverseComplement(l, loBases) // k-32... no: loBases bases
            val rcHi = Dna.reverseComplement(h, hiBases)
            // rc(kmer) = rc of concatenation = rc(lo) ++ rc(hi); repack into
            // (hi', lo') with hiBases/loBases split
            val total = k
            // build big value as bases stream: simplest correct route via
            // explicit base extraction (k <= 64 keeps this O(k))
            var nh = 0L; var nl = 0L
            var idx = 0
            def baseAt(pos: Int): Long = { // pos 0 = leftmost of rc(kmer)
              if (pos < loBases) (rcLo >>> (2 * (loBases - 1 - pos))) & 3L
              else (rcHi >>> (2 * (hiBases - 1 - (pos - loBases)))) & 3L
            }
            while (idx < hiBases) { nh = (nh << 2) | baseAt(idx); idx += 1 }
            while (idx < total) { nl = (nl << 2) | baseAt(idx); idx += 1 }
            (nh, nl)
          }
        }
        private def unsignedLess(h1: Long, l1: Long, h2: Long, l2: Long): Boolean = {
          val c = java.lang.Long.compareUnsigned(h1, h2)
          c < 0 || (c == 0 && java.lang.Long.compareUnsigned(l1, l2) < 0)
        }
      }
    }
  }

  /** Distinct canonical k-mers per taxon (spec: the reference's
    * totalKmerCountReport golden-number statistic). */
  def distinctKmersPerTaxon(library: Dataset[(Int, String)], k: Int): DataFrame = {
    val spark = library.sparkSession
    import spark.implicits._
    library.flatMap { case (taxon, seq) =>
      canonicalKmers(seq, k).map { case (hi, lo) => (taxon, hi, lo) }
    }.toDF("taxon", "hi", "lo")
      .groupBy($"taxon")
      .agg(countDistinct($"hi", $"lo").cast("long").as("n_distinct_kmers"),
        count(lit(1)).cast("long").as("n_kmers"))
  }

  /** Global distinct k-mer count across a library. */
  def distinctKmerCount(library: Dataset[(Int, String)], k: Int): Long = {
    val spark = library.sparkSession
    import spark.implicits._
    library.flatMap { case (_, seq) => canonicalKmers(seq, k) }
      .distinct().count()
  }
}
