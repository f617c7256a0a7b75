package graft.taxa

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Sentinel taxa used in span/hit streams
  * (spec: reference slacken/package.scala:28-39). */
object Sentinels {
  val AMBIGUOUS_SPAN: Int = -1
  val MATE_PAIR_BORDER: Int = -2
  /** Segment flags carried by spans. */
  val SEQUENCE_FLAG = 1
  val AMBIGUOUS_FLAG = 2
  val MATE_PAIR_BORDER_FLAG = 3
}

/** Minimal open-addressing int->int counter map (no boxing, reusable per
  * task): the per-read hit sets are tiny, so a small power-of-two table with
  * linear probing beats a boxed Map in the classification hot loop. */
final class IntCounter(initialCapacity: Int = 16) {
  private var cap = Integer.highestOneBit(math.max(16, initialCapacity) * 2)
  private var keys = new Array[Int](cap)
  private var vals = new Array[Int](cap)
  private var used = new Array[Boolean](cap)
  private var n = 0

  def size: Int = n
  def isEmpty: Boolean = n == 0

  def clear(): Unit = {
    java.util.Arrays.fill(used, false)
    n = 0
  }

  @inline private def slot(key: Int): Int = {
    var i = (key * 0x9e3775cd) & (cap - 1)
    while (used(i) && keys(i) != key) i = (i + 1) & (cap - 1)
    i
  }

  def add(key: Int, count: Int): Unit = {
    if (n * 2 >= cap) grow()
    val i = slot(key)
    if (!used(i)) { used(i) = true; keys(i) = key; vals(i) = count; n += 1 }
    else vals(i) += count
  }

  def get(key: Int): Int = {
    val i = slot(key)
    if (used(i)) vals(i) else 0
  }

  private def grow(): Unit = {
    val ok = keys; val ov = vals; val ou = used; val ocap = cap
    cap *= 2
    keys = new Array[Int](cap); vals = new Array[Int](cap)
    used = new Array[Boolean](cap); n = 0
    var i = 0
    while (i < ocap) { if (ou(i)) add(ok(i), ov(i)); i += 1 }
  }

  /** Iterate (key, value) pairs via callback (no allocation). */
  def foreachEntry(f: (Int, Int) => Unit): Unit = {
    var i = 0
    while (i < cap) { if (used(i)) f(keys(i), vals(i)); i += 1 }
  }
}

/** Kraken 2 read-level classification: weighted leaf-to-root path scoring with
  * confidence-threshold lifting (algorithm published in Kraken 2's classify.cc;
  * behavioral spec also at reference LowestCommonAncestor.scala:91-146).
  *
  * Executor-local; one instance per task via mapPartitions/closure. The
  * internal counter map is reused across reads (no per-read allocation).
  */
final class LcaResolver(taxonomy: Taxonomy) extends Serializable {

  @transient private lazy val counts = new IntCounter(32)

  /** Resolve hit counts (taxon -> k-mer count, sentinels excluded) to a taxon.
    * @param requiredScore minimum k-mers within the chosen clade
    *                      (ceil(confidence * totalKmers)) */
  def resolveTree(hitCounts: collection.Map[Int, Int], requiredScore: Double): Int = {
    counts.clear()
    for ((t, c) <- hitCounts) counts.add(t, c)
    resolveCounter(counts, requiredScore)
  }

  private def resolveCounter(hitCounts: IntCounter, requiredScore: Double): Int = {
    var maxTaxon = Taxonomy.NONE
    var maxScore = 0
    hitCounts.foreachEntry { (taxon, _) =>
      // score = sum of counts along this taxon's root path
      var node = taxon
      var score = 0
      while (node != Taxonomy.NONE) {
        score += hitCounts.get(node)
        node = taxonomy.parents(node)
      }
      if (score > maxScore) { maxTaxon = taxon; maxScore = score }
      else if (score == maxScore && score > 0) maxTaxon = taxonomy.lca(maxTaxon, taxon)
    }
    // lift toward the root until the clade score reaches the requirement
    maxScore = hitCounts.get(maxTaxon)
    while (maxTaxon != Taxonomy.NONE && maxScore < requiredScore) {
      var cladeScore = 0
      hitCounts.foreachEntry { (taxon, cnt) =>
        if (taxonomy.hasAncestor(taxon, maxTaxon)) cladeScore += cnt
      }
      if (cladeScore >= requiredScore) return maxTaxon
      maxScore = cladeScore
      maxTaxon = taxonomy.parents(maxTaxon)
    }
    maxTaxon
  }

  /** Classify from ordered (taxon, kmerCount) hit pairs.
    * Ambiguous-span pseudo-hits count toward totalKmers but score nothing;
    * mate-pair borders count nothing (spec: TaxonCounts.scala:83-87). */
  def classify(hits: Iterable[(Int, Int)], confidenceThreshold: Double): Int = {
    var total = 0
    counts.clear()
    for ((t, c) <- hits) {
      if (t != Sentinels.MATE_PAIR_BORDER) total += c
      if (t != Sentinels.MATE_PAIR_BORDER && t != Sentinels.AMBIGUOUS_SPAN && t != Taxonomy.NONE)
        counts.add(t, c)
    }
    if (counts.isEmpty) Taxonomy.NONE
    else resolveCounter(counts, math.ceil(confidenceThreshold * total))
  }
}

/** The defining custom aggregate: fold taxa with the LCA function per
  * minimizer. Commutative + associative with zero=NONE, so Spark's
  * partial aggregation (map-side combine) applies
  * (spec: reference LowestCommonAncestor.scala:152-170). */
final case class TaxonLcaAggregator(bcTax: Broadcast[Taxonomy])
    extends Aggregator[Int, Int, Int] {
  @transient private lazy val tax = bcTax.value
  override def zero: Int = Taxonomy.NONE
  override def reduce(b: Int, a: Int): Int = tax.lca(b, a)
  override def merge(b1: Int, b2: Int): Int = tax.lca(b1, b2)
  override def finish(r: Int): Int = r
  override def bufferEncoder: Encoder[Int] = Encoders.scalaInt
  override def outputEncoder: Encoder[Int] = Encoders.scalaInt
}
