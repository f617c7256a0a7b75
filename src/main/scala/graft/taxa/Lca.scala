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

/** Kraken 2 read-level classification: weighted leaf-to-root path scoring with
  * confidence-threshold lifting (algorithm published in Kraken 2's classify.cc;
  * behavioral spec also at reference LowestCommonAncestor.scala:91-146).
  *
  * Executor-local; one instance per task via mapPartitions/closure.
  */
final class LcaResolver(taxonomy: Taxonomy) extends Serializable {

  /** Resolve hit counts (taxon -> k-mer count, sentinels excluded) to a taxon.
    * @param requiredScore minimum k-mers within the chosen clade
    *                      (ceil(confidence * totalKmers)) */
  def resolveTree(hitCounts: collection.Map[Int, Int], requiredScore: Double): Int = {
    var maxTaxon = Taxonomy.NONE
    var maxScore = 0
    for (taxon <- hitCounts.keysIterator) {
      // score = sum of counts along this taxon's root path
      var node = taxon
      var score = 0
      while (node != Taxonomy.NONE) {
        score += hitCounts.getOrElse(node, 0)
        node = taxonomy.parents(node)
      }
      if (score > maxScore) { maxTaxon = taxon; maxScore = score }
      else if (score == maxScore && score > 0) maxTaxon = taxonomy.lca(maxTaxon, taxon)
    }
    // lift toward the root until the clade score reaches the requirement
    maxScore = hitCounts.getOrElse(maxTaxon, 0)
    while (maxTaxon != Taxonomy.NONE && maxScore < requiredScore) {
      maxScore = 0
      for ((taxon, cnt) <- hitCounts)
        if (taxonomy.hasAncestor(taxon, maxTaxon)) maxScore += cnt
      if (maxScore >= requiredScore) return maxTaxon
      maxTaxon = taxonomy.parents(maxTaxon)
    }
    maxTaxon
  }

  /** Classify from ordered (taxon, kmerCount) hit pairs.
    * Ambiguous-span pseudo-hits count toward totalKmers but score nothing;
    * mate-pair borders count nothing (spec: TaxonCounts.scala:83-87). */
  def classify(hits: Iterable[(Int, Int)], confidenceThreshold: Double): Int = {
    var total = 0
    val counts = collection.mutable.Map.empty[Int, Int]
    for ((t, c) <- hits) {
      if (t != Sentinels.MATE_PAIR_BORDER) total += c
      if (t != Sentinels.MATE_PAIR_BORDER && t != Sentinels.AMBIGUOUS_SPAN && t != Taxonomy.NONE)
        counts(t) = counts.getOrElse(t, 0) + c
    }
    if (counts.isEmpty) Taxonomy.NONE
    else resolveTree(counts, math.ceil(confidenceThreshold * total))
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
