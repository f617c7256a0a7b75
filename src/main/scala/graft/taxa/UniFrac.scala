package graft.taxa

/** Unweighted UniFrac distance between samples over the taxonomy tree
  * (spec: reference analysis/UniFrac.scala:26-49): each taxon-to-parent edge
  * is a unit-length branch; a branch is "covered" by a sample if any taxon in
  * its subtree is present. Distance = unique branch length / total branch
  * length. Driver-side set algebra on broadcast-size data.
  */
object UniFrac {

  /** Branch set of a sample: all present taxa plus their ancestors
    * (every node on a root path contributes its parent edge). */
  def branchSet(tax: Taxonomy, taxa: Iterable[Int]): collection.BitSet = {
    val bs = tax.withAncestors(taxa.filter(t => t > 0 && tax.isDefined(t)))
    bs -= Taxonomy.ROOT // the root has no parent edge
    collection.immutable.BitSet.empty ++ bs
  }

  /** Unweighted UniFrac in [0,1]: 0 = identical branch sets, 1 = disjoint. */
  def distance(tax: Taxonomy, sampleA: Iterable[Int], sampleB: Iterable[Int]): Double = {
    val a = branchSet(tax, sampleA)
    val b = branchSet(tax, sampleB)
    val union = (a | b).size
    if (union == 0) 0.0
    else (a ^ b).size.toDouble / union
  }

  /** Pairwise distance matrix over many samples (driver-side; sample counts
    * are small even when read counts are not). */
  def distanceMatrix(tax: Taxonomy, samples: Seq[(String, Iterable[Int])])
      : Seq[(String, String, Double)] = {
    val sets = samples.map { case (n, ts) => (n, branchSet(tax, ts)) }
    for {
      i <- sets.indices
      j <- (i + 1) until sets.size
    } yield {
      val (na, a) = sets(i)
      val (nb, b) = sets(j)
      val union = (a | b).size
      (na, nb, if (union == 0) 0.0 else (a ^ b).size.toDouble / union)
    }
  }
}
