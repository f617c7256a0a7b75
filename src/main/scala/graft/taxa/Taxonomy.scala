package graft.taxa

import scala.collection.mutable

/** Array-backed taxonomy tree (behavioral spec: reference slacken/Taxonomy.scala).
  * Dense arrays indexed by taxon id; NONE=0 marks undefined nodes; ROOT=1.
  * Driver-side object, broadcast to executors — all tree operations are local
  * array walks. Additionally precomputes a depth array so LCA runs in
  * O(path length) instead of the reference's quadratic buffer scan.
  *
  * @param parents parent taxon per id (ROOT's parent is NONE)
  * @param ranks   rank code per id (index into Taxonomy.rankNames, -1 undefined)
  * @param names   scientific name per id (null if undefined)
  */
final class Taxonomy(
    parents0: Array[Int],
    val ranks: Array[Byte],
    val names: Array[String]) extends Serializable {

  import Taxonomy._

  /** Parent taxon per id (ROOT's parent is NONE). Defensively copied: the
    * depths initializer severs dangling/cyclic chains in place, and callers
    * retaining the constructor array must not observe that. */
  val parents: Array[Int] = parents0.clone()

  val size: Int = parents.length

  /** Depth of each defined taxon (ROOT=0); -1 for undefined ids.
    * Chains that do not reach ROOT (dangling parent ids in malformed input,
    * or cycles) are severed: every node on such a chain gets parent NONE, so
    * it reads as undefined everywhere instead of hanging the walk. */
  val depths: Array[Int] = {
    val d = Array.fill(size)(-1)
    if (ROOT < size) d(ROOT) = 0
    def depthOf(t: Int): Unit = {
      if (t != ROOT && d(t) < 0) {
        // iterative two-pass to avoid deep recursion on long chains
        var path = List.empty[Int]
        var steps = 0
        var cur = t
        while (cur != ROOT && cur > NONE && cur < size && d(cur) < 0 && steps <= size) {
          path ::= cur; cur = parents(cur); steps += 1
        }
        if (cur <= NONE || cur >= size || steps > size) {
          // dangling or cyclic: sever so these ids are undefined, not ROOT-deep
          for (n <- path) parents(n) = NONE
        } else {
          // path head is the node closest to the root; assign downward
          var base = if (cur == ROOT) 0 else d(cur)
          for (n <- path) { base += 1; d(n) = base }
        }
      }
    }
    var t = 0
    while (t < size) {
      // must not call isDefined here: it reads this very field mid-init;
      // the raw parent-link predicate is the construction-time equivalent
      if (t == ROOT || (t > NONE && parents(t) != NONE)) depthOf(t)
      t += 1
    }
    d
  }

  @inline def isDefined(t: Int): Boolean =
    t > 0 && t < size && (t == ROOT || (parents(t) != NONE && depths(t) >= 0))

  def rankName(t: Int): String = {
    val r = ranks(t)
    if (r >= 0 && r < rankNames.length) rankNames(r) else "no rank"
  }

  /** Lowest common ancestor via depth-aligned parallel ascent. NONE is the
    * identity element (LCA fold zero), matching the reference semantics. */
  def lca(a: Int, b: Int): Int = {
    // single-sided folds still validate the survivor: an id absent from the
    // taxonomy must not flow through (it would crash later parent walks).
    // Deliberate deviation from the reference LowestCommonAncestor, which
    // returns the survivor unconditionally; here an undefined survivor maps
    // to ROOT for crash-safety (upstream build filtering keeps undefined ids
    // out of index folds, so this path is defensive only).
    if (a == NONE) return if (b == NONE || isDefined(b)) b else ROOT
    if (b == NONE) return if (isDefined(a)) a else ROOT
    if (!isDefined(a) || !isDefined(b)) return ROOT
    var x = a; var y = b
    while (depths(x) > depths(y)) x = parents(x)
    while (depths(y) > depths(x)) y = parents(y)
    while (x != y) { x = parents(x); y = parents(y) }
    x
  }

  /** Is `anc` an ancestor of (or equal to) `t`? */
  def hasAncestor(t: Int, anc: Int): Boolean = {
    var cur = t
    while (cur != NONE) {
      if (cur == anc) return true
      cur = parents(cur)
    }
    false
  }

  /** Depth of the nearest standard-ranked self-or-ancestor of t. Rank codes
    * are indexes into [[Taxonomy.rankNames]] in depth order (superkingdom=1
    * … species=8), so the code of the first ranked node up the lineage IS
    * its depth; a lineage with no ranked node reads as root depth 0; -1 for
    * ids absent from the taxonomy. Mirrors the reference's Taxonomy.depth
    * (Taxonomy.scala:222-228), which rank-cutoff filters compare with >= —
    * unlike ancestorAtRank != NONE, this keeps rank-skipping lineages (e.g.
    * a species with no genus node) under a genus cutoff. */
  def rankDepth(t: Int): Int = {
    if (!isDefined(t)) return -1
    var cur = t
    while (cur != NONE) {
      if (ranks(cur) > 0) return ranks(cur)
      cur = parents(cur)
    }
    0
  }

  /** Ancestor of t at the given rank code, or NONE. */
  def ancestorAtRank(t: Int, rank: Byte): Int = {
    var cur = t
    while (cur != NONE) {
      if (ranks(cur) == rank) return cur
      cur = parents(cur)
    }
    NONE
  }

  /** All defined taxa. */
  def taxa: Iterator[Int] = Iterator.range(1, size).filter(isDefined)

  /** t plus all its ancestors up to ROOT. */
  def withAncestors(ts: Iterable[Int]): mutable.BitSet = {
    val r = mutable.BitSet.empty
    for (t <- ts) {
      var cur = t
      while (cur != NONE && !r.contains(cur)) { r += cur; cur = parents(cur) }
    }
    r
  }

  /** ts plus all their descendants (clade closure). */
  def withDescendants(ts: Iterable[Int]): mutable.BitSet = {
    val seed = mutable.BitSet.empty ++ ts
    val r = mutable.BitSet.empty ++ ts
    // single pass: a node is in some seed clade iff one of its ancestors is
    var t = 1
    while (t < size) {
      if (isDefined(t) && !r.contains(t)) {
        var cur = t
        var hit = false
        while (cur != NONE && !hit) {
          if (seed.contains(cur)) hit = true else cur = parents(cur)
        }
        if (hit) r += t
      }
      t += 1
    }
    r
  }

  /** Children lists (built on demand, driver-side; used for report DFS). */
  lazy val children: Array[List[Int]] = {
    val ch = Array.fill(size)(List.empty[Int])
    var t = 1
    while (t < size) {
      if (isDefined(t) && t != ROOT) ch(parents(t)) ::= t
      t += 1
    }
    ch
  }
}

object Taxonomy {
  val NONE = 0
  val ROOT = 1

  /** Standard ranks in depth order; codes are indexes into this array. */
  val rankNames: Array[String] = Array(
    "no rank", "superkingdom", "kingdom", "phylum", "class", "order",
    "family", "genus", "species")

  def rankCode(name: String): Byte = {
    val i = rankNames.indexOf(name)
    (if (i < 0) 0 else i).toByte
  }

  /** Build from (taxon, parent, rankName, name) tuples (ROOT implied). */
  def fromTuples(nodes: Seq[(Int, Int, String, String)]): Taxonomy = {
    val maxId = (ROOT +: nodes.map(_._1)).max
    val parents = new Array[Int](maxId + 1)
    val ranks = Array.fill[Byte](maxId + 1)(0)
    val names = new Array[String](maxId + 1)
    names(ROOT) = "root"
    for ((t, p, r, n) <- nodes if t != ROOT) {
      parents(t) = p
      ranks(t) = rankCode(r)
      names(t) = n
    }
    new Taxonomy(parents, ranks, names)
  }

  /** Parse NCBI-style dump files: nodes.dmp (taxid|parent|rank|...),
    * names.dmp (taxid|name|...|scientific name|), merged.dmp (old|new|).
    * (Format spec: reference slacken/Taxonomy.scala:111-137.) */
  def fromDumpLines(nodes: Iterator[String], names: Iterator[String],
      merged: Iterator[String] = Iterator.empty): Taxonomy = {
    def fields(l: String): Array[String] = l.split("\\s*\\|\\s*", -1)
    val nodeList = nodes.map { l =>
      val f = fields(l)
      (f(0).trim.toInt, f(1).trim.toInt, f(2).trim)
    }.toArray
    val nameMap = mutable.Map.empty[Int, String]
    for (l <- names) {
      val f = fields(l)
      if (f.length > 3 && f(3).startsWith("scientific name"))
        nameMap(f(0).trim.toInt) = f(1).trim
    }
    val mergedPairs = merged.map { l =>
      val f = fields(l)
      (f(0).trim.toInt, f(1).trim.toInt)
    }.toArray
    val maxId = (nodeList.map(_._1) ++ mergedPairs.map(_._1) :+ ROOT).max
    val parents = new Array[Int](maxId + 1)
    val ranks = Array.fill[Byte](maxId + 1)(0)
    val nm = new Array[String](maxId + 1)
    for ((t, p, r) <- nodeList) {
      if (t != ROOT) parents(t) = if (p == t) NONE else p
      ranks(t) = rankCode(r)
      nm(t) = nameMap.getOrElse(t, null)
    }
    // merged ids alias their new taxon by sharing the parent link
    for ((old, nw) <- mergedPairs if old != nw && nw < parents.length) {
      parents(old) = parents(nw)
      ranks(old) = ranks(nw)
      nm(old) = nm(nw)
    }
    if (nm(ROOT) == null) nm(ROOT) = "root"
    new Taxonomy(parents, ranks, nm)
  }
}
