package graft.taxa

import org.scalatest.funsuite.AnyFunSuite
import graft.PropChecks
import org.scalacheck.Gen

object TaxGens {
  /** Random tree over ids 1..n: parent of node i is a random smaller id. */
  def taxonomy(maxSize: Int): Gen[Taxonomy] = for {
    n <- Gen.chooseNum(2, maxSize)
    parents <- Gen.sequence[Vector[Int], Int](
      (2 to n).map(i => Gen.chooseNum(1, i - 1)))
  } yield Taxonomy.fromTuples(
    (2 to n).map(i => (i, parents(i - 2), Taxonomy.rankNames(
      1 + (i % (Taxonomy.rankNames.length - 1))), s"taxon$i")))
}

class TaxonomySpec extends AnyFunSuite with PropChecks {
  import TaxGens._

  val taxAndTwo: Gen[(Taxonomy, Int, Int)] = for {
    t <- taxonomy(60)
    a <- Gen.chooseNum(1, t.size - 1)
    b <- Gen.chooseNum(1, t.size - 1)
  } yield (t, a, b)

  test("lca is an ancestor of both, and the lowest such") {
    forAll(taxAndTwo) { case (t, a, b) =>
      val l = t.lca(a, b)
      assert(t.hasAncestor(a, l) && t.hasAncestor(b, l))
      // no child of l on a's path is also an ancestor of b
      var cur = a
      while (cur != l) {
        assert(!t.hasAncestor(b, cur))
        cur = t.parents(cur)
      }
    }
  }

  test("lca is commutative, idempotent, and NONE is the identity") {
    forAll(taxAndTwo) { case (t, a, b) =>
      assert(t.lca(a, b) == t.lca(b, a))
      assert(t.lca(a, a) == a)
      assert(t.lca(a, Taxonomy.NONE) == a)
      assert(t.lca(Taxonomy.NONE, b) == b)
    }
  }

  test("depths increase by one from parent to child") {
    forAll(taxonomy(60)) { t =>
      for (x <- t.taxa if x != Taxonomy.ROOT)
        assert(t.depths(x) == t.depths(t.parents(x)) + 1)
      assert(t.depths(Taxonomy.ROOT) == 0)
    }
  }

  test("clade closure contains the seed, its descendants, nothing else") {
    forAll(taxAndTwo) { case (t, a, _) =>
      val clade = t.withDescendants(Seq(a))
      for (x <- t.taxa)
        assert(clade.contains(x) == t.hasAncestor(x, a))
    }
  }

  test("withAncestors walks to root") {
    forAll(taxAndTwo) { case (t, a, _) =>
      val anc = t.withAncestors(Seq(a))
      assert(anc.contains(Taxonomy.ROOT) && anc.contains(a))
      for (x <- anc) assert(t.hasAncestor(a, x))
    }
  }

  // canary for construction-time breakage: plain construction + a basic LCA
  // must work without any factory indirection (round-2 shipped an init-order
  // NPE that this exact call path exposes)
  test("fromTuples constructs and answers lca(ROOT, leaf)") {
    val t = Taxonomy.fromTuples(Seq(
      (2, 1, "superkingdom", "sk"),
      (3, 2, "species", "sp")))
    assert(t.isDefined(3))
    assert(t.lca(Taxonomy.ROOT, 3) == Taxonomy.ROOT)
    assert(t.lca(3, 2) == 2)
    assert(t.depths(3) == 2)
  }

  test("rankDepth keeps rank-skipping lineages under a rank cutoff") {
    // 4 is a species whose lineage skips genus entirely: a genus cutoff
    // (rankDepth >= genus code) must keep it, while ancestorAtRank(genus)
    // would report NONE and drop it (the camiReport parity bug).
    val t = Taxonomy.fromTuples(Seq(
      (2, 1, "superkingdom", "sk"),
      (3, 2, "no rank", "unranked-mid"),
      (4, 3, "species", "skipper"),
      (5, 2, "genus", "g"),
      (6, 5, "no rank", "unranked-leaf")))
    val genus = Taxonomy.rankCode("genus")
    val species = Taxonomy.rankCode("species")
    assert(t.rankDepth(4) == species)
    assert(t.rankDepth(4) >= genus)                      // kept under genus cutoff
    assert(t.ancestorAtRank(4, genus) == Taxonomy.NONE)  // the old check drops it
    assert(t.rankDepth(6) == genus)   // unranked leaf inherits nearest ranked ancestor
    assert(t.rankDepth(3) == Taxonomy.rankCode("superkingdom"))
    assert(t.rankDepth(Taxonomy.ROOT) == 0)  // root lineage has no ranked node
    assert(t.rankDepth(99) == -1 && t.rankDepth(0) == -1) // undefined ids
  }

  test("dangling parent chain is severed, not ROOT-deep and not a hang") {
    // 5 -> 4 -> 99 (undefined, out of the id space reachable as a node)
    val t = Taxonomy.fromTuples(Seq(
      (2, 1, "superkingdom", "sk"),
      (4, 99, "genus", "dangling-mid"),
      (5, 4, "species", "dangling-leaf"),
      (99, 0, "no rank", null))) // 99 explicitly undefined (parent NONE)
    assert(t.isDefined(2))
    assert(!t.isDefined(4) && !t.isDefined(5))
    assert(t.depths(4) < 0 && t.depths(5) < 0)
    assert(t.lca(2, 5) == Taxonomy.ROOT) // undefined operand -> defensive ROOT
  }

  test("parent cycle is severed, not a hang") {
    val t = Taxonomy.fromTuples(Seq(
      (2, 1, "superkingdom", "sk"),
      (3, 4, "genus", "cyc-a"),
      (4, 3, "genus", "cyc-b")))
    assert(!t.isDefined(3) && !t.isDefined(4))
    assert(t.isDefined(2) && t.depths(2) == 1)
  }

  test("negative parent id is treated as dangling, not AIOOBE") {
    val t = Taxonomy.fromTuples(Seq(
      (2, 1, "superkingdom", "sk"),
      (3, -7, "genus", "neg")))
    assert(!t.isDefined(3))
    assert(t.isDefined(2))
  }

  test("constructor does not mutate the caller's parents array") {
    // id 3 has a dangling parent; severing must happen on an internal copy
    val parents = Array(0, 0, 1, 98)
    val ranks = Array.fill[Byte](4)(0)
    val names = Array[String](null, "root", "a", "b")
    val t = new Taxonomy(parents, ranks, names)
    assert(parents(3) == 98)   // caller copy untouched
    assert(t.parents(3) == Taxonomy.NONE) // internal copy severed
  }

  test("NCBI dump parsing") {
    val nodes = Iterator(
      "1\t|\t1\t|\tno rank\t|",
      "2\t|\t1\t|\tsuperkingdom\t|",
      "9606\t|\t2\t|\tspecies\t|")
    val names = Iterator(
      "1\t|\troot\t|\t\t|\tscientific name\t|",
      "2\t|\tBacteria\t|\t\t|\tscientific name\t|",
      "9606\t|\tHomo sapiens\t|\t\t|\tscientific name\t|")
    val merged = Iterator("666\t|\t9606\t|")
    val t = Taxonomy.fromDumpLines(nodes, names, merged)
    assert(t.parents(9606) == 2 && t.parents(2) == Taxonomy.ROOT)
    assert(t.names(9606) == "Homo sapiens")
    assert(t.rankName(9606) == "species")
    assert(t.parents(666) == t.parents(9606)) // merged alias
    assert(t.lca(9606, 2) == 2)
  }
}

class LcaResolverSpec extends AnyFunSuite {
  // chain: 1 <- 2 <- 3 <- 4 (species), plus sibling 5 under 2
  val tax = Taxonomy.fromTuples(Seq(
    (2, 1, "superkingdom", "sk"),
    (3, 2, "genus", "g"),
    (4, 3, "species", "s1"),
    (5, 2, "genus", "g2")))
  val resolver = new LcaResolver(tax)

  test("single dominant taxon wins") {
    assert(resolver.classify(Seq((4, 10), (0, 2)), 0.0) == 4)
  }

  test("hits on different branches resolve to their LCA on a tie") {
    // 4 and 5 diverge at 2; equal path scores -> LCA lifting
    assert(resolver.classify(Seq((4, 5), (5, 5)), 0.0) == 2)
  }

  test("ancestor hits add to descendant path scores") {
    // taxon 3 is on 4's root path: 4's path score = 6+5 beats 5's 5
    assert(resolver.classify(Seq((3, 6), (4, 1), (5, 5)), 0.0) == 4)
  }

  test("confidence threshold lifts toward the root") {
    // 10 of 20 k-mers hit taxon 4; threshold 0.75 cannot be met at 4,
    // nor anywhere (only 10/20 classified) -> NONE
    assert(resolver.classify(Seq((4, 10), (0, 10)), 0.75) == Taxonomy.NONE)
    // threshold 0.5 met at 4
    assert(resolver.classify(Seq((4, 10), (0, 10)), 0.5) == 4)
  }

  test("ambiguous spans dilute confidence but never score") {
    // 5 hits on 4, 5 ambiguous: total=10, conf 0.6 -> lift past 4 to NONE
    assert(resolver.classify(Seq((4, 5), (Sentinels.AMBIGUOUS_SPAN, 5)), 0.6) ==
      Taxonomy.NONE)
    assert(resolver.classify(Seq((4, 5), (Sentinels.AMBIGUOUS_SPAN, 5)), 0.5) == 4)
  }

  test("mate-pair border contributes nothing") {
    assert(resolver.classify(Seq((4, 5), (Sentinels.MATE_PAIR_BORDER, 0)), 1.0) == 4)
  }

  test("no hits -> unclassified") {
    assert(resolver.classify(Seq((0, 7)), 0.0) == Taxonomy.NONE)
    assert(resolver.classify(Nil, 0.0) == Taxonomy.NONE)
  }
}
