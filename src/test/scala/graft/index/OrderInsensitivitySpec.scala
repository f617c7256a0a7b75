package graft.index

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSessionTestWrapper
import graft.sources.InputFragment
import graft.taxa.Taxonomy
import scala.util.Random

/** Order-insensitivity CONTRACT on the CollectAligned consumers (r17
  * verdict ask #3): `CollectAligned`'s output array order is whatever row
  * order the aggregate consumed, and a retried/speculated task or an AQE
  * re-partition can permute it between runs. Both consumers — the classify
  * resolver ([[ClassifyKernel]] via the per-(read, taxon) level-1
  * aggregate / [[IndexOps.classifyReport]]) and bracken's per-fragment
  * window resolve ([[Bracken.weights]]) — are order-insensitive by
  * construction (the resolver's tie handling LCA-folds ALL max-scoring
  * taxa, which is commutative; bracken builds a key->LCA hash map over
  * per-fragment-distinct keys), but until this spec nothing asserted it.
  * A future order-SENSITIVE consumer fails here in CI instead of flaking
  * at scale.
  *
  * Protocol: feed deliberately permuted row orders (shuffled sort, skewed
  * repartition, random sort-within-partitions, single partition reversed)
  * into the SAME computation and assert byte-identical final outputs:
  * per-read decisions, the rendered kreport, and bracken (source, dest,
  * reads) triples.
  */
class OrderInsensitivitySpec extends AnyFunSuite with SparkSessionTestWrapper {

  val rng = new Random(1918)
  def randomDna(n: Int): String =
    Array.fill(n)("ACGT"(rng.nextInt(4))).mkString

  // root(1) <- 2,3 (genus); 2 <- 4,5; 3 <- 6 — sibling species force
  // genuine LCA ties when a chimeric read hits both
  val tax = Taxonomy.fromTuples(Seq(
    (2, 1, "genus", "g1"), (3, 1, "genus", "g2"),
    (4, 2, "species", "s4"), (5, 2, "species", "s5"),
    (6, 3, "species", "s6")))

  val genomes: Map[Int, String] =
    Map(4 -> randomDna(4000), 5 -> randomDna(4000), 6 -> randomDna(4000))

  val params = IndexParams(k = 35, m = 31, spaces = 0, buckets = 4)

  lazy val bcTax = spark.sparkContext.broadcast(tax)
  lazy val index = new MinimizerIndex(params, bcTax)

  lazy val lib = {
    import spark.implicits._
    spark.createDataset(genomes.toSeq)
  }
  lazy val records = index.makeRecords(lib).cache()

  /** Reads engineered to exercise the tie paths: pure per-taxon reads plus
    * chimeric reads splicing equal-length halves of two genomes (equal hit
    * mass on sibling and cross-genus taxa — exactly where an
    * order-dependent resolver would flip). */
  lazy val reads: Seq[InputFragment] = {
    val pure = for {
      (t, g) <- genomes.toSeq; i <- 0 until 40
      off = (i * 97) % (g.length - 120)
    } yield InputFragment(s"pure_${t}_$i", 0L, g.substring(off, off + 120), None)
    val chimeric = for {
      (a, b) <- Seq((4, 5), (4, 6), (5, 6)); i <- 0 until 40
      offA = (i * 89) % (genomes(a).length - 80)
      offB = (i * 83) % (genomes(b).length - 80)
    } yield InputFragment(s"chi_${a}_${b}_$i", 0L,
      genomes(a).substring(offA, offA + 80) +
        genomes(b).substring(offB, offB + 80), None)
    pure ++ chimeric
  }

  /** The deliberate row-order permutations, applied to any DataFrame-like
    * dataset: each changes the order (and partition placement) rows reach
    * downstream aggregates in, without changing the multiset of rows. */
  def permutations[T](ds: org.apache.spark.sql.Dataset[T])
      : Seq[(String, org.apache.spark.sql.Dataset[T])] = Seq(
    "as-is" -> ds,
    "shuffled-sort" -> ds.orderBy(rand(7)),
    "skewed-repartition" -> ds.repartition(3, rand(13)),
    "sorted-within-partitions" -> ds.repartition(5)
      .sortWithinPartitions(rand(17)),
    "single-partition-reversed" -> ds.coalesce(1).orderBy(rand(19)))

  test("classify decisions and kreport are identical under span permutation") {
    import spark.implicits._
    val spans = index.spans(spark.createDataset(reads)).cache()
    spans.count()
    // confidence > 0 exercises the resolver's clade-lift loop too
    for (conf <- Seq(0.0, 0.15); minHitGroups <- Seq(1, 2)) {
      val runs = permutations(spans).map { case (name, perm) =>
        val classified = index.classify(perm, records,
          confidence = conf, minHitGroups = minHitGroups)
        val decisions = classified.select($"title", $"taxon")
          .as[(String, Int)].collect().toMap
        val kreport = ClassifyKernel.report(classified, bcTax)
          .lines.mkString("\n")
        (name, decisions, kreport)
      }
      val (_, baseDec, baseRep) = runs.head
      assert(baseDec.size == reads.size)
      // the fixture must actually exercise multi-taxon resolution
      assert(baseDec.count(_._1.startsWith("chi_")) > 0)
      for ((name, dec, rep) <- runs.tail) {
        val diff = (baseDec.keySet ++ dec.keySet)
          .filter(k => baseDec.get(k) != dec.get(k))
        assert(diff.isEmpty,
          s"conf=$conf mhg=$minHitGroups: '$name' flipped decisions for " +
            diff.take(5).map(k => s"$k: ${baseDec.get(k)} vs ${dec.get(k)}"))
        assert(rep == baseRep,
          s"conf=$conf mhg=$minHitGroups: '$name' changed the kreport")
      }
    }
    spans.unpersist()
  }

  test("classifyReport (SQL CollectAligned path) is identical under span permutation") {
    import spark.implicits._
    val spans = index.spans(spark.createDataset(reads)).cache()
    spans.count()
    val runs = permutations(spans).map { case (name, perm) =>
      name -> IndexOps.classifyReport(index, perm, records,
        confidence = 0.1, minHitGroups = 1)
        .as[(Int, Long)].collect().toMap
    }
    val (_, base) = runs.head
    assert(base.values.sum == reads.size)
    for ((name, counts) <- runs.tail)
      assert(counts == base, s"'$name' changed the per-taxon report counts")
    spans.unpersist()
  }

  test("bracken triples are identical under library permutation") {
    import spark.implicits._
    val bracken = new Bracken(params, bcTax)
    // duplicate rows in the library exercise the weight (dedup) path
    val libDup = lib.union(spark.createDataset(Seq(4 -> genomes(4))))
    val runs = permutations(libDup).map { case (name, perm) =>
      name -> bracken.weights(perm, records, readLen = 100)
        .select($"source".cast("long"), $"dest".cast("long"), $"reads")
        .as[(Long, Long, Long)].collect().sorted.toSeq
    }
    val (_, base) = runs.head
    assert(base.nonEmpty)
    for ((name, triples) <- runs.tail)
      assert(triples == base, s"'$name' changed the weight triples")
  }
}
