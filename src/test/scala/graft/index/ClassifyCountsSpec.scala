package graft.index

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSessionTestWrapper
import graft.sources.InputFragment
import graft.taxa.Taxonomy
import scala.util.Random

/** Equivalence contract for the r21 count-only regroup
  * ([[ClassifyKernel.groupCounts]]/[[resolveCounts]] — the `detail = false`
  * path drops the span ordinals and distinct flags from the collect_list
  * buffer): per-read decisions must be IDENTICAL to the full
  * [[ClassifyKernel.group]]+[[resolve]] pipeline at `detail = false`
  * semantics, across confidence thresholds, hit-group gates, chimeric
  * (tie-forcing) reads, paired-end mate borders and ambiguity sentinels,
  * and under row-order permutations (the narrow path must stay as
  * order-insensitive as the wide one). */
class ClassifyCountsSpec extends AnyFunSuite with SparkSessionTestWrapper {

  val rng = new Random(2711)
  def randomDna(n: Int): String =
    Array.fill(n)("ACGT"(rng.nextInt(4))).mkString

  val tax = Taxonomy.fromTuples(Seq(
    (2, 1, "genus", "g1"), (3, 1, "genus", "g2"),
    (4, 2, "species", "s4"), (5, 2, "species", "s5"),
    (6, 3, "species", "s6")))

  val genomes: Map[Int, String] =
    Map(4 -> randomDna(3000), 5 -> randomDna(3000), 6 -> randomDna(3000))

  val params = IndexParams(k = 35, m = 31, spaces = 0, buckets = 4)

  lazy val bcTax = spark.sparkContext.broadcast(tax)
  lazy val index = new MinimizerIndex(params, bcTax)
  lazy val records = {
    import spark.implicits._
    index.makeRecords(spark.createDataset(genomes.toSeq)).cache()
  }

  /** Pure, chimeric (tie-forcing), ambiguity-carrying and paired reads —
    * every sentinel arm of the regroup. */
  lazy val reads: Seq[InputFragment] = {
    val pure = for {
      (t, g) <- genomes.toSeq; i <- 0 until 25
      off = (i * 101) % (g.length - 120)
    } yield InputFragment(s"pure_${t}_$i", 0L, g.substring(off, off + 120), None)
    val chimeric = for {
      (a, b) <- Seq((4, 5), (4, 6), (5, 6)); i <- 0 until 25
      offA = (i * 89) % (genomes(a).length - 80)
      offB = (i * 83) % (genomes(b).length - 80)
    } yield InputFragment(s"chi_${a}_${b}_$i", 0L,
      genomes(a).substring(offA, offA + 80) +
        genomes(b).substring(offB, offB + 80), None)
    val ambiguous = for (i <- 0 until 10) yield InputFragment(s"amb_$i", 0L,
      genomes(4).substring(i * 7, i * 7 + 50) + ("N" * 40) +
        genomes(5).substring(i * 11, i * 11 + 50), None)
    val paired = for (i <- 0 until 10) yield InputFragment(s"pair_$i", 0L,
      genomes(6).substring(i * 13, i * 13 + 60),
      Some(genomes(4).substring(i * 17, i * 17 + 60)))
    pure ++ chimeric ++ ambiguous ++ paired
  }

  test("count-only regroup decisions == full regroup decisions (detail=false semantics)") {
    import spark.implicits._
    val spans = index.spans(spark.createDataset(reads))
    val joined = spans.toDF().drop("id2", "id3", "id4")
      .join(records, index.keyCols, "left")
    for (conf <- Seq(0.0, 0.2); mhg <- Seq(1, 2)) {
      val wide = ClassifyKernel.resolve(ClassifyKernel.group(joined),
          bcTax, conf, mhg, detail = false)
        .select($"title", $"classified", $"taxon", $"length", $"hits")
        .as[(String, Boolean, Int, Int, String)].collect()
        .map { case (t, c, x, l, h) => t -> ((c, x, l, h)) }.toMap
      val slim = ClassifyKernel.resolveCounts(ClassifyKernel.groupCounts(joined),
          bcTax, conf, mhg)
        .select($"title", $"classified", $"taxon", $"length", $"hits")
        .as[(String, Boolean, Int, Int, String)].collect()
        .map { case (t, c, x, l, h) => t -> ((c, x, l, h)) }.toMap
      assert(wide.keySet == slim.keySet, s"conf=$conf mhg=$mhg: read sets differ")
      val diff = wide.keySet.filter(k => wide(k) != slim(k))
      assert(diff.isEmpty, s"conf=$conf mhg=$mhg: " +
        diff.take(5).map(k => s"$k: ${wide(k)} vs ${slim(k)}"))
      // the fixture must actually exercise ties, gates and sentinels
      assert(wide.keys.count(_.startsWith("chi_")) > 0)
      assert(wide.keys.count(_.startsWith("amb_")) > 0)
      assert(wide.keys.count(_.startsWith("pair_")) > 0)
    }
  }

  test("detail=true keeps the wide hit struct; detail=false ships no ordinals") {
    import spark.implicits._
    val spans = index.spans(spark.createDataset(reads.take(20)))
    val joined = spans.toDF().drop("id2", "id3", "id4")
      .join(records, index.keyCols, "left")
    // the Kraken hit-string lanes NEED ordinals and distinct flags in the
    // buffer — pin the wide struct so a future count-only "optimization"
    // cannot silently narrow the detail=true path (r22, verdict item 9)
    val wide = ClassifyKernel.resolve(ClassifyKernel.group(joined),
      bcTax, 0.0, 1, detail = true)
    val wplan = wide.queryExecution.optimizedPlan.toString
    assert(wplan.contains("collect_list"),
      s"detail=true regroup lost its collect_list:\n$wplan")
    for (f <- Seq("ordinal", "distinct"))
      assert(wplan.contains(f),
        s"detail=true regroup no longer carries '$f':\n$wplan")
    // and the count-only twin must stay narrow: taxon_counts aggregate,
    // no collect_list, no ordinal column surviving into the regroup
    val slim = ClassifyKernel.resolveCounts(
      ClassifyKernel.groupCounts(joined), bcTax, 0.0, 1)
    val splan = slim.queryExecution.optimizedPlan.toString
    assert(splan.contains("taxon_counts"),
      s"count-only regroup lost the taxon_counts aggregate:\n$splan")
    assert(!splan.contains("collect_list"),
      s"count-only regroup regressed to collect_list:\n$splan")
    assert(!splan.contains("ordinal"),
      s"count-only regroup still ships ordinals:\n$splan")
  }

  test("count-only regroup is order-insensitive") {
    import spark.implicits._
    val spans = index.spans(spark.createDataset(reads)).cache()
    spans.count()
    def decisions(perm: org.apache.spark.sql.Dataset[KeyedOrdinalSpan]) =
      ClassifyKernel.resolveCounts(
          ClassifyKernel.groupCounts(perm.toDF().drop("id2", "id3", "id4")
            .join(records, index.keyCols, "left")),
          bcTax, 0.15, 1)
        .select($"title", $"taxon").as[(String, Int)].collect().toMap
    val base = decisions(spans)
    for ((name, perm) <- Seq(
        "shuffled-sort" -> spans.orderBy(rand(7)),
        "skewed-repartition" -> spans.repartition(3, rand(13)))) {
      val d = decisions(perm)
      assert(d == base, s"'$name' flipped count-only decisions")
    }
    spans.unpersist()
  }
}
