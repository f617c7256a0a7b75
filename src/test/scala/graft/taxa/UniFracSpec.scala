package graft.taxa

import org.scalatest.funsuite.AnyFunSuite
import graft.PropChecks

class UniFracSpec extends AnyFunSuite with PropChecks {

  val tax = Taxonomy.fromTuples(Seq(
    (2, 1, "genus", "g1"), (3, 1, "genus", "g2"),
    (4, 2, "species", "s4"), (5, 2, "species", "s5"),
    (6, 3, "species", "s6")))

  test("identical samples have distance 0, disjoint clades close to 1") {
    assert(UniFrac.distance(tax, Seq(4, 5), Seq(4, 5)) == 0.0)
    // {4} vs {6}: branches {4,2} vs {6,3} — fully disjoint
    assert(UniFrac.distance(tax, Seq(4), Seq(6)) == 1.0)
    // {4} vs {5}: share branch 2 — distance 2/3
    assert(math.abs(UniFrac.distance(tax, Seq(4), Seq(5)) - 2.0 / 3.0) < 1e-12)
  }

  test("distance is symmetric and bounded") {
    import org.scalacheck.Gen
    val taxaGen = Gen.listOf(Gen.oneOf(2, 3, 4, 5, 6))
    forAll(taxaGen, taxaGen) { (a, b) =>
      val d1 = UniFrac.distance(tax, a, b)
      val d2 = UniFrac.distance(tax, b, a)
      assert(d1 == d2 && d1 >= 0.0 && d1 <= 1.0)
    }
  }

  test("distance matrix covers all pairs") {
    val m = UniFrac.distanceMatrix(tax,
      Seq("s1" -> Seq(4), "s2" -> Seq(5), "s3" -> Seq(6)))
    assert(m.size == 3)
    assert(m.forall { case (_, _, d) => d > 0.0 && d <= 1.0 })
  }
}

class SequencesGapSpec extends AnyFunSuite with graft.SparkSessionTestWrapper {
  import graft.sources.{InputFragment, Sequences}
  import java.nio.file.Files

  test("file-list expansion, format dispatch, multi-file union") {
    val dir = Files.createTempDirectory("graft-gap")
    Files.writeString(dir.resolve("a.fasta"), ">s1\nACGT\n")
    Files.writeString(dir.resolve("b.fastq"), "@r1\nTTTT\n+\nIIII\n")
    Files.writeString(dir.resolve("list.txt"),
      s"${dir.resolve("a.fasta")}\n${dir.resolve("b.fastq")}\n")
    val expanded = Sequences.expandFileList(spark, Seq(s"@${dir.resolve("list.txt")}"))
    assert(expanded.size == 2)
    val all = Sequences.forFiles(spark, Seq(s"@${dir.resolve("list.txt")}"))
      .collect().map(f => f.header -> f.nucleotides).toMap
    assert(all == Map("s1" -> "ACGT", "r1" -> "TTTT"))
  }

  test("reverse-complement augmentation doubles fragments") {
    import spark.implicits._
    val ds = spark.createDataset(Seq(InputFragment("x", 0L, "ACGT", None)))
    val rc = Sequences.withReverseComplements(ds).collect().sortBy(_.header)
    assert(rc.length == 2)
    assert(rc(1).header == "x/rc" && rc(1).nucleotides == "ACGT") // ACGT is its own RC
  }

  test("sampling is deterministic under a fixed seed") {
    import spark.implicits._
    val ds = spark.createDataset((0 until 1000).map(i =>
      InputFragment(s"f$i", 0L, "ACGT", None)))
    val a = Sequences.sampled(ds, 0.3).collect().map(_.header).toSet
    val b = Sequences.sampled(ds, 0.3).collect().map(_.header).toSet
    assert(a == b && a.size > 200 && a.size < 400)
  }
}

class IndexCompareSpec extends AnyFunSuite with graft.SparkSessionTestWrapper {
  import graft.index._

  val tax = Taxonomy.fromTuples(Seq(
    (2, 1, "genus", "g1"), (4, 2, "species", "s4"), (5, 2, "species", "s5")))
  lazy val bcTax = spark.sparkContext.broadcast(tax)

  test("index comparison counts LCA depth migrations") {
    import spark.implicits._
    val a = Seq((1L, 4), (2L, 4), (3L, 5)).toDF("id1", "taxon")
    val b = Seq((1L, 4), (2L, 2), (4L, 5)).toDF("id1", "taxon") // 2L lifted, 3L gone, 4L new
    val got = IndexOps.compareIndexes(a, b, bcTax, Seq("id1")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got(0) == 1)   // 1L unchanged
    assert(got(-1) == 1)  // 2L species(2) -> genus(1)
    // 3L: b side NONE -> depth -1; steps = -1 - 2 = -3
    assert(got(-3) == 1)
    // 4L: a side NONE; steps = 2 - (-1) = 3
    assert(got(3) == 1)
  }

  test("index comparison runs on two-long wide keys") {
    import spark.implicits._
    val a = Seq((1L, 9L, 4), (2L, 0L, 4), (2L, 1L, 5)).toDF("id1", "id2", "taxon")
    val b = Seq((1L, 9L, 4), (2L, 0L, 2), (9L, 9L, 5)).toDF("id1", "id2", "taxon")
    val got = IndexOps.compareIndexes(a, b, bcTax, Seq("id1", "id2")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got(0) == 1)  // (1,9) unchanged
    assert(got(-1) == 1) // (2,0) lifted species -> genus
    assert(got(-3) == 1) // (2,1) only in a
    assert(got(3) == 1)  // (9,9) only in b
  }

  test("coverage summary emits the standard statistics rows") {
    import spark.implicits._
    val recs = Seq((1L, 4), (2L, 4), (3L, 5)).toDF("id1", "taxon")
    val stats = IndexOps.coverageSummary(recs).collect()
      .map(r => r.getString(0)).toSet
    assert(Set("count", "mean", "min", "max").subsetOf(stats))
  }
}

class BrackenCheckpointSpec extends AnyFunSuite with graft.SparkSessionTestWrapper {
  import graft.index._
  import scala.util.Random

  test("chunked checkpointed weights equal the single-pass weights") {
    import spark.implicits._
    val rng = new Random(37)
    def dna(n: Int) = Array.fill(n)("ACGT"(rng.nextInt(4))).mkString
    val tax = Taxonomy.fromTuples(Seq(
      (2, 1, "genus", "g"), (4, 2, "species", "s4"), (5, 2, "species", "s5")))
    val bcTax = spark.sparkContext.broadcast(tax)
    val params = IndexParams(k = 35, m = 31, spaces = 7, buckets = 4)
    val index = new MinimizerIndex(params, bcTax)
    val bracken = new Bracken(params, bcTax)
    val lib = spark.createDataset(Seq(4 -> dna(800), 5 -> dna(800)))
    val records = index.makeRecords(lib).cache()

    val direct = bracken.weights(lib, records, 100)
      .as[(Int, Int, Long)].collect().toSet
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ck").toString + "/w"
    val gradual = bracken.weightsGradually(lib, records, 100, ckpt, chunks = 3)
      .as[(Int, Int, Long)].collect().toSet
    assert(gradual == direct)
    // resuming with completed chunks is a no-op (idempotent)
    val resumed = bracken.weightsGradually(lib, records, 100, ckpt, chunks = 3)
      .as[(Int, Int, Long)].collect().toSet
    assert(resumed == direct)
  }
}
