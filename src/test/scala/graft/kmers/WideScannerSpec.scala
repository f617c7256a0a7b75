package graft.kmers

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.PropChecks

class WideScannerSpec extends AnyFunSuite with PropChecks {
  import Gens._

  def decode2(hi: Long, lo: Long, m: Int): String =
    (if (m > 32) Dna.decode(hi, m - 32) else "") + Dna.decode(lo, 32)

  /** Brute-force wide minimizer of the k-mer at offset i. */
  def bruteMin(seq: String, i: Int, k: Int, p: WideRandomXorPriority): (Long, Long) = {
    val m = p.width
    val out = new Array[Long](2)
    var best: (Long, Long) = null
    var j = i
    while (j + m <= i + k) {
      val mer = seq.substring(j, j + m)
      val hi = Dna.encode(mer.substring(0, m - 32))
      val lo = Dna.encode(mer.substring(m - 32))
      p.priorityOf(hi, lo, out)
      val cand = (out(0), out(1))
      if (best == null ||
        WideRandomXorPriority.unsignedLess(cand._1, cand._2, best._1, best._2))
        best = cand
      j += 1
    }
    best
  }

  val wideCase: Gen[(String, Int, Int)] = for {
    m <- Gen.chooseNum(33, 64)
    k <- Gen.chooseNum(m, m + 30)
    s <- dnaString(k, 2 * k + 40)
  } yield (s, m, k)

  test("two-word rolling rc matches string reverse complement") {
    forAll(Gen.chooseNum(33, 64).flatMap(m => dnaString(m, m))) { s =>
      val m = s.length
      val hi = Dna.encode(s.substring(0, m - 32))
      val lo = Dna.encode(s.substring(m - 32))
      val (rh, rl) = WideRandomXorPriority.rc(hi, lo, m - 32)
      assert(decode2(rh, rl, m) == Dna.reverseComplement(s))
    }
  }

  test("wide per-kmer minimizer matches brute force; counts sum correctly") {
    forAll(wideCase) { case (s, m, k) =>
      val p = new WideRandomXorPriority(m)
      val sc = new WideSupermerScanner(k, p)
      val sms = sc.scan(s).toVector
      assert(sms.map(_.kmers).sum == s.length - k + 1)
      val perKmer = sms.flatMap(sm => Vector.fill(sm.kmers)((sm.minHi, sm.minLo)))
      val expected = (0 to s.length - k).map(i => bruteMin(s, i, k, p))
      assert(perKmer == expected)
      for (w <- sms.sliding(2) if sms.size > 1)
        assert((w(0).minHi, w(0).minLo) != (w(1).minHi, w(1).minLo))
    }
  }

  test("wide canonical minimizer multiset is reverse-complement invariant") {
    forAll(wideCase) { case (s, m, k) =>
      val sc = new WideSupermerScanner(k, new WideRandomXorPriority(m))
      val fwd = sc.scan(s).map(sm => (sm.minHi, sm.minLo)).toVector.sorted
      val rev = sc.scan(Dna.reverseComplement(s))
        .map(sm => (sm.minHi, sm.minLo)).toVector.sorted
      assert(fwd == rev)
    }
  }
}

class WideIndexSpec extends AnyFunSuite with graft.SparkSessionTestWrapper {
  import graft.index.WideMinimizerIndex
  import graft.sources.InputFragment
  import graft.taxa.Taxonomy
  import scala.util.Random

  val rng = new Random(47)
  def dna(n: Int) = Array.fill(n)("ACGT"(rng.nextInt(4))).mkString

  test("wide-m end-to-end: build (id1,id2) records and classify reads") {
    import spark.implicits._
    val tax = Taxonomy.fromTuples(Seq(
      (2, 1, "genus", "g"), (4, 2, "species", "s4"), (5, 2, "species", "s5")))
    val bcTax = spark.sparkContext.broadcast(tax)
    val index = new WideMinimizerIndex(k = 50, m = 40, bcTax)
    val genomes = Map(4 -> dna(3000), 5 -> dna(3000))
    val records = index.makeRecords(spark.createDataset(genomes.toSeq)).cache()
    assert(records.columns.toSeq == Seq("id1", "id2", "taxon"))
    assert(records.count() > 0)
    // distinct (hi, lo) pairs computed locally agree
    val local = genomes.values.flatMap(g =>
      index.scanner.scan(g).map(sm => (sm.minHi, sm.minLo))).toSet
    assert(records.count() == local.size)

    val reads = (0 until 100).map { i =>
      val t = if (i % 2 == 0) 4 else 5
      val g = genomes(t)
      val s = rng.nextInt(g.length - 150)
      InputFragment(s"w$i|src=$t", 0L, g.substring(s, s + 150), None)
    }
    val got = index.classifyReport(index.spans(spark.createDataset(reads)), records)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got.size == 100)
    var classified = 0
    for ((title, taxon) <- got if taxon != Taxonomy.NONE) {
      classified += 1
      assert(tax.hasAncestor(title.split("src=")(1).toInt, taxon))
    }
    assert(classified > 90)
  }
}
