package graft.kmers

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.PropChecks

class KmerOpsSpec extends AnyFunSuite with PropChecks {
  import Gens._

  /** Brute-force canonical k-mer strings (the oracle). */
  def bruteCanonical(seq: String, k: Int): Seq[String] =
    (0 to seq.length - k).map { i =>
      val f = seq.substring(i, i + k)
      val r = Dna.reverseComplement(f)
      if (f <= r) f else r
    }

  def decode2(hi: Long, lo: Long, k: Int): String = {
    val hiBases = math.max(0, k - 32)
    (if (hiBases > 0) Dna.decode(hi, hiBases) else "") + Dna.decode(lo, k - hiBases)
  }

  val kmerCase: Gen[(String, Int)] = for {
    k <- Gen.chooseNum(1, 64)
    s <- dnaString(k, 2 * k + 50)
  } yield (s, k)

  test("packed canonical k-mers match brute-force string canonicalization") {
    forAll(kmerCase) { case (s, k) =>
      val got = KmerOps.canonicalKmers(s, k).map { case (h, l) => decode2(h, l, k) }.toSeq
      // lexicographic string order == unsigned order of the 2-bit packing
      assert(got == bruteCanonical(s, k))
    }
  }

  test("k-mers spanning ambiguous bases are excluded") {
    val got = KmerOps.canonicalKmers("ACGTNACGT", 4).size
    assert(got == 2) // only ACGT on each side contributes one 4-mer each
  }

  test("distinct counts per taxon on Spark match local sets") {
    val spark = graft.SparkSessionTestWrapper.session
    import spark.implicits._
    val rng = new scala.util.Random(41)
    def dna(n: Int) = Array.fill(n)("ACGT"(rng.nextInt(4))).mkString
    val lib = Map(4 -> dna(500), 5 -> dna(500))
    val got = KmerOps.distinctKmersPerTaxon(
      spark.createDataset(lib.toSeq), 35).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    for ((t, g) <- lib) {
      val local = bruteCanonical(g, 35)
      assert(got(t) == ((local.distinct.size.toLong, local.size.toLong)))
    }
    assert(KmerOps.distinctKmerCount(spark.createDataset(lib.toSeq), 35) ==
      lib.values.flatMap(g => bruteCanonical(g, 35)).toSet.size)
  }
}
