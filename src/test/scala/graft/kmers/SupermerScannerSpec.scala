package graft.kmers

import org.scalatest.funsuite.AnyFunSuite
import graft.PropChecks
import org.scalacheck.Gen

class SupermerScannerSpec extends AnyFunSuite with PropChecks {
  import Gens._

  /** Brute-force minimizer of the k-mer at offset i: min-priority m-mer,
    * leftmost on ties. */
  private def bruteMinimizer(seq: String, i: Int, k: Int, p: MinimizerPriority): Long = {
    val m = p.width
    var best = -1L
    var j = i
    while (j + m <= i + k) {
      val pri = p.priorityOf(Dna.encode(seq.substring(j, j + m)))
      if (best == -1L || java.lang.Long.compareUnsigned(pri, best) < 0) best = pri
      j += 1
    }
    best
  }

  val scanCase: Gen[(String, Int, Int)] = for {
    (m, k) <- mAndK
    s <- dnaString(k, 3 * k + 40)
  } yield (s, m, k)

  test("k-mer counts sum to L - k + 1") {
    forAll(scanCase) { case (s, m, k) =>
      val sc = new SupermerScanner(k, RandomXorPriority(m))
      assert(sc.scan(s).map(_.kmers).sum == s.length - k + 1)
    }
  }

  test("per-kmer minimizer matches brute force; supermers group equal runs") {
    forAll(scanCase) { case (s, m, k) =>
      val p = RandomXorPriority(m)
      val sc = new SupermerScanner(k, p)
      val sms = sc.scan(s).toVector
      // expand supermers back to a per-kmer minimizer sequence
      val perKmer = sms.flatMap(sm => Vector.fill(sm.kmers)(sm.minimizer))
      val expected = (0 to s.length - k).map(i => bruteMinimizer(s, i, k, p))
      assert(perKmer == expected)
      // adjacent supermers have different minimizers (maximal runs)
      for (Vector(a, b) <- sms.sliding(2) if sms.size > 1)
        assert(a.minimizer != b.minimizer)
      // starts are consistent with counts
      for (Vector(a, b) <- sms.sliding(2) if sms.size > 1)
        assert(b.start == a.start + a.kmers)
    }
  }

  test("canonical minimizer multiset is reverse-complement invariant") {
    forAll(scanCase) { case (s, m, k) =>
      val sc = new SupermerScanner(k, RandomXorPriority(m, canonical = true))
      val fwd = sc.scan(s).map(_.minimizer).toVector.sorted
      val rev = sc.scan(Dna.reverseComplement(s)).map(_.minimizer).toVector.sorted
      assert(fwd == rev)
    }
  }

  test("splitByAmbiguity concatenation restores the sequence, runs alternate") {
    forAll(dnaStringWithN(0, 200)) { s =>
      val runs = SupermerScanner.splitByAmbiguity(s).toVector
      assert(runs.map(_.seq).mkString == s)
      for (r <- runs)
        assert(r.seq.forall(Dna.isValid) == r.valid)
      for (Vector(a, b) <- runs.sliding(2) if runs.size > 1)
        assert(a.valid != b.valid)
      for (r <- runs)
        assert(s.substring(r.pos, r.pos + r.seq.length) == r.seq)
    }
  }

  test("sequences shorter than k produce no supermers") {
    val sc = new SupermerScanner(35, RandomXorPriority(31))
    assert(sc.scan("ACGT").isEmpty)
  }
}
