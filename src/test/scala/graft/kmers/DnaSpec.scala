package graft.kmers

import org.scalatest.funsuite.AnyFunSuite
import graft.PropChecks
import org.scalacheck.Gen

object Gens {
  val dnaChar: Gen[Char] = Gen.oneOf('A', 'C', 'G', 'T')
  def dnaString(min: Int, max: Int): Gen[String] =
    Gen.chooseNum(min, max).flatMap(n => Gen.stringOfN(n, dnaChar))
  def dnaStringWithN(min: Int, max: Int): Gen[String] =
    Gen.chooseNum(min, max).flatMap(n =>
      Gen.stringOfN(n, Gen.frequency(8 -> dnaChar, 1 -> Gen.const('N'))))
  val mAndK: Gen[(Int, Int)] = for {
    m <- Gen.chooseNum(1, 31)
    k <- Gen.chooseNum(m, 64)
  } yield (m, k)
}

class DnaSpec extends AnyFunSuite with PropChecks {
  import Gens._

  test("encode/decode roundtrip") {
    forAll(Gen.chooseNum(1, 32).flatMap(m => dnaString(m, m))) { s =>
      assert(Dna.decode(Dna.encode(s), s.length) == s)
    }
  }

  test("reverse complement is an involution") {
    forAll(Gen.chooseNum(1, 32).flatMap(m => dnaString(m, m))) { s =>
      val m = s.length
      val mer = Dna.encode(s)
      assert(Dna.reverseComplement(Dna.reverseComplement(mer, m), m) == mer)
    }
  }

  test("packed reverse complement matches string reverse complement") {
    forAll(Gen.chooseNum(1, 32).flatMap(m => dnaString(m, m))) { s =>
      val m = s.length
      assert(Dna.decode(Dna.reverseComplement(Dna.encode(s), m), m) ==
        Dna.reverseComplement(s))
    }
  }

  test("canonical is strand-independent") {
    forAll(Gen.chooseNum(1, 32).flatMap(m => dnaString(m, m))) { s =>
      val m = s.length
      val fwd = Dna.encode(s)
      val rc = Dna.reverseComplement(fwd, m)
      assert(Dna.canonical(fwd, m) == Dna.canonical(rc, m))
    }
  }

  test("2-bit packing roundtrips and scans identically to the string") {
    forAll(dnaString(1, 200)) { s =>
      val packed = new Dna.Packed(Dna.pack2bit(s), s.length)
      assert(packed.toString == s)
      assert(packed.length == s.length)
      assert(packed.charAt(0) == s.charAt(0) &&
        packed.charAt(s.length - 1) == s.charAt(s.length - 1))
    }
    // the supermer scan over a packed view equals the scan over the string
    forAll(dnaString(40, 300)) { s =>
      val sc = new SupermerScanner(35, RandomXorPriority(31))
      val a = sc.scan(s).toVector
      val b = sc.scan(new Dna.Packed(Dna.pack2bit(s), s.length)).toVector
      assert(a == b)
    }
  }

  test("packing rejects ambiguous bases") {
    intercept[IllegalArgumentException](Dna.pack2bit("ACGTN"))
  }

  test("complement is XOR with ones") {
    assert(Dna.code('A') == (Dna.code('T') ^ 3))
    assert(Dna.code('C') == (Dna.code('G') ^ 3))
    assert(Dna.code('U') == Dna.code('T'))
    assert(Dna.code('N') == -1)
  }
}

class MinimizerPrioritySpec extends AnyFunSuite with PropChecks {
  import Gens._

  test("RandomXOR priority is invertible (non-canonical)") {
    forAll(Gen.chooseNum(1, 31), Gen.long) { (m, merBits) =>
      val p = RandomXorPriority(m, canonical = false)
      val mer = merBits & Dna.merMask(m)
      assert(p.merFor(p.priorityOf(mer)) == mer)
    }
  }

  test("canonical RandomXOR gives equal priorities for a mer and its RC") {
    forAll(Gen.chooseNum(1, 31), Gen.long) { (m, merBits) =>
      val p = RandomXorPriority(m, canonical = true)
      val mer = merBits & Dna.merMask(m)
      assert(p.priorityOf(mer) == p.priorityOf(Dna.reverseComplement(mer, m)))
    }
  }

  test("spaced seed clears alternating positions from second-rightmost") {
    // width 9, s 3: positions 1,3,5 from the right cleared (spec example:
    // TTCTGTGGG -> TTC-G-G-G)
    val inner = RandomXorPriority(9, xorMask = 0L, canonical = false)
    val p = SpacedSeedPriority(3, inner)
    val pri = p.priorityOf(Dna.encode("TTCTGTGGG"))
    assert(Dna.decode(pri, 9) == "TTCAGAGAG")
  }

  test("spaced priorities collide for mers differing only at masked positions") {
    forAll(Gen.chooseNum(4, 31), Gen.long, Gen.chooseNum(0, 6)) { (m, bits, i) =>
      whenever(i < m / 2) {
        val p = SpacedSeedPriority(m / 2, RandomXorPriority(m, canonical = false))
        val mer = bits & Dna.merMask(m)
        val flipped = mer ^ (3L << (2 * (2 * i + 1))) // change a masked position
        assert(p.priorityOf(mer) == p.priorityOf(flipped))
      }
    }
  }
}
