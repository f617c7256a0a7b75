package graft.index

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.PropChecks
import graft.taxa.Taxonomy

/** The broadcast lookup tables must behave exactly like a Map under
  * adversarial keys: 0, -1 (no Long sentinel is safe — both are legal
  * minimizer priorities), duplicate inserts (last wins is NOT required —
  * records are unique per key by construction — but probing must not loop),
  * and dense collision clusters. */
class TaxonMapSpec extends AnyFunSuite with PropChecks {

  private val keyGen: Gen[Long] = Gen.oneOf(
    Gen.const(0L), Gen.const(-1L), Gen.const(Long.MinValue),
    Gen.chooseNum(Long.MinValue, Long.MaxValue),
    // dense cluster: many keys sharing low bits to force probe chains
    Gen.chooseNum(0L, 63L).map(_ << 58))

  test("LongTaxonMap agrees with Map on hits and misses") {
    forAll(Gen.listOf(Gen.zip(keyGen, Gen.chooseNum(1, 1 << 20)))) { kvs =>
      val distinct = kvs.toMap // records are unique per key
      val table = LongTaxonMap(distinct.toArray)
      for ((k, v) <- distinct) assert(table.get(k) == v)
      for ((k, _) <- kvs; miss = k + 1 if !distinct.contains(miss))
        assert(table.get(miss) == Taxonomy.NONE)
      assert(table.get(0x123456789abcdefL) ==
        distinct.getOrElse(0x123456789abcdefL, Taxonomy.NONE))
    }
  }

  test("WideTaxonMap agrees with Map on hits and misses") {
    forAll(Gen.listOf(Gen.zip(keyGen, keyGen, Gen.chooseNum(1, 1 << 20)))) { kvs =>
      val distinct = kvs.map(t => (t._1, t._2) -> t._3).toMap
      val table = WideTaxonMap(distinct.toArray.map { case ((h, l), v) => (h, l, v) })
      for (((h, l), v) <- distinct) assert(table.get(h, l) == v)
      for (((h, l), _) <- distinct; miss = (h, l + 1) if !distinct.contains(miss))
        assert(table.get(miss._1, miss._2) == Taxonomy.NONE)
    }
  }
}
