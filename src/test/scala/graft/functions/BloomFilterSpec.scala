package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionTestWrapper
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._

class BloomFilterSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val LogM = 20
  private val Probes = 5

  private def freshKeys(seed: Int, n: Int): Array[Long] = {
    val rng = new scala.util.Random(seed)
    Array.fill(n)(rng.nextLong())
  }

  test("no false negatives: every inserted key passes contains (fuzz)") {
    val keys = freshKeys(7, 20000)
    val bits = new Array[Long](BloomKernels.words(LogM))
    keys.foreach(BloomKernels.insert(bits, _, Probes, LogM))
    val ad = new GenericArrayData(bits)
    assert(keys.forall(BloomKernels.contains(ad, _, Probes, LogM)))
  }

  test("false positive rate stays near the design point") {
    val keys = freshKeys(11, 20000)
    val bits = new Array[Long](BloomKernels.words(LogM))
    keys.foreach(BloomKernels.insert(bits, _, Probes, LogM))
    val ad = new GenericArrayData(bits)
    val member = keys.toSet
    val probes = freshKeys(13, 100000).filterNot(member)
    val fp = probes.count(BloomKernels.contains(ad, _, Probes, LogM))
    // design fp at 20k keys / 2^20 bits / 5 probes ~ (k*n/m)^k ~ 1e-5;
    // allow two orders of slack so the test never flakes
    assert(fp.toDouble / probes.length < 1e-3, s"fp=$fp of ${probes.length}")
  }

  test("bloom_agg partial-merge equals serial insert regardless of partitioning") {
    BloomFilterAggregate.register(spark, LogM, Probes)
    import spark.implicits._
    val keys = freshKeys(17, 5000)
    val got = keys.toSeq.toDF("h").repartition(7)
      .agg(BloomFilterAggregate.bloomAgg($"h"))
      .head().getSeq[Long](0).toArray
    val want = new Array[Long](BloomKernels.words(LogM))
    keys.foreach(BloomKernels.insert(want, _, Probes, LogM))
    assert(got.sameElements(want))
  }

  test("bloom_contains participates in whole-stage codegen") {
    BloomFilterAggregate.register(spark, LogM, Probes)
    import spark.implicits._
    val bits = new Array[Long](BloomKernels.words(LogM))
    BloomKernels.insert(bits, 42L, Probes, LogM)
    val df = spark.range(1000)
      .filter(BloomFilterAggregate.bloomContains(typedlit(bits), $"id"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Filter .*bloomcontains.*"),
      s"bloom filter not codegen'd:\n$plan")
    // and the probe actually filters: the member survives, almost all don't
    val survivors = df.collect().map(_.longValue).toSet
    assert(survivors.contains(42L))
    assert(survivors.size < 20, s"prefilter too permissive: $survivors")
  }
}
