package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionTestWrapper

class MinHashAggregateSpec extends AnyFunSuite with SparkSessionTestWrapper {

  test("aggregate signature equals the kernel signature of the same set") {
    import spark.implicits._
    MinHashAggregate.register(spark, numHashes = 64)
    val shingles = (1L to 500L).map(TextAnalysis.mix64)
    val viaAgg = shingles.toDF("sh")
      .agg(MinHashAggregate.minhashAgg($"sh").as("sig"))
      .collect()(0).getSeq[Long](0).toArray
    val viaKernel = graft.operators.Dedup.minhashSignature(shingles.toArray, 64)
    assert(viaAgg.toSeq == viaKernel.toSeq)
  }

  test("signatures merge by elementwise min (union sketch property)") {
    import spark.implicits._
    MinHashAggregate.register(spark, numHashes = 32)
    val a = (1L to 300L).map(TextAnalysis.mix64)
    val b = (200L to 600L).map(TextAnalysis.mix64)
    def sig(xs: Seq[Long]): Seq[Long] = xs.toDF("sh")
      .agg(MinHashAggregate.minhashAgg($"sh")).collect()(0).getSeq[Long](0)
    val union = sig(a ++ b)
    val merged = sig(a).zip(sig(b)).map { case (x, y) => math.min(x, y) }
    assert(union == merged)
  }

  test("estimated similarity tracks exact Jaccard of shingle sets") {
    import spark.implicits._
    MinHashAggregate.register(spark, numHashes = 256)
    val base = (1L to 400L).map(TextAnalysis.mix64)
    val overlapping = (101L to 500L).map(TextAnalysis.mix64)
    def sig(xs: Seq[Long]): Seq[Long] = xs.toDF("sh")
      .agg(MinHashAggregate.minhashAgg($"sh")).collect()(0).getSeq[Long](0)
    val est = MinHashAggregate.estimateSimilarity(sig(base), sig(overlapping))
    val exact = base.toSet.intersect(overlapping.toSet).size.toDouble /
      base.toSet.union(overlapping.toSet).size
    assert(math.abs(est - exact) < 0.1, s"est $est vs exact $exact")
  }
}
