package graft.index

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionTestWrapper
import org.apache.spark.sql.functions._

/** Pins the alignment contract that Bracken.weights and
  * IndexOps.classifyReport rely on since r16: MULTIPLE collect_list
  * aggregates in one groupBy consume the group's input rows in the same
  * order, so parallel primitive-array columns index-align exactly like a
  * single collect_list(struct(...)) — without the struct decoder's
  * per-element boxing (the 170 s hotspot the r16 64x bracken head-to-head
  * measured). If a Spark upgrade ever broke this (e.g. per-aggregate
  * input reordering), these paths would silently mis-pair keys with
  * taxa — this spec turns that into a named test failure.
  */
class ParallelCollectAlignmentSpec extends AnyFunSuite with SparkSessionTestWrapper {

  test("parallel collect_lists align with collect_list(struct) across a real shuffle") {
    // fresh session: the shuffle-partition override must not leak into
    // suites sharing the wrapper's session
    val ss = spark.newSession()
    import ss.implicits._
    ss.conf.set("spark.sql.shuffle.partitions", "7")
    // many groups, many rows per group, spread over many input partitions
    // so the aggregation genuinely shuffles and merges partial buffers
    val rng = new scala.util.Random(42)
    val rows = (0 until 50000).map { i =>
      (s"g${i % 937}", rng.nextLong(), rng.nextInt())
    }
    val df = ss.createDataset(rows).toDF("g", "k", "v")
      .repartition(13)

    val parallel = df.groupBy($"g")
      .agg(collect_list($"k").as("ks"), collect_list($"v").as("vs"))
      .as[(String, Array[Long], Array[Int])]
      .collect()
      .map { case (g, ks, vs) =>
        g -> ks.zip(vs).map { case (k, v) => (k, v) }.sorted.toSeq
      }.toMap

    val structed = df.groupBy($"g")
      .agg(collect_list(struct($"k", $"v")).as("pairs"))
      .as[(String, Seq[(Long, Int)])]
      .collect()
      .map { case (g, pairs) => g -> pairs.sorted }
      .toMap

    assert(parallel.keySet == structed.keySet)
    for ((g, pairs) <- structed)
      assert(parallel(g) == pairs, s"group $g mis-aligned")
    // alignment must hold as PAIRS, not just as sorted multisets of each
    // column — verify on one group by comparing the unsorted zip too
    val one = df.filter($"g" === "g1")
    val (ks, vs) = one.groupBy($"g")
      .agg(collect_list($"k").as("ks"), collect_list($"v").as("vs"))
      .as[(String, Array[Long], Array[Int])].head() match {
        case (_, a, b) => (a, b)
      }
    val truth = one.select($"k", $"v").as[(Long, Int)].collect().toSet
    assert(ks.zip(vs).map { case (k, v) => (k, v) }.toSet == truth)
  }
}
