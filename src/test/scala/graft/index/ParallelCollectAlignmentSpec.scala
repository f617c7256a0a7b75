package graft.index

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionTestWrapper
import graft.functions.CollectAligned
import org.apache.spark.sql.functions._

/** r16 pinned Spark's undocumented "parallel collect_lists in one groupBy
  * consume rows in the same order" behavior, which Bracken.weights and
  * IndexOps.classifyReport then relied on. r17 removed the reliance: both
  * hot paths now use ONE CollectAligned TypedImperativeAggregate whose
  * parallel primitive arrays come from a single buffer (alignment is
  * structural). This spec verifies the new aggregate across a real shuffle
  * (partial buffers serialized + merged), against a collect_list(struct)
  * ground truth, and that a null input fails LOUDLY instead of silently
  * dropping (collect_list's null-drop is exactly how parallel collects
  * mis-align).
  */
class ParallelCollectAlignmentSpec extends AnyFunSuite with SparkSessionTestWrapper {

  test("collect_aligned pairs match collect_list(struct) across a real shuffle") {
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

    val fn = CollectAligned.register(ss, Seq("ks", "vs"))
    val aligned = df.groupBy($"g")
      .agg(CollectAligned(fn, $"k", $"v").as("h"))
      .select($"g", $"h.ks", $"h.vs")
      .as[(String, Array[Long], Array[Int])]
      .collect()
      .map { case (g, ks, vs) =>
        assert(ks.length == vs.length, s"group $g length mismatch")
        g -> ks.zip(vs).map { case (k, v) => (k, v) }.sorted.toSeq
      }.toMap

    val structed = df.groupBy($"g")
      .agg(collect_list(struct($"k", $"v")).as("pairs"))
      .as[(String, Seq[(Long, Int)])]
      .collect()
      .map { case (g, pairs) => g -> pairs.sorted }
      .toMap

    assert(aligned.keySet == structed.keySet)
    for ((g, pairs) <- structed)
      assert(aligned(g) == pairs, s"group $g mis-aligned")
    // alignment must hold as PAIRS, not just as sorted multisets of each
    // column — verify on one group by comparing the unsorted zip too
    val one = df.filter($"g" === "g1")
    val (ks, vs) = one.groupBy($"g")
      .agg(CollectAligned(fn, $"k", $"v").as("h"))
      .select($"g", $"h.ks", $"h.vs")
      .as[(String, Array[Long], Array[Int])].head() match {
        case (_, a, b) => (a, b)
      }
    val truth = one.select($"k", $"v").as[(Long, Int)].collect().toSet
    assert(ks.zip(vs).map { case (k, v) => (k, v) }.toSet == truth)
  }

  test("collect_aligned supports the bracken five-wide long/int mix") {
    val ss = spark.newSession()
    import ss.implicits._
    ss.conf.set("spark.sql.shuffle.partitions", "5")
    val rows = (0 until 5000).map { i =>
      (i % 101, i.toLong, (i * 31).toLong, (i * 7).toLong, -i.toLong, i % 13)
    }
    val df = ss.createDataset(rows)
      .toDF("g", "k1", "k2", "k3", "k4", "t").repartition(9)
    val fn = CollectAligned.register(ss, Seq("mk1", "mk2", "mk3", "mk4", "mtaxa"))
    val out = df.groupBy($"g")
      .agg(CollectAligned(fn, $"k1", $"k2", $"k3", $"k4", $"t").as("h"))
      .select($"g", $"h.mk1", $"h.mk2", $"h.mk3", $"h.mk4", $"h.mtaxa")
      .as[(Int, Array[Long], Array[Long], Array[Long], Array[Long], Array[Int])]
      .collect()
    assert(out.map(_._2.length).sum == 5000)
    for ((g, k1, k2, k3, k4, t) <- out; i <- k1.indices) {
      // every quintuple must be one original input row
      assert(k2(i) == k1(i) * 31 && k3(i) == k1(i) * 7 && k4(i) == -k1(i)
        && t(i) == k1(i) % 13 && k1(i) % 101 == g,
        s"row ($g, ${k1(i)}) mis-aligned")
    }
  }

  test("collect_aligned survives the sort-based aggregation fallback") {
    // ObjectHashAggregateExec falls back to sort-based aggregation when a
    // partition holds more distinct groups than the fallback threshold —
    // a DIFFERENT execution path (buffers serialized between sort runs).
    // Force it with threshold 2 and verify against the hash-path result.
    val ss = spark.newSession()
    import ss.implicits._
    ss.conf.set("spark.sql.shuffle.partitions", "5")
    val rows = (0 until 20000).map(i => (i % 501, i.toLong, i * 3))
    val df = ss.createDataset(rows).toDF("g", "k", "v").repartition(7)
    val fn = CollectAligned.register(ss, Seq("ks", "vs"))
    def run(): Map[Int, Seq[(Long, Int)]] =
      df.groupBy($"g").agg(CollectAligned(fn, $"k", $"v").as("h"))
        .select($"g", $"h.ks", $"h.vs")
        .as[(Int, Array[Long], Array[Int])]
        .collect()
        .map { case (g, ks, vs) => g -> ks.zip(vs).sorted.toSeq }.toMap
    val hashPath = run()
    ss.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "2")
    val sortPath = run()
    assert(sortPath == hashPath)
    assert(sortPath.values.map(_.size).sum == 20000)
  }

  test("a null input fails loudly instead of silently mis-aligning") {
    val ss = spark.newSession()
    import ss.implicits._
    val df = ss.createDataset(Seq((1, Some(1L), 1), (1, None, 2)))
      .toDF("g", "k", "v")
    val fn = CollectAligned.register(ss, Seq("ks", "vs"))
    val ex = intercept[Exception] {
      df.groupBy($"g").agg(CollectAligned(fn, $"k", $"v")).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(e => e +: chain(e.getCause))
    assert(chain(ex).exists(_.getMessage != null) &&
      chain(ex).exists(e => Option(e.getMessage).exists(_.contains("collect_aligned"))),
      s"unexpected failure: $ex")
  }
}
