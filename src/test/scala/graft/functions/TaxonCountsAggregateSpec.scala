package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSessionTestWrapper
import scala.util.Random

/** Contract for the r22 per-group (taxon -> Σkmers) counter aggregate that
  * replaced `collect_list(struct(taxon, kmers))` in the count-only classify
  * regroup ([[graft.index.ClassifyKernel.groupCounts]]):
  *  - per-group entry MULTISETS must equal the reference per-(group, taxon)
  *    kmer sums, across many partitions (exercising update, serialize,
  *    merge and eval — partial buffers cross a real exchange);
  *  - one entry per DISTINCT taxon per group (the compression that cuts the
  *    regroup's buffered entries — guide §2.3 "aggregate before you
  *    shuffle");
  *  - partition order must not change the entry SET (the consumer,
  *    LcaResolver.classify, is order-independent);
  *  - null inputs contribute nothing (collect_list's skip semantics);
  *  - sentinel taxa (negative ids) group like any other key. */
class TaxonCountsAggregateSpec extends AnyFunSuite with SparkSessionTestWrapper {

  test("per-group sums equal the groupBy reference across partitions") {
    import spark.implicits._
    TaxonCountsAggregate.register(spark)
    val rng = new Random(42)
    // many groups x few taxa with repeats — the per-read hit shape,
    // including sentinel taxa -1/-2 and zero counts
    val rows = for {
      g <- 0 until 200
      _ <- 0 until (1 + rng.nextInt(12))
    } yield (s"read_$g", Seq(-2, -1, 0, 4, 5, 6)(rng.nextInt(6)),
      rng.nextInt(10))
    val df = spark.createDataset(rows).toDF("title", "taxon", "kmers")
      .repartition(13)
    val agged = df.groupBy($"title")
      .agg(TaxonCountsAggregate.taxonCounts($"taxon", $"kmers").as("hits"))
      .as[(String, Seq[(Int, Int)])].collect()
      .map { case (t, hs) => t -> hs }.toMap
    val ref = rows.groupBy(_._1).map { case (t, rs) =>
      t -> rs.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    }
    assert(agged.keySet == ref.keySet)
    for ((t, hs) <- agged) {
      // one entry per distinct taxon (the compression property)
      assert(hs.map(_._1).distinct.length == hs.length,
        s"$t: duplicate taxon entries in $hs")
      assert(hs.toMap == ref(t), s"$t: ${hs.toMap} != ${ref(t)}")
    }
  }

  test("null taxon or kmers contributes nothing") {
    import spark.implicits._
    TaxonCountsAggregate.register(spark)
    val df = spark.createDataset(Seq(
        ("a", Some(4), Some(3)), ("a", None, Some(7)), ("a", Some(5), None),
        ("b", None, None)))
      .toDF("title", "taxon", "kmers")
    val out = df.groupBy($"title")
      .agg(TaxonCountsAggregate.taxonCounts($"taxon", $"kmers").as("hits"))
      .as[(String, Seq[(Int, Int)])].collect().toMap
    assert(out("a").toMap == Map(4 -> 3))
    assert(out("b").isEmpty)
  }

  test("partition order does not change the entry set") {
    import spark.implicits._
    TaxonCountsAggregate.register(spark)
    val rows = (0 until 500).map(i => ("r" + i % 20, i % 7, 1 + i % 5))
    def sets(df: org.apache.spark.sql.DataFrame) =
      df.groupBy($"title")
        .agg(TaxonCountsAggregate.taxonCounts($"taxon", $"kmers").as("hits"))
        .as[(String, Seq[(Int, Int)])].collect()
        .map { case (t, hs) => t -> hs.toMap }.toMap
    val base = spark.createDataset(rows).toDF("title", "taxon", "kmers")
    assert(sets(base.repartition(1)) == sets(base.repartition(7, rand(3))))
  }
}
