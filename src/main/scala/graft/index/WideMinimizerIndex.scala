package graft.index

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.kmers.{SupermerScanner, WideRandomXorPriority, WideSupermerScanner}
import graft.sources.InputFragment
import graft.taxa.{LcaResolver, TaxonLcaAggregator, Taxonomy}

/** Wide-minimizer index (m in [33, 64]): records carry two key columns
  * (id1, id2) — the reference's idLongs = ceil(m/32) column scheme
  * (KmerKeyedIndex.scala:27-55) at width 2. Build and classify mirror
  * [[MinimizerIndex]]; joins/groupBys run on primitive long column pairs so
  * Tungsten hashing stays allocation-free.
  */
final class WideMinimizerIndex(k: Int, m: Int, bcTax: Broadcast[Taxonomy])
    extends Serializable {

  val scanner = new WideSupermerScanner(k, new WideRandomXorPriority(m))

  def makeRecords(library: Dataset[(Int, String)]): DataFrame = {
    val spark = library.sparkSession
    import spark.implicits._
    val sc = scanner
    val kk = k
    val lcaAgg = udaf(TaxonLcaAggregator(bcTax))
    library.flatMap { case (taxon, seq) =>
      SupermerScanner.splitByAmbiguity(seq).flatMap { run =>
        if (!run.valid || run.seq.length < kk) Iterator.empty
        else sc.scan(run.seq).map(sm => (sm.minHi, sm.minLo, taxon))
      }
    }.toDF("id1", "id2", "taxon")
      .groupBy($"id1", $"id2")
      .agg(lcaAgg($"taxon").as("taxon"))
  }

  /** Spans with two-long keys; same ordinal/distinct protocol as narrow. */
  def spans(reads: Dataset[InputFragment]): DataFrame = {
    val spark = reads.sparkSession
    import spark.implicits._
    val sc = scanner
    val kk = k
    reads.mapPartitions { it =>
      val rnd = java.util.concurrent.ThreadLocalRandom.current()
      it.flatMap { f =>
        var last: (Long, Long) = (0L, 0L)
        var first = true
        SupermerScanner.splitByAmbiguity(f.nucleotides).flatMap { run =>
          if (run.seq.length < kk) Iterator.empty
          else if (run.valid)
            sc.scan(run.seq).map { sm =>
              val distinct = first || (sm.minHi, sm.minLo) != last
              first = false; last = (sm.minHi, sm.minLo)
              (sm.minHi, sm.minLo, distinct, sm.kmers, f.header)
            }
          else Iterator((rnd.nextLong(), rnd.nextLong(), false,
            run.seq.length - (kk - 1), f.header))
        }
      }
    }.toDF("id1", "id2", "distinct", "kmers", "title")
  }

  /** Bucketed persistence on the two-long key (same scheme as the narrow
    * index: bucketBy + DDL reload keeps the classify join one-sided). */
  def writeRecords(records: DataFrame, path: String, buckets: Int): Unit = {
    val spark = records.sparkSession
    val table = MinimizerIndex.tableName(path)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    records.write
      .bucketBy(buckets, "id1", "id2")
      .sortBy("id1", "id2")
      .option("path", path)
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .saveAsTable(table)
    IndexParams.write(spark, IndexParams(k = k, m = m, spaces = 0,
      buckets = buckets), path)
  }

  def loadRecords(spark: org.apache.spark.sql.SparkSession, path: String,
      buckets: Int): DataFrame = {
    val table = MinimizerIndex.tableName(path)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(
      s"""CREATE TABLE $table (id1 BIGINT, id2 BIGINT, taxon INT)
         |USING PARQUET
         |CLUSTERED BY (id1, id2) SORTED BY (id1, id2) INTO $buckets BUCKETS
         |LOCATION '$path'""".stripMargin)
    spark.table(table)
  }

  /** Report-only classification on two-long keys. */
  def classifyReport(spans: DataFrame, records: DataFrame,
      confidence: Double = 0.0, minHitGroups: Int = 2): DataFrame = {
    val spark = spans.sparkSession
    import spark.implicits._
    val bc = bcTax
    spans.join(records, Seq("id1", "id2"), "left")
      .select($"title", coalesce($"taxon", lit(Taxonomy.NONE)).as("taxon"),
        $"kmers", $"distinct")
      .groupBy($"title", $"taxon")
      .agg(sum($"kmers").cast("int").as("kmers"),
        sum(when($"distinct" && $"taxon" > 0, 1).otherwise(0)).as("groups"))
      .groupBy($"title")
      .agg(collect_list(struct($"taxon", $"kmers")).as("pairs"),
        sum($"groups").cast("int").as("hitGroups"))
      .as[(String, Seq[(Int, Int)], Int)]
      .mapPartitions { it =>
        val resolver = new LcaResolver(bc.value)
        it.map { case (title, pairs, hitGroups) =>
          val taxon =
            if (hitGroups < minHitGroups) Taxonomy.NONE
            else resolver.classify(pairs, confidence)
          (title, taxon)
        }
      }
      .toDF("title", "taxon")
  }
}
