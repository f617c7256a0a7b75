package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.index.{DistinctMinimizers, DynamicClassifier, IndexParams}
import graft.operators.GenomicQueries

/** Plan evidence for the r22 evidence-pass rewrite (verdict item 1b): the
  * g04/g10 lanes return localCheckpoint'ed counts, so their Explain dumps
  * cannot show the internal two-pass plans. This dumps the evidence
  * subplan itself — the OLD formulation (post-join per-taxon
  * countDistinct over the keys, written out verbatim below) and the NEW
  * one (`DynamicClassifier.evidence`: pre-join distinct of the span keys,
  * then a per-taxon count) — over the same g04 span/record frames, so the
  * exchange-count claim is checkable from the committed files. */
object EvidencePlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val params = IndexParams(k = 35, m = 31, spaces = 7, buckets = 32)
    val bcTax = spark.sparkContext.broadcast(
      GenomicQueries.starTaxonomy(spark, sfDir))
    val dyn = new DynamicClassifier(params, bcTax)
    // g04's derivations replicated like G10Profile (customerGenomes /
    // ordersScan are private[operators])
    val customer = spark.read.parquet(s"$sfDir/customer.parquet")
    val lib = graft.operators.Q.fanOut(customer, col("c_custkey"))
      .select((col("c_nationkey") + 10).cast("int").as("taxon"),
        GenomicQueries.dnaCol(col("c_name")).as("dna"))
      .as[(Int, String)]
    val leafPairs = dyn.index.buildLeafPairs(lib)
    val records = dyn.index.foldLeafPairs(leafPairs)
    val customerDna = customer
      .select(col("c_custkey"), col("c_nationkey"),
        GenomicQueries.dnaCol(col("c_name")).as("dna"))
    val reads = graft.operators.Q
      .fanOut(spark.read.parquet(s"$sfDir/orders.parquet"), col("o_orderkey"))
      .join(customerDna, col("o_custkey") === col("c_custkey"))
      .filter(col("c_nationkey") % 2 === 0)
      .select(col("o_orderkey"),
        substring(col("dna"), ((col("o_orderkey") % 80) + 1).cast("int"),
          lit(44)).as("read"))
      .as[(Long, String)]
      .map { case (ok, read) =>
        graft.sources.InputFragment(s"order$ok", 0L, read, None) }
    val spans = dyn.index.spansDF(reads)
    val keys = dyn.index.keyCols

    println("\n========== g04 evidence (DistinctMinimizers) — OLD: post-join countDistinct ==========")
    spans.join(records, keys)
      .groupBy($"taxon")
      .agg(countDistinct(col(keys.head), keys.tail.map(col): _*)
        .cast("long").as("count"))
      .explain("formatted")

    println("\n========== g04 evidence (DistinctMinimizers) — NEW: pre-join distinct keys + count ==========")
    dyn.evidence(spans, records, DistinctMinimizers).explain("formatted")

    spark.stop()
  }
}
