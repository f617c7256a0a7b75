package graft.index

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.taxa.Taxonomy

/** Classification-accuracy comparison against a reference mapping
  * (spec: reference analysis/MappingComparison.scala): join per-read results
  * with ground truth, categorize each read at a chosen rank, compute
  * PPV/sensitivity (read level) and precision/recall (taxon level).
  */
object MappingComparison {

  /** Read a Kraken-format output file back as (title, taxon)
    * (spec: Classifier.scala:41-44 line format). Accepts both a single
    * sample directory and the partitioned root that `classify` writes
    * (partition discovery appends the `sample` column AFTER the five data
    * columns — keep the first five). Malformed lines (non-numeric taxon)
    * are dropped rather than poisoning downstream tree walks. */
  def readKrakenOutput(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("sep", "\t").csv(path)
    raw.select(raw.columns.take(5).map(col): _*)
      .toDF("flag", "title", "taxon", "length", "hits")
      .select(col("title"), col("taxon").try_cast("int"))
      .filter(col("taxon").isNotNull)
  }

  /** Per-read categories at a rank: TP (same rank ancestor), VP (ancestor
    * above rank — vague positive), FP (wrong), FN (unclassified but mapped). */
  def categorize(classified: Dataset[ClassifiedRead], truth: DataFrame,
      bcTax: Broadcast[Taxonomy], rank: String): DataFrame = {
    val spark = classified.sparkSession
    import spark.implicits._
    val rc = Taxonomy.rankCode(rank)
    val catUdf = udf((got: Int, expected: Int) => {
      val tax = bcTax.value
      // ids come from user files and may reference a larger taxonomy than
      // the one loaded (stale/foreign taxids) — isDefined bounds-checks.
      // An invalid EXPECTATION is NA regardless of the classification: the
      // read carries no scorable truth, so it must not land in the FN
      // denominator for some reads and outside the metrics for others.
      if (!tax.isDefined(expected)) "NA"
      else if (got == Taxonomy.NONE) "FN"
      else if (!tax.isDefined(got)) "NA"
      else {
        val gotAtRank = tax.ancestorAtRank(got, rc)
        val expAtRank = tax.ancestorAtRank(expected, rc)
        if (expAtRank == Taxonomy.NONE) "NA"
        else if (gotAtRank == expAtRank) "TP"
        else if (gotAtRank == Taxonomy.NONE && tax.hasAncestor(expAtRank, got)) "VP"
        else "FP"
      }
    })
    classified.toDF()
      // try_cast: ANSI-safe — malformed truth lines become null and drop out
      .join(truth.select($"title", $"taxon".try_cast("int").as("expected"))
        .filter($"expected".isNotNull), Seq("title"))
      .select($"title", $"taxon", $"expected",
        catUdf($"taxon", $"expected").as("category"))
  }

  /** Read-level PPV and sensitivity from categories
    * (PPV = TP/(TP+FP), sensitivity = TP/total mapped). */
  def readMetrics(categories: DataFrame): DataFrame = {
    val spark = categories.sparkSession
    import spark.implicits._
    categories
      .groupBy($"category").agg(count(lit(1)).as("n"))
      .agg(
        sum(when($"category" === "TP", $"n").otherwise(0L)).as("tp"),
        sum(when($"category" === "FP", $"n").otherwise(0L)).as("fp"),
        sum(when($"category" === "VP", $"n").otherwise(0L)).as("vp"),
        sum(when($"category" === "FN", $"n").otherwise(0L)).as("fn"))
      .select(
        round($"tp" / greatest($"tp" + $"fp", lit(1L)), 4).as("ppv"),
        round($"tp" / greatest($"tp" + $"fp" + $"vp" + $"fn", lit(1L)), 4)
          .as("sensitivity"),
        $"tp", $"fp", $"vp", $"fn")
  }

  /** Taxon-level precision/recall at a rank: detected taxa vs truth taxa
    * (spec: the gold-set comparison in Dynamic.scala:265-279 / UniFrac-style
    * set algebra, driver-side BitSets). */
  def taxonMetrics(classified: Dataset[ClassifiedRead], truth: DataFrame,
      bcTax: Broadcast[Taxonomy], rank: String, minReads: Long = 1)
      : (Double, Double, Set[Int], Set[Int]) = {
    val spark = classified.sparkSession
    import spark.implicits._
    val tax = bcTax.value
    val rc = Taxonomy.rankCode(rank)
    // isDefined bounds-checks, so foreign ids are skipped, never walked
    def atRank(ts: Seq[Int]): Set[Int] =
      ts.filter(tax.isDefined)
        .map(t => tax.ancestorAtRank(t, rc)).filter(_ != Taxonomy.NONE).toSet
    val detectedCounts = classified.filter(_.classified)
      .groupBy($"taxon").agg(count(lit(1)).as("n"))
      .filter($"n" >= minReads)
      .select($"taxon").as[Int].collect()
    val truthTaxa = truth.select(col("taxon").try_cast("int"))
      .filter(col("taxon").isNotNull).as[Int].collect()
    val det = atRank(detectedCounts.toSeq)
    val tru = atRank(truthTaxa.toSeq)
    val tp = det.intersect(tru).size.toDouble
    val precision = if (det.isEmpty) 0.0 else tp / det.size
    val recall = if (tru.isEmpty) 0.0 else tp / tru.size
    (precision, recall, det, tru)
  }
}
