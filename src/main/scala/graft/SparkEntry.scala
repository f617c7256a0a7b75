package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.immutable.ListMap
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are registered in [[graft.operators.Q]] groups; each carries its
  * Spark plan and (where SQL-expressible) a DuckDB oracle. Non-SQL ops
  * (minimizer/LCA domain pipeline, MinHash LSH, SimHash, language-ID) get
  * rows-only checks per the driver protocol.
  */
object SparkEntry {

  /** All registered queries, insertion-ordered. */
  val all: ListMap[String, Q] = Q.registry(
    RelationalQueries.queries ++ TextQueries.queries ++ VectorQueries.queries ++
      PipelineQueries.queries ++ Clustering.queries ++ GenomicQueries.queries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all("q01_agg_pricing").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, q) => k -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (k, q) if q.oracle.isDefined => k -> q.oracle.get }

  /** Headline benchmark queries. */
  def benchQueries: ListMap[String, Q] = all.filter(_._2.bench)
}
