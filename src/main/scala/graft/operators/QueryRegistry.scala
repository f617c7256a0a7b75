package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.immutable.ListMap

/** One verifiable query: a Spark DataFrame program plus (optionally) an
  * equivalent ANSI SQL string the driver runs in DuckDB over the same parquet
  * tables. Cross-engine determinism rules (so value hashes match):
  *   - every numeric output column is explicitly cast: BIGINT for integers,
  *     DOUBLE for floats (DuckDB's sum(BIGINT) is HUGEINT, Spark's is LONG);
  *   - floating aggregates whose value depends on accumulation order are
  *     `round`ed (the reorder error is ~1e-10 relative, far below the
  *     rounding quantum);
  *   - results carry a total ORDER BY over non-null keys (Spark sorts nulls
  *     first, DuckDB last — avoid nullable sort keys);
  *   - timestamps never appear raw in outputs (ns vs us precision).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** headline benchmark query */
    bench: Boolean = false)

object Q {
  /** Parquet table loader: the only data-access path queries use. */
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  def registry(qs: Seq[Q]): ListMap[String, Q] =
    ListMap(qs.map(q => q.name -> q): _*)
}
