package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection: prints the formatted physical plan of selected queries
  * (all bench queries by default) for shuffle/pushdown/codegen review. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.benchQueries.keys.toSeq
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names; q <- SparkEntry.all.get(n)) {
      println(s"\n========== $n ==========")
      q.fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
