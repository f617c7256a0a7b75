package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump the FINAL adaptive executed plan of selected lanes (r22, verdict
  * item 6): `graft.Explain` prints the static plan, where AQE-time exchange
  * reuse is invisible (`AdaptiveSparkPlan isFinalPlan=false`). This tool
  * EXECUTES each lane (collect — the lanes dumped here return small result
  * sets) and prints the re-optimized plan, in which `ReusedExchange` /
  * `ShuffleQueryStage (reused)` nodes appear where AQE actually shared
  * work. Output goes to plans/<dir> via shell redirection like Explain. */
object AdaptivePlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else Seq("t21_span_dedup",
      "t28_span_rewrite")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names; q <- graft.SparkEntry.all.get(n)) {
      val df = q.fn(spark, sfDir)
      df.collect()
      println(s"\n========== $n (adaptive executed plan, post-execution) ==========")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
