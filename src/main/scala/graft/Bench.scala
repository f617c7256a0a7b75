package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline queries on SPARK_GRAFT_SF_DIR and
  * prints one JSON line for the driver (BENCH_r{N}.json). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // full materialization through a noop sink: unlike count(), this cannot
    // be satisfied by column pruning / partial aggregation shortcuts
    def run(q: org.apache.spark.sql.DataFrame): Unit =
      q.write.format("noop").mode("overwrite").save()

    // one untimed warm-up action to JIT/codegen and prime the FS cache
    SparkEntry.benchQueries.headOption.foreach { case (_, q) =>
      try run(q.fn(spark, sfDir)) catch { case _: Throwable => () }
    }

    val results = SparkEntry.benchQueries.map { case (name, q) =>
      val t0 = System.nanoTime()
      // a failed query records -1, never its time-to-crash (round-2
      // post-mortem: swallowing made a total outage look like a 2x speedup)
      val elapsed =
        try { run(q.fn(spark, sfDir)); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: $e")
          e.printStackTrace()
          -1.0
        }
      name -> elapsed
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    val sf = sfDir.replaceAll(".*sf", "")
    val failed = results.values.count(_ < 0)
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","failed":$failed,"queries":$qs,"sf":"$sf"}""")
    spark.stop()
  }
}
