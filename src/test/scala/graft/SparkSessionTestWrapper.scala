package graft

import org.apache.spark.sql.SparkSession

/** Shared local session for Spark specs. Tiny input splits force multi-split
  * code paths (same trick as the reference test harness). */
trait SparkSessionTestWrapper {
  lazy val spark: SparkSession = SparkSessionTestWrapper.session
}

object SparkSessionTestWrapper {
  lazy val session: SparkSession = {
    val warehouse = java.nio.file.Files.createTempDirectory("graft-warehouse")
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", warehouse.toString)
      .config("spark.sql.files.maxPartitionBytes", "65536")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
