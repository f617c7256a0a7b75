package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingDedup

/** Per-trigger breakdown of the stream_dedup bench lane (r22, verdict item
  * 2): replicates StreamingBench.dedupLane (same rows/trigger, same corpus
  * cycling, same sink) with a SparkListener that attributes each trigger's
  * wall to its jobs (the state-machine + fold pass, the survivors noop
  * write, the totalDocs count) and the un-attributed driver gap (planning,
  * state-store commits, offset log). One JSON line per trigger. */
object StreamDedupProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val batches = args.lift(1).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SessionTuning(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // job ledger: (jobId, wallMs, stageCount, taskCount)
    val jobs = collection.mutable.ArrayBuffer.empty[(Int, Long, Int, Int)]
    val jobStart = collection.mutable.Map.empty[Int, (Long, Int)]
    val taskCounts = collection.mutable.Map.empty[Int, Int]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobStart(j.jobId) = (j.time, j.stageInfos.size)
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        taskCounts(s.stageInfo.stageId) = s.stageInfo.numTasks
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        jobStart.remove(j.jobId).foreach { case (t0, nStages) =>
          jobs.synchronized { jobs += ((j.jobId, j.time - t0, nStages, 0)) }
        }
    })

    val rowsPerBatch = 500
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"text").limit(rowsPerBatch * batches)
      .as[String].collect()
    def ts(b: Int, i: Int) = new java.sql.Timestamp(
      1700000000000L + b * 60000L + i * 10L)
    val stream = MemoryStream[(java.sql.Timestamp, Long, String)]
    val writer = StreamingDedup.dedupNear(
      stream.toDS().toDF("ts", "doc_id", "text"), "text", "ts", "doc_id",
      watermark = "10 minutes", stateTtlMs = 60 * 60 * 1000L) { survivors =>
      survivors.write.format("noop").mode("overwrite").save()
    }
    val query = writer.start()
    try {
      for (b <- 0 until batches) {
        stream.addData((0 until rowsPerBatch).map { i =>
          val n = b * rowsPerBatch + i
          (ts(b, i), n.toLong, texts(n % texts.length))
        })
        jobs.synchronized(jobs.clear())
        val t0 = System.nanoTime()
        query.processAllAvailable()
        val wallMs = (System.nanoTime() - t0) / 1e6
        val snap = jobs.synchronized(jobs.toVector)
        val jobMs = snap.map(_._2).sum
        val jl = snap.map { case (id, ms, st, _) => s"""{"job":$id,"ms":$ms,"stages":$st}""" }
          .mkString("[", ",", "]")
        println(f"""{"trigger":$b,"wall_ms":${wallMs}%.0f,"job_ms":$jobMs,"driver_gap_ms":${wallMs - jobMs}%.0f,"n_jobs":${snap.size},"jobs":$jl}""")
      }
    } finally query.stop()
    spark.stop()
  }
}
