package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Per-stage time/bytes breakdown for selected bench lanes (guide §1:
  * measure first; §7.1: decide whether time goes to compute, shuffle or the
  * driver BEFORE changing anything). For each lane this runs `reps`
  * executions through the noop sink with a listener that accumulates, per
  * stage: wall span, summed executor run/CPU time, shuffle read/write bytes,
  * input bytes and task count. The report separates
  *   - executor-side time (Σ executorRunTime / cores ≈ the parallel compute
  *     floor),
  *   - shuffle traffic (fetch-wait is inside executorRunTime; bytes tell the
  *     story), and
  *   - the DRIVER GAP (rep wall − Σ stage wall spans, ≈ planning + collect +
  *     job-submission overhead — the part no plan change can fix).
  * Output is one JSON line per lane on stdout (plus a human table on stderr)
  * so sweeps can be diffed round over round.
  */
object LaneProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROFILE_REPS", "2").toInt
    val lanes =
      if (args.nonEmpty) args.toSeq
      else Seq("g03_classify", "g13_wide64_freq_classify", "g14_xwide_classify",
        "g10_multisample_classify2", "g04_classify2", "t28_span_rewrite",
        "t37_cc_contraction", "c07_semantic_dedup_k1024", "q38_interval_join")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // ad-hoc conf A/B hook: SPARK_GRAFT_EXTRA_CONF="key=value;key=value"
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach { kvs =>
      kvs.split(";").map(_.trim).filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k, v)
      }
    }
    val spark = graft.SessionTuning(builder).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    final case class StageAgg(var name: String = "", var wallMs: Long = 0,
      var runMs: Long = 0, var cpuMs: Long = 0, var shufReadB: Long = 0,
      var shufWriteB: Long = 0, var inputB: Long = 0, var tasks: Int = 0)
    val stages = mutable.LinkedHashMap.empty[Int, StageAgg]
    var jobWallMs = 0L
    var jobStart = mutable.Map.empty[Int, Long]
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobStart(j.jobId) = j.time
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        jobStart.remove(j.jobId).foreach(t0 => jobWallMs += j.time - t0)
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val agg = stages.getOrElseUpdate(si.stageId, StageAgg())
        agg.name = si.name.takeWhile(_ != '\n')
        agg.wallMs += (for {
          a <- si.submissionTime; b <- si.completionTime } yield b - a)
          .getOrElse(0L)
        agg.tasks += si.numTasks
        val m = si.taskMetrics
        if (m != null) {
          agg.runMs += m.executorRunTime
          agg.cpuMs += m.executorCpuTime / 1000000L
          agg.shufReadB += m.shuffleReadMetrics.totalBytesRead
          agg.shufWriteB += m.shuffleWriteMetrics.bytesWritten
          agg.inputB += m.inputMetrics.bytesRead
        }
      }
    }

    def run(q: org.apache.spark.sql.DataFrame): Unit =
      q.write.format("noop").mode("overwrite").save()

    for (name <- lanes; q <- graft.SparkEntry.all.get(name)) {
      // one untimed warm-up (JIT, codegen cache, FS cache)
      try run(q.fn(spark, sfDir)) catch { case e: Throwable =>
        System.err.println(s"[profile] $name warmup FAILED: $e") }
      stages.clear(); jobWallMs = 0
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      var failed = false
      (0 until reps).foreach { _ =>
        try run(q.fn(spark, sfDir))
        catch { case e: Throwable => failed = true
          System.err.println(s"[profile] $name FAILED: $e") }
      }
      val wallMs = (System.nanoTime() - t0) / 1000000L
      // listener events are async; give the bus a moment to drain (the
      // public API has no wait — a fixed short sleep is fine for a profiler)
      Thread.sleep(300)
      spark.sparkContext.removeSparkListener(listener)
      val sumWall = stages.valuesIterator.map(_.wallMs).sum
      val sumRun = stages.valuesIterator.map(_.runMs).sum
      val sumCpu = stages.valuesIterator.map(_.cpuMs).sum
      val sumSR = stages.valuesIterator.map(_.shufReadB).sum
      val sumSW = stages.valuesIterator.map(_.shufWriteB).sum
      val sumIn = stages.valuesIterator.map(_.inputB).sum
      val nStages = stages.size
      System.err.println(f"\n== $name%s reps=$reps wall=${wallMs / 1000.0}%.2fs " +
        f"stages=$nStages stageWallSum=${sumWall / 1000.0}%.2fs " +
        f"jobWallSum=${jobWallMs / 1000.0}%.2fs " +
        f"driverGap=${(wallMs - jobWallMs) / 1000.0}%.2fs")
      System.err.println(f"   execRun=${sumRun / 1000.0}%.1fs " +
        f"execCpu=${sumCpu / 1000.0}%.1fs (parallel floor ~" +
        f"${sumRun / 1000.0 / cpus.toInt}%.2fs) " +
        f"shufR=${sumSR / 1e6}%.1fMB shufW=${sumSW / 1e6}%.1fMB " +
        f"input=${sumIn / 1e6}%.1fMB")
      val top = stages.toSeq.sortBy(-_._2.runMs).take(8)
      for ((id, a) <- top)
        System.err.println(f"   stage $id%4d ${a.wallMs}%6dms wall " +
          f"${a.runMs}%7dms run ${a.cpuMs}%7dms cpu ${a.tasks}%4d tasks " +
          f"sr=${a.shufReadB / 1e6}%.1fMB sw=${a.shufWriteB / 1e6}%.1fMB " +
          f"in=${a.inputB / 1e6}%.1fMB  ${a.name}%s")
      def num(d: Double) = String.format(java.util.Locale.ROOT, "%.3f",
        Double.box(d))
      println(s"""{"lane":"$name","reps":$reps,"failed":$failed""" +
        s""","wall_s":${num(wallMs / 1000.0)}""" +
        s""","job_wall_s":${num(jobWallMs / 1000.0)}""" +
        s""","driver_gap_s":${num((wallMs - jobWallMs) / 1000.0)}""" +
        s""","exec_run_s":${num(sumRun / 1000.0)}""" +
        s""","exec_cpu_s":${num(sumCpu / 1000.0)}""" +
        s""","shuffle_read_mb":${num(sumSR / 1e6)}""" +
        s""","shuffle_write_mb":${num(sumSW / 1e6)}""" +
        s""","input_mb":${num(sumIn / 1e6)},"stages":$nStages}""")
    }
    spark.stop()
  }
}
