package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the claim behind the r16 q38 salt revert: a hot calendar day
  * in the interval join's bucket key is handled by AQE skew-join
  * splitting, so the uniform case need not pay a salt-replication tax.
  *
  * Sessions and events are synthesized DIRECTLY (not via sessionize) so
  * the hot bucket's candidate volume is controlled: `hotShare` of both
  * sessions and events land on ONE day, the rest spread over 60 days —
  * the hot bucket carries (hotShare^2 / (1-hotShare)^2 * 60) times a
  * cold bucket's join work, the 100x-hot-day shape the r15 verdict
  * worried about. The q38 join shape is replayed verbatim (bucket
  * equi-join -> range filter -> count). Broadcast is disabled so the
  * join is the sort-merge join it would be at scale, and the skew
  * threshold is lowered so the splitter engages at probe size (at
  * cluster scale the 256 MB default plays the same role).
  *
  * Measured in-sandbox (local[32], defaults: 2k sessions / 300k events,
  * 70% of each on one day): skewJoin OFF 3.90 / 4.25 s (one straggler
  * task owns the hot bucket), skewJoin ON 1.61 / 1.82 s — 2.4x, with
  * identical counts (12,009,520 matched pairs on every run). The salt
  * alternative measured 2x SLOWER at sf0.1 and 6.5x at sf1.0 on healthy
  * data (see the RelationalQueries q38 comment); this probe is the other
  * half of that decision's evidence.
  *
  * Run: sbt "runMain graft.tools.IntervalSkewProbe [nSessions] [nEvents] [hotShare]"
  */
object IntervalSkewProbe {
  def main(args: Array[String]): Unit = {
    val nSessions = args.lift(0).map(_.toInt).getOrElse(2000)
    val nEvents = args.lift(1).map(_.toInt).getOrElse(300000)
    val hotShare = args.lift(2).map(_.toDouble).getOrElse(0.7)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // force the at-scale plan: sort-merge, no broadcast fast path
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // engage the splitter at probe size (cluster default: 256 MB)
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val DAY = 86400L * 1000000000L
    val hotPct = (hotShare * 100).toInt
    // day(id, salt): the hot day (1000) for hotShare of rows, else one of
    // 60 cold days — deterministic (no Random: reproducible run to run)
    def day(idCol: org.apache.spark.sql.Column, salt: Int) =
      when(pmod(xxhash64(idCol, lit(salt)), lit(100)) < lit(hotPct), lit(1000L))
        .otherwise(lit(1001L) + pmod(xxhash64(idCol, lit(salt + 1)), lit(60)))

    // sessions: one hour inside their day, never crossing midnight
    val sess = spark.range(nSessions.toLong).select(
      pmod(xxhash64($"id"), lit(5000)).as("user_id"),
      $"id".as("session_idx"),
      (day($"id", 10) * DAY +
        pmod(xxhash64($"id", lit(12)), lit(DAY - 3600L * 1000000000L))).as("t0"))
      .withColumn("t1", $"t0" + 3600L * 1000000000L)

    val ev = spark.range(nEvents.toLong).select(
      pmod(xxhash64($"id", lit(20)), lit(5000)).as("e_user"),
      (day($"id", 30) * DAY + pmod(xxhash64($"id", lit(32)), lit(DAY))).as("ts"))

    def run(): Long = {
      val sessB = sess.select($"user_id", $"session_idx", $"t0", $"t1",
        expr(s"t0 DIV ${DAY}L").as("bucket"))
      val evB = ev.select($"e_user", $"ts", expr(s"ts DIV ${DAY}L").as("bucket"))
      sessB.join(evB, Seq("bucket"))
        .filter($"ts".between($"t0", $"t1") && $"e_user" =!= $"user_id")
        .groupBy($"user_id", $"session_idx")
        .agg(count(lit(1)).as("n"))
        .agg(sum($"n")).head.getLong(0)
    }

    def timed(label: String, skewJoin: Boolean): Long = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewJoin.toString)
      val t0 = System.nanoTime()
      val total = run()
      println(f"[skewprobe] $label%-14s ${(System.nanoTime() - t0) / 1e9}%8.2f s" +
        s"  (matched pairs: $total)")
      total
    }

    println(s"[skewprobe] $nSessions sessions, $nEvents events, " +
      s"$hotPct% of each on one day")
    timed("warmup", skewJoin = true)
    val off = timed("skewJoin OFF", skewJoin = false)
    val on = timed("skewJoin ON", skewJoin = true)
    val off2 = timed("skewJoin OFF", skewJoin = false)
    val on2 = timed("skewJoin ON", skewJoin = true)
    require(Set(off, on, off2, on2).size == 1, "results diverged across configs")
    spark.stop()
  }
}
