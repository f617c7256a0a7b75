package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionTestWrapper
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._

/** Pins the r16 skew decision as CI (r16 verdict ask #2): the hot-key
  * protection for bucket-keyed equi-joins is AQE skew-join splitting, NOT
  * key salting — salting was implemented, measured 2x slower at sf0.1 and
  * 6.5x at sf1.0 on healthy data, and reverted (tools/IntervalSkewProbe
  * holds the timing evidence). That makes the AQE config the load-bearing
  * artifact: if someone disables AQE skew joins or a Spark upgrade stops
  * splitting this shape, a hot key becomes a straggler at 100 TB with
  * nothing failing. This spec replays the day-bucket equi-join -> range
  * filter shape on a fixture with 70% of both sides on ONE day, with the
  * skew threshold lowered to engage the splitter at test size (the 256 MB
  * default plays the same role at cluster scale), and asserts (a) the
  * FINAL adaptive plan contains a skew-split shuffled join and (b) the
  * result matches the unsplit run.
  *
  * r19 NOTE: q38 itself no longer runs this shape — its pairwise join was
  * measured QUADRATIC in time density (sf1→sf5 exponent 2.09) and was
  * replaced by the order-statistics rewrite
  * ([[RelationalQueries.intervalConcurrency]], IntervalPrefixSumSpec).
  * The retired shape survives as
  * [[RelationalQueries.intervalConcurrencyPairwise]] (the differential
  * oracle), and this spec stays load-bearing for the OTHER bucket-keyed
  * joins in the engine (q35 as-of day buckets, the LSH band buckets, the
  * spans⋈index join under forced-bucketed stress). */
class IntervalSkewJoinSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val DAY = 86400L * 1000000000L

  /** q38's shape on a deterministic skewed fixture (70% of sessions and
    * events on day 1000, rest over 60 cold days — see IntervalSkewProbe). */
  private def joined(ss: SparkSession, nSessions: Int, nEvents: Int): DataFrame = {
    def day(idCol: org.apache.spark.sql.Column, salt: Int) =
      when(pmod(xxhash64(idCol, lit(salt)), lit(100)) < lit(70), lit(1000L))
        .otherwise(lit(1001L) + pmod(xxhash64(idCol, lit(salt + 1)), lit(60)))
    val sess = ss.range(nSessions.toLong).select(
      pmod(xxhash64(col("id")), lit(5000)).as("user_id"),
      col("id").as("session_idx"),
      (day(col("id"), 10) * DAY +
        pmod(xxhash64(col("id"), lit(12)), lit(DAY - 3600L * 1000000000L))).as("t0"))
      .withColumn("t1", col("t0") + 3600L * 1000000000L)
      .withColumn("bucket", expr(s"t0 DIV ${DAY}L"))
    val ev = ss.range(nEvents.toLong).select(
      pmod(xxhash64(col("id"), lit(20)), lit(5000)).as("e_user"),
      (day(col("id"), 30) * DAY + pmod(xxhash64(col("id"), lit(32)), lit(DAY))).as("ts"))
      .withColumn("bucket", expr(s"ts DIV ${DAY}L"))
    sess.join(ev, Seq("bucket"))
      .filter(col("ts").between(col("t0"), col("t1")) && col("e_user") =!= col("user_id"))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n"))
  }

  private def walk(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    p +: kids.flatMap(walk)
  }

  private def skewSession(skewJoin: Boolean): SparkSession = {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.adaptive.enabled", "true")
    ss.conf.set("spark.sql.adaptive.skewJoin.enabled", skewJoin.toString)
    // force the at-scale plan: sort-merge, no broadcast fast path
    ss.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    ss.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    // engage the splitter at test size (cluster default: 256 MB)
    ss.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64k")
    ss.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32k")
    ss.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    ss.conf.set("spark.sql.shuffle.partitions", "8")
    ss
  }

  test("q38's hot-day shape is split by AQE skew join, result unchanged") {
    val (nSessions, nEvents) = (500, 60000)

    val on = joined(skewSession(skewJoin = true), nSessions, nEvents)
    val onRows = on.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val nodes = walk(on.queryExecution.executedPlan)
    val skewJoins = nodes.collect {
      case s: SortMergeJoinExec if s.isSkewJoin => s
      case s: ShuffledHashJoinExec if s.isSkewJoin => s
    }
    assert(skewJoins.nonEmpty,
      "AQE did not skew-split the hot-day join — q38's hot-key protection " +
        "is gone (config regression or Spark behavior change):\n" +
        on.queryExecution.executedPlan.toString.linesIterator.take(40).mkString("\n"))

    val off = joined(skewSession(skewJoin = false), nSessions, nEvents)
    val offRows = off.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(onRows == offRows, "skew-split changed the join result")
    assert(onRows.nonEmpty)
  }
}
