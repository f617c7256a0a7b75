package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionTestWrapper
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Differential gate for the r19 q38 rewrite: the order-statistics shape
  * ([[RelationalQueries.intervalConcurrency]] — union + cumulative windows,
  * no pairwise join) must be row-identical to the retired pairwise shape
  * ([[RelationalQueries.intervalConcurrencyPairwise]] — day-bucket
  * equi-join + range filter, measured quadratic in time density: sf1→sf5
  * exponent 2.09) on every fixture class that distinguishes them:
  * uniform, hot-day skew, exact-timestamp boundary collisions, a user
  * whose event_id order disagrees with timestamp order (time-overlapping
  * sessions of ONE user — the case where "own events in [t0,t1]" is NOT
  * the session size), and single-user data (all counts 0). */
class IntervalPrefixSumSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val H = 3600L * 1000000000L
  private val DAY = 24 * H

  private def run(ev: DataFrame): Set[(Long, Long, Long)] =
    RelationalQueries.intervalConcurrency(ev)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def runPairwise(ev: DataFrame): Set[(Long, Long, Long)] =
    RelationalQueries.intervalConcurrencyPairwise(ev)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def mkEv(rows: Seq[(Long, Long, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("event_id", "user_id", "ts")
  }

  test("uniform random fixture: identical to the pairwise shape") {
    val rng = new scala.util.Random(7)
    val rows = (0L until 4000L).map { i =>
      (i, rng.nextInt(40).toLong, 100 * DAY + rng.nextLong(10 * DAY))
    }
    val ev = mkEv(rows)
    val a = run(ev); val b = runPairwise(ev)
    assert(a == b, s"prefix-sum vs pairwise diverged: ${(a -- b).take(3)} / ${(b -- a).take(3)}")
    assert(a.exists(_._3 > 0), "fixture produced no concurrency at all")
  }

  test("hot-day skew (70% of events on one day): identical") {
    val rng = new scala.util.Random(11)
    val rows = (0L until 4000L).map { i =>
      val day = if (rng.nextInt(100) < 70) 1000L else 1001L + rng.nextInt(60)
      (i, rng.nextInt(50).toLong, day * DAY + rng.nextLong(DAY))
    }
    val ev = mkEv(rows)
    assert(run(ev) == runPairwise(ev))
  }

  test("exact-timestamp collisions at session boundaries: identical " +
    "(the <t0 / <=t1 tie-break is where an off-by-one would hide)") {
    // users 1..6 all emit events at the SAME nanosecond grid; session
    // boundaries (min/max ts) land exactly on other users' event times
    val rows = for {
      u <- 1L to 6L
      k <- 0L until 50L
    } yield (u * 1000 + k, u, 100 * DAY + k * (H / 2))
    val ev = mkEv(rows)
    assert(run(ev) == runPairwise(ev))
  }

  test("event_id order disagreeing with ts order (time-overlapping " +
    "sessions of one user): identical — the same-user term is computed, " +
    "not assumed from session disjointness") {
    // user 1's event_id order: 0h, 0.5h (session 0), then 5h (gap > 1h ->
    // session 1), then ts JUMPS BACK to 0.25h — the signed gap rule
    // (ts - prev_ts > 1h) does not split on a negative gap, so session 1
    // spans [0.25h, 5h] and CONTAINS user 1's own session-0 event at
    // 0.5h. A naive "own = session size" subtraction undercounts there;
    // the per-user window computes the true in-range own count (3).
    val rows = Seq(
      (0L, 1L, 100 * DAY + 0L),        // session 0
      (1L, 1L, 100 * DAY + H / 2),     // session 0 (gap 0.5h)
      (2L, 1L, 100 * DAY + 5 * H),     // session 1 (gap 4.5h > 1h)
      (3L, 1L, 100 * DAY + H / 4),     // session 1 (negative gap: no split)
      // user 2 bystanders inside/outside the ranges
      (10L, 2L, 100 * DAY + H / 3),
      (11L, 2L, 100 * DAY + 4 * H),
      (12L, 2L, 100 * DAY + 6 * H))
    val ev = mkEv(rows)
    val a = run(ev); val b = runPairwise(ev)
    assert(a == b, s"diverged on overlap fixture: $a vs $b")
    // sanity: user 1 really has two sessions and session 1's time range
    // contains a user-1 event from session 0 (the trap this test exists for)
    val sess = RelationalQueries.sessionize(ev)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val u1 = sess.filter(_._1 == 1L)
    assert(u1.length == 2, s"expected 2 user-1 sessions: ${u1.toSeq}")
    val s1 = u1.maxBy(_._2)
    assert(s1._3 <= 100 * DAY + H / 2 && s1._4 >= 100 * DAY + H / 2,
      s"fixture lost its time overlap: $s1")
  }

  test("single user: every session counts zero concurrent events") {
    val rows = (0L until 100L).map(i => (i, 1L, 100 * DAY + i * 2 * H))
    val ev = mkEv(rows)
    val a = run(ev)
    assert(a == runPairwise(ev))
    assert(a.forall(_._3 == 0L))
  }
}
