package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionTestWrapper

/** stripSpans must not pin caches it can never release (the returned
  * Dataset is lazy, so an internal persist would outlive the call for the
  * whole session) — instead its three references to the span subtree share
  * work through Spark's exchange reuse. This spec pins both halves of that
  * contract: zero persisted RDDs after materialization, and actual
  * ReusedExchange/AQE-stage-reuse nodes in the executed plan. */
class StripSpansReuseSpec extends AnyFunSuite with SparkSessionTestWrapper {

  test("stripSpans leaves no persisted RDDs and reuses the span exchanges") {
    val ss = spark.newSession()
    import ss.implicits._
    val boiler = (1 to 12).map(i => s"b$i").mkString(" ")
    val corpus = ss.createDataset((0L until 200L).map { i =>
      val unique = (0 until 20).map(j => s"u${i}_$j").mkString(" ")
      if (i % 2 == 0) (i, s"$unique $boiler") else (i, unique)
    })
    val before = ss.sparkContext.getPersistentRDDs.keySet
    val result = Dedup.stripSpans(corpus, n = 8)
    val rows = result.collect().toMap
    // semantic spot checks: keepers byte-identical, later copies stripped
    assert(rows.size == 200)
    assert(rows(0L).endsWith(boiler), "first occurrence must keep its copy")
    for (i <- 2L until 200L by 2) assert(!rows(i).contains("b1"),
      s"doc $i kept a foreign span copy")
    val after = ss.sparkContext.getPersistentRDDs.keySet
    assert((after -- before).isEmpty,
      s"stripSpans pinned caches: ${after -- before}")
    // the span subtree feeds three branches; without a persist the plan
    // must share its shuffles rather than recompute the gram aggregation
    val executed = result.queryExecution.executedPlan.toString
    assert(executed.contains("ReusedExchange") ||
      executed.contains("TableCacheQueryStage") ||
      executed.contains("ShuffleQueryStage"),
      s"no exchange reuse visible in plan:\n$executed")
    val reused = executed.linesIterator.count(l =>
      l.contains("ReusedExchange") || l.contains("reuses"))
    assert(reused >= 1, s"expected at least one reused exchange:\n$executed")
  }

  test("stripSpansEager rewrites identically to stripSpans") {
    val ss = spark.newSession()
    import ss.implicits._
    val boiler = (1 to 12).map(i => s"c$i").mkString(" ")
    val corpus = ss.createDataset((0L until 120L).map { i =>
      val unique = (0 until 20).map(j => s"v${i}_$j").mkString(" ")
      if (i % 3 == 0) (i, s"$boiler $unique $boiler") else (i, unique)
    })
    val lazyRows = Dedup.stripSpans(corpus, n = 8).collect().toMap
    val eagerRows = Dedup.stripSpansEager(corpus, n = 8).collect().toMap
    assert(eagerRows == lazyRows,
      "eager span materialization changed the rewrite")
    // the fixture must actually strip something
    assert((0L until 120L by 3).count(i => eagerRows(i) != corpus.collect()
      .toMap.apply(i)) > 0)
  }
}
