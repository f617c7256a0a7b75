package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSessionTestWrapper
import java.sql.Timestamp

class StreamingDedupSpec extends AnyFunSuite with SparkSessionTestWrapper {

  def ts(sec: Int): Timestamp = Timestamp.valueOf(f"2026-01-01 10:00:${sec}%02d")

  test("streaming exact dedup keeps first arrival within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, Long, String)]
    val out = StreamingDedup.dedupExact(
      stream.toDS().toDF("ts", "doc_id", "text"), "text", "ts",
      watermark = "10 minutes")
    val query = out.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      stream.addData(Seq(
        (ts(0), 1L, "alpha beta"),
        (ts(1), 2L, "alpha beta"), // dup in-batch
        (ts(2), 3L, "gamma delta")))
      query.processAllAvailable()
      stream.addData(Seq(
        (ts(3), 4L, "alpha beta"), // dup across batches, inside watermark
        (ts(4), 5L, "epsilon")))
      query.processAllAvailable()
      val ids = spark.sql("SELECT doc_id FROM dedup_out")
        .collect().map(_.getLong(0)).toSet
      assert(ids.contains(3L) && ids.contains(5L))
      assert(ids.intersect(Set(2L, 4L)).isEmpty) // duplicates dropped
      assert(ids.size == 3) // exactly one survivor of the alpha-beta trio
    } finally query.stop()
  }

  test("streaming near-dup keeps exactly one representative per cluster") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, Long, String)]
    val shared = "the quick brown fox jumps over the lazy dog again and again " * 4
    val distinct = "completely different content about spark physical plans " * 4
    val survivors = collection.mutable.Set.empty[Long]
    val writer = StreamingDedup.dedupNear(
      stream.toDS().toDF("ts", "doc_id", "text"), "text", "ts", "doc_id",
      watermark = "1 minute", stateTtlMs = 60 * 1000L) { batch =>
      survivors.synchronized {
        survivors ++= batch.select("doc_id").collect().map(_.getLong(0))
      }
    }
    val query = writer.start()
    try {
      // a 3-doc near-dup cluster in one batch + one distinct doc: the naive
      // per-row band dedup could split bucket ownership and drop the WHOLE
      // cluster; the ownership design must keep exactly doc 1
      stream.addData(Seq(
        (ts(0), 1L, shared),
        (ts(1), 2L, shared),
        (ts(2), 3L, shared + " tail"),
        (ts(3), 4L, distinct)))
      query.processAllAvailable()
      // cross-batch duplicate inside the watermark; empty/whitespace docs
      // are never near-dup candidates and must ALL pass (batch parity)
      stream.addData(Seq(
        (ts(10), 5L, shared),
        (ts(11), 6L, "   "),
        (ts(12), 7L, "")))
      query.processAllAvailable()
      val ids = survivors.synchronized(survivors.toSet)
      assert(ids.contains(1L), s"cluster representative lost: $ids")
      assert(ids.contains(4L), s"distinct doc lost: $ids")
      assert(ids.contains(6L) && ids.contains(7L),
        s"empty docs wrongly suppressed: $ids")
      assert(ids.intersect(Set(2L, 3L, 5L)).isEmpty,
        s"near-duplicates not suppressed: $ids")
    } finally query.stop()
  }

  test("streaming embedding near-dup suppresses cosine look-alikes across " +
    "triggers; zero vectors all pass") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = 32
    // deterministic signed random direction per d (LCG, zero-centered)
    def dir(d: Int): Array[Float] = {
      var s = d.toLong * 6364136223846793005L + 1442695040888963407L
      Array.tabulate(dim) { _ =>
        s = s * 6364136223846793005L + 1442695040888963407L
        ((s >>> 40).toInt % 2001 - 1000) / 1000f
      }
    }
    // tiny jitter: sign pattern moves at most one hyperplane, which the
    // multi-probe band keys cover
    def near(v: Array[Float], seed: Long): Array[Float] = {
      var s = seed * 2862933555777941757L + 3037000493L
      v.map { x =>
        s = s * 2862933555777941757L + 3037000493L
        x + ((s >>> 40).toInt % 5 - 2) / 1000f
      }
    }
    val stream = MemoryStream[(Timestamp, Long, Array[Float])]
    val survivors = collection.mutable.Set.empty[Long]
    val writer = StreamingDedup.dedupNearEmbedding(
      stream.toDS().toDF("ts", "vec_id", "emb"), "emb", "ts", "vec_id",
      watermark = "1 minute", planes = 12, stateTtlMs = 60 * 1000L) { batch =>
      survivors.synchronized {
        survivors ++= batch.select("vec_id").collect().map(_.getLong(0))
      }
    }
    val query = writer.start()
    try {
      // trigger 1: five distinct directions, an in-batch exact copy of
      // direction 1, and a zero vector
      stream.addData(Seq(
        (ts(0), 1L, dir(1)), (ts(1), 2L, dir(2)), (ts(2), 3L, dir(3)),
        (ts(3), 4L, dir(4)), (ts(4), 5L, dir(5)),
        (ts(5), 6L, dir(1).clone()),
        (ts(6), 7L, new Array[Float](dim))))
      query.processAllAvailable()
      // trigger 2: a cross-trigger near-copy of direction 2, one genuinely
      // new direction, and another zero vector (degenerates never suppress
      // each other — batch parity with the positive-threshold cosine gate)
      stream.addData(Seq(
        (ts(10), 8L, near(dir(2), 8L)),
        (ts(11), 9L, dir(9)),
        (ts(12), 10L, new Array[Float](dim))))
      query.processAllAvailable()
      val ids = survivors.synchronized(survivors.toSet)
      assert(Set(1L, 2L, 3L, 4L, 5L).subsetOf(ids),
        s"distinct directions lost: $ids")
      assert(ids.contains(9L), s"new direction lost: $ids")
      assert(ids.contains(7L) && ids.contains(10L),
        s"zero vectors wrongly suppressed: $ids")
      assert(!ids.contains(6L), s"in-batch exact copy not suppressed: $ids")
      assert(!ids.contains(8L), s"cross-trigger near-copy not suppressed: $ids")
    } finally query.stop()
  }

  test("streaming embedding near-dup never suppresses on bucket collision " +
    "alone: the in-state cosine confirm gates every drop") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = 32
    def dir(d: Int): Array[Float] = {
      var s = d.toLong * 6364136223846793005L + 1442695040888963407L
      Array.tabulate(dim) { _ =>
        s = s * 6364136223846793005L + 1442695040888963407L
        ((s >>> 40).toInt % 2001 - 1000) / 1000f
      }
    }
    val stream = MemoryStream[(Timestamp, Long, Array[Float])]
    val survivors = collection.mutable.Set.empty[Long]
    // planes = 2: only FOUR buckets, and every doc multi-probes all but
    // one of them — collisions are total. Without the sketch confirm this
    // setting suppressed everything after the first arrival; with it,
    // distinct directions must all pass while the exact copy still drops
    val writer = StreamingDedup.dedupNearEmbedding(
      stream.toDS().toDF("ts", "vec_id", "emb"), "emb", "ts", "vec_id",
      tau = 0.9, watermark = "1 minute", planes = 2,
      stateTtlMs = 60 * 1000L) { batch =>
      survivors.synchronized {
        survivors ++= batch.select("vec_id").collect().map(_.getLong(0))
      }
    }
    val query = writer.start()
    try {
      stream.addData(Seq(
        (ts(0), 1L, dir(11)), (ts(1), 2L, dir(12)), (ts(2), 3L, dir(13)),
        (ts(3), 4L, dir(14)), (ts(4), 5L, dir(15)), (ts(5), 6L, dir(16))))
      query.processAllAvailable()
      stream.addData(Seq(
        (ts(10), 7L, dir(17)), (ts(11), 8L, dir(12).clone())))
      query.processAllAvailable()
      val ids = survivors.synchronized(survivors.toSet)
      assert(Set(1L, 2L, 3L, 4L, 5L, 6L, 7L).subsetOf(ids),
        s"distinct directions suppressed by mere bucket collision: $ids")
      assert(!ids.contains(8L), s"exact copy not suppressed: $ids")
    } finally query.stop()
  }

  test("survivor fold is distributed: <10% of docs reach the driver greedy") {
    import spark.implicits._
    import StreamingDedup.OwnedRow
    val rows = collection.mutable.ArrayBuffer.empty[OwnedRow]
    // 90 unique docs: every bucket self-owned -> classified alive distributively
    for (i <- 1 to 90) {
      rows += OwnedRow(i, ts(i % 50), 1000L + i, i, false, s"text $i")
      rows += OwnedRow(i, ts(i % 50), 2000L + i, i, false, null)
    }
    // 5 docs duplicating earlier batches: prior-owned bucket -> dead distributively
    for (i <- 91 to 95)
      rows += OwnedRow(i, ts(50), 3000L + i, 424200L + i, true, s"text $i")
    // 5 (X, Y) pairs: X dead via a prior bucket but owns a fresh bucket that Y
    // also touches -> Y is the genuine residual class needing the greedy
    for (i <- 96 to 100) {
      val x = 100L + i
      rows += OwnedRow(x, ts(51), 5000L + i, 424242L, true, s"text x$i")
      rows += OwnedRow(x, ts(51), 6000L + i, x, false, null)
      rows += OwnedRow(i, ts(52), 6000L + i, x, false, s"text y$i")
    }
    val fold = StreamingDedup.foldBatch(spark.createDataset(rows.toSeq))
    try {
      assert(fold.totalDocs() == 105)
      assert(fold.residualDocs == 5, "only the 5 Y docs need the greedy")
      assert(fold.residualDocs.toDouble / fold.totalDocs() < 0.10)
      val ids = fold.survivors.select("docId").collect().map(_.getLong(0)).toSet
      assert(ids == ((1 to 90) ++ (96 to 100)).map(_.toLong).toSet)
      // X's fresh buckets get reassigned to their surviving toucher Y
      val fb = fold.feedback.collect().map(f => f.bandKey -> f.newOwner).toMap
      assert(fb == (96 to 100).map(i => (6000L + i) -> i.toLong).toMap)
    } finally fold.cleanup()
  }

  /** Deterministic per-token candidate test so bucket collisions are exact. */
  private val tokenKeyer: String => Array[Long] = s =>
    s.trim.split("\\s+").filter(_.nonEmpty)
      .map(t => graft.functions.TextAnalysis.mix64(t.hashCode.toLong)).distinct

  test("feedback releases a dead doc's buckets after one trigger") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, Long, String)]
    val fbStream = MemoryStream[StreamingDedup.Feedback]
    val survivors = collection.mutable.Set.empty[Long]
    val writer = StreamingDedup.dedupNearWithFeedback(
      stream.toDS().toDF("ts", "doc_id", "text"), "text", "ts", "doc_id",
      Some(fbStream.toDS()), watermark = "1 minute",
      stateTtlMs = 3600 * 1000L, keyer = Some(tokenKeyer)) { (surv, fb) =>
      survivors.synchronized {
        survivors ++= surv.select("doc_id").collect().map(_.getLong(0))
      }
      val f = fb.collect()
      if (f.nonEmpty) fbStream.addData(f.toIndexedSeq)
    }
    val query = writer.start()
    try {
      stream.addData(Seq((ts(0), 1L, "alpha shared")))
      query.processAllAvailable()
      // doc 2 dies on bucket "shared" (owned by live doc 1) but is the first
      // arrival in bucket "beta" — without feedback that bucket would keep
      // suppressing beta-docs for the full 1 h TTL
      stream.addData(Seq((ts(1), 2L, "shared beta")))
      query.processAllAvailable()
      stream.addData(Seq((ts(2), 3L, "beta")))
      query.processAllAvailable()
      val ids = survivors.synchronized(survivors.toSet)
      assert(ids == Set(1L, 3L),
        s"feedback must free the dead doc's bucket within one trigger: $ids")
    } finally query.stop()
  }

  test("without feedback the dead doc's bucket suppresses until TTL") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, Long, String)]
    val survivors = collection.mutable.Set.empty[Long]
    val writer = StreamingDedup.dedupNearWithFeedback(
      stream.toDS().toDF("ts", "doc_id", "text"), "text", "ts", "doc_id",
      None, watermark = "1 minute", stateTtlMs = 3600 * 1000L,
      keyer = Some(tokenKeyer)) { (surv, _) =>
      survivors.synchronized {
        survivors ++= surv.select("doc_id").collect().map(_.getLong(0))
      }
    }
    val query = writer.start()
    try {
      stream.addData(Seq((ts(0), 1L, "alpha shared")))
      query.processAllAvailable()
      stream.addData(Seq((ts(1), 2L, "shared beta")))
      query.processAllAvailable()
      stream.addData(Seq((ts(2), 3L, "beta")))
      query.processAllAvailable()
      val ids = survivors.synchronized(survivors.toSet)
      // documents the residual window this round's feedback loop closes
      assert(ids == Set(1L),
        s"doc 3 should still be suppressed by dead doc 2's bucket: $ids")
    } finally query.stop()
  }

  test("streaming quality gate agrees with the batch kernel") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, Long, String)]
    val out = StreamingDedup.qualityFilter(
      stream.toDS().toDF("ts", "doc_id", "text"), "text", minTokens = 3)
    val query = out.writeStream.outputMode("append")
      .format("memory").queryName("quality_out").start()
    try {
      stream.addData(Seq(
        (ts(0), 1L, "good document with several proper words"),
        (ts(1), 2L, "no"), // too few tokens
        (ts(2), 3L, "1 2 3 4 5 6 7 8 9 0 , . ! ?"))) // low alpha ratio
      query.processAllAvailable()
      val ids = spark.sql("SELECT doc_id FROM quality_out")
        .collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L))
    } finally query.stop()
  }

  test("windowed per-source ingest stats close with the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String, String)]
    val out = StreamingDedup.sourceWindowStats(
      stream.toDS().toDF("ts", "source", "text"), "source", "text", "ts",
      windowLen = "1 minute", watermark = "2 minutes")
    val query = out.writeStream.outputMode("append")
      .format("memory").queryName("source_stats").start()
    try {
      stream.addData(Seq(
        (ts(0), "srcA", "aaaa"), (ts(5), "srcA", "bb"), (ts(10), "srcB", "c")))
      query.processAllAvailable()
      // advance event time past watermark + window to emit the first window
      stream.addData(Seq(
        (Timestamp.valueOf("2026-01-01 10:05:00"), "srcA", "zz")))
      query.processAllAvailable()
      val rows = spark.sql("SELECT source, n_docs, n_chars FROM source_stats")
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(rows("srcA") == ((2L, 6L)))
      assert(rows("srcB") == ((1L, 1L)))
    } finally query.stop()
  }

  test("streaming span strip matches the batch keep-first rule in one " +
    "trigger and suppresses across triggers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def words(seed: Long, k: Int): Seq[String] = {
      var s = graft.functions.TextAnalysis.mix64(seed)
      (0 until k).map { _ =>
        s = graft.functions.TextAnalysis.mix64(s)
        "w" + java.lang.Long.toHexString(s & 0xffffffL)
      }
    }
    val block = words(42L, 12)
    val doc1 = (words(100L, 10) ++ block ++ words(101L, 5)).mkString(" ")
    val doc2 = (words(200L, 4) ++ block ++ words(201L, 8)).mkString(" ")
    val flood = Seq.fill(30)("spam").mkString(" ")
    val spans = collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    val stream = MemoryStream[(Timestamp, Long, String)]
    val query = StreamingDedup.spanStrip(
      stream.toDS().toDF("ts", "doc_id", "text"), "text", "ts", "doc_id",
      n = 8, watermark = "10 minutes")({ batch =>
        spans ++= batch.collect().map(r => (r.getAs[Number](0).longValue,
          r.getAs[Number](1).longValue, r.getAs[Number](2).longValue,
          r.getAs[Number](3).longValue))
        ()
      }).outputMode("append").start()
    try {
      // one trigger: doc 1 keeps the block (smallest (ts, docId, pos)); the
      // flood doc keeps only its first gram. Same outcome as the batch
      // packed-key min for equal timestamps.
      stream.addData(Seq(
        (ts(0), 1L, doc1), (ts(0), 2L, doc2), (ts(0), 4L, flood)))
      query.processAllAvailable()
      // doc 2's block: foreign starts 5..9 -> one span covering words 5..16
      // (the 12-word block); flood: foreign starts 2..23 -> span 2..30
      assert(spans.toSet === Set(
        (2L, 5L, 16L, 5L),
        (4L, 2L, 30L, 22L)))
      // second trigger: a re-arrival of the block inside the watermark is
      // fully foreign even though its first copy claimed in an EARLIER batch
      spans.clear()
      val doc9 = (words(900L, 3) ++ block ++ words(901L, 3)).mkString(" ")
      stream.addData(Seq((ts(5), 9L, doc9)))
      query.processAllAvailable()
      assert(spans.toSet === Set((9L, 4L, 15L, 5L)))
    } finally query.stop()
  }

  test("cross-trigger keeper diverges from the batch keep-first pass on " +
    "unequal timestamps (documented contract)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def words(seed: Long, k: Int): Seq[String] = {
      var s = graft.functions.TextAnalysis.mix64(seed)
      (0 until k).map { _ =>
        s = graft.functions.TextAnalysis.mix64(s)
        "w" + java.lang.Long.toHexString(s & 0xffffffL)
      }
    }
    // the block reaches doc 10 FIRST (trigger 1, earlier ts) and doc 3 —
    // the SMALLER (doc_id, pos) — only in trigger 2: streaming keeps the
    // first ARRIVAL, batch keeps the struct-min. Both behaviors are the
    // respective contracts; this pins the divergence instead of letting a
    // parity claim paper over it.
    val block = words(4242L, 12)
    val docHi = (words(300L, 6) ++ block ++ words(301L, 4)).mkString(" ")
    val docLo = (block ++ words(302L, 7)).mkString(" ")
    val spans = collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    val stream = MemoryStream[(Timestamp, Long, String)]
    val query = StreamingDedup.spanStrip(
      stream.toDS().toDF("ts", "doc_id", "text"), "text", "ts", "doc_id",
      n = 8, watermark = "10 minutes")({ batch =>
        spans ++= batch.collect().map(r => (r.getAs[Number](0).longValue,
          r.getAs[Number](1).longValue, r.getAs[Number](2).longValue,
          r.getAs[Number](3).longValue))
        ()
      }).outputMode("append").start()
    try {
      stream.addData(Seq((ts(0), 10L, docHi)))
      query.processAllAvailable()
      assert(spans.isEmpty, "first copy must claim, not mark")
      stream.addData(Seq((ts(2), 3L, docLo)))
      query.processAllAvailable()
      // streaming: doc 3 is fully foreign (block at words 1..12, 5 starts)
      assert(spans.toSet === Set((3L, 1L, 12L, 5L)))
    } finally query.stop()
    // the batch pass on the SAME corpus keeps doc 3 (struct-min) and marks
    // doc 10 instead — the divergence this contract documents
    val batchStats = graft.operators.Dedup.stripSpanStats(
        Seq((10L, docHi), (3L, docLo)).toDS(), n = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(batchStats(3L) == 0L, "batch keeps the smaller (doc_id, pos)")
    assert(batchStats(10L) == 12L, "batch strips the larger doc's copy")
  }
}
