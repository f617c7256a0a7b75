package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSessionTestWrapper
import graft.index.{ClassifiedRead, IndexParams, MinimizerIndex, WideMinimizerIndex}
import graft.sources.InputFragment
import graft.taxa.Taxonomy
import scala.util.Random

class StreamingClassifierSpec extends AnyFunSuite with SparkSessionTestWrapper {

  val rng = new Random(23)
  def randomDna(n: Int): String = Array.fill(n)("ACGT"(rng.nextInt(4))).mkString

  val tax = Taxonomy.fromTuples(Seq(
    (2, 1, "genus", "g1"),
    (4, 2, "species", "s4"), (5, 2, "species", "s5")))
  val params = IndexParams(k = 35, m = 31, spaces = 7, buckets = 4)
  lazy val bcTax = spark.sparkContext.broadcast(tax)
  lazy val index = new MinimizerIndex(params, bcTax)
  val genomes = Map(4 -> randomDna(2500), 5 -> randomDna(2500))

  def reads(n: Int, offset: Int = 0): Seq[InputFragment] = (0 until n).map { i =>
    val t = if (i % 2 == 0) 4 else 5
    val g = genomes(t)
    val s = rng.nextInt(g.length - 150)
    InputFragment(s"sr${offset + i}|src=$t", 0L, g.substring(s, s + 150), None)
  }

  test("foreachBatch streaming classification matches batch results per batch") {
    import spark.implicits._
    val records = index.makeRecords(spark.createDataset(genomes.toSeq)).cache()
    records.count()

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[InputFragment]
    val results = scala.collection.mutable.Map.empty[Long, Array[ClassifiedRead]]

    val query = StreamingClassifier.classifyStream(index, stream.toDS(), records) {
      (batchId, classified) => results.synchronized {
        results(batchId) = classified.collect()
      }
    }.start()

    try {
      val batch1 = reads(30)
      val batch2 = reads(30, offset = 100)
      stream.addData(batch1)
      query.processAllAvailable()
      stream.addData(batch2)
      query.processAllAvailable()

      assert(results.size == 2)
      val all = results.values.flatten.toSeq
      assert(all.size == 60)
      for (c <- all if c.classified) {
        val src = c.title.split("src=")(1).toInt
        assert(tax.hasAncestor(src, c.taxon))
      }
      assert(all.count(_.classified) > 50)

      // streaming per batch == batch API on the same input
      val batchResult = index.classify(
        index.spans(spark.createDataset(batch1)), records)
        .collect().map(c => c.title -> c.taxon).toMap
      val streamResult = results(0).map(c => c.title -> c.taxon).toMap
      assert(batchResult == streamResult)
    } finally query.stop()
  }

  test("in-memory streaming classification matches the join-path stream") {
    import spark.implicits._
    val records = index.makeRecords(spark.createDataset(genomes.toSeq)).cache()
    records.count()

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[InputFragment]
    val results = scala.collection.mutable.Map.empty[Long, Array[ClassifiedRead]]

    // the broadcast table is built ONCE here, before the stream starts
    val query = StreamingClassifier.classifyStreamInMemory(index,
        stream.toDS(), records) { (batchId, classified) =>
      results.synchronized { results(batchId) = classified.collect() }
    }.start()

    try {
      val batch1 = reads(30, offset = 200)
      val batch2 = reads(30, offset = 300)
      stream.addData(batch1)
      query.processAllAvailable()
      stream.addData(batch2)
      query.processAllAvailable()

      assert(results.size == 2)
      // per batch, the zero-shuffle stream equals the batch join path
      // (full rows: taxa, lengths and hit strings)
      for ((batchId, batch) <- Seq(0L -> batch1, 1L -> batch2)) {
        val expect = index.classify(
          index.spans(spark.createDataset(batch)), records)
          .collect().map(c => c.title -> ((c.taxon, c.length, c.hits))).toMap
        val got = results(batchId)
          .map(c => c.title -> ((c.taxon, c.length, c.hits))).toMap
        assert(got == expect, s"batch $batchId")
      }
    } finally query.stop()
    records.unpersist()
  }

  test("native streaming aggregation: running taxon k-mer mass in update mode") {
    import spark.implicits._
    val records = index.makeRecords(spark.createDataset(genomes.toSeq)).cache()

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[InputFragment]
    val agg = StreamingClassifier.taxonKmerMassStream(index, stream.toDS(), records)
    val query = agg.writeStream
      .outputMode("update")
      .format("memory")
      .queryName("taxon_mass")
      .start()

    try {
      stream.addData(reads(40))
      query.processAllAvailable()
      val state = spark.sql("SELECT * FROM taxon_mass").collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(state.keySet.intersect(Set(2, 4, 5)).nonEmpty)
      assert(state.values.forall(_ > 0))
    } finally query.stop()
  }

  test("flatMapGroupsWithState sessionization closes sessions on gaps") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[UserEvent]
    val query = Sessionize.sessions(stream.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("sessions_out").start()
    try {
      val h = 3600L * 1000000000L
      // user 1: two bursts separated by > 1h gap; user 2: one burst
      stream.addData(Seq(
        UserEvent(1L, 0L, "click", 1.0),
        UserEvent(1L, 1000L, "view", 2.0),
        UserEvent(1L, 2 * h, "click", 3.0), // gap -> closes first session
        UserEvent(2L, 0L, "purchase", 9.0)))
      query.processAllAvailable()
      val rows = spark.sql("SELECT * FROM sessions_out").as[SessionOut].collect()
      // the first session of user 1 must be closed with 2 events, value 3.0
      val closed = rows.filter(s => s.userId == 1L && s.closed)
      assert(closed.length == 1)
      assert(closed.head.nEvents == 2 && closed.head.totalValue == 3.0)
      assert(closed.head.startNanos == 0L && closed.head.endNanos == 1000L)
      // user 2's session is still open (no gap, no timeout yet)
      assert(!rows.exists(s => s.userId == 2L))
    } finally query.stop()
  }

  test("windowed event-time abundance with watermark") {
    import spark.implicits._
    val records = index.makeRecords(spark.createDataset(genomes.toSeq)).cache()

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, InputFragment)]
    val agg = StreamingClassifier.windowedAbundance(index, stream.toDS(), records,
      windowLen = "1 minute", watermark = "2 minutes")
    val query = agg.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("windowed_abundance")
      .start()

    try {
      val t0 = java.sql.Timestamp.valueOf("2026-01-01 10:00:30")
      val t1 = java.sql.Timestamp.valueOf("2026-01-01 10:05:00")
      stream.addData(reads(20).map(f => (t0, f)))
      query.processAllAvailable()
      // advance event time far past the watermark to close the first window
      stream.addData(reads(5, offset = 200).map(f => (t1, f)))
      query.processAllAvailable()
      val rows = spark.sql("SELECT * FROM windowed_abundance").collect()
      assert(rows.nonEmpty)
      assert(rows.forall(_.getLong(2) > 0))
    } finally query.stop()
  }

  test("streaming classification is width-generic: wide (m=33) index streams") {
    import spark.implicits._
    val wide = new WideMinimizerIndex(k = 35, m = 33, bcTax)
    val records = wide.buildRecords(spark.createDataset(genomes.toSeq)).cache()
    records.count()

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[InputFragment]
    val results = scala.collection.mutable.Map.empty[Long, Array[ClassifiedRead]]
    val query = StreamingClassifier.classifyStream(wide, stream.toDS(), records) {
      (batchId, classified) => results.synchronized {
        results(batchId) = classified.collect()
      }
    }.start()
    try {
      val batch = reads(30)
      stream.addData(batch)
      query.processAllAvailable()
      val all = results.values.flatten.toSeq
      assert(all.size == 30)
      assert(all.count(_.classified) > 25)
      for (c <- all if c.classified) {
        val src = c.title.split("src=")(1).toInt
        assert(tax.hasAncestor(src, c.taxon))
      }
      // streaming == batch API over the wide index on the same input
      val batchResult = wide.classifyDF(
        wide.spansDF(spark.createDataset(batch)), records)
        .collect().map(c => c.title -> c.taxon).toMap
      assert(results(0).map(c => c.title -> c.taxon).toMap == batchResult)
    } finally query.stop()
  }

  test("windowed event-time abundance over a wide index joins on both keys") {
    import spark.implicits._
    val wide = new WideMinimizerIndex(k = 35, m = 33, bcTax)
    val records = wide.buildRecords(spark.createDataset(genomes.toSeq)).cache()

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, InputFragment)]
    val agg = StreamingClassifier.windowedAbundance(wide, stream.toDS(), records,
      windowLen = "1 minute", watermark = "2 minutes")
    val query = agg.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("windowed_abundance_wide")
      .start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2026-01-01 10:00:30")
      val t1 = java.sql.Timestamp.valueOf("2026-01-01 10:05:00")
      stream.addData(reads(20).map(f => (t0, f)))
      query.processAllAvailable()
      stream.addData(reads(5, offset = 200).map(f => (t1, f)))
      query.processAllAvailable()
      val rows = spark.sql("SELECT * FROM windowed_abundance_wide").collect()
      assert(rows.nonEmpty)
      assert(rows.forall(_.getLong(2) > 0))
    } finally query.stop()
  }
}
