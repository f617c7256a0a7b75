package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming corpus curation — the online half of the batch dedup/quality
  * operators in [[graft.operators.Dedup]] / [[graft.functions.TextAnalysis]]:
  * documents arrive as a stream and are deduplicated / scored incrementally.
  *
  * Scale design: exact dedup keys state by a 128-bit content hash and uses
  * `dropDuplicatesWithinWatermark`, so per-key state is dropped once the
  * event-time watermark passes it — state is bounded by (arrival rate x
  * watermark delay), never by corpus size. The quality filter is stateless.
  */
object StreamingDedup {

  /** Exact streaming dedup on content: keeps the first arrival of each
    * distinct text, with state bounded by the watermark delay (duplicates
    * arriving later than `watermark` after the original may pass — the
    * standard bounded-state tradeoff). `tsCol` must be an event-time
    * timestamp column. */
  def dedupExact(docs: DataFrame, textCol: String, tsCol: String,
      watermark: String = "10 minutes"): DataFrame = {
    require(docs.isStreaming, "docs must be a streaming DataFrame")
    docs
      .withColumn("content_hash", md5(col(textCol).cast("binary")))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")
  }

  /** A doc's band row heading into the ownership state machine. */
  final case class BandRow(bandKey: Long, docId: Long, ts: java.sql.Timestamp,
      text: String)
  /** Band row annotated with whether its doc owns the band bucket. */
  final case class OwnedRow(docId: Long, ts: java.sql.Timestamp, text: String,
      owned: Boolean)

  /** Streaming NEAR-dup suppression: a document is dropped when any of its
    * MinHash LSH band buckets is already OWNED by an earlier document
    * inside the watermark — the online analogue of
    * [[graft.operators.Dedup.minhashDedup]]'s candidate blocking.
    *
    * Scale/correctness design: one state entry per band bucket (the owner
    * doc id), expired by event-time timeout — never pairwise state. The
    * per-bucket owner is assigned deterministically to the earliest
    * (ts, docId) arrival, so a cluster of mutual near-dups keeps exactly
    * its first representative (a naive per-row dropDuplicates on band keys
    * could split bucket wins across the cluster and drop ALL copies). Band
    * matching is the LSH candidate test, so false-positive drops happen at
    * the usual LSH rate for (numHashes, bands); exact verification would
    * need a batch pass — streams cannot re-read earlier documents.
    *
    * Emits surviving docs (docId, text) after their window closes.
    */
  def dedupNearOwnership(docs: DataFrame, textCol: String, tsCol: String,
      idCol: String, watermark: String = "10 minutes", shingleN: Int = 3,
      numHashes: Int = 64, bands: Int = 16,
      stateTtlMs: Long = 10 * 60 * 1000L)
      : Dataset[OwnedRow] = {
    require(docs.isStreaming, "docs must be a streaming DataFrame")
    require(numHashes % bands == 0, "bands must divide numHashes")
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val rowsPerBand = numHashes / bands
    val bandKeys = udf((text: String) => {
      val sig = graft.operators.Dedup.minhashSignature(
        graft.functions.TextAnalysis.shingleSet(text, shingleN), numHashes)
      (0 until bands).map { b =>
        var h = b.toLong
        var r = 0
        while (r < rowsPerBand) {
          h = graft.functions.TextAnalysis.mix64(h ^ sig(b * rowsPerBand + r))
          r += 1
        }
        h
      }.toArray
    })

    def assignOwner(bandKey: Long, rows: Iterator[BandRow],
        state: GroupState[Long]): Iterator[OwnedRow] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      val rs = rows.toVector.sortBy(r => (r.ts.getTime, r.docId))
      if (rs.isEmpty) return Iterator.empty
      val owner = state.getOption.getOrElse(rs.head.docId)
      if (!state.exists) state.update(owner)
      // expire the bucket once the watermark passes arrival + TTL (the
      // timeout must stay ahead of the current watermark or Spark rejects it)
      state.setTimeoutTimestamp(math.max(state.getCurrentWatermarkMs() + 1,
        rs.map(_.ts.getTime).max + stateTtlMs))
      rs.iterator.map(r => OwnedRow(r.docId, r.ts, r.text, r.docId == owner))
    }

    docs
      .withColumn("band_key", explode(bandKeys(col(textCol))))
      .select(col("band_key").as("bandKey"), col(idCol).as("docId"),
        col(tsCol).as("ts"), col(textCol).as("text"))
      .withWatermark("ts", watermark)
      .as[BandRow]
      .groupByKey(_.bandKey)
      .flatMapGroupsWithState[Long, OwnedRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(assignOwner)
  }

  /** Run [[dedupNearOwnership]] and deliver each micro-batch's SURVIVING
    * docs (docId, ts, text) to `sink`. The all-bands-owned fold runs
    * batch-locally inside foreachBatch — correct because a doc's band rows
    * are produced by an in-batch explode and therefore always co-batch;
    * chaining a second stateful aggregation instead would trip Spark's
    * global-watermark correctness check (flatMapGroupsWithState output is
    * treated as potentially late for downstream stateful operators). */
  def dedupNear(docs: DataFrame, textCol: String, tsCol: String, idCol: String,
      watermark: String = "10 minutes", shingleN: Int = 3,
      numHashes: Int = 64, bands: Int = 16,
      stateTtlMs: Long = 10 * 60 * 1000L)
      (sink: DataFrame => Unit): org.apache.spark.sql.streaming.DataStreamWriter[OwnedRow] = {
    val owned = dedupNearOwnership(docs, textCol, tsCol, idCol, watermark,
      shingleN, numHashes, bands, stateTtlMs)
    owned.writeStream.foreachBatch { (batch: Dataset[OwnedRow], _: Long) =>
      val survivors = batch.toDF()
        .groupBy(col("docId"), col("ts"), col("text"))
        .agg(min(when(col("owned"), 1).otherwise(0)).as("allOwned"))
        .filter(col("allOwned") === 1)
        .select(col("docId").as(idCol), col("ts").as(tsCol),
          col("text").as(textCol))
      sink(survivors)
    }
  }

  /** Stateless streaming quality gate: attach the batch quality columns and
    * keep docs inside the given bounds (same kernel as the batch path, so
    * online and offline filtering agree). */
  def qualityFilter(docs: DataFrame, textCol: String,
      minTokens: Long = 5, maxTokens: Long = 100000,
      minAlphaRatio: Double = 0.5): DataFrame = {
    val scored = graft.functions.TextAnalysis.withQuality(docs, textCol)
    scored.filter(col("n_tokens").between(minTokens, maxTokens) &&
      col("alpha_ratio") >= minAlphaRatio)
  }

  /** Windowed per-source arrival statistics (docs + chars per source per
    * tumbling window) — the monitoring signal for a streaming ingest:
    * watermarked, so late data beyond the delay is dropped and state stays
    * bounded. */
  def sourceWindowStats(docs: DataFrame, sourceCol: String, textCol: String,
      tsCol: String, windowLen: String = "1 minute",
      watermark: String = "2 minutes"): DataFrame = {
    require(docs.isStreaming, "docs must be a streaming DataFrame")
    docs
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col(textCol))).as("n_chars"))
      .select(col("window.start").as("window_start"), col("source"),
        col("n_docs"), col("n_chars"))
  }
}
