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

  /** A doc's band row heading into the ownership state machine; `text` is
    * carried on ONE designated row per doc (null elsewhere), so payloads do
    * not amplify by the band count through the stateful shuffle. */
  final case class BandRow(bandKey: Long, docId: Long, ts: java.sql.Timestamp,
      text: String)
  /** Band row annotated with the bucket's owning doc. */
  final case class OwnedRow(docId: Long, ts: java.sql.Timestamp, bandKey: Long,
      ownerDocId: Long, text: String)

  /** Streaming NEAR-dup suppression, phase 1: per band bucket, record the
    * owning document (earliest (ts, docId) arrival, event-time expired) —
    * the online analogue of [[graft.operators.Dedup.minhashDedup]]'s
    * candidate blocking, using the SAME [[graft.operators.Dedup.bandKeys]]
    * candidate test as the batch path.
    *
    * Scale/correctness design: one state entry per band bucket (the owner
    * doc id), never pairwise state. Docs with no shingles get a synthetic
    * self-owned bucket (mirroring the batch rule that empty docs are never
    * candidates), and null text/ts rows are dropped rather than crashing
    * the query. Band matching is the LSH candidate test, so false-positive
    * drops happen at the usual LSH rate for (numHashes, bands); exact
    * verification would need a batch pass — streams cannot re-read earlier
    * documents.
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
      rs.iterator.map(r => OwnedRow(r.docId, r.ts, r.bandKey, owner, r.text))
    }

    docs
      .filter(col(textCol).isNotNull && col(tsCol).isNotNull)
      .select(col(idCol).as("docId"), col(tsCol).as("ts"),
        col(textCol).as("text"))
      .as[(Long, java.sql.Timestamp, String)]
      .flatMap { case (docId, ts, text) =>
        val sig = graft.operators.Dedup.minhashSignature(
          graft.functions.TextAnalysis.shingleSet(text, shingleN), numHashes)
        val keys = graft.operators.Dedup.bandKeys(sig, bands)
        if (keys.isEmpty)
          // no shingles: a synthetic per-doc bucket the doc trivially owns
          // (batch parity: empty docs never become near-dup candidates)
          Iterator.single(BandRow(
            graft.functions.TextAnalysis.mix64(docId ^ 0x5ee7a11dL), docId,
            ts, text))
        else
          keys.iterator.zipWithIndex.map { case (k, i) =>
            BandRow(k, docId, ts, if (i == 0) text else null)
          }
      }
      .withWatermark("ts", watermark)
      .groupByKey(_.bandKey)
      .flatMapGroupsWithState[Long, OwnedRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(assignOwner)
  }

  /** Run [[dedupNearOwnership]] and deliver each micro-batch's SURVIVING
    * docs (docId, ts, text) to `sink`.
    *
    * Survival is a greedy fold in arrival order over the batch's band rows
    * (sound batch-locally because a doc's band rows come from an in-batch
    * flatMap and always co-batch; a chained stateful aggregation would trip
    * Spark's global-watermark correctness check): buckets owned by earlier
    * BATCHES are claimed unconditionally; within the batch, only docs that
    * actually SURVIVE claim their buckets, so an LSH false positive killing
    * one cluster member cannot cascade through the dead doc to kill the
    * whole cluster. Cross-batch, a bucket whose recorded owner was itself
    * dropped still suppresses later arrivals until the TTL expires — the
    * documented residual false-positive window.
    *
    * The greedy fold runs on the driver over one micro-batch's band tuples
    * (bounded by arrival rate x trigger interval, never corpus size). */
  def dedupNear(docs: DataFrame, textCol: String, tsCol: String, idCol: String,
      watermark: String = "10 minutes", shingleN: Int = 3,
      numHashes: Int = 64, bands: Int = 16,
      stateTtlMs: Long = 10 * 60 * 1000L)
      (sink: DataFrame => Unit): org.apache.spark.sql.streaming.DataStreamWriter[OwnedRow] = {
    val owned = dedupNearOwnership(docs, textCol, tsCol, idCol, watermark,
      shingleN, numHashes, bands, stateTtlMs)
    owned.writeStream.foreachBatch { (batch: Dataset[OwnedRow], _: Long) =>
      val spark = batch.sparkSession
      import spark.implicits._
      val rows = batch.collect()
      val inBatch = rows.map(_.docId).toSet
      val claimed = collection.mutable.Set.empty[Long]
      // prior-batch claims: buckets whose recorded owner is not in this batch
      for (r <- rows if !inBatch.contains(r.ownerDocId)) claimed += r.bandKey
      val survivors = collection.mutable.ArrayBuffer.empty[(Long, java.sql.Timestamp, String)]
      val byDoc = rows.groupBy(_.docId).toSeq
        .sortBy { case (id, rs) => (rs.head.ts.getTime, id) }
      for ((id, rs) <- byDoc) {
        if (rs.forall(r => !claimed.contains(r.bandKey))) {
          survivors += ((id, rs.head.ts, rs.iterator.map(_.text).find(_ != null).orNull))
          rs.foreach(r => claimed += r.bandKey)
        }
      }
      sink(survivors.toSeq.toDF("docId", "ts", "text")
        .select(col("docId").as(idCol), col("ts").as(tsCol),
          col("text").as(textCol)))
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
