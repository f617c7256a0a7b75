package graft.streaming

import org.apache.spark.sql.DataFrame
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
