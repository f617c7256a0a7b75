package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import graft.index.{ClassifiedRead, KeyedIndex}
import graft.sources.InputFragment

/** Structured Streaming classification — an extension beyond the reference
  * (which is batch-only; SURVEY §2.11). Reads arrive whole (one fragment per
  * row), so span extraction and per-read regrouping never cross micro-batch
  * boundaries: classification runs inside foreachBatch against the static
  * bucketed index (a stream-static join pattern), while running per-taxon
  * abundance uses a native streaming aggregation in update mode.
  *
  * Width-independent: all entry points take a [[KeyedIndex]], so narrow
  * (m <= 32) and wide (m in [33, 64]) indexes stream identically.
  *
  * At scale this is the online-classification topology: executors hold the
  * broadcast taxonomy; each micro-batch shuffles only its own spans.
  */
object StreamingClassifier {

  /** Per-micro-batch classification: invoke `sink` with (batchId, classified
    * reads for that batch). The index side is a static DataFrame — Spark
    * plans a fresh stream-static join per batch, so the bucketed index scan
    * stays shuffle-free. */
  def classifyStream(index: KeyedIndex, reads: Dataset[InputFragment],
      records: DataFrame, confidence: Double = 0.0, minHitGroups: Int = 2)(
      sink: (Long, Dataset[ClassifiedRead]) => Unit): DataStreamWriter[InputFragment] = {
    require(reads.isStreaming, "reads must be a streaming Dataset")
    reads.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[InputFragment], batchId: Long) =>
        sink(batchId, index.classifyDF(index.spansDF(batch), records,
          confidence, minHitGroups))
      }
  }

  /** [[classifyStream]] through the zero-shuffle in-memory path: the index
    * table is collected and broadcast ONCE before the stream starts
    * ([[KeyedIndex.inMemoryClassifier]]), and each micro-batch is then one
    * mapPartitions — no stream-static join, no per-batch shuffle, and no
    * re-planning of the index scan per trigger. The right topology whenever
    * the index fits executor memory (the common online-classification
    * deployment: one resident index, an unbounded read stream). */
  def classifyStreamInMemory(index: KeyedIndex, reads: Dataset[InputFragment],
      records: DataFrame, confidence: Double = 0.0, minHitGroups: Int = 2)(
      sink: (Long, Dataset[ClassifiedRead]) => Unit): DataStreamWriter[InputFragment] =
    classifyStreamInMemory(index.inMemoryClassifier(records), reads,
      confidence, minHitGroups)(sink)

  /** [[classifyStreamInMemory]] over a PREBUILT classifier: the caller owns
    * the broadcast table's lifetime (build once, `close()` after the stream
    * stops) — the shape a long-lived serving deployment needs, and the one
    * that avoids collecting + broadcasting the key-taxon table twice when
    * the caller already holds a classifier. */
  def classifyStreamInMemory(mem: graft.index.InMemoryClassifier,
      reads: Dataset[InputFragment], confidence: Double, minHitGroups: Int)(
      sink: (Long, Dataset[ClassifiedRead]) => Unit): DataStreamWriter[InputFragment] = {
    require(reads.isStreaming, "reads must be a streaming Dataset")
    reads.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[InputFragment], batchId: Long) =>
        sink(batchId, mem.classify(batch, confidence, minHitGroups))
      }
  }

  /** Running per-taxon read counts as a native streaming aggregation:
    * spans -> stream-static join -> per-read resolution inside the batch is
    * replaced by a coarser span-level abundance signal (taxon k-mer mass),
    * which IS expressible as an incremental aggregation in update mode. */
  def taxonKmerMassStream(index: KeyedIndex, reads: Dataset[InputFragment],
      records: DataFrame): DataFrame = {
    require(reads.isStreaming, "reads must be a streaming Dataset")
    val spark = reads.sparkSession
    import spark.implicits._
    index.spansDF(reads)
      .join(records, index.keyCols)
      .groupBy($"taxon")
      .agg(sum($"kmers").as("kmer_mass"), count(lit(1)).as("n_spans"))
  }

  /** Windowed event-time abundance: reads tagged with an event timestamp,
    * watermarked tumbling windows of per-taxon span counts (late data beyond
    * the watermark is dropped — bounded state at scale). */
  def windowedAbundance(index: KeyedIndex,
      timedReads: Dataset[(java.sql.Timestamp, InputFragment)],
      records: DataFrame, windowLen: String = "1 minute",
      watermark: String = "2 minutes"): DataFrame = {
    require(timedReads.isStreaming, "reads must be a streaming Dataset")
    val spark = timedReads.sparkSession
    import spark.implicits._
    index.timedSpanMass(timedReads)
      .withWatermark("ts", watermark)
      .join(records, index.keyCols)
      .groupBy(window($"ts", windowLen), $"taxon")
      .agg(sum($"kmers").as("kmer_mass"))
      .select($"window.start".as("window_start"), $"taxon", $"kmer_mass")
  }
}
