package graft

import org.apache.spark.sql.SparkSession

/** Shared session-level performance settings applied by every graft main
  * (Bench / Verify / Main / tools), parameterized by env with local
  * defaults that keep the driver's bench comparable (optimization round
  * r21; see OPTIMIZATION_r21.md for the measurements).
  */
object SessionTuning {

  /** `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` — Spark's
    * default is 128: any ObjectHashAggregate task that sees more than 128
    * distinct keys abandons its hash map and re-processes the REMAINING
    * input through an UnsafeKVExternalSorter, paying a per-row sort +
    * buffer serialization. Graft's object aggregates are small-buffered —
    * collect_list of per-read span hits (≈6 struct rows per read, bounded
    * by read length), CollectAligned (2-GB-guarded), TopKAggregate
    * (k-capped heaps) — and their group-by cardinality per task is in the
    * 10^4..10^6 range on every real input, so the default threshold put
    * EVERY per-read regroup on the sort path (measured r21: the regroup
    * stages are the bench's dominant memory-traffic source and the path
    * most amplified by host memory-bus contention).
    *
    * Default 262144 (2^18): a map-side aggregation task keeps up to 256k
    * group buffers in its hash map before degrading to the memory-safe
    * sort path. Production justification at 100 TB: a 128 MB shuffle
    * partition of span rows holds ~2M rows ≈ 300k titles; 256k buffers of
    * a few hundred bytes ≈ low hundreds of MB per task — within a normal
    * 4-8 GB executor-core budget, while the sort fallback stays as the
    * guard for genuinely unbounded cardinality. Override with
    * SPARK_GRAFT_OBJ_AGG_FALLBACK. */
  val ObjAggFallbackDefault = "262144"

  def apply(builder: SparkSession.Builder): SparkSession.Builder =
    builder.config(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
      sys.env.getOrElse("SPARK_GRAFT_OBJ_AGG_FALLBACK", ObjAggFallbackDefault))
}
