package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Intra-query materialization of a relation consumed more than once.
  *
  * `localCheckpoint` over `.cache()` is deliberate everywhere in this
  * repo (no CacheManager entry for identical re-plans to silently hit,
  * no leaked pin; blocks are GC'd with the returned plan) — but the two
  * defaults it inherits are wrong for our pinned relations:
  *
  *  - the default `MEMORY_AND_DISK` level stores DESERIALIZED rows:
  *    a pinned shingle relation of 16-byte (doc_id, h) facts carries
  *    ~an order of magnitude of JVM object overhead on-heap, which is
  *    where q37's multi-GB driver-bench heap lived (r8 sidecar:
  *    heap_mb ~1.9 GB isolated, 11–12 GB under full-registry GC
  *    pressure). `MEMORY_AND_DISK_SER` keeps one compact byte buffer
  *    per partition block instead.
  *  - `.cache()`d plans are exempt from AQE partition coalescing by
  *    default (`spark.sql.optimizer.canChangeCachedPlanOutputPartitioning`
  *    is false so the cached plan's output partitioning stays stable for
  *    reuse) — so every exchange under a cached pair-producer ran at
  *    full `spark.sql.shuffle.partitions` width no matter how small the
  *    data (q37's 133-task fan-out at sf0.1). A checkpoint has no such
  *    exemption: AQE sizes each exchange to the data, which is exactly
  *    the "scale knob, not hard-coded width" behavior we want — small
  *    inputs coalesce, a 100 TB run keeps its width.
  *
  * Trade-off unchanged from the per-site scaladocs: checkpoint blocks do
  * not recompute on executor loss — a multi-executor deployment that
  * needs that resilience swaps in `persist(MEMORY_AND_DISK_SER_2)` with
  * an explicit unpersist after the sink.
  */
object Pin {
  /** Eagerly materialize `df` scoped to this plan, serialized on heap
    * with disk spill. */
  def ser(df: DataFrame): DataFrame =
    df.localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
}
