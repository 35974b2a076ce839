package graft.pipeline

import graft.sources.KeyedParquetStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, StringType, StructField, StructType}

/** Incremental IVF index maintenance — the live-corpus counterpart of the
  * one-shot build (q61's layout: a KB-sized `(cell, centroid)` store +
  * a cell-partitioned assigned-corpus store). New embedding batches are
  * assigned to the FROZEN stored centroids (the standard ANN insertion
  * path — Faiss's `add` after `train`: cells drift only on an explicit
  * re-train, searches meanwhile stay consistent with the index that
  * assigned every stored vector) and appended under `(cell, batch)`
  * partitions, so:
  *
  *  - per-batch ingest work is batch-sized — one narrow argmax pass over
  *    the batch plus partition-scoped upserts (the accumulated corpus is
  *    never read);
  *  - search still prunes to the probed cells at the file-listing level
  *    (`cell=` stays a partition column; the `batch=` sub-directories
  *    under it are just layout);
  *  - a replayed batch id re-merges its own partitions idempotently
  *    (last-wins keys) — at-least-once delivery, effectively-once index.
  *
  * Results are IDENTICAL to assigning the whole corpus at once against
  * the same centroids (assignment is per-row and the centroids are
  * frozen — spec-asserted, similarities included).
  */
object IncrementalIvf {

  /** Fixed store schemas (known-schema reads skip mergeSchema's footer
    * pass; pre-evolution files null-fill). */
  val centroidsSchema: StructType = StructType(Seq(
    StructField("cell", LongType),
    StructField("centroid", ArrayType(DoubleType))))
  val assignedSchema: StructType = StructType(Seq(
    StructField("neighbor_id", LongType),
    StructField("cv", ArrayType(DoubleType)),
    StructField("cell", LongType),
    StructField("batch", StringType)))

  /** One-time: train centroids on a seed corpus and persist them. */
  def buildCentroids(spark: SparkSession, corpus: DataFrame,
                     centroidsPath: String, numCells: Int = 8,
                     trainIters: Int = 2): Unit =
    KeyedParquetStore.upsert(spark, centroidsPath,
      Similarity.buildIvfIndex(corpus, numCells, trainIters),
      keys = Seq("cell"), version = Seq(lit(1L)), incomingUnique = true)

  /** Assign `batch` (columns `vec_id`, `embedding`) to the stored
    * centroids and append it under `(cell, batch=<batchId>)` partitions
    * of the assigned-corpus store. */
  def ingestBatch(spark: SparkSession, batch: DataFrame, batchId: String,
                  centroidsPath: String, assignedPath: String): Unit = {
    val index = KeyedParquetStore.read(spark, centroidsPath,
        schema = Some(centroidsSchema))
      .getOrElse(sys.error(s"no IVF centroid store at $centroidsPath — " +
        "run buildCentroids first (insertion needs a trained index)"))
    val assigned = Similarity.assignIvfCells(batch, index)
      .withColumn("batch", lit(batchId))
    // Static hint: one tuple per (cell, batch) — the cell ids are the
    // KB-sized centroid store's keys, already on the driver; no
    // distinct() discovery job over the batch.
    val cells = index.select(col("cell")).collect().map(_.getLong(0)).sorted
    KeyedParquetStore.upsert(spark, assignedPath, assigned,
      keys = Seq("neighbor_id"), version = Seq(lit(1L)),
      partitionCols = Seq("cell", "batch"),
      partitionValues = cells.toSeq.map(c => Seq(c, batchId)),
      incomingUnique = true)
  }

  /** RE-TRAIN the index from the stored vectors and re-assign the whole
    * corpus — the periodic answer to distribution drift under frozen-
    * centroid insertion (the Faiss re-train contract; see README's
    * re-train-cadence knob). The assigned store carries the vectors, so
    * no original corpus access is needed: read it back, train fresh
    * centroids, re-assign every vector, and REPLACE both stores (the
    * assignment legitimately shrinks/reshapes partitions — not a merge).
    * Deterministic: training is hash-bucket-seeded and decimal-exact,
    * so re-running on the same store reproduces the same index.
    *
    * NOT crash-atomic ACROSS the two stores (each replace is
    * individually atomic): a crash between them leaves new centroids
    * with the old assignment. Searches against that pairing mis-prune —
    * re-run `retrain` to converge; a deployment that needs stronger
    * guarantees versions the store pair under one manifest. Run from
    * the stream owner's thread, never concurrently with ingest (the
    * writer locks serialize the conflict to a fail-fast either way). */
  def retrain(spark: SparkSession, centroidsPath: String,
              assignedPath: String, numCells: Int = 8,
              trainIters: Int = 2, batchLabel: String = "retrain"): Unit = {
    val assigned = KeyedParquetStore.read(spark, assignedPath,
        schema = Some(assignedSchema))
      .getOrElse(sys.error(s"no assigned-corpus store at $assignedPath"))
    val corpus = assigned
      .select(col("neighbor_id").as("vec_id"), col("cv").as("embedding"))
    // KB-sized; pinned so the centroid relation is not re-derived from
    // the store mid-replace
    val index = Similarity.buildIvfIndex(corpus, numCells, trainIters)
      .localCheckpoint()
    val reassigned = Similarity.assignIvfCells(corpus, index)
      .withColumn("batch", lit(batchLabel))
    // assignment first (reads the old store into staging, then swaps),
    // centroids second; both orders are observably inconsistent if a
    // crash lands between them — see the scaladoc contract
    KeyedParquetStore.replace(spark, assignedPath, reassigned,
      partitionCols = Seq("cell", "batch"))
    KeyedParquetStore.replace(spark, centroidsPath, index)
  }

  /** Search the incrementally-built index: the stored centroids pick the
    * probed cells, the assigned store prunes to them, and the shared
    * scoring path ranks — identical to q61's search over a one-shot
    * build of the same corpus. */
  def searchStored(spark: SparkSession, centroidsPath: String,
                   assignedPath: String, probes: DataFrame, k: Int,
                   nProbe: Int = 2): DataFrame = {
    val index = KeyedParquetStore.read(spark, centroidsPath,
        schema = Some(centroidsSchema))
      .getOrElse(sys.error(s"no IVF centroid store at $centroidsPath"))
    val assigned = KeyedParquetStore.read(spark, assignedPath,
        schema = Some(assignedSchema))
      .getOrElse(sys.error(s"no assigned-corpus store at $assignedPath"))
    Similarity.searchIvfAssigned(assigned, index, probes, k, nProbe)
  }
}
