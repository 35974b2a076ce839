package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`). Two paths:
  *
  *  - brute force: probe × corpus expansion with a codegen'd arithmetic
  *    dot product — exact, O(|probes|·|corpus|); correct baseline and the
  *    oracle for the approximate path. The corpus side stays partitioned;
  *    probes are broadcast, so no corpus shuffle at all.
  *  - LSH (random hyperplane / signed projection): k sign bits per vector
  *    from deterministic pseudo-random hyperplanes → bucket join on the
  *    signature prefix. At 100 TB the bucket join touches only colliding
  *    buckets; recall tunes with bits/tables. An IVF variant would swap
  *    the signature for a k-means cell id.
  *
  * All float math is widened to double in index order so results are
  * bit-reproducible against DuckDB's list functions.
  */
object Similarity {

  /** Σ a_i·b_i over two array<double> columns, folded left-to-right in
    * index order (deterministic). Backed by the codegen'd
    * [[graft.functions.DotProduct]] Catalyst expression — a compiled
    * inner loop rather than interpreted `zip_with`/`aggregate` lambdas. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dot_product(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Exact top-k cosine neighbors for each probe row. `corpus` and
    * `probes` both need (`vec_id`, `embedding`); probes should be small —
    * they are broadcast against the partitioned corpus. Ties broken by
    * neighbor id on the ROUNDED similarity so ranking is reproducible. */
  def bruteForceTopK(corpus: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    val p = probes.select(col("vec_id").as("probe_id"), asDouble(col("embedding")).as("pv"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), asDouble(col("embedding")).as("cv"))
    val scored = c.join(broadcast(p), col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"),
        round(cosine(col("pv"), col("cv")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Deterministic pseudo-random hyperplane component for (seed, dim):
    * md5-derived uniform in [-0.5, 0.5). Reproducible in any engine with
    * md5 — the LSH analogue of `TextAnalysis.md5Hash60`. */
  private def planeComponent(seed: Column, dimIdx: Column): Column =
    (TextAnalysis.md5Hash60(concat(seed, lit("_"), dimIdx)) % 1000000L) / 1000000.0 - 0.5

  /** Random-hyperplane signature: `bits` sign bits packed into a long. */
  def rhpSignature(vec: Column, bits: Int): Column = {
    val terms = (0 until bits).map { b =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x * planeComponent(lit(b), i)),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, lit(1L << b)).otherwise(0L)
    }
    terms.reduce(_ + _)
  }

  /** LSH-bucketed ANN: probes and corpus rows that share a signature are
    * scored exactly; others are never compared. Returns the same schema as
    * `bruteForceTopK` (some probes may surface < k or zero neighbors —
    * that is the recall trade-off, measured against the brute-force path
    * in tests). */
  def lshTopK(corpus: DataFrame, probes: DataFrame, k: Int, bits: Int = 8): DataFrame = {
    val p = probes.select(col("vec_id").as("probe_id"), asDouble(col("embedding")).as("pv"))
      .withColumn("sig", rhpSignature(col("pv"), bits))
    val c = corpus.select(col("vec_id").as("neighbor_id"), asDouble(col("embedding")).as("cv"))
      .withColumn("sig", rhpSignature(col("cv"), bits))
    val scored = c.join(broadcast(p), Seq("sig"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"),
        round(cosine(col("pv"), col("cv")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** IVF-style ANN: partition the corpus into `numCells` Voronoi cells
    * around deterministic "centroids" (the first `numCells` corpus
    * vectors — a real deployment k-means-trains these; assignment and
    * search mechanics are identical), then scan only each probe's
    * `nProbe` closest cells. The corpus cell assignment is the one-time
    * index build (one centroid broadcast join); each query then touches
    * `nProbe/numCells` of the data instead of all of it. Recall vs the
    * brute-force baseline is the tuning knob, measured in SimilaritySpec. */
  def ivfTopK(corpus: DataFrame, probes: DataFrame, k: Int,
              numCells: Int = 8, nProbe: Int = 2): DataFrame = {
    val c = corpus.select(col("vec_id").as("neighbor_id"), asDouble(col("embedding")).as("cv"))
    val cents = corpus.filter(col("vec_id") < numCells)
      .select(col("vec_id").as("cell"), asDouble(col("embedding")).as("centroid"))
    val wAssign = Window.partitionBy(col("neighbor_id"))
      .orderBy(col("cent_sim").desc, col("cell"))
    val assigned = c.join(broadcast(cents), lit(true))
      .withColumn("cent_sim", round(cosine(col("cv"), col("centroid")), 6))
      .withColumn("r", row_number().over(wAssign)).filter(col("r") === 1)
      .select(col("neighbor_id"), col("cv"), col("cell"))
    val p = probes.select(col("vec_id").as("probe_id"), asDouble(col("embedding")).as("pv"))
    val wProbe = Window.partitionBy(col("probe_id"))
      .orderBy(col("cent_sim").desc, col("cell"))
    val probeCells = p.join(broadcast(cents), lit(true))
      .withColumn("cent_sim", round(cosine(col("pv"), col("centroid")), 6))
      .withColumn("r", row_number().over(wProbe)).filter(col("r") <= nProbe)
      .select(col("probe_id"), col("pv"), col("cell"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    assigned.join(broadcast(probeCells), Seq("cell"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"),
        round(cosine(col("pv"), col("cv")), 6).as("cos_sim"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Embedding near-dup pairs: cosine ≥ threshold among all pairs
    * (doc_a < doc_b). Quadratic baseline; the LSH signature equi-join is
    * the scale path. */
  def cosinePairs(vectors: DataFrame, threshold: Double): DataFrame = {
    val a = vectors.select(col("vec_id").as("id_a"), asDouble(col("embedding")).as("va"))
    val b = vectors.select(col("vec_id").as("id_b"), asDouble(col("embedding")).as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), round(cosine(col("va"), col("vb")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }
}
