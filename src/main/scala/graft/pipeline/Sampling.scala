package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / dataset-split operators for training-data
  * pipelines. Everything keys on the md5-derived 60-bit content hash of
  * the row's ID (+ a salt), never on `rand()`:
  *
  *  - task retries and speculative re-execution see the same sample
  *    (`rand()` is the SPARK-23207-class hazard: a retried partition
  *    re-rolls and rows appear/vanish);
  *  - the split is reproducible across runs, engines (DuckDB rebuilds
  *    the identical hash — these are oracle-checked), partitionings and
  *    cluster sizes;
  *  - changing `salt` re-deals the assignment without touching data.
  *
  * Shuffle profile: none. Both operators are narrow codegen'd
  * projections/filters over the scan — at 100 TB the split of a corpus
  * is a metadata-cheap pass, not a job. */
object Sampling {

  private val Buckets = 10000

  /** The row's deterministic bucket in [0, 10000): hash(id || '_' || salt). */
  def bucket(id: Column, salt: String): Column =
    pmod(TextAnalysis.md5Hash60(concat_ws("", id.cast("string"), lit("_" + salt))),
      lit(Buckets.toLong))

  /** Assign each row a named split by cumulative weight over its bucket —
    * the train/val/test deal. Weights must sum to 1 (±1e-9); boundaries
    * quantize to 1/10000, so a 0.8/0.1/0.1 deal is exact. Splits are
    * disjoint and exhaustive by construction. */
  def assignSplit(df: DataFrame, idCol: String,
                  weights: Seq[(String, Double)],
                  salt: String = "split"): DataFrame = {
    require(weights.nonEmpty && math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1, got $weights")
    val b = bucket(col(idCol), salt)
    val bounds = weights.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(w => math.round(w * Buckets))
    val labeled = weights.map(_._1).zip(bounds).dropRight(1)
      .foldRight(lit(weights.last._1)) { case ((name, hi), rest) =>
        when(b < hi, lit(name)).otherwise(rest)
      }
    df.withColumn("bucket", b).withColumn("split", labeled)
  }

  /** Deterministic `fraction` sample: keep rows whose bucket falls below
    * `fraction * 10000` (quantized). Nested samples compose: a 1% sample
    * is a subset of the 10% sample at the same salt — the property that
    * lets a pipeline debug on the small slice of exactly the big run. */
  def deterministicSample(df: DataFrame, idCol: String, fraction: Double,
                          salt: String = "sample"): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction out of range: $fraction")
    df.filter(bucket(col(idCol), salt) < math.round(fraction * Buckets))
  }
}
