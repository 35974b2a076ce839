package graft.sources

import graft.operators.CoreOps
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Snapshot readers for the reference's HTTP sources (zero-egress build:
  * the JSON payloads are read from disk, but the schema/navigation
  * matches the live API shape the reference parses imperatively at
  * `stock_data_fetcher.py:106-118`).
  */
object Snapshots {

  /** NASDAQ screener response shape: `data.table.rows[].symbol` (S1). */
  val screenerSchema: StructType = StructType(Seq(
    StructField("data", StructType(Seq(
      StructField("table", StructType(Seq(
        StructField("rows", ArrayType(StructType(Seq(
          StructField("symbol", StringType),
          StructField("name", StringType),
          StructField("marketCap", StringType)))))))))))))

  /** S1 + S2 + S5: JSON snapshot → ticker universe. Explicit schema (no
    * inference pass over the file), `explode` of the rows array, symbol
    * normalization ('/' → '-'), deterministic order + limit — the whole
    * imperative JSON walk as one declarative plan. Null symbols are
    * dropped (the reference's per-ticker loop skips them via its
    * catch-and-continue, `stock_data_fetcher.py:122-128`); duplicate
    * symbols are kept, matching the reference, and collapse later at the
    * store's last-wins upsert. */
  def tickerUniverse(spark: SparkSession, path: String, limit: Int): DataFrame =
    spark.read.schema(screenerSchema).json(path)
      .select(explode(col("data.table.rows")).as("r"))
      .filter(col("r.symbol").isNotNull)
      .select(translate(col("r.symbol"), "/", "-").as("ticker"),
        col("r.name").as("name"))
      .orderBy(col("ticker"))
      .limit(limit)
}

/** Last-write-wins keyed parquet store: the engine-level replacement for
  * the reference's `INSERT OR REPLACE` SQLite tables (S6/S7,
  * `database_manager.py:34-44`). Plain parquet (no Delta jars in this
  * build): upsert = read-if-exists ∪ incoming → keyed last-wins dedup →
  * atomic swap via a staging directory. With Delta available, `upsert`
  * becomes a `MERGE` on the same keys — the call-site contract is
  * unchanged.
  *
  * Scale notes: `partitionBy` columns put each partition in its own
  * directory, so date-ranged reads prune at the file listing level
  * (verified in SourcesSpec via the plan's PartitionFilters); the
  * last-wins dedup is one hash shuffle on the PK.
  */
object KeyedParquetStore {

  def read(spark: SparkSession, path: String): Option[DataFrame] =
    if (new java.io.File(path).exists()) Some(spark.read.parquet(path)) else None

  /** Merge `incoming` into the store at `path`, newest `version` wins per
    * `keys` row. Writes through a staging dir then swaps, so a failed job
    * never leaves a half-written store. */
  def upsert(spark: SparkSession, path: String, incoming: DataFrame,
             keys: Seq[String], version: Seq[Column],
             partitionCols: Seq[String] = Nil): Unit = {
    val merged = read(spark, path) match {
      case Some(existing) => CoreOps.upsertLastWins(existing, incoming, keys, version)
      case None => CoreOps.latestPerGroup(incoming, keys.map(col), version.map(_.desc))
    }
    val staging = path + ".staging"
    val writer = merged.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(staging)
    val target = new java.io.File(path)
    if (target.exists()) {
      val old = new java.io.File(path + ".old")
      deleteRec(old)
      target.renameTo(old)
      new java.io.File(staging).renameTo(target)
      deleteRec(old)
    } else {
      new java.io.File(staging).renameTo(target)
    }
  }

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRec)
    if (f.exists()) { f.delete(); () }
  }
}
