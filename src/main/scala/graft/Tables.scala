package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the harness-generated testdata tables (TESTDATA.md).
  * One parquet file per table under `sfDir`. Kept as plain lazy scans so
  * Catalyst can push filters/projections into the parquet source — callers
  * must NOT cache DATA here; each query declares its own plan.
  *
  * The RELATION (schema + file index) is memoized per (session, dir,
  * table): `spark.read.parquet` performs a driver-side listing + footer
  * read per call, which across a 40-query bench re-lists the same
  * immutable snapshot dozens of times. Valid precisely because the
  * testdata is an immutable snapshot — mutable stores
  * (KeyedParquetStore) never read through this object. */
object Tables {
  // Weak-keyed on the session OBJECT: identity semantics while the session
  // lives (no cross-session hash collisions handing out DataFrames bound
  // to a stopped session), and the whole per-session cache is collectable
  // once the session is — test suites create many sessions.
  private val relations = new java.util.WeakHashMap[
    SparkSession, scala.collection.concurrent.TrieMap[(String, String), DataFrame]]()

  private def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val perSession = relations.synchronized {
      var m = relations.get(spark)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]
        relations.put(spark, m)
      }
      m
    }
    perSession.getOrElseUpdate((dir, name), spark.read.parquet(s"$dir/$name.parquet"))
  }

  def region(s: SparkSession, d: String): DataFrame = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  /** `events.parquet` stores TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects; read it as nanos-since-epoch longs and surface a
    * microsecond-truncated TimestampType `ts` (orderings keep `event_id`
    * tiebreaks, so sub-microsecond truncation never changes results).
    * Requires `spark.sql.legacy.parquet.nanosAsLong=true`, set ONCE at
    * session construction (Verify/Bench/SparkSpec) — a library reader
    * must not silently flip session flags. */
  def events(s: SparkSession, d: String): DataFrame = {
    require(s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "set spark.sql.legacy.parquet.nanosAsLong=true at session build to read events.parquet")
    t(s, d, "events").withColumn("ts",
      org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
