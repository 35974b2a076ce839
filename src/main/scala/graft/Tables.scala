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
  // Weak-keyed on the session OBJECT for identity semantics: no
  // cross-session hash collisions handing out DataFrames bound to a
  // stopped session. NOTE the weak key does NOT make entries collectable:
  // each cached DataFrame strongly references its SparkSession, and
  // WeakHashMap's documented value→key caveat means a value that reaches
  // its own key pins the entry forever. The map is bounded by the number
  // of sessions a process ever builds (a handful in tests, one in
  // production), so the retention is small and stable; `invalidate`
  // exists for teardown code that wants the entry gone deterministically.
  private val relations = new java.util.WeakHashMap[
    SparkSession, scala.collection.concurrent.TrieMap[(String, String), DataFrame]]()

  /** Drop a session's memoized relations (e.g. from test teardown). */
  def invalidate(spark: SparkSession): Unit =
    relations.synchronized { relations.remove(spark); () }

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
