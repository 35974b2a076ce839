package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable relational building blocks for the SURVEY.md §2 operator
  * inventory. Each is a thin, lazily-composed `DataFrame => DataFrame`
  * transform; no caching, no actions — callers own the plan.
  *
  * Scale notes (100 TB design point):
  *  - Per-group windows shuffle once on the partition keys; every helper
  *    takes explicit partition columns so the shuffle is on the caller's
  *    natural key (e.g. `date`), never a global single-partition window
  *    unless the group count is known-small.
  *  - `topKPerGroup` relies on Spark's rank-limit pushdown
  *    (`InferWindowGroupLimit`) so each partition keeps only K rows before
  *    the final filter — no full materialization of the sorted groups.
  */
object CoreOps {

  /** W2: per-group top-K by `order` (callers must make `order` a total
    * order — tiebreak on a unique key; the reference leans on Python's
    * stable sort at `equal_weight_index.py:43`, which a distributed engine
    * must replace with explicit determinism).
    * Adds column `rn` (1-based rank) and keeps rows with `rn <= k`.
    */
  def topKPerGroup(df: DataFrame, part: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(part: _*).orderBy(order: _*)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  /** W1: latest row per group — top-1 by `order` descending-most-recent.
    * `order` must again be total. */
  def latestPerGroup(df: DataFrame, part: Seq[Column], order: Seq[Column]): DataFrame =
    topKPerGroup(df, part, order, 1).drop("rn")

  /** S6/S7: last-write-wins upsert semantics of `INSERT OR REPLACE`
    * (`database_manager.py:39`): union old+new, keep the newest row per key
    * by `version` (descending total order). On a version TIE the incoming
    * row wins — `INSERT OR REPLACE` always replaces, so re-ingesting the
    * same version must surface the fresh row, deterministically.
    *
    * The union tolerates ADDITIVE schema evolution (`allowMissingColumns`):
    * an incoming batch with a new column back-fills null on surviving old
    * rows, and an old-writer batch missing a column surfaces null on its
    * replaced rows — exactly `INSERT OR REPLACE`'s whole-row-replace
    * semantics after an `ALTER TABLE ADD COLUMN`. */
  def upsertLastWins(existing: DataFrame, incoming: DataFrame,
                     keys: Seq[String], version: Seq[Column]): DataFrame = {
    // the merge machinery adds these two names; a caller relation that
    // already carries one would be silently overwritten and then dropped
    Seq("__incoming", "rn").foreach { reserved =>
      require(!existing.columns.contains(reserved) &&
        !incoming.columns.contains(reserved),
        s"upsertLastWins reserves column name '$reserved' for the merge " +
          "window; rename it in the input relation")
    }
    val unioned = existing.withColumn("__incoming", lit(0))
      .unionByName(incoming.withColumn("__incoming", lit(1)),
        allowMissingColumns = true)
    // trailing content-hash tiebreak: two incoming rows with the same key
    // AND version tie on (version, __incoming); without a total order
    // row_number picks a survivor per-execution and two runs of the same
    // upsert can persist different rows. Identical duplicates hash equal
    // and either survivor is the same row — still deterministic.
    val contentTiebreak = xxhash64(unioned.columns.toIndexedSeq.map(col): _*)
    latestPerGroup(unioned,
      keys.map(col), version.map(_.desc) :+ col("__incoming").desc
        :+ contentTiebreak.desc)
      .drop("__incoming")
  }

  /** W3: lag-1 percent return over `order` within `part` partitions
    * (`dashboard.py:196`). First row per partition is null. */
  def lagReturn(df: DataFrame, part: Seq[Column], order: Seq[Column],
                value: Column, as: String): DataFrame = {
    val w = if (part.isEmpty) Window.orderBy(order: _*)
            else Window.partitionBy(part: _*).orderBy(order: _*)
    val prev = lag(value, 1).over(w)
    df.withColumn(as, (value - prev) / prev * 100)
  }

  /** W4: percent return vs the first value of the ordered partition
    * (`dashboard.py:198-200`). */
  def returnFromFirst(df: DataFrame, part: Seq[Column], order: Seq[Column],
                      value: Column, as: String): DataFrame = {
    val w0 = if (part.isEmpty) Window.orderBy(order: _*)
             else Window.partitionBy(part: _*).orderBy(order: _*)
    val w = w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val init = first(value).over(w)
    df.withColumn(as, (value - init) / init * 100)
  }

  /** W8: ratio of `value` to the sum of `value` over `part` (whole-frame
    * window; the pie-share at `dashboard.py:122-127`). */
  def ratioToTotal(df: DataFrame, part: Seq[Column], value: Column, as: String): DataFrame = {
    val w = Window.partitionBy(part: _*)
    df.withColumn(as, value / sum(value).over(w))
  }

  /** A3: order-preserving array agg — collect `payload` ordered by `rank`
    * (strict total order). Built-ins only (`sort_array` of structs keeps
    * codegen); returns an `array` column named `as`. */
  def orderedCollect(rank: Column, payload: Column): Column =
    transform(array_sort(collect_list(struct(rank.as("r"), payload.as("p")))),
      x => x.getField("p"))

  /** W6/W7 helper: day-over-day ordered-set diff columns. Input must have
    * one row per `order` unit with an array column `arr`; adds `prev`,
    * `added`, `removed`. Uses a `filter`+`array_contains` lambda rather
    * than `array_except` because the latter deduplicates — the reference's
    * list-comprehension diff (`dashboard.py:180-181`) is order-preserving
    * AND keeps duplicate members, and so does this. */
  def lagArrayDiff(df: DataFrame, part: Seq[Column], order: Seq[Column],
                   arr: Column): DataFrame = {
    // part = Nil is an explicit opt-in to a single-partition global window
    // — valid only when the row count is known-small (one row per date in
    // the reference's index series); at scale callers partition per
    // instrument/shard so the sort never concentrates on one task.
    val w = if (part.isEmpty) Window.orderBy(order: _*)
            else Window.partitionBy(part: _*).orderBy(order: _*)
    df.withColumn("prev", lag(arr, 1).over(w))
      // coalesce closes array_contains' three-valued hole: ONE null
      // member in the other side makes contains return null for every
      // non-member, and `!null` silently drops genuinely added/removed
      // members from the diff. Under the coalesce a null member simply
      // never matches (it reads as added/removed while present) instead
      // of blanking the whole diff.
      // The prev-null FIRST row keeps its case explicit (the coalesce
      // would otherwise turn its added into the whole array): added = []
      // and removed = null there — the documented contract changeString
      // renders as '-'.
      .withColumn("added",
        when(col("prev").isNull, filter(arr, _ => lit(false)))
          .otherwise(filter(arr,
            x => !coalesce(array_contains(col("prev"), x), lit(false)))))
      .withColumn("removed",
        filter(col("prev"), x => !coalesce(array_contains(arr, x), lit(false))))
  }

  /** W6 at scale: like [[lagArrayDiff]] but for SET-valued arrays
    * (distinct members). `array_except` builds a hash set per row —
    * O(|a|+|b|) per pair instead of the lambda filter's O(|a|·|b|) — and
    * for distinct inputs the two coincide (`array_except`'s dedup is a
    * no-op on sets). Day-grain member sets grow with the entity count
    * (thousands wide at SF 100), where the quadratic variant dominates
    * the whole query; keep [[lagArrayDiff]] only where duplicates/order
    * must survive (W7). */
  def lagSetDiff(df: DataFrame, part: Seq[Column], order: Seq[Column],
                 arr: Column): DataFrame = {
    val w = if (part.isEmpty) Window.orderBy(order: _*)
            else Window.partitionBy(part: _*).orderBy(order: _*)
    df.withColumn("prev", lag(arr, 1).over(w))
      // coalesce keeps first-row semantics identical to lagArrayDiff's
      // lambda filter: added = [] (not null) when prev is null, removed
      // stays null — asserted equivalent in CoreOpsSpec
      .withColumn("added", array_except(arr, coalesce(col("prev"), arr)))
      .withColumn("removed", array_except(col("prev"), arr))
  }

  /** W7 formatting: `+(A, B) , -(C)` or `-` when unchanged / first row
    * (`dashboard.py:182-188`). */
  def changeString(added: Column, removed: Column): Column =
    when(added.isNull || removed.isNull, lit("-"))
      .when(size(added) === 0 && size(removed) === 0, lit("-"))
      .otherwise(concat(lit("+("), array_join(added, ", "), lit(") , -("),
        array_join(removed, ", "), lit(")")))

  /** J4: bounded backward as-of lookup — latest row per `part` with
    * `ts <= probe` and `ts > probe - maxBack` (the 5-day holiday fallback
    * at `dashboard.py:328-343`). `order` must be a total order aligned
    * with recency. Pushed down as a plain range filter + top-1 window so
    * parquet min/max pruning applies before any shuffle.
    */
  def asOfBackward(df: DataFrame, part: Seq[Column], ts: Column,
                   probe: Column, maxBack: Column, order: Seq[Column]): DataFrame =
    latestPerGroup(df.filter(ts <= probe && ts > probe - maxBack), part, order)

  /** Skew-resilient exact sum: two-phase aggregation with a salt on the
    * hot key. Phase 1 spreads each group over `buckets` reducers (map-side
    * partials still apply); phase 2 merges the per-salt partials — the
    * standard fix when one key holds a disproportionate share of rows and
    * a single reducer would stall the stage. Result is identical to the
    * unsalted aggregation because the decimal partial sums are exact.
    *
    * The salt hashes the row's own (key, value) columns, never a stateful
    * expression like `monotonically_increasing_id()`: task retries /
    * speculative re-execution must map every row to the same bucket or
    * phase 1 can drop/duplicate rows (SPARK-23207-class hazard). Hashing
    * only the aggregation's inputs keeps the salt one cheap codegen'd
    * hash (wide rows' unrelated columns — comments, payloads — never
    * enter it); (key, value) duplicates collide into one bucket, which is
    * harmless because a high-cardinality measure spreads a hot key's rows
    * near-uniformly. */
  def saltedExactSum(df: DataFrame, keys: Seq[String], value: Column,
                     scale: Int, as: String, buckets: Int = 16): DataFrame = {
    // Integer-unit quantization for the same tie-stability reason as
    // [[exactSum]] (see its scaladoc); the partials stay exact decimals
    // so the two-level sum is order-insensitive.
    val f = math.pow(10, scale).toLong
    val salted = df.withColumn("__salt",
      pmod(hash(keys.map(col) :+ value: _*), lit(buckets)))
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(round(value * f, 0)
        .cast(org.apache.spark.sql.types.DecimalType(30, 0))).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg((sum(col("__partial")).cast("double") / f).as(as))
  }

  /** Exact monetary sum: quantize a double expression to the 10^-scale
    * grid as INTEGER units (`round(e·10^scale)` → DECIMAL(30,0)), sum in
    * decimal (order-insensitive, bit-identical across partitionings),
    * then surface units/10^scale as a double.
    *
    * Why integer units instead of the previous `cast(e as DECIMAL(30,
    * scale))`: the per-row double→fractional-decimal cast ROUNDS when the
    * value carries more decimals than `scale`, and that rounding is
    * engine-dependent at ties — Spark rounds the double's shortest
    * decimal rendering ("1.215" → 1.22) where DuckDB rounds the binary
    * value (1.21499999999999986 → 1.21). The fixed testdata draw never
    * landed a row on such a boundary; the r13 reseeded draw
    * (value·(1+k/1000) — exact 5-decimal rationals) hit it on the first
    * try and failed q43/q59 by a cent. Round-to-INTEGER is the one
    * rounding both engines agree on for every double: a shortest
    * rendering ending in ".5" denotes a binary value that IS exactly
    * half (.5 is representable, rendering round-trips), and both engines
    * round half away from zero — so the same IEEE product e·10^scale
    * rounds identically everywhere. Exactness bound: |e|·10^scale must
    * stay below 2^53 (money at 4 dp: ~9·10^11 — far above any row
    * value; the SUM side is DECIMAL(30,0), good to 10^30 units). */
  def exactSum(e: Column, scale: Int = 4): Column = {
    val f = math.pow(10, scale).toLong
    sum(round(e * f, 0).cast(org.apache.spark.sql.types.DecimalType(30, 0)))
      .cast("double") / f
  }
}
