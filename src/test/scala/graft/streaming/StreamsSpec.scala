package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

class StreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val batchEvents = Seq(
    Streams.Event(1L, ts("2024-01-01 00:10:00"), 1L, "click", 1.0),
    Streams.Event(2L, ts("2024-01-01 00:20:00"), 1L, "click", 2.0),
    Streams.Event(3L, ts("2024-01-01 01:10:00"), 2L, "view", 5.0),
    Streams.Event(4L, ts("2024-01-01 01:40:00"), 1L, "view", 3.0))

  test("windowedTypeCounts over a file stream matches the batch plan") {
    val dir = Files.createTempDirectory("events_stream").toFile
    batchEvents.toDS().toDF().coalesce(1).write.mode("overwrite").parquet(dir.toString)

    val streaming = Streams.windowedTypeCounts(
      Streams.readEventStream(spark, dir.toString))
    val q = streaming.writeStream.outputMode("complete")
      .format("memory").queryName("win_counts").start()
    q.processAllAvailable(); q.stop()

    val got = spark.table("win_counts")
      .orderBy($"window_start", $"event_type")
      .select($"event_type", $"n", $"total_value")
      .as[(String, Long, Double)].collect().toSeq
    val want = Streams.windowedTypeCounts(batchEvents.toDS().toDF())
      .orderBy($"window_start", $"event_type")
      .select($"event_type", $"n", $"total_value")
      .as[(String, Long, Double)].collect().toSeq
    assert(got === want)
    // clicks at 00:10/00:20 share window [00:00,01:00); views at 01:10/01:40
    // share [01:00,02:00)
    assert(got === Seq(("click", 2L, 3.0), ("view", 2L, 8.0)))
  }

  test("runningUserTotals keeps cross-batch state") {
    val dir = Files.createTempDirectory("events_state").toFile
    val checkpoint = Files.createTempDirectory("events_ckpt").toString
    batchEvents.take(2).toDS().toDF().coalesce(1)
      .write.mode("overwrite").parquet(dir.toString)

    val stream = Streams.runningUserTotals(
      Streams.readEventStream(spark, dir.toString).as[Streams.Event])
    val q = stream.writeStream.outputMode("append")
      .option("checkpointLocation", checkpoint)
      .format("memory").queryName("running").start()
    q.processAllAvailable()
    // second micro-batch: two more events land as a new file
    batchEvents.drop(2).toDS().toDF().coalesce(1)
      .write.mode("append").parquet(dir.toString)
    q.processAllAvailable(); q.stop()

    val last = spark.table("running").orderBy($"n_events")
      .as[Streams.UserRunning].collect().filter(_.user_id == 1L).last
    assert(last.n_events === 3L)        // state carried across batches
    assert(last.total_value === 6.0)
    assert(last.last_event_id === 4L)
  }

  test("sessionCounts over a stream matches the batch plan (gap sessions)") {
    val dir = Files.createTempDirectory("events_sessions").toFile
    batchEvents.toDS().toDF().coalesce(1).write.mode("overwrite").parquet(dir.toString)
    val q = Streams.sessionCounts(Streams.readEventStream(spark, dir.toString))
      .writeStream.outputMode("complete")
      .format("memory").queryName("sessions").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("sessions")
      .orderBy($"user_id", $"session_start")
      .select($"user_id", $"n_events").as[(Long, Long)].collect().toSeq
    // user 1: 00:10+00:20 fuse (gap < 30m), 01:40 stands alone; user 2: 01:10
    assert(got === Seq((1L, 2L), (1L, 1L), (2L, 1L)))
    val batch = Streams.sessionCounts(batchEvents.toDS().toDF())
      .orderBy($"user_id", $"session_start")
      .select($"user_id", $"n_events").as[(Long, Long)].collect().toSeq
    assert(got === batch)
  }

  test("upsertStream merges each micro-batch into the keyed store (S6 streaming)") {
    val src = Files.createTempDirectory("events_upsert_src").toFile
    val store = Files.createTempDirectory("events_upsert").toString + "/events"
    val checkpoint = Files.createTempDirectory("events_upsert_ckpt").toString
    batchEvents.take(3).toDS().toDF().coalesce(1)
      .write.mode("overwrite").parquet(src.toString)

    val q = Streams.upsertStream(
      Streams.readEventStream(spark, src.toString),
      store, keys = Seq("event_id"), version = Seq($"ts"),
      partitionCols = Seq("event_type"), checkpoint = checkpoint)
    q.processAllAvailable()
    // second micro-batch REPLACES event 2 (newer ts, new value) + adds 4
    Seq(Streams.Event(2L, ts("2024-01-01 02:00:00"), 1L, "click", 9.0),
        batchEvents(3))
      .toDS().toDF().coalesce(1).write.mode("append").parquet(src.toString)
    q.processAllAvailable(); q.stop()

    val got = graft.sources.KeyedParquetStore.read(spark, store).get
      .orderBy($"event_id").select($"event_id", $"value")
      .as[(Long, Double)].collect().toSeq
    assert(got === Seq((1L, 1.0), (2L, 9.0), (3L, 5.0), (4L, 3.0)))
  }

  test("dedupEvents drops already-seen ids across batches") {
    val events = Seq(
      Streams.Event(1L, ts("2024-01-01 00:00:01"), 1L, "click", 1.0),
      Streams.Event(1L, ts("2024-01-01 00:00:02"), 1L, "click", 1.0), // dup id
      Streams.Event(2L, ts("2024-01-01 00:00:03"), 1L, "view", 2.0))
    val got = Streams.dedupEvents(events.toDS()).collect().map(_.event_id).toSeq.sorted
    assert(got === Seq(1L, 2L))
  }

  test("dedupEvents evicts expired per-user state once the watermark passes") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[Streams.Event]
    val checkpoint = Files.createTempDirectory("dedup_evict_ckpt").toString
    val q = Streams.dedupEvents(src.toDS(),
        watermark = "10 minutes", stateTtlMs = 10L * 60 * 1000)
      .writeStream.outputMode("append")
      .option("checkpointLocation", checkpoint)
      .format("memory").queryName("dedup_evict").start()
    // batch 1: user 1 sees id 1
    src.addData(Streams.Event(1L, ts("2024-01-01 00:00:00"), 1L, "click", 1.0))
    q.processAllAvailable()
    // batch 2: duplicate id 1 IN-WINDOW -> suppressed (state alive); user
    // 2's event at 01:00 advances the watermark to 00:50, far past user
    // 1's timeout (00:05 + 10 min)
    src.addData(
      Streams.Event(1L, ts("2024-01-01 00:05:00"), 1L, "click", 1.0),
      Streams.Event(9L, ts("2024-01-01 01:00:00"), 2L, "view", 2.0))
    q.processAllAvailable()
    // batch 3: unrelated event triggers timeout processing -> user 1's
    // seen-set is removed
    src.addData(Streams.Event(10L, ts("2024-01-01 01:10:00"), 2L, "view", 3.0))
    q.processAllAvailable()
    // batch 4: id 1 reappears AFTER eviction -> re-emitted (state gone)
    src.addData(Streams.Event(1L, ts("2024-01-01 01:30:00"), 1L, "click", 4.0))
    q.processAllAvailable(); q.stop()
    val ids = spark.table("dedup_evict").as[Streams.Event]
      .collect().map(_.event_id).toSeq
    // id 1 exactly twice: once pre-eviction (its 00:05 dup was suppressed
    // in-window), once post-eviction
    assert(ids.count(_ == 1L) === 2)
    assert(ids.sorted === Seq(1L, 1L, 9L, 10L))
  }

  test("runningUserTotals restarts an evicted user from zero (bounded state)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[Streams.Event]
    val checkpoint = Files.createTempDirectory("running_evict_ckpt").toString
    val q = Streams.runningUserTotals(src.toDS(),
        watermark = "10 minutes", stateTtlMs = 10L * 60 * 1000)
      .writeStream.outputMode("append")
      .option("checkpointLocation", checkpoint)
      .format("memory").queryName("running_evict").start()
    src.addData(Streams.Event(1L, ts("2024-01-01 00:00:00"), 1L, "click", 5.0))
    q.processAllAvailable()
    // watermark jumps past user 1's ttl; next batch expires their state
    src.addData(Streams.Event(9L, ts("2024-01-01 01:00:00"), 2L, "view", 2.0))
    q.processAllAvailable()
    src.addData(Streams.Event(10L, ts("2024-01-01 01:10:00"), 2L, "view", 3.0))
    q.processAllAvailable()
    src.addData(Streams.Event(11L, ts("2024-01-01 01:30:00"), 1L, "click", 7.0))
    q.processAllAvailable(); q.stop()
    val user1 = spark.table("running_evict").as[Streams.UserRunning]
      .collect().filter(_.user_id == 1L).sortBy(_.last_event_id)
    // first emission counted 1 event (5.0); the post-eviction emission
    // restarted from zero: 1 event (7.0), not 2 events (12.0)
    assert(user1.map(r => (r.n_events, r.total_value)).toSeq ===
      Seq((1L, 5.0), (1L, 7.0)))
  }

  test("dedupIngestStream self-compacts the index on its epoch cadence (r7)") {
    val dir = Files.createTempDirectory("docs_compact_stream").toFile
    val ckpt = Files.createTempDirectory("compact_ckpt").toString
    val store = Files.createTempDirectory("compact_store").toString
    // ten epochs of mutually-unrelated docs: every one survives and is
    // indexed under its own batch=eN partition
    val texts = (0 until 10).map(i =>
      s"epoch $i talks about subject$i topic$i detail$i matter$i angle$i facet$i")
    def schema = Seq((0L, "")).toDF("doc_id", "text").schema
    Seq((0L, texts(0))).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(dir.toString)
    val stream = spark.readStream.schema(schema).parquet(dir.toString)
    val q = Streams.dedupIngestStream(stream, s"$store/bands", s"$store/shingles",
      ckpt, compactEvery = 3)
    q.processAllAvailable()
    (1 until 10).foreach { i =>
      Seq((i.toLong, texts(i))).toDF("doc_id", "text")
        .coalesce(1).write.mode("append").parquet(dir.toString)
      q.processAllAvailable() // one file per micro-batch -> epoch i
    }
    q.stop()
    // survivors: every doc indexed, none lost by the interleaved compactions
    val indexed = graft.sources.KeyedParquetStore.read(spark, s"$store/bands").get
      .select($"doc_id").distinct().as[Long].collect().toSet
    assert(indexed === (0L until 10L).toSet)
    // layout: the epoch-9 compaction rewrote every fragmented partition, so
    // no leaf dir in either store holds more than one data file — bounded
    // by cadence, not by stream lifetime (the shuffle writes up to 4 files
    // per partition per epoch without it)
    def leafFileCounts(root: String): Seq[Int] = {
      def walk(f: java.io.File): Seq[java.io.File] = {
        val dirs = f.listFiles().filter(_.isDirectory)
          .filterNot(d => d.getName.startsWith("_") || d.getName.startsWith("."))
        if (dirs.isEmpty) Seq(f) else dirs.toSeq.flatMap(walk)
      }
      walk(new java.io.File(root)).map(_.listFiles().count(c =>
        c.isFile && !c.getName.startsWith("_") && !c.getName.startsWith(".")))
    }
    assert(leafFileCounts(s"$store/bands").forall(_ <= 1))
    assert(leafFileCounts(s"$store/shingles").forall(_ <= 1))
    // the compacted index still answers: a near-dup of epoch 4's doc is
    // rejected against the store, fresh content is kept
    val labeled = graft.pipeline.IncrementalDedup.dedupBatch(spark,
      Seq((40L, texts(4)), (41L, "wholly new sentence that matches nothing above"))
        .toDF("doc_id", "text"),
      s"$store/bands", s"$store/shingles")
      .select($"doc_id", $"status").as[(Long, String)].collect().toMap
    assert(labeled === Map(40L -> "dup_of_stored", 41L -> "kept"))
  }

  test("bm25IngestStream: stream-built index answers identically to a " +
      "from-scratch batch build (r7)") {
    val dir = Files.createTempDirectory("docs_bm25_stream").toFile
    val ckpt = Files.createTempDirectory("bm25_ckpt").toString
    val store = Files.createTempDirectory("bm25_store").toString
    val (pP, tP, sP) = (s"$store/postings", s"$store/terms", s"$store/stats")
    val batches = Seq(
      Seq((1L, "spark shuffles data across the cluster for a join"),
        (2L, "a window function ranks rows within a partition")),
      Seq((3L, "merge small files before the join to cut spark overhead"),
        (4L, "columnar parquet storage speeds the scan")),
      Seq((5L, "the spark window merge path avoids a full shuffle")))
    def schema = Seq((0L, "")).toDF("doc_id", "text").schema
    batches.head.toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(dir.toString)
    val stream = spark.readStream.schema(schema).parquet(dir.toString)
    val q = Streams.bm25IngestStream(stream, pP, tP, sP, ckpt, compactEvery = 2)
    q.processAllAvailable()
    batches.tail.foreach { b =>
      b.toDF("doc_id", "text")
        .coalesce(1).write.mode("append").parquet(dir.toString)
      q.processAllAvailable() // one file per micro-batch
    }
    q.stop()
    val query = Seq("spark", "window", "merge")
    val got = graft.pipeline.IncrementalBm25
      .searchStored(spark, pP, tP, sP, query, k = 10)
      .as[(Long, Double)].collect().toSeq
    val want = graft.pipeline.TextAnalysis
      .bm25Search(batches.flatten.toDF("doc_id", "text"), query, k = 10)
      .as[(Long, Double)].collect().toSeq
    assert(got === want) // scores INCLUDED: exact, not approximate
    assert(got.nonEmpty && got.map(_._1).contains(5L))
    // the incremental layout keeps the q65 pruning promise: the query
    // terms' bucket ids reach the postings scan as partition filters
    // (batch= is layout; tbucket= is what bounds per-query I/O)
    val plan = graft.pipeline.IncrementalBm25
      .searchStored(spark, pP, tP, sP, query, k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("PartitionFilters: [")
        && !l.contains("PartitionFilters: []")
        && l.matches(""".*PartitionFilters: \[[^\]]*tbucket[^\]]* IN \(.*""")),
      s"expected tbucket partition pruning on the stored postings:\n$plan")
  }

  test("ivfIngestStream: streamed vectors land in the stored index and " +
      "search sees every epoch (r7)") {
    val dir = Files.createTempDirectory("vecs_stream").toFile
    val ckpt = Files.createTempDirectory("ivf_ckpt").toString
    val store = Files.createTempDirectory("ivf_store").toString
    val (cP, aP) = (s"$store/centroids", s"$store/assigned")
    def v(xs: Double*): Seq[Float] = xs.map(_.toFloat)
    val b1 = Seq((0L, v(1, 0, 0, 0)), (1L, v(0.9, 0.1, 0, 0)),
      (2L, v(0, 1, 0, 0))).toDF("vec_id", "embedding")
    val b2 = Seq((3L, v(1, 0, 0, 0)), (4L, v(0, 0.9, 0.1, 0)))
      .toDF("vec_id", "embedding")
    graft.pipeline.IncrementalIvf.buildCentroids(spark, b1, cP, numCells = 2)
    b1.coalesce(1).write.mode("overwrite").parquet(dir.toString)
    val stream = spark.readStream.schema(b1.schema).parquet(dir.toString)
    val q = Streams.ivfIngestStream(stream, cP, aP, ckpt)
    q.processAllAvailable()
    b2.coalesce(1).write.mode("append").parquet(dir.toString)
    q.processAllAvailable(); q.stop()
    // every streamed vector is searchable; nProbe == numCells -> exact
    val got = graft.pipeline.IncrementalIvf
      .searchStored(spark, cP, aP, b1.filter($"vec_id" === 0), k = 4, nProbe = 2)
      .select($"neighbor_id").as[Long].collect().toSet
    assert(got === Set(1L, 2L, 3L, 4L))
  }

  test("ivfIngestStream: crash mid-epoch, re-train with that epoch on " +
      "the replay horizon, restart — replay re-merges, no duplicates (r8)") {
    val dir = Files.createTempDirectory("vecs_crash").toFile
    val ckpt = Files.createTempDirectory("ivf_crash_ckpt").toString
    val store = Files.createTempDirectory("ivf_crash_store").toString
    val (cP, aP) = (s"$store/centroids", s"$store/assigned")
    def v(xs: Double*): Seq[Float] = xs.map(_.toFloat)
    val b1 = Seq((0L, v(1, 0, 0, 0)), (1L, v(0.9, 0.1, 0, 0)),
      (2L, v(0, 1, 0, 0))).toDF("vec_id", "embedding")
    val b2 = Seq((3L, v(1, 0, 0, 0)), (4L, v(0, 0.9, 0.1, 0)))
      .toDF("vec_id", "embedding")
    graft.pipeline.IncrementalIvf.buildCentroids(spark, b1, cP, numCells = 2)
    b1.coalesce(1).write.mode("overwrite").parquet(dir.toString)
    val q1 = Streams.ivfIngestStream(
      spark.readStream.schema(b1.schema).parquet(dir.toString), cP, aP, ckpt)
    q1.processAllAvailable()
    b2.coalesce(1).write.mode("append").parquet(dir.toString)
    q1.processAllAvailable()
    q1.stop(); q1.awaitTermination()
    while (spark.streams.active.exists(_.id == q1.id)) Thread.sleep(50)
    // CRASH: epoch 1 (b2) fully ingested but its commit marker is lost
    assert(new java.io.File(s"$ckpt/commits/1").delete())
    new java.io.File(s"$ckpt/commits/.1.crc").delete()
    // maintenance re-train runs while the stream is down — this is the
    // ADVICE-r7 scenario: without the replay horizon, e1's folded copies
    // would duplicate every b2 neighbor when the epoch redelivers
    graft.pipeline.IncrementalIvf.retrain(spark, cP, aP, numCells = 2,
      keepBatches = Set("e1"))
    val q2 = Streams.ivfIngestStream(
      spark.readStream.schema(b1.schema).parquet(dir.toString), cP, aP, ckpt)
    q2.processAllAvailable() // replays e1 against the NEW frozen centroids
    q2.stop()
    val got = graft.pipeline.IncrementalIvf
      .searchStored(spark, cP, aP, b1.filter($"vec_id" === 0), k = 4, nProbe = 2)
      .select($"neighbor_id").as[Long].collect()
    assert(got.sorted.toSeq === Seq(1L, 2L, 3L, 4L)) // each EXACTLY once
    val stored = graft.sources.KeyedParquetStore.read(spark, aP,
      schema = Some(graft.pipeline.IncrementalIvf.assignedSchema)).get
    assert(stored.groupBy($"neighbor_id").count().filter($"count" > 1)
      .count() === 0L, "post-re-train replay duplicated stored neighbors")
  }

  test("IncrementalBm25: a bucket-count mismatch refuses loudly instead " +
      "of silently dropping postings (r8)") {
    val store = Files.createTempDirectory("bm25_nb_store").toString
    val (pP, tP, sP) = (s"$store/postings", s"$store/terms", s"$store/stats")
    val b1 = Seq((1L, "spark joins shuffle data")).toDF("doc_id", "text")
    graft.pipeline.IncrementalBm25.ingestBatch(spark, b1, "e0", pP, tP, sP,
      nBuckets = 16)
    // a search with another modulus would prune to the WRONG buckets and
    // silently miss postings — the stats fingerprint refuses it
    val e = intercept[IllegalArgumentException] {
      graft.pipeline.IncrementalBm25.searchStored(spark, pP, tP, sP,
        Seq("spark"), k = 5, nBuckets = 8).collect()
    }
    assert(e.getMessage.contains("bucket-count mismatch"))
    // the matching modulus still answers
    assert(graft.pipeline.IncrementalBm25.searchStored(spark, pP, tP, sP,
      Seq("spark"), k = 5, nBuckets = 16).collect().nonEmpty)
    // and under debugChecks a drifted INGEST fails fast before writing
    spark.conf.set("spark.graft.store.debugChecks", "true")
    try {
      val e2 = intercept[IllegalArgumentException] {
        graft.pipeline.IncrementalBm25.ingestBatch(spark,
          Seq((2L, "window ranks rows")).toDF("doc_id", "text"), "e1",
          pP, tP, sP, nBuckets = 8)
      }
      assert(e2.getMessage.contains("bucket-count drift"))
    } finally spark.conf.unset("spark.graft.store.debugChecks")
  }

  test("null event-time rows are dropped, not poison pills, in the " +
      "stateful operators (r8)") {
    // a null ts would NPE inside the typed state functions — on a real
    // stream the checkpoint then replays the same batch forever
    val events = Seq(
      (1L, Option(ts("2024-01-01 10:00:00")), 7L, "click", 1.0),
      (2L, Option.empty[java.sql.Timestamp], 7L, "click", 2.0),
      (3L, Option(ts("2024-01-01 10:05:00")), 7L, "click", 4.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("ts", $"ts".cast("timestamp"))
      .as[Streams.Event]
    val run = Streams.runningUserTotals(events).collect()
    assert(run.map(_.total_value).toSeq === Seq(5.0)) // null row skipped
    assert(run.head.n_events === 2L)
    val ded = Streams.dedupEvents(events).collect()
    assert(ded.map(_.event_id).toSet === Set(1L, 3L))
    // the WINDOW aggregations share the policy: without the guard their
    // batch face groups the null ts into a phantom null-window row the
    // streaming face (which drops unwatermarkable rows) would never emit
    val win = Streams.windowedTypeCounts(events.toDF()).collect()
    assert(win.length === 1 && !win.head.isNullAt(0))
    assert(win.head.getAs[Long]("n") === 2L)
    val sess = Streams.sessionCounts(events.toDF()).collect()
    assert(sess.length === 1 && sess.head.getAs[Long]("n_events") === 2L)
  }

  test("IncrementalBm25: a replayed batch id re-merges idempotently (r7)") {
    val store = Files.createTempDirectory("bm25_retry_store").toString
    val (pP, tP, sP) = (s"$store/postings", s"$store/terms", s"$store/stats")
    val b1 = Seq((1L, "spark joins shuffle data"), (2L, "window ranks rows"))
      .toDF("doc_id", "text")
    graft.pipeline.IncrementalBm25.ingestBatch(spark, b1, "e0", pP, tP, sP)
    val before = graft.pipeline.IncrementalBm25
      .searchStored(spark, pP, tP, sP, Seq("spark", "window"), k = 5)
      .as[(Long, Double)].collect().toSeq
    // at-least-once delivery: the SAME batch id arrives again
    graft.pipeline.IncrementalBm25.ingestBatch(spark, b1, "e0", pP, tP, sP)
    val after = graft.pipeline.IncrementalBm25
      .searchStored(spark, pP, tP, sP, Seq("spark", "window"), k = 5)
      .as[(Long, Double)].collect().toSeq
    assert(after === before) // no double-counted df / n_docs / postings
  }

  test("IncrementalBm25.ingestBatch: debugChecks enforces the " +
      "one-batch-per-doc precondition; same-batch replay stays legal (r8)") {
    val store = Files.createTempDirectory("bm25_precond_store").toString
    val (pP, tP, sP) = (s"$store/postings", s"$store/terms", s"$store/stats")
    val b1 = Seq((1L, "spark joins shuffle data"), (2L, "window ranks rows"))
      .toDF("doc_id", "text")
    graft.pipeline.IncrementalBm25.ingestBatch(spark, b1, "e0", pP, tP, sP)
    spark.conf.set("spark.graft.store.debugChecks", "true")
    try {
      // replay under the ORIGINAL batch id: the sanctioned idempotent path
      graft.pipeline.IncrementalBm25.ingestBatch(spark, b1, "e0", pP, tP, sP)
      // the corruption mode the scaladoc documents: a doc redelivered
      // under a DIFFERENT batch id would double-count df/n_docs/postings
      // (its old rows live in another partition, invisible to the merge) —
      // with checks on it fails fast BEFORE any store write
      val e = intercept[IllegalArgumentException] {
        graft.pipeline.IncrementalBm25.ingestBatch(spark,
          b1.filter($"doc_id" === 1L), "e9", pP, tP, sP)
      }
      assert(e.getMessage.contains("precondition"))
      // nothing was written by the refused ingest
      val batches = graft.pipeline.IncrementalBm25
      val stored = graft.sources.KeyedParquetStore.read(spark, pP,
        schema = Some(batches.postingsSchema)).get
        .select($"batch").distinct().as[String].collect().toSet
      assert(stored === Set("e0"))
      // WITHIN-batch duplicate rows: the tf/df/stats aggregations would
      // collapse them into unique-keyed rows with doubled values — the
      // one duplication the store's incomingUnique vouch check can't
      // see, so the ingest face refuses it before any write
      val dup = intercept[IllegalArgumentException] {
        graft.pipeline.IncrementalBm25.ingestBatch(spark,
          Seq((7L, "dup text"), (7L, "dup text")).toDF("doc_id", "text"),
          "e7", pP, tP, sP)
      }
      assert(dup.getMessage.contains("more than once within batch"))
      // NULL doc_id rows are not keys at all — two of them would trip
      // the duplicate diagnostic and NPE inside its own error path
      // (getLong on a null cell, r8 ADVICE); refused FIRST with the
      // explanatory message instead
      val nul = intercept[IllegalArgumentException] {
        graft.pipeline.IncrementalBm25.ingestBatch(spark,
          Seq((Option.empty[Long], "null id"), (None, "null id too"),
            (Some(8L), "a keyed row")).toDF("doc_id", "text"),
          "e8", pP, tP, sP)
      }
      assert(nul.getMessage.contains("NULL doc_id"))
    } finally spark.conf.unset("spark.graft.store.debugChecks")
  }

  test("bm25IngestStream: a mid-epoch crash replays through the " +
      "checkpoint after its roll-up already ran — no double counting (r8)") {
    val dir = Files.createTempDirectory("docs_bm25_crash").toFile
    val ckpt = Files.createTempDirectory("bm25_crash_ckpt").toString
    val store = Files.createTempDirectory("bm25_crash_store").toString
    val (pP, tP, sP) = (s"$store/postings", s"$store/terms", s"$store/stats")
    val batches = Seq(
      Seq((1L, "spark shuffles data across the cluster for a join"),
        (2L, "a window function ranks rows within a partition")),
      Seq((3L, "merge small files before the join to cut spark overhead")),
      Seq((5L, "the spark window merge path avoids a full shuffle")))
    def schema = Seq((0L, "")).toDF("doc_id", "text").schema
    batches.head.toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(dir.toString)
    // compactEvery=2: epoch 2 runs the roll-up with ITSELF on the replay
    // horizon (keepBatches = e2) — the interaction under test
    val q1 = Streams.bm25IngestStream(
      spark.readStream.schema(schema).parquet(dir.toString),
      pP, tP, sP, ckpt, compactEvery = 2)
    q1.processAllAvailable()
    batches.tail.foreach { b =>
      b.toDF("doc_id", "text")
        .coalesce(1).write.mode("append").parquet(dir.toString)
      q1.processAllAvailable()
    }
    q1.stop()
    q1.awaitTermination()
    // the restart must not race the stopped run's deregistration (the
    // engine guards a checkpoint against concurrent active runs)
    while (spark.streams.active.exists(_.id == q1.id)) Thread.sleep(50)
    // CRASH SIMULATION: epoch 2 fully executed (ingest + roll-up) but its
    // commit marker is lost — exactly the window between foreachBatch
    // returning and the checkpoint commit. On restart the engine MUST
    // redeliver epoch 2 under the same id.
    assert(new java.io.File(s"$ckpt/commits/2").delete(),
      "expected an epoch-2 commit marker to crash")
    // the local FS keeps a checksum sidecar; leaving it behind makes the
    // replayed commit's rename fail as a phantom concurrent writer
    new java.io.File(s"$ckpt/commits/.2.crc").delete()
    val q2 = Streams.bm25IngestStream(
      spark.readStream.schema(schema).parquet(dir.toString),
      pP, tP, sP, ckpt, compactEvery = 2)
    q2.processAllAvailable() // replays e2: re-ingest + re-roll-up
    q2.stop()
    // df / n_docs / sum_dl survived the replay exactly once: scores match
    // a from-scratch batch build, similarities included
    val query = Seq("spark", "window", "merge")
    val got = graft.pipeline.IncrementalBm25
      .searchStored(spark, pP, tP, sP, query, k = 10)
      .as[(Long, Double)].collect().toSeq
    val want = graft.pipeline.TextAnalysis
      .bm25Search(batches.flatten.toDF("doc_id", "text"), query, k = 10)
      .as[(Long, Double)].collect().toSeq
    assert(got === want)
  }

  test("IncrementalBm25.rollupPartials: partials consolidate, search is " +
      "unchanged, and the kept epoch still replays idempotently (r7)") {
    val store = Files.createTempDirectory("bm25_rollup_store").toString
    val (pP, tP, sP) = (s"$store/postings", s"$store/terms", s"$store/stats")
    val batches = Seq(
      Seq((1L, "spark shuffles data for the join")),
      Seq((2L, "a window ranks rows per partition")),
      Seq((3L, "the spark window merge path")))
    batches.zipWithIndex.foreach { case (b, i) =>
      graft.pipeline.IncrementalBm25.ingestBatch(spark,
        b.toDF("doc_id", "text"), s"e$i", pP, tP, sP)
    }
    val query = Seq("spark", "window", "merge")
    def search() = graft.pipeline.IncrementalBm25
      .searchStored(spark, pP, tP, sP, query, k = 10)
      .as[(Long, Double)].collect().toSeq
    val before = search()
    graft.pipeline.IncrementalBm25.rollupPartials(spark, tP, sP,
      keepBatches = Set("e2"))
    assert(search() === before) // exact sums: consolidation is invisible
    // layout: only the rollup partition + the kept epoch remain
    def batchesOf(path: String) = spark.read.parquet(path)
      .select($"batch").distinct().as[String].collect().toSet
    assert(batchesOf(tP) === Set("rollup", "e2"))
    assert(batchesOf(sP) === Set("rollup", "e2"))
    // the kept epoch's partition survived -> its replay stays a no-op
    graft.pipeline.IncrementalBm25.ingestBatch(spark,
      batches(2).toDF("doc_id", "text"), "e2", pP, tP, sP)
    assert(search() === before)
    // a second roll-up folds everything (no replay horizon left)
    graft.pipeline.IncrementalBm25.rollupPartials(spark, tP, sP)
    assert(search() === before)
    assert(batchesOf(tP) === Set("rollup"))
  }

  test("dedupIngestStream: micro-batches accrete only survivors into the index (r4)") {
    val dir = Files.createTempDirectory("docs_stream").toFile
    val ckpt = Files.createTempDirectory("dedup_ckpt").toString
    val store = Files.createTempDirectory("dedup_store").toString
    val t1 = "the quick brown fox jumps over the lazy dog near the river bank today"
    val t2 = "completely different words about spark catalyst optimizer and shuffles here"
    val t3 = "another unrelated snippet mentioning parquet columnar storage formats"
    val b1 = Seq((1L, t1), (2L, t2)).toDF("doc_id", "text")
    b1.coalesce(1).write.mode("overwrite").parquet(dir.toString)
    val stream = spark.readStream.schema(b1.schema).parquet(dir.toString)
    val q = Streams.dedupIngestStream(stream, s"$store/bands", s"$store/shingles", ckpt)
    q.processAllAvailable()
    // micro-batch 2: a near-dup of STORED doc 1 plus genuinely new content
    Seq((10L, t1), (11L, t3)).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(dir.toString)
    q.processAllAvailable(); q.stop()
    val indexed = graft.sources.KeyedParquetStore.read(spark, s"$store/bands").get
      .select($"doc_id").distinct().as[Long].collect().toSet
    assert(indexed === Set(1L, 2L, 11L)) // 10 rejected against the stored index
    // the read-only face labels without mutating the index
    val labeled = graft.pipeline.IncrementalDedup.dedupBatch(spark,
      Seq((20L, t2), (21L, "wholly new sentence about advisory locks and swaps today"))
        .toDF("doc_id", "text"),
      s"$store/bands", s"$store/shingles")
      .select($"doc_id", $"status").as[(Long, String)].collect().toMap
    assert(labeled === Map(20L -> "dup_of_stored", 21L -> "kept"))
    val after = graft.sources.KeyedParquetStore.read(spark, s"$store/bands").get
      .select($"doc_id").distinct().as[Long].collect().toSet
    assert(after === indexed) // dry run: index untouched
  }

  test("dedupIngestStream threads the LSH structural params — a sink " +
      "locked to defaults cannot feed a non-default index (r8)") {
    val dir = Files.createTempDirectory("docs_stream_p").toFile
    val ckpt = Files.createTempDirectory("dedup_ckpt_p").toString
    val store = Files.createTempDirectory("dedup_store_p").toString
    val t1 = "the quick brown fox jumps over the lazy dog near the river bank today"
    val b1 = Seq((1L, t1)).toDF("doc_id", "text")
    // the index is BUILT at non-default structural params via the batch face
    graft.pipeline.IncrementalDedup.ingestBatch(spark, b1, "seed",
      s"$store/bands", s"$store/shingles", numHashes = 32, shingleN = 4)
    // the stream feeds the same index with MATCHING params: a near-dup of
    // the seeded doc must be rejected (drifted params would band-join the
    // stored rows and match nothing — the fingerprinted corruption mode)
    Seq((10L, t1)).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(dir.toString)
    val stream = spark.readStream.schema(b1.schema).parquet(dir.toString)
    val q = Streams.dedupIngestStream(stream, s"$store/bands",
      s"$store/shingles", ckpt, numHashes = 32, shingleN = 4)
    q.processAllAvailable(); q.stop()
    val indexed = graft.sources.KeyedParquetStore.read(spark, s"$store/bands").get
      .select($"doc_id").distinct().as[Long].collect().toSet
    assert(indexed === Set(1L), "the streamed near-dup was not rejected " +
      "against the non-default-parameter index")
  }

  test("embedDedupIngestStream: micro-batches accrete only surviving " +
      "vectors into the signature index (r12)") {
    val dir = Files.createTempDirectory("vecs_stream").toFile
    val ckpt = Files.createTempDirectory("embed_ckpt").toString
    val store = Files.createTempDirectory("embed_store").toString
    def vec(xs: Double*): Seq[Float] = xs.map(_.toFloat)
    val b1 = Seq((1L, vec(1, 0, 0, 0)), (2L, vec(0, 1, 0, 0)))
      .toDF("vec_id", "embedding")
    b1.coalesce(1).write.mode("overwrite").parquet(dir.toString)
    val stream = spark.readStream.schema(b1.schema).parquet(dir.toString)
    val q = Streams.embedDedupIngestStream(stream, s"$store/sigs",
      s"$store/vecs", ckpt, threshold = 0.999, bits = 6, dim = 4)
    q.processAllAvailable()
    // micro-batch 2: a copy of STORED vec 1 plus genuinely new content
    Seq((10L, vec(1, 0, 0, 0)), (11L, vec(0, 0, 1, 0)))
      .toDF("vec_id", "embedding")
      .coalesce(1).write.mode("append").parquet(dir.toString)
    q.processAllAvailable(); q.stop()
    val indexed = graft.sources.KeyedParquetStore.read(spark, s"$store/sigs").get
      .select($"vec_id").distinct().as[Long].collect().toSet
    assert(indexed === Set(1L, 2L, 11L)) // 10 rejected against the stored index
    // the read-only face labels without mutating the index
    val labeled = graft.pipeline.IncrementalEmbedDedup.dedupBatch(spark,
      Seq((20L, vec(0, 1, 0, 0)), (21L, vec(0, 0, 0, 1)))
        .toDF("vec_id", "embedding"),
      s"$store/sigs", s"$store/vecs", threshold = 0.999, bits = 6, dim = 4)
      .select($"vec_id", $"status").as[(Long, String)].collect().toMap
    assert(labeled === Map(20L -> "dup_of_stored", 21L -> "kept"))
    assert(graft.sources.KeyedParquetStore.read(spark, s"$store/sigs").get
      .select($"vec_id").distinct().as[Long].collect().toSet === indexed)
  }
}
