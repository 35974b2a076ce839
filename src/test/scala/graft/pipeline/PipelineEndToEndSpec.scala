package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end CURATION pipeline over real testdata — the chain a
  * library user actually runs, stage by stage, in the order the ops are
  * designed to compose:
  *
  *   redact → scrub → quality-filter → exact-dedup → decontaminate
  *     → token-budget select → deterministic shuffle → sequence pack
  *
  * Unit specs pin each operator; THIS spec pins the interfaces between
  * them — column contracts surviving the handoffs, id-width decision
  * relations applying back to bodies, and the whole chain being
  * deterministic when re-run (every stage is a hash deal or an exact
  * computation, so two runs must agree byte-for-byte). */
class PipelineEndToEndSpec extends SparkSpec {
  import spark.implicits._

  private def curate(): (Seq[(String, Long)], DataFrame) = {
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    // plant exact duplicates at shifted ids: dedup must remove ALL of
    // them (min-id election keeps the originals)
    val corpus = base.unionByName(
      base.filter($"doc_id" < 10)
        .select(($"doc_id" + 500000L).as("doc_id"), $"text"))
    val stages = scala.collection.mutable.ArrayBuffer[(String, Long)]()
    def stage(name: String, df: DataFrame): DataFrame = {
      stages += name -> df.count(); df
    }
    val s0 = stage("corpus", corpus)
    // 1-2: PII redaction then scrub, composed on the text column
    val cleaned = stage("cleaned", s0.withColumn("text",
      TextAnalysis.scrub(
        TextAnalysis.redactPii($"text").toMap.apply("redacted"))))
    // 3: quality gate (lenient — the synthetic corpus is clean-ish)
    val quality = stage("quality", TextAnalysis.qualityFilter(
      cleaned, minTokens = 10, maxStopwordRatio = 0.9,
      maxShortTokenRatio = 0.9).select($"doc_id", $"text", $"n_tokens"))
    // 4: exact dedup decision (id-width) applied back with a semi-join
    val deduped = stage("deduped", Dedup.keepCanonical(quality,
      Dedup.exact(quality).select($"kept_id".as("doc_id"))))
    // 5: decontaminate against an "eval set" (first 3 docs stand in)
    val evalSet = base.filter($"doc_id" < 3)
    val decon = stage("decontaminated",
      Dedup.decontaminate(deduped, evalSet, shingleN = 3, minOverlap = 5))
    // 6: token-budget selection (id-width) re-attached by semi-join
    val budget = 2000L
    val selection = Sampling.takeTokenBudget(
      decon, "doc_id", $"n_tokens".cast("double"), $"n_tokens", budget)
    val selected = stage("selected",
      decon.join(selection.select($"doc_id", $"cum_before"), Seq("doc_id")))
    // 7-8: shuffle order + packs over the surviving id-width projection
    val ranked = Sampling.deterministicShuffleRank(
      selected.select($"doc_id", $"n_tokens"), "doc_id")
    val packed = stage("packed", Sampling.packBudget(
      ranked, "doc_id", $"n_tokens", budget = 256, packBuckets = 4))
    (stages.toSeq, packed.select($"doc_id", $"shuffle_rank", $"pack_id"))
  }

  test("curation chain: stages compose, shrink monotonically, and keep ids unique") {
    val (stages, finalDf) = curate()
    val byName = stages.toMap
    // the chain only ever removes rows (redact/scrub rewrite in place)
    val order = Seq("corpus", "cleaned", "quality", "deduped",
      "decontaminated", "selected")
    order.sliding(2).foreach { case Seq(a, b) =>
      assert(byName(a) >= byName(b), s"$a(${byName(a)}) < $b(${byName(b)})")
    }
    assert(byName("packed") === byName("selected"))
    // every planted duplicate died in dedup; the originals survived it
    assert(byName("deduped") <= byName("quality") - 10)
    // decontamination removed at least the eval docs themselves (exact
    // overlap >> 5 shingles), and the budget stage made a real cut
    assert(byName("decontaminated") < byName("deduped"))
    assert(byName("selected") < byName("decontaminated"))
    val rows = finalDf.collect()
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)
    assert(rows.forall(!_.isNullAt(1)), "a surviving doc lost its rank")
    // ranks are the 1..n permutation over the final survivors
    assert(rows.map(_.getLong(1)).sorted.toSeq === (1L to rows.length).toSeq)
  }

  test("curation chain is deterministic end-to-end across re-runs") {
    val a = curate()._2.as[(Long, Long, Long)].collect().toSet
    val b = curate()._2.as[(Long, Long, Long)].collect().toSet
    assert(a === b)
    assert(a.nonEmpty)
  }

  // q81's full-chain face (quality → exact dedup → minhash near-dup →
  // decontaminate → budget → redact → chunk): the oracle pins the exact
  // row set at sf0.01/sf1; THIS spec pins the properties a hash can't
  // localize when it fails — the injected PII is gone from every chunk,
  // the typed placeholders actually appear (so redaction ran, rather
  // than the injection never happening), and the chunk geometry holds.
  test("q81 full curation chain: chunks are redacted, sized, deterministic") {
    val q81 = graft.SparkEntry.queries("q81_curation_full")
    val out = q81(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"chunk_id", $"chunk_text", $"n_chunk_tokens")
      .collect()
    assert(out.nonEmpty)
    val texts = out.map(_.getString(2))
    // every selected doc carried injected PII; redaction must have
    // consumed all of it...
    assert(!texts.exists(_.contains("@example.com")),
      "an email survived redaction into a training chunk")
    assert(!texts.exists(t => "\\b10\\.0\\.\\d{1,3}\\.7\\b".r.findFirstIn(t).isDefined),
      "an IP survived redaction into a training chunk")
    assert(!texts.exists(t => "\\b99887766\\d+\\b".r.findFirstIn(t).isDefined),
      "a long number survived redaction into a training chunk")
    // ...and left its typed markers (each doc's tail chunk carries them)
    assert(texts.exists(_.contains("<EMAIL>")) && texts.exists(_.contains("<NUM>")),
      "no placeholder tokens found — the injection or redaction stage never ran")
    assert(out.forall(_.getLong(3) <= 32), "a chunk exceeded maxTokens")
    // chunk ids are dense per doc (0..n-1): posexplode + sequence contract
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(1)).sorted.toSeq === (0L until rows.length).toSeq)
    }
    val again = q81(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"chunk_id", $"chunk_text").as[(Long, Long, String)]
      .collect().toSet
    assert(again === out.map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet)
  }

  // q90's curation-v2 chain (quality → near-dup clusters → BEST-member
  // election → containment decontamination → temperature mixture): the
  // oracle pins the exact row set; this spec pins the properties a hash
  // can't localize — no surviving doc contains ≥ 0.5 of any eval doc
  // (recomputed INDEPENDENTLY via containmentPairs over the raw scan,
  // not the chain's own pinned relations), the mixture excludes
  // null-lang docs, and the chain is deterministic.
  test("q90 curation v2: survivors are decontaminated (independent " +
      "recheck), mixture is null-free, chain deterministic") {
    val q90 = graft.SparkEntry.queries("q90_curation_quality")
    val out = q90(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"lang").as[(Long, String)].collect()
    assert(out.nonEmpty)
    assert(out.forall(_._2 != null), "a null-lang doc entered the mixture")
    val survivors = out.map(_._1).toSet
    // independent containment recheck over the raw scan
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val contaminated = graft.pipeline.Dedup.containmentPairs(
        graft.pipeline.TextAnalysis.hashedShingles(
          docs.filter($"doc_id" >= 20), 3),
        graft.pipeline.TextAnalysis.hashedShingles(
          docs.filter($"doc_id" < 20), 3))
      .filter($"containment" >= 0.5)
      .select($"doc_id").as[Long].collect().toSet
    assert(survivors.intersect(contaminated).isEmpty,
      "a contaminated doc survived the chain")
    val again = q90(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"lang").as[(Long, String)].collect().toSet
    assert(again === out.toSet)
  }

  // q82's export manifest: the oracle pins the exact values; this spec
  // pins the export INVARIANTS a training run depends on — split
  // hygiene (one doc never straddles splits), rank being a permutation,
  // and packs that respect both the budget (modulo the documented
  // straddler) and split boundaries.
  test("q82 training export: split hygiene, rank permutation, pack discipline") {
    val rows = graft.SparkEntry.queries("q82_training_export")(
      spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"chunk_id", $"n_chunk_tokens", $"shuffle_rank",
        $"pack_id", $"split")
      .as[(Long, Long, Long, Long, Long, String)].collect()
    assert(rows.nonEmpty)
    // every chunk of a doc carries the doc's one split
    rows.groupBy(_._1).foreach { case (doc, rs) =>
      assert(rs.map(_._6).distinct.length === 1, s"doc $doc straddles splits")
    }
    // shuffle_rank is the 1..n permutation over ALL chunks
    assert(rows.map(_._4).sorted.toSeq === (1L to rows.length).toSeq)
    // a pack never mixes splits, and pack totals respect the budget up
    // to one straddling chunk (maxTokens=32 << 2048, so any pack's
    // pre-straddler prefix is < 2048 and the overflow is < 32)
    rows.groupBy(r => (r._6, r._5)).foreach { case ((sp, pack), rs) =>
      assert(rs.map(_._6).forall(_ == sp))
      val tot = rs.map(_._3).sum
      assert(tot < 2048 + 32, s"pack $pack in $sp overflows: $tot tokens")
    }
  }

  test("q90/q91 on an ALL-contaminated corpus: the clean set empties " +
      "mid-chain and every downstream stage is empty-out, not a crash (r15)") {
    // Every pool doc embeds eval doc 0's full text → containment 1.0 →
    // stage 4 drops everything. Distinct from the EMPTY edge corpus
    // (where all stages see zero rows): here stages 1–3 carry real rows
    // and the EMPTINESS TRANSITION happens mid-chain — temperatureMixture
    // gets a populated lookup path with zero input rows, and q91's
    // repeat/rank/pack faces all run over the empty survivor set.
    val evalText = "zebra quokka wombat numbat dingo"
    val filler = (1 to 45).map(j => s"filler${j}word").mkString(" ")
    val docs =
      (0L until 5L).map(i => (i, s"$evalText marker$i", "en", "web", 0L)) ++
        (20L until 31L).map(i => (i, s"$evalText $filler extra$i", "en", "web", 0L))
    val dir = java.nio.file.Files.createTempDirectory("allcontam").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val q90 = graft.SparkEntry.queries("q90_curation_quality")(spark, dir)
    assert(q90.count() === 0L, "all pool docs are contaminated — clean set must be empty")
    val q91 = graft.SparkEntry.queries("q91_training_order")(spark, dir)
    assert(q91.count() === 0L, "empty survivors must pack to an empty manifest")
  }

  test("q93 surgical decontamination on a planted corpus: the plagiarized " +
      "chunk drops, the clean chunks of the SAME doc survive — where " +
      "doc-grain containment burns the whole doc (r15)") {
    // doc 30: chunk 0 = eval doc 0's text verbatim (64 tokens), chunks
    // 1–2 = clean filler. Chunk grain keeps 2 of 3 chunks; doc grain at
    // the same 0.5 threshold drops all three (the eval doc is fully
    // contained in doc 30 → doc containment 1.0).
    val evalToks = (1 to 64).map(i => s"bench${i}tok").mkString(" ")
    val clean = (1 to 128).map(i => s"clean${i}tok").mkString(" ")
    val docs = Seq(
      (0L, evalToks, "en", "web", 0L),
      (30L, s"$evalToks $clean", "en", "web", 0L),
      (31L, clean, "en", "web", 0L))
    val dir = java.nio.file.Files.createTempDirectory("surgical").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val kept = graft.SparkEntry.queries("q93_chunk_decontaminate")(spark, dir)
      .as[(Long, Long, Long)].collect().sortBy(t => (t._1, t._2))
    // doc 30 keeps exactly chunks 1 and 2; doc 31 keeps both of its own
    assert(kept.filter(_._1 == 30L).map(_._2).toSeq === Seq(1L, 2L))
    assert(kept.filter(_._1 == 31L).map(_._2).toSeq === Seq(0L, 1L))
    // the doc-grain face at the same threshold burns doc 30 whole
    val pool = spark.read.parquet(s"$dir/documents.parquet")
      .filter($"doc_id" >= 20).select($"doc_id", $"text")
    val evalD = spark.read.parquet(s"$dir/documents.parquet")
      .filter($"doc_id" < 20).select($"doc_id", $"text")
    val docGrainBad = graft.pipeline.Dedup.contaminatedByContainment(
      graft.pipeline.TextAnalysis.hashedShingles(pool, 3),
      graft.pipeline.TextAnalysis.hashedShingles(evalD, 3),
      minContainment = 0.5).as[Long].collect().toSet
    assert(docGrainBad === Set(30L),
      "doc grain drops doc 30 entirely — the data q93 saves")
  }

  test("q96 curation v3 on a planted corpus: the surgical chain keeps a " +
      "partially-plagiarized doc's clean chunks where v2 burns the doc, " +
      "packs respect the budget, and reruns agree (r16)") {
    // doc 30: chunk 0 = eval doc 0's text verbatim, chunks 1-2 clean
    // filler; doc 31: unrelated filler (DISTINCT from doc 30's, so the
    // shared near-dup election stage does not cluster them)
    val evalToks = (1 to 64).map(i => s"bench${i}tok").mkString(" ")
    val clean = (1 to 128).map(i => s"clean${i}tok").mkString(" ")
    val other = (1 to 128).map(i => s"other${i}tok").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("surgical_v3").toString
    Seq(
      (0L, evalToks, "en", "web", 0L),
      (30L, s"$evalToks $clean", "en", "web", 0L),
      (31L, other, "en", "web", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def run() = graft.SparkEntry.queries("q96_curation_surgical")(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(t => (t._1, t._2))
    val manifest = run()
    // the plagiarized chunk (30, 0) is gone; every clean chunk survives
    assert(manifest.map(t => (t._1, t._2)).toSeq ===
      Seq((30L, 1L), (30L, 2L), (31L, 0L), (31L, 1L)))
    // tokens-saved vs the doc-grain chain: v2 burns doc 30 whole (its
    // eval containment is 1.0), so v3 rescues exactly its clean chunks
    val v2Survivors = graft.SparkEntry.queries("q90_curation_quality")(spark, dir)
      .select($"doc_id").as[Long].collect().toSet
    assert(v2Survivors === Set(31L))
    val savedTokens = manifest.filter(_._1 == 30L).map(_._3).sum
    assert(savedTokens === 128L)
    // pack discipline: a pack never exceeds budget + one overflow chunk
    manifest.groupBy(_._5).foreach { case (_, rows) =>
      assert(rows.map(_._3).sum <= 2048L + 64L)
    }
    // deterministic end to end
    assert(run() === manifest)
  }

  test("q96 bridge windows catch a chunk-boundary straddle: an implant " +
      "split 24/24 across two 64-token chunks leaves both under the 0.5 " +
      "chunk ratio, but lies whole inside the stride-32 bridge — both " +
      "halves burn, the clean tail survives (r17)") {
    // eval doc 0: 64 distinct tokens; doc 32 embeds a 48-token CONTIGUOUS
    // interior slice (eval tokens 9..56) at position 41 — chunk 0 gets
    // implant tokens 41..64 (24), chunk 1 gets 65..88 (24): each chunk's
    // eval-shingle ratio is 22/62 ≈ 0.355, the exact r16 miss. Bridge
    // w=1 covers tokens 33..96 ⊇ the whole implant: 46/62 ≈ 0.742 fires.
    val evalToks = (1 to 64).map(i => s"bench${i}tok")
    val implant = evalToks.slice(8, 56) // tokens 9..56, 48 of them
    val filler = (1 to 144).map(i => s"extra${i}tok")
    val straddler = (filler.take(40) ++ implant ++ filler.drop(40)).mkString(" ")
    val control = (1 to 128).map(i => s"other${i}tok").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("surgical_straddle").toString
    Seq(
      (0L, evalToks.mkString(" "), "en", "web", 0L),
      (32L, straddler, "en", "web", 0L),
      (33L, control, "en", "web", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val manifest = graft.SparkEntry.queries("q96_curation_surgical")(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(t => (t._1, t._2))
    // chunks 0 and 1 of the straddler burn via the bridge; its clean
    // chunk 2 and the control doc's chunks survive untouched
    assert(manifest.map(t => (t._1, t._2)).toSeq ===
      Seq((32L, 2L), (33L, 0L), (33L, 1L)))
  }

  test("q92 curriculum order: anneal set nests in epoch 1, global ranks " +
      "are an exact 1..n permutation, the fresh salt decorrelates the " +
      "two epochs' orders, and reruns agree row-for-row (r15)") {
    val dir = "/root/testdata/sf0.01"
    def run() = graft.SparkEntry.queries("q92_curriculum_order")(spark, dir)
      .as[(Long, Long, Long, Long)].collect().sortBy(t => (t._3, t._4))
    val rows = run()
    val (ep1, ep2) = rows.partition(_._3 == 1L)
    assert(ep1.nonEmpty && ep2.nonEmpty, "both epochs must be exercised")
    // the anneal slice is a strict, criterion-exact subset of epoch 1
    assert(ep2.map(_._1).toSet.subsetOf(ep1.map(_._1).toSet))
    assert(ep2.forall(_._2 >= 60) && ep2.length < ep1.length)
    assert(ep1.filter(_._2 >= 60).map(_._1).toSet === ep2.map(_._1).toSet,
      "epoch 2 is exactly the >= 60-token survivors, nothing dropped")
    // global order: epoch 1 is 1..n1, epoch 2 continues to n1+n2
    assert(ep1.map(_._4).sorted === (1L to ep1.length.toLong))
    assert(ep2.map(_._4).sorted ===
      ((ep1.length + 1).toLong to (ep1.length + ep2.length).toLong))
    // fresh salt: the shared docs must NOT replay epoch 1's relative
    // order (a reused salt would — the correlated-curriculum hazard)
    val order1 = ep1.filter(_._2 >= 60).sortBy(_._4).map(_._1).toSeq
    val order2 = ep2.sortBy(_._4).map(_._1).toSeq
    assert(order1 !== order2, "anneal pass must reshuffle, not replay")
    // retry-determinism across independent plans
    assert(run().toSeq === rows.toSeq)
  }
}
