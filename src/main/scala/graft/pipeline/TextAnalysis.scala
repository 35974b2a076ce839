package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * tokenization, quality scoring, language-ID heuristics, token counting.
  * Everything is built from codegen'd built-ins (no UDFs) so the hot path
  * stays inside whole-stage codegen and scales linearly with input — these
  * run per-document with no shuffle at all until a caller aggregates.
  */
object TextAnalysis {

  /** Whitespace tokens (the baseline tokenizer). DELIBERATE boundary
    * semantics, shared verbatim by every DuckDB oracle
    * (`regexp_split_to_array(text, '\s+')`): leading whitespace yields a
    * leading "" token and empty text yields [""] — so token counts over
    * un-scrubbed text include those boundary empties IN BOTH ENGINES.
    * The pipeline answer is ordering, not a special case here: [[scrub]]
    * normalizes whitespace upstream, after which the split is exact.
    * Changing this unilaterally would silently break every text oracle
    * and the persisted BM25 indexes' stored dl/df. */
  def tokens(text: Column): Column = split(text, "\\s+")

  /** BPE-ish regex token count: letter runs, digit runs, and single
    * punctuation marks each count as one token. */
  def regexTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")).cast("long")

  /** Deterministic 60-bit content hash usable identically from DuckDB
    * (`CAST('0x' || substr(md5(x),1,15) AS BIGINT)`): the cross-engine
    * hash used by dedup/minhash oracles. Backed by the fused codegen'd
    * [[graft.functions.Md5Hash60]] expression (bit-identical to
    * `conv(substring(md5(c),1,15),16,10)`). In a pure-Spark deployment,
    * `xxhash64` is the faster drop-in. */
  def md5Hash60(c: Column): Column =
    graft.functions.Md5Hash60.md5_hash60(c)

  /** Quality-score feature columns over a `text` column. All ratios are
    * exact-integer-derived doubles (deterministic across engines).
    * `avg_token_len`'s (length − nTok + 1)/nTok closed form assumes
    * single-space separators — exact on scrubbed text, overstated on raw
    * whitespace runs; the oracle mirrors the same formula, so the pair
    * stays engine-identical either way (scrub first for the exact
    * number). */
  def qualityFeatures(text: Column): Seq[(String, Column)] = {
    val toks = tokens(text)
    val nTok = size(toks).cast("long")
    Seq(
      "n_chars_computed" -> length(text).cast("long"),
      "n_tokens" -> nTok,
      "n_regex_tokens" -> regexTokenCount(text),
      "avg_token_len" -> round((length(text) - nTok + 1) / nTok.cast("double"), 8),
      "stopword_ratio" -> round(
        size(filter(toks, t => t.isin(Stopwords: _*))).cast("double") / nTok, 8),
      "short_token_ratio" -> round(
        size(filter(toks, t => length(t) <= 2)).cast("double") / nTok, 8))
  }

  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  /** Language-ID heuristic: marker-token counts per candidate language,
    * argmax with a deterministic tiebreak (alphabetical), 'und' when no
    * marker hits. N-gram-frequency models slot in the same shape. */
  def langIdScores(text: Column): Seq[(String, Column)] = Seq(
    "c_en" -> (regexp_count(text, lit("\\bthe\\b")) + regexp_count(text, lit("\\ba\\b"))),
    "c_de" -> (regexp_count(text, lit("\\bder\\b")) + regexp_count(text, lit("\\bdie\\b"))),
    "c_fr" -> (regexp_count(text, lit("\\ble\\b")) + regexp_count(text, lit("\\bla\\b"))),
    "c_es" -> (regexp_count(text, lit("\\bel\\b")) + regexp_count(text, lit("\\blos\\b"))))

  def predictedLang(cEn: Column, cDe: Column, cFr: Column, cEs: Column): Column = {
    val top = greatest(cEn, cDe, cFr, cEs)
    // null counts (null text): every three-valued `when` below evaluates
    // to null and falls through — without the explicit guard a null
    // document lands in the otherwise() and is confidently labeled 'fr'
    when(top.isNull || top === 0, lit("und"))
      .when(cDe === top, lit("de"))
      .when(cEn === top, lit("en"))
      .when(cEs === top, lit("es"))
      .otherwise(lit("fr"))
  }

  /** Word n-gram shingles (default 3) as a DISTINCT exploded relation
    * `(doc_id, shingle)` — the substrate for Jaccard/MinHash dedup.
    * Requires `docs(doc_id, text)`.
    *
    * Dedup is `array_distinct` WITHIN each document's shingle array
    * before the explode: since `doc_id` is part of the relation's key,
    * per-doc distinct equals relation-level distinct — but it runs
    * narrow inside the scan stage, where a `.distinct()` after the
    * explode would hash-shuffle the whole exploded corpus (the largest
    * relation in the dedup pipeline) once per consumer. */
  def shingles(docs: DataFrame, n: Int = 3): DataFrame = {
    val w = tokens(col("text"))
    docs
      .select(col("doc_id"), w.as("w"))
      .filter(size(col("w")) >= n)
      .select(col("doc_id"), explode(array_distinct(
        transform(sequence(lit(1), size(col("w")) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(o => element_at(col("w"), i + o)): _*))))
        .as("shingle"))
  }

  /** Training-data text scrub: strip URLs and emails, collapse repeated
    * whitespace, trim — the standard cleaning pass before tokenization.
    * Pure regexp_replace chain (codegen'd, no UDF). */
  def scrub(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(text, lit("https?://\\S+"), lit(" ")),
        lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"), lit(" ")),
      lit("\\s+"), lit(" ")))

  /** PII redaction for training corpora: replace emails, IPv4 addresses
    * and long digit runs (phone/account-number shaped) with TYPED
    * placeholder tokens — a training pipeline wants `<EMAIL>` markers
    * that preserve sentence structure, where [[scrub]] deletes — plus
    * per-document match counts for the privacy audit trail. Each count
    * is taken on the text AS THE MATCHING STAGE SEES IT (n_ips on the
    * email-redacted text, n_long_nums on the email+ip-redacted text),
    * so counts equal replacements BY CONSTRUCTION — counting on the
    * original over-reports whenever an earlier stage consumes a later
    * pattern's match (a 7-digit local part inside an email counts as a
    * long number but is never replaced as one). Email runs first; its
    * domain needs an alphabetic TLD, so it can never consume an IP, and
    * the placeholders contain no digits for later patterns to re-match.
    * Pure per-row codegen'd regex work, zero shuffle; the patterns are
    * RE2-compatible so an oracle applies them verbatim. */
  def redactPii(text: Column): Seq[(String, Column)] = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ipv4 = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    val longNum = "\\b\\d{7,}\\b"
    val afterEmail = regexp_replace(text, lit(email), lit("<EMAIL>"))
    val afterIp = regexp_replace(afterEmail, lit(ipv4), lit("<IP>"))
    Seq(
      "redacted" -> regexp_replace(afterIp, lit(longNum), lit("<NUM>")),
      "n_emails" -> regexp_count(text, lit(email)).cast("long"),
      "n_ips" -> regexp_count(afterEmail, lit(ipv4)).cast("long"),
      "n_long_nums" -> regexp_count(afterIp, lit(longNum)).cast("long"))
  }

  /** Composite quality gate: keep documents whose features clear the
    * given thresholds — the filter stage of a cleaning pipeline. */
  def qualityFilter(docs: DataFrame, minTokens: Long = 20,
                    maxStopwordRatio: Double = 0.5,
                    maxShortTokenRatio: Double = 0.6): DataFrame = {
    val withFeatures = qualityFeatures(col("text"))
      .foldLeft(docs) { case (df, (n, c)) => df.withColumn(n, c) }
    withFeatures
      .filter(col("n_tokens") >= minTokens &&
        col("stopword_ratio") <= maxStopwordRatio &&
        col("short_token_ratio") <= maxShortTokenRatio)
  }

  /** `shingles` with each shingle replaced by its 60-bit hash — the
    * substrate the dedup joins actually run on: equality joins and
    * minhashing over 8-byte longs instead of ~25-byte strings cut shuffle
    * width, and the hash is computed exactly once per (doc, shingle). */
  def hashedShingles(docs: DataFrame, n: Int = 3): DataFrame =
    shingles(docs, n).select(col("doc_id"), md5Hash60(col("shingle")).as("h"))

  /** Sketch-based corpus statistics per `group`: approximate distinct
    * documents/tokens (HyperLogLog++, `rsd` relative error) and length
    * quantiles (Greenwald-Khanna sketch). At 100 TB these are THE way to
    * profile a corpus — exact distincts shuffle every value, sketches
    * shuffle a few KB per partition and merge associatively. Accuracy vs
    * the exact aggregation is asserted in TextAnalysisSpec; no DuckDB
    * oracle (sketch implementations differ across engines by design). */
  def corpusSketch(docs: DataFrame, group: String, rsd: Double = 0.02): DataFrame = {
    // doc-grain and token-grain sketches aggregate separately (an explode
    // before the quantile would weight each document by its token count),
    // then join on the tiny group key. Quantiles come out as scalar
    // columns (len_p50/p90/p99), not one array — downstream consumers
    // (and the driver's rows-check) sort and compare scalars.
    val q = percentile_approx(length(col("text")).cast("double"),
      array(lit(0.5), lit(0.9), lit(0.99)), lit(10000))
    val docStats = docs.groupBy(col(group)).agg(
      approx_count_distinct(col("doc_id"), rsd).as("approx_docs"),
      q.getItem(0).as("len_p50"),
      q.getItem(1).as("len_p90"),
      q.getItem(2).as("len_p99"))
    val tokStats = docs
      .select(col(group), explode(tokens(col("text"))).as("tok"))
      .groupBy(col(group))
      .agg(approx_count_distinct(col("tok"), rsd).as("approx_distinct_tokens"))
    // null-safe equality: both aggregations emit a null-group row for
    // null-keyed docs, and a plain equi-join would drop exactly that
    // cohort (null never equals null) — often the one a curation audit
    // cares about most
    docStats.join(tokStats.withColumnRenamed(group, "__g"),
        docStats(group) <=> col("__g"))
      .drop("__g")
  }

  /** EXACT corpus profile per `group` — the oracle-checkable counterpart
    * of [[corpusSketch]] (same row grain, same null-safe group join):
    * exact distinct documents/tokens and exact interpolated length
    * percentiles (`percentile`, the standard `p·(n−1)` linear
    * interpolation DuckDB's `quantile_cont` shares; rounded to 6 dp so
    * the cross-engine comparison is ulp-robust). At 100 TB this is the
    * audit face you run on a SAMPLE or a single shard — the exact
    * distincts shuffle every value and the exact percentile collects
    * per-group value multisets — while [[corpusSketch]] is the full-
    * corpus face whose sketches shuffle KBs. Keeping both faces behind
    * one shape lets a profiling job swap exactness for scale without
    * changing consumers. */
  def corpusExact(docs: DataFrame, group: String): DataFrame = {
    val q = percentile(length(col("text")).cast("double"),
      array(lit(0.5), lit(0.9), lit(0.99)))
    val docStats = docs.groupBy(col(group)).agg(
      countDistinct(col("doc_id")).as("n_docs"),
      round(q.getItem(0), 6).as("len_p50"),
      round(q.getItem(1), 6).as("len_p90"),
      round(q.getItem(2), 6).as("len_p99"))
    val tokStats = docs
      .select(col(group), explode(tokens(col("text"))).as("tok"))
      .groupBy(col(group))
      .agg(countDistinct(col("tok")).as("n_distinct_tokens"))
    docStats.join(tokStats.withColumnRenamed(group, "__g"),
        docStats(group) <=> col("__g"))
      .drop("__g")
  }

  /** TF-IDF keyword extraction: top-`k` terms per document by
    * `tf · ln((N+1)/(df+1))` (smoothed idf), deterministic tiebreak on
    * the term. Shuffle profile: one (doc_id, term) aggregation for TF,
    * one term aggregation for DF (narrow counts — term strings shuffle
    * once each), a broadcast of the tiny DF relation back onto TF, and a
    * rank-limit window per doc. Scores round to 6 dp so the ranking (and
    * the DuckDB differential) is stable across libm ulp differences in
    * `ln`. */
  def tfidfTopTerms(docs: DataFrame, k: Int): DataFrame = {
    val tok = docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val tf = tok.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.select(countDistinct(col("doc_id")).as("n_docs"))
    val scored = tf
      .join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf") * log((col("n_docs") + 1) / (col("df") + 1)), 6))
    graft.operators.CoreOps.topKPerGroup(scored,
        Seq(col("doc_id")), Seq(col("tfidf").desc, col("term")), k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("tfidf"), col("rn").cast("long").as("rank"))
  }

  /** PER-DOC snapshot diff between two corpus versions — the id-grain
    * verdict relation that DRIVES a crawl refresh: one row per doc id
    * present in either snapshot, `status` ∈ new (id only in `cur`) /
    * removed (id only in `prev`) / changed (id in both, content hash
    * differs) / same. [[corpusDiff]] is the report face over this
    * relation; an incremental refresh routes `new`/`changed` rows into
    * the ingest stores and `removed` rows into retirement (q95).
    *
    * Content compares by 60-bit hash computed AT THE SCAN, so only
    * (id, 8-byte hash[, group]) ever shuffles — never the bodies —
    * through ONE full-outer id join; the scale shape of exact dedup.
    * The hash bound is the contract a per-row consumer inherits: a
    * changed doc reads `same` at ~2⁻⁶⁰ per pair — the right trade for
    * refresh routing (a missed re-ingest of one near-identical doc),
    * documented here because this face acts PER ROW where the count
    * report only mis-tallies. Hash equality is NULL-SAFE (`<=>`): a
    * null body on both sides is SAME, null vs text is CHANGED — a crawl
    * that nulls a body out is a change, not a phantom add/remove.
    *
    * CONTRACT (caller-vouched, the [[Sampling.repeatByWeight]]-style
    * convention): `idCol` is DISTINCT within each snapshot. A duplicate
    * id on either side fans the full-outer join out and every duplicate
    * pair double-counts downstream — silently, because the join itself
    * is shape-valid, and dangerously now that this relation DRIVES
    * retirement + re-ingest (a fanned `new`+`changed` pair double-
    * ingests). Crawl snapshots are keyed by id at write time; a source
    * that can re-emit ids must `dropDuplicates(idCol)` first. With
    * `spark.graft.store.debugChecks=true` (the store modules' opt-in
    * gate) the vouch is ENFORCED — each snapshot is scanned for
    * duplicate ids before the join, failing fast at the call site;
    * spec/staging cost, like every other armed contract here. */
  def docStatus(cur: DataFrame, prev: DataFrame, idCol: String,
                contentCol: String, groupCol: Option[String]): DataFrame = {
    if (graft.sources.KeyedParquetStore.debugChecksOn(cur.sparkSession)) {
      def refuseDups(df: DataFrame, side: String): Unit = {
        val dups = df.groupBy(col(idCol)).agg(count(lit(1)).as("__n"))
          .filter(col("__n") > 1).select(col(idCol)).limit(3)
          .collect().map(_.get(0))
        require(dups.isEmpty,
          s"docStatus precondition violated: $side snapshot holds duplicate " +
            s"$idCol(s) ${dups.mkString(", ")} — duplicates fan the full-outer " +
            "join out and a refresh driven by this relation would retire or " +
            s"ingest those docs twice; dropDuplicates(\"$idCol\") upstream")
      }
      refuseDups(cur, "cur")
      refuseDups(prev, "prev")
    }
    def side(df: DataFrame, h: String, g: String, p: String): DataFrame =
      df.select(Seq(col(idCol).as("__id"),
        md5Hash60(col(contentCol)).as(h), lit(1).as(p)) ++
        groupCol.map(gc => col(gc).as(g)): _*)
    val statusCol = when(col("__pp").isNull, "new")
      .when(col("__pc").isNull, "removed")
      .when(col("__hc") <=> col("__hp"), "same")
      .otherwise("changed").as("status")
    val joined = side(cur, "__hc", "__gc", "__pc")
      .join(side(prev, "__hp", "__gp", "__pp"), Seq("__id"), "full_outer")
    // Group label comes from the surviving side (cur wins when both).
    if (groupCol.isDefined)
      joined.select(col("__id").as(idCol),
        coalesce(col("__gc"), col("__gp")).as("grp"), statusCol)
    else joined.select(col("__id").as(idCol), statusCol)
  }

  /** Snapshot DIFF report between two corpus versions — the crawl-refresh
    * question ("what changed since the last dump?") answered per `group`:
    * how many docs are NEW / REMOVED / CHANGED / SAME. The counts face
    * over [[docStatus]] (which carries the shuffle shape, the null-safe
    * hash-equality semantics, the 60-bit collision bound, and the
    * distinct-id-per-snapshot contract): the id-grain statuses collapse
    * through one KB-sized group agg. */
  def corpusDiff(cur: DataFrame, prev: DataFrame, idCol: String,
                 contentCol: String, groupCol: String): DataFrame =
    docStatus(cur, prev, idCol, contentCol, Some(groupCol))
      .groupBy(col("grp"))
      .agg(
        sum(when(col("status") === "new", 1L).otherwise(0L)).as("n_new"),
        sum(when(col("status") === "removed", 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("status") === "changed", 1L).otherwise(0L)).as("n_changed"),
        sum(when(col("status") === "same", 1L).otherwise(0L)).as("n_same"))

  /** BM25 keyword search: rank documents for a bag-of-words query by
    * `Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))` with
    * `idf = ln(1 + (N−df+0.5)/(df+0.5))` — the retrieval face of the
    * text-analysis surface (corpus curation: "find documents about X").
    *
    * Shuffle profile at 100 TB: tokens are FILTERED to the query's terms
    * inside the scan stage, so the (doc, term) aggregation exchanges only
    * matching postings; df and the corpus scalars (N, avg length) are
    * KB-sized broadcasts; the final top-k is a TakeOrderedAndProject.
    * Per-term scores round to 6 dp and sum through DECIMAL so the
    * cross-engine ranking is bit-stable — a raw double sum would depend
    * on term arrival order. */
  /** The BM25 per-(doc, term) score — shared by the single-query and
    * batch retrieval faces so the formula can't drift between them.
    * Expects columns `tf`, `df`, `dl`, `n_docs`, `avgdl`; rounds to 6 dp
    * so the downstream DECIMAL sum is order-stable cross-engine. */
  private def bm25ScoreExpr(k1: Double, b: Double): Column =
    round(log(lit(1) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
      * col("tf") * lit(k1 + 1)
      / (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))), 6)

  /** Per-(doc, term) BM25 scores for every term the `keep` filter admits —
    * the shared body of [[bm25Search]] and [[bm25SearchMany]]. */
  private def bm25Scored(docs: DataFrame, keep: DataFrame => DataFrame,
                         k1: Double, b: Double): DataFrame = {
    val lens = docs.select(col("doc_id"), size(tokens(col("text"))).cast("long").as("dl"))
    val stats = lens.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val tf = keep(docs.select(col("doc_id"), explode(tokens(col("text"))).as("term")))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), Seq("term"))
      .join(lens, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("score", bm25ScoreExpr(k1, b))
  }

  def bm25Search(docs: DataFrame, query: Seq[String], k: Int,
                 k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25Scored(docs, _.filter(col("term").isin(query: _*)), k1, b)
      .groupBy(col("doc_id"))
      .agg(sum(col("score").cast(org.apache.spark.sql.types.DecimalType(30, 6)))
        .cast("double").as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)

  /** BATCH retrieval: score MANY bag-of-words queries in one pass —
    * `queries` is a `(query_id, term)` relation (the real retrieval
    * workload: a benchmark's question set, a dedup probe list), and the
    * result is each query's top-k documents with a rank.
    *
    * One corpus scan serves every query: the token explode is semi-joined
    * against the broadcast term VOCABULARY of all queries (only matching
    * postings ever aggregate), scores compute once per (doc, term), and
    * the per-query fan-out joins the KB-sized query relation afterwards —
    * adding a query adds one broadcast row, not a corpus scan. Top-k per
    * query rides the rank-limit window ([[graft.operators.CoreOps
    * .topKPerGroup]] — WindowGroupLimit prunes map-side). */
  def bm25SearchMany(docs: DataFrame, queries: DataFrame, k: Int,
                     k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val vocab = queries.select(col("term")).distinct()
    // distinct: a natural-language query tokenized with repeats ("to be
    // or to be") must score each term once, as bm25Search's isin does —
    // a non-distinct fan-out join would sum duplicated terms twice and
    // the two faces would rank differently for the same query
    val perQuery = bm25Scored(docs, _.join(broadcast(vocab), Seq("term"), "left_semi"), k1, b)
      .join(broadcast(queries.select(col("query_id"), col("term")).distinct()),
        Seq("term"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("score").cast(org.apache.spark.sql.types.DecimalType(30, 6)))
        .cast("double").as("bm25"))
    graft.operators.CoreOps.topKPerGroup(perQuery,
        Seq(col("query_id")), Seq(col("bm25").desc, col("doc_id")), k)
      .select(col("query_id"), col("doc_id"), col("bm25"),
        col("rn").cast("long").as("rank"))
  }

  /** The persisted BM25 index's three relations — the build half of the
    * retrieval production shape ([[bm25Search]]/[[bm25SearchMany]]
    * re-tokenize the corpus on every call; a deployment tokenizes ONCE):
    *
    *  - postings `(term, doc_id, tf, dl, tbucket)` — doc length
    *    DENORMALIZED onto each posting so search never reads a
    *    corpus-sized lengths table;
    *  - terms `(term, df, tbucket)` — per-term document frequency;
    *  - stats `(k, n_docs, avgdl)` — one corpus-stats row (constant
    *    join key `k` so the keyed store can upsert it).
    *
    * `tbucket` is a deterministic md5 term bucket (`Sampling.bucket mod
    * nBuckets`): stored PARTITIONED BY it, a query's terms resolve to
    * bucket ids ON THE DRIVER ([[bm25TermBucket]]) and the search scan
    * prunes to those partition directories — per-query I/O is the query
    * terms' postings, not the index (the same literal-IN pruning shape
    * as the stored IVF search). All quantities are global, so search
    * results are IDENTICAL to [[bm25Search]] over the same corpus. */
  def bm25IndexRelations(docs: DataFrame, nBuckets: Int = 16)
      : (DataFrame, DataFrame, DataFrame) = {
    val lens = docs.select(col("doc_id"), size(tokens(col("text"))).cast("long").as("dl"))
    val stats = lens.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
      .withColumn("k", lit(1))
    val tf = docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val tb = pmod(Sampling.bucket(col("term"), "bm25"), lit(nBuckets)).cast("int")
    val postings = tf.join(lens, Seq("doc_id")).withColumn("tbucket", tb)
    val terms = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .withColumn("tbucket", tb)
    (postings, terms, stats)
  }

  /** Driver-side mirror of the postings partition bucket: the same
    * md5-derived arithmetic as `Sampling.bucket` (first 15 md5 hex chars
    * of `term_bm25` as a 60-bit integer, mod 10⁴, mod `nBuckets`), so a
    * query's literal terms map to partition directories without touching
    * the cluster. */
  def bm25TermBucket(term: String, nBuckets: Int): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${term}_bm25".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    ((java.lang.Long.parseLong(hex, 16) % 10000L) % nBuckets).toInt
  }

  /** Search the PERSISTED index: postings/terms relations (as stored by
    * the keyed store from [[bm25IndexRelations]], partitioned by
    * `tbucket`) + the one-row stats relation. The caller pre-filters
    * `postings`/`terms` to the query's term buckets (a literal partition
    * filter — see [[bm25TermBucket]]); this narrows to the exact terms,
    * scores with the SAME expression as [[bm25Search]], and top-ks.
    * No tokenize, no corpus scan — the per-query cost is the query
    * terms' postings lists. */
  def bm25SearchStored(postings: DataFrame, terms: DataFrame, stats: DataFrame,
                       query: Seq[String], k: Int,
                       k1: Double = 1.2, b: Double = 0.75): DataFrame =
    postings.filter(col("term").isin(query: _*))
      .join(broadcast(terms.filter(col("term").isin(query: _*))
        .select(col("term"), col("df"))), Seq("term"))
      .crossJoin(broadcast(stats.select(col("n_docs"), col("avgdl"))))
      .withColumn("score", bm25ScoreExpr(k1, b))
      .groupBy(col("doc_id"))
      .agg(sum(col("score").cast(org.apache.spark.sql.types.DecimalType(30, 6)))
        .cast("double").as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)

  /** Gopher-style repetition signals per document: duplicate-token
    * fraction, duplicate-bigram fraction (what share of bigram
    * OCCURRENCES are repeats), and top-bigram fraction (how much of the
    * document the single most frequent bigram covers) — the standard
    * filters for boilerplate / degenerate-generation text in a training
    * corpus (Rae et al. 2021, "Scaling Language Models", table A1).
    *
    * Shape: ONE explode per grain (token, bigram) feeding a two-level
    * aggregation — `(doc_id, term) → count` then `doc_id → (Σc, #rows,
    * max c)` — so every exchange carries narrow count rows with map-side
    * partial aggregation, never token arrays or text, and the final join
    * stitches two per-doc scalar relations. (A first cut computed the
    * fractions array-locally with `array_distinct` and joined the
    * array-carrying relation against the top-bigram agg: re-evaluating
    * the bigram-construction lambda across project/join boundaries made
    * it the bench's worst query at 13 s on 50k docs — this shape is ~10×
    * cheaper and is also the one that survives docs too long for one
    * row's array.) Fractions are int/int IEEE divisions — bit-identical
    * across engines, no rounding needed. Documents shorter than two
    * tokens get NULL bigram fractions. NULL-text documents DROP from the
    * output entirely (the q29/q62 derived-signal convention): the
    * exploded token aggregation has no rows to group for them, and a
    * repetition fraction of nothing is undefined — consumers that need
    * every doc row should left-join this relation back. */
  def repetitionSignals(docs: DataFrame): DataFrame = {
    def stats(exploded: DataFrame, p: String): DataFrame =
      exploded.groupBy(col("doc_id"), col("x")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id")).agg(
          sum(col("c")).as(s"${p}_n"),     // total occurrences
          count(lit(1)).as(s"${p}_d"),     // distinct terms
          max(col("c")).as(s"${p}_top"))   // top term multiplicity
    val tok = stats(
      docs.select(col("doc_id"), explode(tokens(col("text"))).as("x")), "tok")
    val bg = stats(
      docs.withColumn("t", tokens(col("text")))
        .filter(size(col("t")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(t) - 1), " +
            "i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))")).as("x")),
      "bg")
    tok.join(bg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        col("tok_n").cast("long").as("n_tokens"),
        ((col("tok_n") - col("tok_d")).cast("double") / col("tok_n"))
          .as("dup_token_frac"),
        ((col("bg_n") - col("bg_d")).cast("double") / col("bg_n"))
          .as("dup_bigram_frac"),
        (col("bg_top").cast("double") / col("bg_n")).as("top_bigram_frac"))
  }

  /** CCNet-style unigram language-model quality score per document: the
    * corpus's OWN unigram distribution scores each document by its mean
    * per-token negative log-probability — low = ordinary fluent text,
    * high = rare-token soup (noise, mojibake, degenerate generations).
    * The standard corpus-statistical quality filter (Wenzek et al. 2020,
    * "CCNet: Extracting High Quality Monolingual Datasets"),
    * complementing [[qualityFeatures]]' per-document heuristics with a
    * signal computed FROM the corpus itself. Returns
    * `(doc_id, n_tokens, avg_neg_logp)`.
    *
    * Shape at 100 TB: a two-level token aggregation — (doc, term) counts
    * first, with map-side combine collapsing each doc's repeats, then the
    * (term, tf) vocabulary — so every exchange carries narrow count rows,
    * never text. The corpus total is a scalar broadcast (q10's
    * ratio-to-total shape) and the per-term log-probability table
    * BROADCASTS back onto the (doc, term) relation: a Zipf vocabulary is
    * MBs where its corpus is TBs (a deployment caps it with a min-count
    * cutoff + an OOV floor probability, same contract), and the broadcast
    * sidesteps the stopword skew a shuffle join on term would hit —
    * every document contains "the". Per-term contributions round to 6 dp
    * and sum through DECIMAL (order-insensitive — the q54 trick), so the
    * score is bit-identical across engines and partitionings. The final
    * per-document mean is rounded to 6 dp in INTEGER micro-units
    * (`(2·s_micro + n) div (2·n)`, half-up for the all-positive scores)
    * rather than by `round(s/n, 6)` on a double: the sum s has exactly
    * 6 dp, so s/n can land EXACTLY on a half-way tie (observed at the
    * 10× corpus: 125.523827/22 = 5.7056285 precisely), where
    * double-based round is engine-dependent — the nearest double sits
    * below the tie, and an engine rounding that double's decimal form
    * (Spark's BigDecimal path) answers …28 while one rounding
    * `x·10⁶` in floats (DuckDB) answers …29. Integer arithmetic on the
    * exact micro-units is tie-deterministic and, away from ties, equals
    * the old result bit-for-bit. */
  def unigramLogProb(docs: DataFrame): DataFrame = {
    val tf = docs.select(col("doc_id"), explode(tokens(col("text"))).as("t"))
      .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("c"))
    val vocab = tf.groupBy(col("t")).agg(sum(col("c")).as("tf"))
    val total = vocab.agg(sum(col("tf")).as("n"))
    val lp = vocab.crossJoin(broadcast(total))
      .select(col("t"), round(-log(col("tf") / col("n")), 6).as("neg_logp"))
    tf.join(broadcast(lp), Seq("t"))
      .groupBy(col("doc_id"))
      .agg(sum(round(col("c") * col("neg_logp"), 6)
          .cast(org.apache.spark.sql.types.DecimalType(30, 6))).as("sd"),
        sum(col("c")).as("n_tokens"))
      .withColumn("s_micro", (col("sd") * lit(1000000)).cast("long"))
      .select(col("doc_id"), col("n_tokens"),
        (expr("(2 * s_micro + n_tokens) div (2 * n_tokens)") / lit(1000000.0))
          .as("avg_neg_logp"))
  }

  /** Split documents into fixed-size token windows with overlap — the
    * context-window chunking step between curation and training (and the
    * unit RAG retrieval indexes). Chunk k of a doc covers tokens
    * `[k·stride, k·stride + maxTokens)` with `stride = maxTokens −
    * overlap`; the last chunk may be shorter, and a tail already fully
    * contained in the previous chunk is not emitted
    * (`nChunks = max(1, ceil((n − overlap) / stride))`). Blank documents
    * produce no chunks (filtered on trimmed text, not token count —
    * `split` returns `[""]` for an empty string in Spark AND DuckDB, so a
    * token-count filter would silently keep them).
    *
    * Pure per-row compute: tokenize → `sequence` → `posexplode` → `slice`,
    * all codegen'd built-ins — no shuffle at any point, so it scales as a
    * map over the corpus. Emitted (doc_id, chunk_id) pairs are
    * deterministic, so downstream splits/packs key on them stably. */
  def chunkDocuments(docs: DataFrame, maxTokens: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && maxTokens > overlap, "need maxTokens > overlap >= 0")
    val stride = maxTokens - overlap
    def chunk(t: Column, k: Column): Column =
      slice(t, k.cast("int") * stride + 1, lit(maxTokens))
    docs
      .filter(trim(col("text")) =!= "")
      .withColumn("t", tokens(col("text")))
      .withColumn("nc", greatest(lit(1L),
        ceil((size(col("t")) - lit(overlap)).cast("double") / stride).cast("long")))
      .select(col("doc_id"), col("t"),
        posexplode(expr("sequence(0L, nc - 1)")).as(Seq("pos", "k")))
      .select(col("doc_id"), col("k").as("chunk_id"),
        array_join(chunk(col("t"), col("k")), " ").as("chunk_text"),
        size(chunk(col("t"), col("k"))).cast("long").as("n_chunk_tokens"))
  }

  /** Non-overlapping fixed-size token segments of a document, as an
    * in-row array — the "paragraph"/"line" grain for segment-level dedup
    * on single-line corpora (a corpus with real newlines would split on
    * those instead; the downstream operators are grain-agnostic).
    * Segment i covers tokens `[i·segTokens, (i+1)·segTokens)`; the last
    * segment may be shorter. Every doc yields ≥1 segment (`split` never
    * returns an empty array), so `sequence(0, ceil(n/segTokens)-1)` is
    * well-formed. Pure codegen'd per-row compute — no shuffle. */
  def segments(text: Column, segTokens: Int): Column = {
    require(segTokens > 0, "need segTokens > 0")
    // The token array is bound ONCE per row via the one-element-transform
    // binding (Similarity.bindOnce's idiom): naming `tokens(text)` inside
    // the per-segment lambda inlines the whole split per SEGMENT, making
    // segmentation O(n²/segTokens) in doc length. Invisible on uniform
    // corpora (docs ~65 tokens); on the r11 skewed corpus's Zipf length
    // tail (1% of docs ×64 tokens) it blew q66 up 5.7 s → 153 s at sf1 —
    // this binding returns it to linear.
    element_at(transform(array(tokens(text)), t =>
      transform(
        sequence(lit(0), (ceil(size(t).cast("double") / segTokens)).cast("int") - 1),
        i => array_join(slice(t, i * segTokens + 1, lit(segTokens)), " "))), 1)
  }

  /** Rolling-hash document fingerprint: min / max / count over the shingle
    * hashes — a compact signature for shard-level pre-clustering. Runs on
    * `hashedShingles` so the hash is computed once per shingle (separate
    * agg expressions would defeat common-subexpression elimination).
    * Documents shorter than `n` tokens shingle to nothing and emit NO
    * row — the same absent-from-the-relation verdict the dedup paths
    * give them (they never pair); a consumer needing every doc present
    * left-joins and treats null as "too short to fingerprint". */
  def fingerprint(docs: DataFrame, n: Int = 4): DataFrame =
    hashedShingles(docs, n)
      .groupBy(col("doc_id"))
      .agg(
        min(col("h")).as("fp_min"),
        max(col("h")).as("fp_max"),
        count(lit(1)).as("n_shingles"))
}
