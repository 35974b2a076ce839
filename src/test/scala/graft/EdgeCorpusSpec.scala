package graft

/** The r13 edge-corpus robustness gate, pinned at unit-test speed: the
  * FULL registry must be well-defined on the degenerate corpus shapes a
  * 100 TB deployment produces at the margins — an EMPTY corpus (a
  * first-ever ingest, a filter that dropped everything) and a TINY
  * referentially-closed one (single-member groups, empty LSH buckets,
  * near-empty incremental batches). The gate's first run found six
  * crash sites (IVF centroid training, BM25/IVF store searches over
  * never-materialized stores, an ANSI 0/0 in the BM25 stat fold) and
  * one genuine cross-engine semantic divergence (Spark's native ROLLUP
  * emits no grand-total row on empty input where ANSI/DuckDB emit one
  * — q63 is now a two-phase rollup for that reason); this spec keeps
  * all of it fixed. Empty-in → empty-out, never a crash. */
class EdgeCorpusSpec extends SparkSpec {

  private def corpus(mode: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"edge_$mode").toString
    EdgeCorpus.run(spark, "/root/testdata/sf0.001", dir, mode)
    dir
  }

  private def runRegistry(dir: String): Seq[(String, Throwable)] =
    SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      try { fn(spark, dir).count(); None }
      catch { case e: Throwable => Some(name -> e) }
    }

  test("every registry query is well-defined on an EMPTY corpus") {
    val failures = runRegistry(corpus("empty"))
    assert(failures.isEmpty, failures.map { case (n, e) =>
      s"$n: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"
    }.mkString("\n"))
  }

  test("every registry query is well-defined on a TINY corpus") {
    val failures = runRegistry(corpus("tiny"))
    assert(failures.isEmpty, failures.map { case (n, e) =>
      s"$n: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"
    }.mkString("\n"))
  }

  test("q63 emits the ANSI grand-total row on an empty corpus") {
    import org.apache.spark.sql.Row
    val rows = SparkEntry.queries("q63_mixture_rollup")(spark, corpus("empty"))
      .collect()
    assert(rows.toSeq === Seq(Row("<all>", "<all>", 0L, null, null)))
  }
}
