package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (scheduler, parquet reader, codegen) so the first
    // timed query doesn't absorb ~5s of one-off JVM init.
    spark.read.parquet(s"$sfDir/nation.parquet").groupBy("n_name").count().count()
    // Sorted execution order: Map iteration order would vary with the key
    // set, attributing residual warm-up to different queries each round —
    // sorted order keeps per-query timings comparable across rounds.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // Full materialization through the noop sink: unlike .count(),
      // Catalyst cannot prune top-level sorts/projections out of the
      // timed plan — every declared output row is produced and consumed.
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // method flags the round-2+ timing change: full noop materialization
    // (count()-based rounds pruned top-level sorts/projections, so their
    // totals are not comparable 1:1).
    println(s"""{"metric":"total","value":$total,"unit":"sec","method":"noop-materialize","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
