package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Per-job diagnostic for one registry query: run it once and print one
  * line per Spark job — index, task count, and the job's callsite (the
  * first stage's name). The bench sidecar records job COUNTS per run;
  * when a count shifts between two data scales (e.g. q49's 47 jobs at
  * sf0.1 vs 49 at the 10× scaling-evidence corpus) this names WHICH
  * jobs appeared, so the explanation is evidence, not inference.
  *
  * Usage: `runMain graft.JobProbe <sfDir> <queryName>`; config mirrors
  * Bench exactly (same master/partitions/codegen cache) so job
  * boundaries match what the sidecar counted.
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: graft.JobProbe <sfDir> <queryName>")
    val Array(sfDir, qName) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries.getOrElse(qName,
      sys.error(s"unknown query: $qName"))

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (String, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val site = e.stageInfos.lastOption.map(_.name).getOrElse("?")
        val nTasks = e.stageInfos.map(_.numTasks).sum
        jobs.put(e.jobId, (site, nTasks))
        ()
      }
    })
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    Thread.sleep(2000) // listener bus is async; let the last events drain
    import scala.jdk.CollectionConverters._
    jobs.asScala.toSeq.sortBy(_._1).zipWithIndex.foreach {
      case ((_, (site, n)), i) => println(f"job $i%3d tasks $n%4d  $site")
    }
    println(s"total jobs: ${jobs.size}")
    spark.stop()
  }
}
