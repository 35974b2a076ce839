package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

/** Scheduler-overhead diagnostic: run ONE registry query and report how
  * many Spark jobs/tasks it launched and how long it took — separates
  * "the plan is heavy" from "the query is many small actions" when a
  * bench number looks off. Parameterized like [[Bench]]:
  * `SPARK_GRAFT_SF_DIR` (data dir), `SPARK_GRAFT_CPUS` (local threads),
  * `JC_QUERY` (registry key to measure). See README § tooling. */
object JobCount {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var jobs = 0
    @volatile var tasks = 0
    val sites = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        sites.add(e.stageInfos.lastOption.map(_.name).getOrElse("?"))
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs += 1
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = tasks += 1
    })
    // warm
    SparkEntry.queries("q01_index_daily")(spark, dir).write.format("noop").mode("overwrite").save()
    Thread.sleep(500); jobs = 0; tasks = 0; sites.clear()
    val name = sys.env.getOrElse("JC_QUERY", "q49_incremental_dedup")
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
    val dt = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    println(s"RESULT $name: jobs=$jobs tasks=$tasks time=${dt}s")
    import scala.jdk.CollectionConverters._
    sites.asScala.groupBy(identity).toSeq.sortBy(-_._2.size).foreach {
      case (s, n) => println(s"  SITE ${n.size}x $s")
    }
    spark.stop()
  }
}
