package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
object JobCount {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var jobs = 0
    @volatile var tasks = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs += 1
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = tasks += 1
    })
    val dir = "/root/testdata/sf0.1"
    // warm
    SparkEntry.queries("q01_index_daily")(spark, dir).write.format("noop").mode("overwrite").save()
    Thread.sleep(500); jobs = 0; tasks = 0
    val name = sys.env.getOrElse("JC_QUERY", "q49_incremental_dedup")
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
    val dt = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    println(s"RESULT $name: jobs=$jobs tasks=$tasks time=${dt}s")
    spark.stop()
  }
}
