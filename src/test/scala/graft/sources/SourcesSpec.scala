package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("tickerUniverse parses the screener JSON shape, normalizes and limits (S1/S2)") {
    val dir = Files.createTempDirectory("screener").toFile
    val json =
      """{"data":{"table":{"rows":[
        |{"symbol":"MSFT","name":"Microsoft","marketCap":"3T"},
        |{"symbol":"BRK/B","name":"Berkshire B","marketCap":"900B"},
        |{"symbol":"AAPL","name":"Apple","marketCap":"3T"}]}}}""".stripMargin.replace("\n", "")
    Files.writeString(new java.io.File(dir, "snap.json").toPath, json)
    val got = Snapshots.tickerUniverse(spark, dir.toString, 2)
      .select($"ticker").as[String].collect().toSeq
    assert(got === Seq("AAPL", "BRK-B")) // normalized, ordered, limited
  }

  test("KeyedParquetStore upsert: INSERT OR REPLACE last-wins across writes (S6/S7)") {
    val path = Files.createTempDirectory("store").toString + "/stocks"
    val v1 = Seq(("AAA", d("2024-01-01"), 10.0, 1), ("BBB", d("2024-01-01"), 3.0, 1))
      .toDF("ticker", "date", "price", "ver")
    KeyedParquetStore.upsert(spark, path, v1, Seq("ticker", "date"), Seq($"ver"))
    // second batch replaces AAA@Jan1 and adds AAA@Jan2
    val v2 = Seq(("AAA", d("2024-01-01"), 11.0, 2), ("AAA", d("2024-01-02"), 12.0, 2))
      .toDF("ticker", "date", "price", "ver")
    KeyedParquetStore.upsert(spark, path, v2, Seq("ticker", "date"), Seq($"ver"))
    val got = KeyedParquetStore.read(spark, path).get
      .orderBy($"ticker", $"date")
      .select($"ticker", $"price").as[(String, Double)].collect().toSeq
    assert(got === Seq(("AAA", 11.0), ("AAA", 12.0), ("BBB", 3.0)))
  }

  test("partitioned store prunes partitions on date filters") {
    val path = Files.createTempDirectory("store_part").toString + "/stocks"
    val rows = (1 to 10).flatMap(day => Seq(("AAA", f"2024-01-$day%02d", day * 1.0, 1)))
      .toDF("ticker", "date", "price", "ver")
    KeyedParquetStore.upsert(spark, path, rows, Seq("ticker", "date"), Seq($"ver"),
      partitionCols = Seq("date"))
    val q = KeyedParquetStore.read(spark, path).get.filter($"date" === "2024-01-03")
    assert(q.count() === 1)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(date"),
      s"expected partition pruning in plan:\n$plan")
  }
}
