package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Md5Hash60Spec extends SparkSpec {
  import spark.implicits._

  test("fused expression equals the conv(substring(md5)) formulation bit-for-bit") {
    val samples = Seq("", "a", "abc", "the quick brown fox", "0:shingle text here",
      "ünïcödé ∂ata", "x" * 500)
    val df = samples.toDF("s")
      .withColumn("fused", Md5Hash60.md5_hash60($"s"))
      .withColumn("ref", conv(substring(md5($"s"), 1, 15), 16, 10).cast("long"))
    val rows = df.select($"s", $"fused", $"ref").collect()
    rows.foreach(r => assert(r.getLong(1) === r.getLong(2), s"mismatch for '${r.getString(0).take(20)}'"))
  }

  test("matches a known md5 value ('abc' -> 0x900150983cd24fb)") {
    val got = Seq("abc").toDF("s").select(Md5Hash60.md5_hash60($"s")).head().getLong(0)
    assert(got === java.lang.Long.parseLong("900150983cd24fb", 16))
  }

  test("null input yields null") {
    val got = Seq[Option[String]](None).toDF("s")
      .select(Md5Hash60.md5_hash60($"s")).head()
    assert(got.isNullAt(0))
  }
}
