package graft.functions

import graft.SparkSpec
import graft.functions.ProductAgg.product_agg
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class ProductAggSpec extends SparkSpec {
  import spark.implicits._

  test("grouped product equals sequential fold") {
    val df = Seq(("a", 2.0), ("a", 3.0), ("a", 0.5), ("b", 4.0))
      .toDF("k", "v")
    val got = df.groupBy($"k").agg(product_agg($"v").as("p"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("a") === 3.0)
    assert(got("b") === 4.0)
  }

  test("nulls are ignored; all-null group yields null") {
    val df = Seq(("a", Some(2.0)), ("a", None), ("b", None))
      .toDF("k", "v")
    val rows = df.groupBy($"k").agg(product_agg($"v").as("p"))
      .collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(rows("a") === Some(2.0))
    assert(rows("b") === None)
  }

  test("partial/merge path (many partitions) matches single-partition result") {
    val vals = (1 to 100).map(i => 1.0 + (i % 7) * 0.01)
    val one = vals.toDF("v").coalesce(1).agg(product_agg($"v")).head().getDouble(0)
    val many = vals.toDF("v").repartition(7).agg(product_agg($"v")).head().getDouble(0)
    assert(math.abs(one - many) / one < 1e-12)
  }

  test("running window product reproduces cumprod (reference split-factor walk)") {
    val df = Seq((1, 1.0), (2, 2.0), (3, 1.0), (4, 5.0)).toDF("i", "v")
    val w = Window.orderBy($"i").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val got = df.withColumn("c", product_agg($"v").over(w))
      .orderBy($"i").select($"c").as[Double].collect()
    assert(got.toSeq === Seq(1.0, 2.0, 2.0, 10.0))
  }

  test("property: product equals foldLeft(*) within fp tolerance (seeded cases)") {
    val rnd = new scala.util.Random(42)
    (1 to 20).foreach { _ =>
      val clean = List.fill(rnd.nextInt(12) + 1)(rnd.nextDouble() * 4 - 2)
        .map(x => if (math.abs(x) < 1e-3) 1.0 else x)
      val expected = clean.foldLeft(1.0)(_ * _)
      val got = clean.toDF("v").repartition(3).agg(product_agg($"v")).head().getDouble(0)
      assert(math.abs(got - expected) <= math.abs(expected) * 1e-9 + 1e-12,
        s"case $clean: got $got expected $expected")
    }
  }
}
