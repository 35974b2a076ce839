package graft

/** Every registered query must be run-to-run deterministic — the driver
  * hash-compares parquet dumps, so any nondeterminism (undetermined sort
  * ties, collect_list ordering, partition-order-sensitive floats) fails
  * the gate. This runs each query twice at sf0.001 and compares full
  * result multisets. */
class QueriesDeterminismSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name is deterministic across runs") {
      val a = fn(spark, dir).collect().map(_.toString).sorted.toSeq
      val b = fn(spark, dir).collect().map(_.toString).sorted.toSeq
      assert(a.nonEmpty, s"$name returned no rows at sf0.001")
      assert(a === b)
    }
  }
}
