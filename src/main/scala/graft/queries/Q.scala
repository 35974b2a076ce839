package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine query: the Spark plan plus (when SQL-expressible) the
  * equivalent DuckDB oracle the driver hash-compares against.
  *
  * Determinism contract (SURVEY.md §5.2): every rank/limit/agg carries a
  * total order, and every order-sensitive double aggregation is routed
  * through DECIMAL (`CoreOps.exactSum`) so Spark's partition-parallel sums
  * are bit-identical to DuckDB's serial ones. Derived floats are computed
  * from those exact inputs with the same expression shape on both sides.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
