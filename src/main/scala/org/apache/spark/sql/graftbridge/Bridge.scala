package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `new Column(expr)` constructor; the supported
  * bridge lives behind `private[sql]`. This object (placed under the
  * `org.apache.spark.sql` package for that reason alone — it contains no
  * Spark code) re-exports the two conversions our custom Catalyst
  * expressions need. Everything else in this repo lives under `graft`.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a SQL function on a LIVE session (the `functionRegistry` is
    * `private[sql]`; this is the same registration `injectFunction`
    * performs at session build time). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession,
                       id: org.apache.spark.sql.catalyst.FunctionIdentifier,
                       info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
                       builder: Seq[Expression] => Expression): Unit = {
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    ()
  }
}
