package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{
  AttributeReference, Coalesce, Expression, Literal, Multiply
}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst `product` aggregate: the running multiply the reference
  * computes with pandas `cumprod` (split-factor adjustment,
  * `/root/reference/src/data/stock_data_fetcher.py:64-66`). Spark has no
  * built-in product aggregate; `exp(sum(log(x)))` loses exactness and breaks
  * on zero/negative inputs.
  *
  * Implemented as a [[DeclarativeAggregate]] — pure expressions, so it is
  * codegen-friendly, supports partial (map-side) aggregation, and is usable
  * both in `groupBy().agg()` and over a `Window`. SQL-standard null
  * semantics: nulls are ignored, empty input yields null.
  */
case class ProductAgg(child: Expression)
    extends DeclarativeAggregate
    with UnaryLike[Expression] {

  override def prettyName: String = "product_agg"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"product_agg requires a DOUBLE input, got ${child.dataType.sql}")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private lazy val product = AttributeReference("product", DoubleType)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = product :: Nil

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal.create(null, DoubleType))

  // Multiply(null, x) is null, so Coalesce walks: both present -> product,
  // child null -> keep buffer, buffer empty -> seed with child.
  override lazy val updateExpressions: Seq[Expression] =
    Seq(Coalesce(Seq(Multiply(product, child), product, child)))

  override lazy val mergeExpressions: Seq[Expression] =
    Seq(Coalesce(Seq(Multiply(product.left, product.right), product.left, product.right)))

  override lazy val evaluateExpression: Expression = product

  override protected def withNewChildInternal(newChild: Expression): ProductAgg =
    copy(child = newChild)
}

object ProductAgg {
  /** Column-API entry point: `product_agg($"x")`, window-capable via `.over(w)`. */
  def product_agg(c: Column): Column =
    Bridge.column(ProductAgg(Bridge.expression(c.cast("double"))).toAggregateExpression())
}
