package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst dot product over two `array<double>` columns.
  *
  * The built-in formulation (`aggregate(zip_with(a, b, _*_), 0d, _+_)`)
  * routes through interpreted higher-order functions — per-element lambda
  * invocations off the codegen path. This expression generates a tight
  * Java loop inside whole-stage codegen, which is the difference between
  * interpreted and compiled inner loops on the ANN scoring path
  * (|probes| × |corpus| × dim multiply-adds at scale).
  *
  * Accumulation is sequential in index order, so results stay
  * bit-identical to the lambda formulation and to engines that sum
  * left-to-right.
  *
  * Mismatched lengths are an ERROR, not a truncation: a dimension drift
  * between two vector populations (a batch ingested into an index whose
  * centroids were trained at another dimensionality, a probe against a
  * store from a different embedding model, a SimHash `dim` parameter out
  * of step with the data) is the vector-side analogue of the stores'
  * structural-fingerprint drifts — silently dotting the common prefix
  * produces plausible-but-wrong similarities with no error anywhere
  * downstream. Failing here covers every scoring path (brute-force, LSH,
  * IVF, quantized, incremental) at their one shared choke point.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def prettyName: String = "dot_product"
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_product requires two ARRAY<DOUBLE> inputs, got ${l.sql} and ${r.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) throw DotProduct.dimMismatch(n, y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements())
         |  throw graft.functions.DotProduct.dimMismatch($n, $b.numElements());
         |double ${ev.value}Acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value}Acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** One message for both eval paths — generated Java reaches this
    * through the companion's static forwarder. Returns (rather than
    * throws) so the codegen template's `throw` keeps the unreachable-
    * code analysis of the generated method intact. */
  def dimMismatch(l: Int, r: Int): IllegalArgumentException =
    new IllegalArgumentException(
      s"dot_product dimension mismatch: $l-dim vs $r-dim vectors — mixed " +
        "embedding dimensionalities (an index trained at another dim, a " +
        "probe from a different embedding model, or a mis-set SimHash dim " +
        "parameter) would score garbage if silently truncated")
}

object VectorExpressions {
  /** `dot_product(a, b)` over array<double> columns (inputs are cast). */
  def dot_product(a: Column, b: Column): Column =
    Bridge.column(DotProduct(
      Bridge.expression(a.cast("array<double>")),
      Bridge.expression(b.cast("array<double>"))))
}
