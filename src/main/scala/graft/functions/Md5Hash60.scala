package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The engine's cross-engine 60-bit content hash as ONE codegen'd
  * expression.
  *
  * Semantically identical to `conv(substring(md5(x), 1, 15), 16, 10)` —
  * i.e. the first 15 hex digits (60 bits) of the md5 — and therefore to
  * the DuckDB oracle form `CAST('0x' || substr(md5(x),1,15) AS BIGINT)`.
  * The fused version skips materializing the 32-char hex string, the
  * substring copy, and the base-conversion parse: digest bytes go
  * straight to a long. Used by every dedup/fingerprint operator
  * (`TextAnalysis.md5Hash60`), so it sits in the hottest shingle loops.
  */
case class Md5Hash60(child: Expression) extends UnaryExpression {

  override def prettyName: String = "md5_hash60"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_hash60 requires a STRING input, got ${child.dataType.sql}")

  override def nullSafeEval(v: Any): Any =
    Md5Hash60.hash(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Hash60.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Hash60 =
    copy(child = newChild)
}

object Md5Hash60 {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(s): bytes 0..6 (56 bits) then the high nibble
    * of byte 7 — exactly the value of the first 15 hex digits. */
  def hash(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val b = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
    (v << 4) | ((b(7) & 0xf0L) >>> 4)
  }

  def md5_hash60(c: Column): Column =
    Bridge.column(Md5Hash60(Bridge.expression(c.cast("string"))))
}
