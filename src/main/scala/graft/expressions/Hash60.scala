package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the top 60 bits of md5(s) as a long —
  * VALUE-identical to `conv(substring(md5(s), 1, 15), 16, 10)::long`
  * (15 hex chars = digest bytes 0–6 plus the high nibble of byte 7),
  * which is what the DuckDB oracles compute, so every hash-keyed oracle
  * passes unchanged.
  *
  * Exists because the SQL composition materializes a 32-char hex string
  * per value and re-parses 15 chars of it through the base-conversion
  * Decimal path — per SHINGLE on the dedup family's hot path (MinHash,
  * winnowing, band stores). This goes digest-bytes → long directly with
  * no intermediate string, in whole-stage codegen.
  */
case class Hash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hash60 requires string, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "hash60"

  override def nullSafeEval(input: Any): Any =
    Hash60.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Hash60.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Hash60 =
    copy(child = newChild)
}

object Hash60 {
  private val Md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** First 15 hex digits of the MD5 digest as an unsigned 60-bit long:
    * bytes 0–6 whole, then the high nibble of byte 7.
    */
  def compute(s: UTF8String): Long = {
    val md = Md5.get()
    md.reset()
    val digest = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (digest(i) & 0xffL); i += 1 }
    (v << 4) | ((digest(7) & 0xffL) >>> 4)
  }
}
