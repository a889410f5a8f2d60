package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: adjusted exponentially-weighted mean over an
  * ordered array (pandas ewm(adjust=true); tsfeatures.py:_ewma).
  *
  *   y_t = Σ_j (1-α)^j x_{t-j} / Σ_j (1-α)^j      — one O(n) recursive scan.
  *
  * The recursion is inherently sequential, so it can't be composed from
  * Spark's array built-ins without an O(n²) window or a Scala UDF; as an
  * Expression with doGenCode it runs INSIDE whole-stage codegen on the
  * one-row-per-series frame: no UDF serialization, no boxing, and the
  * generated loop writes straight into an UnsafeArrayData.
  */
case class EwmaArray(child: Expression, alpha: Double)
    extends UnaryExpression {

  require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ewma_array requires array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "ewma_array"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Double](n)
    val b = 1.0 - alpha
    var num = 0.0; var den = 0.0
    var i = 0
    while (i < n) {
      num = num * b + arr.getDouble(i)
      den = den * b + 1.0
      out(i) = num / den
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val num = ctx.freshName("num")
      val den = ctx.freshName("den")
      val i = ctx.freshName("i")
      val b = 1.0 - alpha
      s"""
         |final int $n = $c.numElements();
         |final double[] $out = new double[$n];
         |double $num = 0.0, $den = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $num = $num * $b + $c.getDouble($i);
         |  $den = $den * $b + 1.0;
         |  $out[$i] = $num / $den;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): EwmaArray =
    copy(child = newChild)
}
