package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Generalized exponentially-weighted mean over an ordered array with the
  * pandas `Series.ewm(alpha, min_periods, adjust).mean()` contract that the
  * reference's technical-indicator battery is built on
  * (kats/models/nowcasting/feature_extraction.py:117 MACD chains
  * `ewm(span, min_periods)`; :432 RSI uses `adjust=False`; :181 `_ewma`
  * compacts NaNs then right-aligns — i.e. missing values are SKIPPED, they
  * do not decay the state).
  *
  * Semantics per element (NaN marks missing, as in the reference):
  *   - missing input        → NaN output, state untouched;
  *   - adjust=true  (valid) → num = num·(1−α) + x;  den = den·(1−α) + 1;
  *                            y = num/den            (power-weight mean);
  *   - adjust=false (valid) → y = x on the first valid obs, else
  *                            y = (1−α)·y + α·x      (recursive form);
  *   - fewer than minPeriods valid obs seen so far → NaN output.
  *
  * NaN-skip equals pandas `ignore_na=False` whenever missing values are a
  * leading prefix — the only shape the indicator chains produce (a
  * min_periods mask on an already-dense series) — and equals the
  * reference's `_ewma` compaction everywhere.
  *
  * Like [[EwmaArray]] (the fixed adjusted/no-mask special case kept for the
  * q_ewma surface), the recursion is inherently sequential, so it runs as a
  * native expression INSIDE whole-stage codegen on the one-row-per-series
  * frame: no UDF boundary, one O(n) pass, output written straight into an
  * UnsafeArrayData.
  */
case class EwmArray(child: Expression, alpha: Double, minPeriods: Int, adjust: Boolean)
    extends UnaryExpression {

  require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
  require(minPeriods >= 1, s"minPeriods must be >= 1, got $minPeriods")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ewm_array requires array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "ewm_array"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Double](n)
    val b = 1.0 - alpha
    var num = 0.0; var den = 0.0; var y = 0.0; var seen = 0
    var i = 0
    while (i < n) {
      val x = if (arr.isNullAt(i)) Double.NaN else arr.getDouble(i)
      if (java.lang.Double.isNaN(x)) {
        out(i) = Double.NaN
      } else {
        seen += 1
        if (adjust) {
          num = num * b + x; den = den * b + 1.0
          out(i) = if (seen >= minPeriods) num / den else Double.NaN
        } else {
          y = if (seen == 1) x else b * y + alpha * x
          out(i) = if (seen >= minPeriods) y else Double.NaN
        }
      }
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
      val y = ctx.freshName("y")
      val seen = ctx.freshName("seen")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val b = 1.0 - alpha
      val step =
        if (adjust)
          s"""$num = $num * $b + $x; $den = $den * $b + 1.0;
             |$out[$i] = ($seen >= $minPeriods) ? $num / $den : Double.NaN;""".stripMargin
        else
          s"""$y = ($seen == 1) ? $x : $b * $y + $alpha * $x;
             |$out[$i] = ($seen >= $minPeriods) ? $y : Double.NaN;""".stripMargin
      s"""
         |final int $n = $c.numElements();
         |final double[] $out = new double[$n];
         |double $num = 0.0, $den = 0.0, $y = 0.0;
         |int $seen = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $x = $c.isNullAt($i) ? Double.NaN : $c.getDouble($i);
         |  if (Double.isNaN($x)) {
         |    $out[$i] = Double.NaN;
         |  } else {
         |    $seen++;
         |    $step
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
