package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}

/** Native Catalyst expression: fraction of a word array's consecutive
  * 2-grams that are duplicates — the per-document repetition signal of
  * the Gopher-style quality gate (1 − distinct/total == dup/total,
  * identical to the oracle's list arithmetic).
  *
  * Exists because the higher-order-function composition
  * (`transform(sequence(...), i -> array_join(slice(ws, i+1, 2)))` +
  * `array_distinct`) allocates a gram string, an array slice, and lambda
  * machinery PER ELEMENT — measured ~0.9 ms/doc at 100-word docs, 11×
  * slower than a single hash pass. This expression walks the
  * UnsafeArrayData once inside whole-stage codegen; the only per-gram
  * cost is one hash-set probe. It sits on the ingest hot path
  * (q_ingest_e2e, streaming qualityGate) where every document pays it.
  */
case class DupBigramFrac(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"dup_bigram_frac requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dup_bigram_frac"

  override def nullSafeEval(input: Any): Any =
    DupBigramFrac.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.DupBigramFrac.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): DupBigramFrac =
    copy(child = newChild)
}

object DupBigramFrac {
  /** One pass over the word array: count consecutive 2-grams already seen.
    * Null elements participate as empty strings (split() never emits
    * nulls, but the contract stays total).
    */
  def compute(arr: ArrayData): Double = {
    val n = arr.numElements()
    if (n < 2) return 0.0
    def word(i: Int): String =
      if (arr.isNullAt(i)) "" else arr.getUTF8String(i).toString
    val seen = new java.util.HashSet[String](n * 2)
    var dup = 0
    var i = 0
    var prev = word(0)
    while (i < n - 1) {
      val cur = word(i + 1)
      if (!seen.add(prev + " " + cur)) dup += 1
      prev = cur
      i += 1
    }
    dup.toDouble / (n - 1)
  }
}
