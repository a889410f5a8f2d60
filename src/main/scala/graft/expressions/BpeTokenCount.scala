package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: token count of a word array under a learned
  * BPE merge cascade (q_bpe_encode's hot path). `merges` is a foldable
  * tab-separated list of ordered merge pairs ("e r\tt h\t…"); each
  * in-alphabet word ([a-z]{2,20}) is char-split and the cascade applied as
  * space-anchored leftmost replaces — byte-for-byte the semantics of the
  * SQL chain `trim(replace(concat(' ', x, ' '), ' a b ', ' ab '))`, which
  * the DuckDB oracle replays — and the surviving symbol count summed;
  * out-of-alphabet words count 1.
  *
  * Exists because the higher-order-function form (nested replace calls
  * inside a `transform` lambda + `aggregate`) pays per-element lambda
  * machinery and Catalyst string expression trees per word per round; this
  * walks the array once in compiled Java inside whole-stage codegen, with
  * the parsed cascade cached per merge-list literal. Encoding is the step
  * every document pays once the tokenizer is fixed — at 100 TB it must be
  * a map-side compiled pass.
  */
case class BpeTokenCount(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), StringType) =>
      if (right.foldable) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        "bpe_token_count requires a foldable merge list (the cascade is parsed once per plan)")
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"bpe_token_count requires (array<string>, string), got (${l.simpleString}, ${r.simpleString})")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_token_count"

  // the merge list is foldable — parse it ONCE per expression instance;
  // rows then pay zero lookup cost (the parsed array rides the codegen
  // references, not a per-row map probe on the literal's bytes)
  @transient private lazy val cascadeArr: Array[Array[String]] =
    BpeTokenCount.parse(String.valueOf(right.eval().asInstanceOf[UTF8String]))

  override def nullSafeEval(words: Any, merges: Any): Any =
    BpeTokenCount.compute(words.asInstanceOf[ArrayData], cascadeArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeCascade", cascadeArr, "java.lang.String[][]")
    defineCodeGen(ctx, ev, (w, _) => s"graft.expressions.BpeTokenCount.compute($w, $ref)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): BpeTokenCount =
    copy(left = newLeft, right = newRight)
}

object BpeTokenCount {
  /** (padded search, padded replacement) per merge — called once per
    * expression instance at resolution, never per row. */
  private[expressions] def parse(merges: String): Array[Array[String]] =
    merges.split('\t').filter(_.nonEmpty).map { pair =>
      Array(" " + pair + " ", " " + pair.replace(" ", "") + " ")
    }

  private def inAlphabet(w: String): Boolean = {
    val n = w.length
    if (n < 2 || n > 20) return false
    var i = 0
    while (i < n) { val c = w.charAt(i); if (c < 'a' || c > 'z') return false; i += 1 }
    true
  }

  def compute(arr: ArrayData, cas: Array[Array[String]]): Long = {
    val n = arr.numElements()
    var total = 0L
    var i = 0
    while (i < n) {
      val w = if (arr.isNullAt(i)) "" else arr.getUTF8String(i).toString
      if (!inAlphabet(w)) total += 1L
      else {
        // char-split ("abc" -> "a b c"), then the space-anchored cascade;
        // String.replace is leftmost non-overlapping without rescanning
        // replaced text — identical to Spark SQL / DuckDB replace()
        val sb = new java.lang.StringBuilder(w.length * 2)
        var j = 0
        while (j < w.length) { sb.append(w.charAt(j)); sb.append(' '); j += 1 }
        var s = sb.substring(0, sb.length - 1)
        var r = 0
        while (r < cas.length) {
          s = (" " + s + " ").replace(cas(r)(0), cas(r)(1)).trim()
          r += 1
        }
        var symbols = 1L
        var k = 0
        while (k < s.length) { if (s.charAt(k) == ' ') symbols += 1L; k += 1 }
        total += symbols
      }
      i += 1
    }
    total
  }
}
