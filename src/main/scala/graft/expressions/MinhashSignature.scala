package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: the full MinHash signature (all `numPerms`
  * permutation minima) of a shingle-hash array in ONE pass. Permutation
  * parameters come from [[graft.text.TextFunctions.permParams]] — the same
  * deterministic LCG stream the batch aggregate and the DuckDB oracles
  * inline — and the per-perm arithmetic `(h·a + b) % P` over exact longs
  * is order-insensitive under min, so results are identical to the
  * per-perm HOF form by construction.
  *
  * Exists for the STREAMING ingest path (Dedup.withSignatures feeding
  * nearDedupAgainstStore): the HOF form pays `numPerms` separate
  * `array_min(transform(...))` walks per document — 64 lambda-machinery
  * passes on the per-row cost every streamed doc pays. This walks the
  * hash array once, updating all perm minima per element, in whole-stage
  * codegen. Returns NULL for an empty shingle array (callers filter
  * `size > 0` first, matching groupBy semantics).
  */
case class MinhashSignature(child: Expression, numPerms: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature requires array<bigint>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any =
    MinhashSignature.compute(input.asInstanceOf[ArrayData], numPerms)

  // nullSafeCodeGen (not defineCodeGen): compute returns null for empty /
  // all-null inputs, which must propagate to isNull
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.expressions.MinhashSignature.compute($c, $numPerms);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)
}

object MinhashSignature {
  private val ParamCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()

  private def params(numPerms: Int): (Array[Long], Array[Long]) =
    ParamCache.computeIfAbsent(numPerms, n => {
      val ps = graft.text.TextFunctions.permParams(n)
      (ps.map(_._1).toArray, ps.map(_._2).toArray)
    })

  /** One pass over the shingle hashes, all perm minima updated per element.
    * Null elements are skipped exactly as long-typed SQL min skips NULLs.
    */
  def compute(arr: ArrayData, numPerms: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val (as, bs) = params(numPerms)
    val p = graft.text.TextFunctions.MinHashPrime
    val mins = Array.fill(numPerms)(Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        val h = arr.getLong(i)
        var j = 0
        while (j < numPerms) {
          val v = (h * as(j) + bs(j)) % p
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!any) null else new GenericArrayData(mins)
  }
}
