package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expression: all random-hyperplane LSH band buckets of a
  * float/double vector in ONE pass. Band b's bucket packs `rowsPerBand`
  * sign bits; plane (b·rows+r)'s weight on dim d is the integer-LCG noise
  * `(((plane·64 + d) · 2654435761) % 1000003) / 1000003 − 0.5` — exactly
  * [[graft.ann.Ann.planeProjection]], with per-plane accumulation in dim
  * order, so projections are BIT-identical to the HOF form and the DuckDB
  * oracles' banding replays keep passing unchanged.
  *
  * Exists because the HOF form pays `bands·rows` separate
  * `aggregate(zip_with(...))` folds per vector — per-element lambda
  * machinery times 32 planes on the signature hot path every
  * near-dup/KNN query pays per corpus row. This walks the vector once,
  * updating all plane accumulators per dim, in whole-stage codegen.
  */
case class LshBandBuckets(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_band_buckets requires array<float|double>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_band_buckets"

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    LshBandBuckets.compute(input.asInstanceOf[ArrayData], bands, rowsPerBand, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.LshBandBuckets.compute($c, $bands, $rowsPerBand, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): LshBandBuckets =
    copy(child = newChild)
}

object LshBandBuckets {
  /** One pass over the vector: per dim, update every plane accumulator
    * (per-accumulator addition order is still dim order — bit-identical
    * to the per-plane fold). A null element — or an EMPTY vector, whose
    * zip_with/fold projection is also NULL in the HOF form — poisons every
    * projection to NULL there, whose sign test then yields bit 0; mirrored
    * here by returning all-zero buckets (NOT by letting the 0.0
    * accumulators pass the >= 0 test, which would set every bit).
    */
  def compute(arr: ArrayData, bands: Int, rowsPerBand: Int, isFloat: Boolean): ArrayData = {
    val planes = bands * rowsPerBand
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(new Array[Long](bands))
    val acc = new Array[Double](planes)
    var nullSeen = false
    var d = 0
    while (d < n && !nullSeen) {
      if (arr.isNullAt(d)) nullSeen = true
      else {
        val x = if (isFloat) arr.getFloat(d).toDouble else arr.getDouble(d)
        var p = 0
        while (p < planes) {
          val w = (((p.toLong * 64 + d) * 2654435761L) % 1000003L).toDouble / 1000003.0 - 0.5
          acc(p) += x * w
          p += 1
        }
      }
      d += 1
    }
    val out = new Array[Long](bands)
    if (!nullSeen) {
      var b = 0
      while (b < bands) {
        var bucket = 0L
        var r = 0
        while (r < rowsPerBand) {
          if (acc(b * rowsPerBand + r) >= 0) bucket |= (1L << r)
          r += 1
        }
        out(b) = bucket
        b += 1
      }
    }
    new GenericArrayData(out)
  }
}
