package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic

/** Thin bridge over Spark's `private[sql]` session internals, placed in the
  * org.apache.spark.sql namespace the way Delta/Iceberg do. Lets graft
  * register its native expressions on sessions it did not build (the driver
  * hands an arbitrary SparkSession to SparkEntry.queries).
  */
object FunctionShim {
  def register(
      spark: SparkSession,
      name: String,
      info: ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(new FunctionIdentifier(name), info, builder)
}
