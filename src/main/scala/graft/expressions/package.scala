package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.{call_function, lit}

/** Column wrappers for graft's native Catalyst expressions. The expressions
  * are registered in the session's FunctionRegistry by [[GraftExtensions]]
  * (`spark.sql.extensions=graft.GraftExtensions`) or lazily by
  * [[expressions.ensureRegistered]]; the wrappers then resolve through
  * `call_function`, which is fully public API.
  */
package object expressions {

  /** Idempotently register graft's native functions on an already-built
    * session (for sessions not created with the extensions config).
    */
  def ensureRegistered(spark: SparkSession): Unit =
    if (!spark.catalog.functionExists("ewma_array")) GraftExtensions.registerOn(spark)

  /** Adjusted exponentially-weighted mean over an ordered array; runs inside
    * whole-stage codegen (see [[EwmaArray]]).
    */
  def ewma_array(xs: Column, alpha: Double): Column = {
    ensureRegistered(SparkSession.active)
    call_function("ewma_array", xs, lit(alpha))
  }

  /** Allocation-free cosine similarity of two float vectors (see
    * [[CosineSim]]); the pair-heavy ANN/dedup hot path.
    */
  def cosine_sim(a: Column, b: Column): Column = {
    ensureRegistered(SparkSession.active)
    call_function("cosine_sim", a, b)
  }
}
