package graft.operators

import graft.{TS, TSSchema}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** cupik-style pipeline (kats/utils/cupik.py:42 Pipeline): chain named
  * processing steps — detectors acting as removers, transformers, models —
  * over a keyed series table.
  *
  * Spark-first: a step is a plain (DataFrame, TSSchema) => DataFrame plan
  * transformer, so `fit` composes ONE logical plan that Catalyst optimizes
  * end-to-end — no per-step materialization, and a chained pipeline over a
  * million-series table costs the same shuffles as hand-fused code. The
  * reference's per-step metadata channel (outlier lists, feature frames)
  * falls out naturally: run any prefix of the chain as its own DataFrame.
  */
final class Pipeline private (steps: Seq[(String, Pipeline.Step)]) {
  def fit(df: DataFrame, s: TSSchema): DataFrame =
    steps.foldLeft(df) { case (d, (_, f)) => f(d, s) }
  def names: Seq[String] = steps.map(_._1)
}

object Pipeline {
  type Step = (DataFrame, TSSchema) => DataFrame

  def apply(steps: (String, Step)*): Pipeline = new Pipeline(steps)

  /** The cupik remove=True detector step (cupik.py __detect__ +
    * outlier.py OutlierDetector.remover(interpolate=True)): null out IQR
    * outliers on the decomposition residual, then linearly interpolate
    * the holes. Same residual bounds as Detectors.outlierIqr; the
    * cleaned table keeps exactly the input columns.
    */
  def iqrRemover(iqrMult: Double = 3.0): Step = (df, s) => {
    val d = Decompose.additive(df, s)
    val q = d.groupBy(s.keyCols: _*)
      .agg(expr("percentile(resid, 0.25)").as("q1"), expr("percentile(resid, 0.75)").as("q3"))
      .withColumn("lo", col("q1") - (col("q3") - col("q1")) * iqrMult)
      .withColumn("hi", col("q3") + (col("q3") - col("q1")) * iqrMult)
    val cleaned = d.join(broadcast(q), s.keys)
      .withColumn(s.value,
        when(col("resid") < col("lo") || col("resid") > col("hi"), lit(null))
          .otherwise(col(s.value)))
      .select(df.columns.map(col).toIndexedSeq: _*)
    TS.interpolateLinear(cleaned, s)
  }
}
