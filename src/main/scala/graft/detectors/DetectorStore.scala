package graft.detectors

import graft.TSSchema
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Detector-baseline persistence (kats/detectors/detector.py serialize
  * surface re-derived, Spark-first): the state a detector needs at
  * serving time is a handful of per-series scalars — z-score mean/std,
  * BOCPD priors — fitted on history. They persist in the same long
  * params-table shape as [[graft.models.ModelStore]] (keys…, model,
  * param, value), reusing its save/load, and rehydrate as baseline
  * DataFrames that reach the detectors through batch or stream-static
  * joins — never as driver-side closure state, so millions of series
  * cost the executors a join, not the driver a map.
  * Fit once on the 100 TB history; serve the stream from the store.
  */
object DetectorStore {

  /** One keyed aggregate pass over each series: z-score baseline
    * (mu, sigma) and BOCPD Normal-model priors (mu0, v0, sigma2 — the
    * same estimators as [[Bocpd.priorsOf]], as distributed aggregates).
    */
  def fitBaselines(df: DataFrame, s: TSSchema): DataFrame = {
    val w = Window.partitionBy(s.keyCols: _*).orderBy(col(s.ts))
    val moments = df
      .withColumn("_d", col(s.value) - lag(s.value, 1).over(w))
      .groupBy(s.keyCols: _*)
      .agg(
        avg(s.value).as("mu"),
        stddev_samp(col(s.value)).as("sigma"),
        var_samp(col(s.value)).as("v0"),
        count(lit(1)).as("n"),
        // Σ(d - d̄)² via the moment identity Σd² - (Σd)²/m, so the whole
        // fit stays ONE aggregate (no second pass to center the diffs)
        sum(pow(col("_d"), 2)).as("sd2"),
        sum(col("_d")).as("sd1"),
        count(col("_d")).as("m"))
      .withColumn("sigma2", greatest(
        (col("sd2") - pow(col("sd1"), 2) / col("m")) /
          (lit(2.0) * greatest(col("n") - 2, lit(1))), lit(1e-12)))
    val entries = Seq(
      ("zscore", "mu", col("mu")), ("zscore", "sigma", col("sigma")),
      ("bocpd", "mu0", col("mu")),
      ("bocpd", "v0", greatest(col("v0"), lit(1e-12))),
      ("bocpd", "sigma2", col("sigma2")))
    moments.select((s.keyCols :+ explode(array(entries.map { case (m, p, v) =>
        struct(lit(m).as("model"), lit(p).as("param"), v.as("value"))
      }: _*)).as("e")): _*)
      .select((s.keyCols :+ col("e.model").as("model") :+ col("e.param").as("param") :+ col("e.value").as("value")): _*)
  }

  /** Rehydrate the (key, mu, sigma) baseline for
    * [[graft.streaming.StreamingDetectors.zscoreAgainstBaseline]]. */
  def zscoreBaseline(params: DataFrame, keys: Seq[String]): DataFrame =
    params.where(col("model") === "zscore")
      .groupBy(keys.map(col): _*)
      .pivot("param", Seq("mu", "sigma")).agg(first("value"))

  /** Rehydrate the per-series BOCPD priors as a (keys…, mu0, v0, sigma2)
    * DataFrame — the stream-static join side for
    * [[graft.streaming.StreamingDetectors.bocpd]] and the baseline side
    * of batch serving. Stays a distributed table (no driver collect), so
    * priors for millions of series ride executor-side through a join
    * instead of a closure-captured map. */
  def bocpdPriorsTable(params: DataFrame, keys: Seq[String]): DataFrame =
    params.where(col("model") === "bocpd")
      .groupBy(keys.map(col): _*)
      .pivot("param", Seq("mu0", "v0", "sigma2")).agg(first("value"))
}
