package graft.models

import graft.TSSchema
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-parameter persistence (kats/models/model.py save/load +
  * nowcasting/model_io.py re-derived, Spark-first): instead of pickled
  * estimator objects, fitted models persist as a LONG params table
  * (series keys…, model, param, value) — schema-stable across models,
  * partition-prunable by model, and joinable back onto data at any
  * scale. `forecast` re-applies a stored fit without touching the
  * training data, which is the whole point of persistence: fit once on
  * the 100 TB history, forecast forever from a kilobyte of params per
  * series.
  */
object ModelStore {

  /** Closed-form battery fit (naive / drift / linear / SES with
    * beta = 0.5) as ONE keyed aggregate pass over the series, emitted in
    * long form: (keys…, model, param, value).
    */
  def fitBattery(df: DataFrame, s: TSSchema): DataFrame = {
    val w = Window.partitionBy(s.keyCols: _*).orderBy(col(s.ts))
    val wk = Window.partitionBy(s.keyCols: _*)
    val moments = df
      .withColumn("_rn", row_number().over(w).cast("long"))
      .withColumn("_n", count(lit(1)).over(wk))
      .groupBy(s.keyCols: _*)
      .agg(
        regr_intercept(col(s.value), col("_rn").cast("double")).as("a"),
        regr_slope(col(s.value), col("_rn").cast("double")).as("b"),
        min_by(col(s.value), col("_rn")).as("yfirst"),
        max_by(col(s.value), col("_rn")).as("ylast"),
        sum(col(s.value) * pow(lit(0.5), col("_n") - col("_rn"))).as("sesn"),
        sum(pow(lit(0.5), col("_n") - col("_rn"))).as("sesd"),
        max("_n").cast("double").as("nt"))
    val entries = Seq(
      ("linear", "a", col("a")), ("linear", "b", col("b")), ("linear", "nt", col("nt")),
      ("naive", "ylast", col("ylast")),
      ("drift", "yfirst", col("yfirst")), ("drift", "ylast", col("ylast")), ("drift", "nt", col("nt")),
      ("ses", "level", col("sesn") / col("sesd")))
    moments.select((s.keyCols :+ explode(array(entries.map { case (m, p, v) =>
        struct(lit(m).as("model"), lit(p).as("param"), v.as("value"))
      }: _*)).as("e")): _*)
      .select((s.keyCols :+ col("e.model").as("model") :+ col("e.param").as("param") :+ col("e.value").as("value")): _*)
  }

  /** Persist a params table, partitioned by model (prune one model's
    * params without touching the rest). */
  def save(params: DataFrame, path: String): Unit =
    params.write.mode("overwrite").partitionBy("model").parquet(path)

  /** Load a params table, validating the persistence contract up front. */
  def load(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.parquet(path)
    val missing = Seq("model", "param", "value").filterNot(df.columns.contains)
    require(missing.isEmpty, s"params table is missing columns: ${missing.mkString(", ")}")
    df
  }

  /** Forecast `steps` ahead from STORED params only — no training data,
    * no refit. Params pivot to a per-(series, model) map and each model's
    * closed form applies to h = 1..steps; an unknown model yields null
    * fcst (surfaced, not silently dropped).
    */
  def forecast(params: DataFrame, keys: Seq[String], steps: Int): DataFrame = {
    val keyCols = keys.map(col)
    val pm = params.groupBy((keyCols :+ col("model")): _*)
      .agg(map_from_entries(array_sort(collect_list(struct(col("param"), col("value"))))).as("pm"))
    pm.select((keyCols :+ col("model") :+ col("pm") :+ explode(sequence(lit(1), lit(steps))).as("h")): _*)
      .withColumn("fcst", expr(
        """CASE model
          |  WHEN 'linear' THEN pm['a'] + pm['b'] * (pm['nt'] + h)
          |  WHEN 'naive'  THEN pm['ylast']
          |  WHEN 'drift'  THEN pm['ylast'] + h * (pm['ylast'] - pm['yfirst']) / (pm['nt'] - 1)
          |  WHEN 'ses'    THEN pm['level']
          |END""".stripMargin))
      .select((keyCols :+ col("model") :+ col("h") :+ col("fcst")): _*)
  }
}
