package graft.models

import graft.TSSchema
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.LinearRegression
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global ML autoregression (kats/models/ml_ar.py): ONE model fit across
  * every series jointly — lag features + calendar Fourier terms through
  * MLlib LinearRegression (deterministic "normal" solver). This is the
  * Spark-native shape of cross-series learning: feature building is a
  * window plan, the solve is a distributed least squares, and scoring is
  * a broadcast-able transform.
  */
object MlAr {

  def features(df: DataFrame, s: TSSchema): DataFrame = {
    val w = s.orderedWindow
    df.withColumn("lag1", lag(col(s.value), 1).over(w))
      .withColumn("lag2", lag(col(s.value), 2).over(w))
      .withColumn("lag24", lag(col(s.value), 24).over(w))
      .withColumn("hs", sin(hour(col(s.ts)) * (2 * math.Pi / 24)))
      .withColumn("hc", cos(hour(col(s.ts)) * (2 * math.Pi / 24)))
  }

  /** Fit on all complete rows, then 1-step-ahead forecast per series from
    * its last observed lags. Returns (series, yhat_1, global train rmse).
    */
  def forecast(df: DataFrame, s: TSSchema): DataFrame = {
    val featCols = Array("lag1", "lag2", "lag24", "hs", "hc")
    val feat = features(df, s).na.drop(featCols.toSeq :+ s.value)
    val assembled = new VectorAssembler().setInputCols(featCols).setOutputCol("features")
      .transform(feat)
    val model = new LinearRegression()
      .setSolver("normal").setRegParam(1e-6).setElasticNetParam(0.0)
      .setLabelCol(s.value).setFeaturesCol("features")
      .fit(assembled)
    val rmse = model.summary.rootMeanSquaredError
    // next-step features per series: lag1 := last value, lag2 := previous, …
    val wKey = Window.partitionBy(s.keyCols: _*)
    val wDesc = Window.partitionBy(s.keyCols: _*).orderBy(col(s.ts).desc)
    val last = df
      .withColumn("_rk", row_number().over(wDesc))
      .where(col("_rk") <= 24)
      .groupBy(s.keyCols: _*)
      .agg(
        max(when(col("_rk") === 1, col(s.value))).as("lag1"),
        max(when(col("_rk") === 2, col(s.value))).as("lag2"),
        max(when(col("_rk") === 24, col(s.value))).as("lag24"), // t+1-24 = t-23 = rank 24 (rank r = t-(r-1))
        max(when(col("_rk") === 1, col(s.ts))).as("_last_ts"))
      .withColumn("_next_hod", (hour(col("_last_ts")) + 1) % 24)
      .withColumn("hs", sin(col("_next_hod") * (2 * math.Pi / 24)))
      .withColumn("hc", cos(col("_next_hod") * (2 * math.Pi / 24)))
    val scored = model.transform(
      new VectorAssembler().setInputCols(featCols).setOutputCol("features").transform(last.na.drop(featCols.toSeq)))
    scored.select((s.keyCols :+ round(col("prediction"), 6).as("yhat_1") :+
      round(lit(rmse), 6).as("train_rmse")): _*)
  }
}
