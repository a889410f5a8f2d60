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

  /** Exact-OLS variant of [[forecast]]: the global fit is computed from
    * one aggregated moments row (X'X, X'y — a single distributed
    * aggregate) solved with breeze on the driver (6×6, same
    * ridge=1e-8 as Regressors.solve), and the coefficients re-enter the
    * plan as literals. Numerically transparent — the DuckDB oracle
    * replays the identical normal equations — unlike MLlib's internally
    * standardized solver. The coefficient transfer is the standard
    * model-fit shape: the driver holds 6 doubles, never data.
    */
  def forecastExact(df: DataFrame, s: TSSchema): DataFrame = {
    val featCols = Array("lag1", "lag2", "lag24", "hs", "hc")
    val basis = "one" +: featCols.toSeq
    val feat = features(df, s).na.drop(featCols.toSeq :+ s.value).withColumn("one", lit(1.0))
    val momentCols =
      (for { i <- basis.indices; j <- basis.indices if j >= i }
        yield sum(col(basis(i)) * col(basis(j))).as(s"m_${i}_$j")) ++
        basis.indices.map(i => sum(col(basis(i)) * col(s.value)).as(s"v_$i"))
    val moments = feat.groupBy().agg(momentCols.head, momentCols.tail: _*).head()
    val p = basis.length
    val xtx = breeze.linalg.DenseMatrix.tabulate[Double](p, p) { (i, j) =>
      val (a, b) = if (i <= j) (i, j) else (j, i)
      moments.getAs[Double](s"m_${a}_$b")
    }
    val xty = breeze.linalg.DenseVector.tabulate[Double](p)(i => moments.getAs[Double](s"v_$i"))
    var i = 0
    while (i < p) { xtx(i, i) += 1e-8; i += 1 }
    val beta = xtx \ xty
    val fitExpr = basis.zipWithIndex.map { case (c, bi) => col(c) * lit(beta(bi)) }.reduce(_ + _)
    val rmse = math.sqrt(
      feat.select(avg(pow(col(s.value) - fitExpr, 2)).as("mse")).head().getAs[Double]("mse"))
    val wDesc = Window.partitionBy(s.keyCols: _*).orderBy(col(s.ts).desc)
    val last = df
      .withColumn("_rk", row_number().over(wDesc))
      .where(col("_rk") <= 24)
      .groupBy(s.keyCols: _*)
      .agg(
        max(when(col("_rk") === 1, col(s.value))).as("lag1"),
        max(when(col("_rk") === 2, col(s.value))).as("lag2"),
        max(when(col("_rk") === 24, col(s.value))).as("lag24"),
        max(when(col("_rk") === 1, col(s.ts))).as("_last_ts"))
      .withColumn("_next_hod", (hour(col("_last_ts")) + 1) % 24)
      .withColumn("hs", sin(col("_next_hod") * (2 * math.Pi / 24)))
      .withColumn("hc", cos(col("_next_hod") * (2 * math.Pi / 24)))
      .withColumn("one", lit(1.0))
      .na.drop(featCols.toSeq)
    last.select((s.keyCols :+ round(fitExpr, 6).as("yhat_1") :+
      round(lit(rmse), 6).as("train_rmse")): _*)
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
