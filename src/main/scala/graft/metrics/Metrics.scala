package graft.metrics

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Forecast error metrics (kats/metrics/metrics.py) as aggregate Column
  * builders: compose into any groupBy — fully codegen'd, map-side partial
  * aggregation, no UDFs. `y` = actual, `f` = forecast.
  */
object Metrics {
  def mae(y: Column, f: Column): Column  = avg(abs(y - f))
  def mse(y: Column, f: Column): Column  = avg(pow(y - f, 2))
  def rmse(y: Column, f: Column): Column = sqrt(mse(y, f))
  /** mean absolute percentage error; rows with y=0 excluded (kats skips). */
  def mape(y: Column, f: Column): Column = avg(when(y =!= 0, abs((y - f) / y)))
  /** symmetric MAPE, kats convention: |y-f| / ((|y|+|f|)/2). */
  def smape(y: Column, f: Column): Column =
    avg(when(abs(y) + abs(f) =!= 0, abs(y - f) / ((abs(y) + abs(f)) / 2)))
  /** mean absolute scaled error vs in-sample naive diff scale `d`. */
  def mase(y: Column, f: Column, scale: Column): Column = avg(abs(y - f)) / scale
  def me(y: Column, f: Column): Column   = avg(y - f)
  def mpe(y: Column, f: Column): Column  = avg(when(y =!= 0, (y - f) / y))
  /** coefficient of determination 1 - SSE/SST, as a plain aggregate
    * (sums-based SST so it composes into any groupBy without a window).
    */
  def r2(y: Column, f: Column): Column =
    lit(1.0) - sum(pow(y - f, 2)) / (sum(pow(y, 2)) - pow(sum(y), 2) / count(lit(1)))

  /** median absolute error (metrics.py:377). Exact interpolated median —
    * Spark `median` and DuckDB `quantile_cont(0.5)` agree. */
  def mdae(y: Column, f: Column): Column = median(abs(y - f))
  /** median absolute percentage error (metrics.py:393); y=0 rows excluded. */
  def mdape(y: Column, f: Column): Column = median(when(y =!= 0, abs((y - f) / y)))
  /** root mean squared log error (metrics.py:568); needs y, f > -1. */
  def rmsle(y: Column, f: Column): Column = sqrt(avg(pow(log1p(y) - log1p(f), 2)))
  /** root mean squared percentage error (metrics.py:590); y=0 rows excluded. */
  def rmspe(y: Column, f: Column): Column = sqrt(avg(when(y =!= 0, pow((y - f) / y, 2))))
  /** tracking signal Σerr / MAE (metrics.py:664). */
  def trackingSignal(y: Column, f: Column): Column = sum(y - f) / avg(abs(y - f))
  /** symmetric bias -2·mean(err / (|y|+|f|)) (metrics.py:633); 0/0 rows excluded. */
  def sbias(y: Column, f: Column): Column =
    lit(-2.0) * avg(when(abs(y) + abs(f) =!= 0, (y - f) / (abs(y) + abs(f))))
  /** scaled sMAPE in [0,1] = sMAPE/2 (metrics.py:614). */
  def smapeScaled(y: Column, f: Column): Column =
    avg(when(abs(y) + abs(f) =!= 0, abs(y - f) / (abs(y) + abs(f))))
  /** share of actuals ≥ threshold × forecast (metrics.py:335). */
  def exceedRate(y: Column, f: Column, threshold: Double): Column =
    avg((y >= f * threshold).cast("double"))

  /** All headline metrics as named agg columns (r2 computed from sums to
    * stay a plain aggregate without a window).
    */
  def battery(y: Column, f: Column): Seq[Column] = Seq(
    round(mae(y, f), 6).as("mae"),
    round(mse(y, f), 6).as("mse"),
    round(rmse(y, f), 6).as("rmse"),
    round(mape(y, f), 6).as("mape"),
    round(smape(y, f), 6).as("smape"),
    round(me(y, f), 6).as("me"),
    round(lit(1.0) - sum(pow(y - f, 2)) / (sum(pow(y, 2)) - pow(sum(y), 2) / count(lit(1))), 6).as("r2"),
    count(lit(1)).as("n")
  )
}
