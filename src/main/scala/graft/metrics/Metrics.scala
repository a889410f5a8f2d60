package graft.metrics

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Forecast error metrics (kats/metrics/metrics.py) as aggregate Column
  * builders: compose into any groupBy — fully codegen'd, map-side partial
  * aggregation, no UDFs. `y` = actual, `f` = forecast.
  */
object Metrics {

  /** kats `_safe_divide` (metrics.py:137): n/d with the division's
    * singularities clamped — ±n/0 → ±1, 0/0 → 0 — and the row KEPT, not
    * excluded. `signum` reproduces exactly that (sign of the numerator is
    * the sign of the infinity numpy would produce for a +0.0 denominator).
    * SQL mirror: CASE WHEN d = 0 THEN CAST(sign(n) AS DOUBLE) ELSE n/d END.
    */
  def safeDiv(n: Column, d: Column): Column = when(d =!= 0, n / d).otherwise(signum(n))

  def mae(y: Column, f: Column): Column  = avg(abs(y - f))
  def mse(y: Column, f: Column): Column  = avg(pow(y - f, 2))
  def rmse(y: Column, f: Column): Column = sqrt(mse(y, f))
  /** mean absolute percentage error (metrics.py:448): mean of
    * safe_divide(|err|, y) — NOT |err/y|, so y<0 contributes negatively,
    * and y=0 rows clamp to sign(|err|) ∈ {0, 1} and stay in the mean. */
  def mape(y: Column, f: Column): Column = avg(safeDiv(abs(y - f), y))
  /** symmetric MAPE (metrics.py:649) = 2 × scaled sMAPE; 0/0 rows count as 0. */
  def smape(y: Column, f: Column): Column = lit(2.0) * smapeScaled(y, f)
  /** mean absolute scaled error vs in-sample naive diff scale `d`. */
  def mase(y: Column, f: Column, scale: Column): Column = avg(abs(y - f)) / scale
  def me(y: Column, f: Column): Column   = avg(y - f)
  /** mean percentage error (metrics.py:507); y=0 rows clamp to sign(err). */
  def mpe(y: Column, f: Column): Column  = avg(safeDiv(y - f, y))
  /** coefficient of determination 1 - SSE/SST, as a plain aggregate
    * (sums-based SST so it composes into any groupBy without a window).
    */
  def r2(y: Column, f: Column): Column =
    lit(1.0) - sum(pow(y - f, 2)) / (sum(pow(y, 2)) - pow(sum(y), 2) / count(lit(1)))

  /** median absolute error (metrics.py:377). Exact interpolated median —
    * Spark `median` and DuckDB `quantile_cont(0.5)` agree. */
  def mdae(y: Column, f: Column): Column = median(abs(y - f))
  /** median absolute percentage error (metrics.py:393); y=0 rows clamp. */
  def mdape(y: Column, f: Column): Column = median(safeDiv(abs(y - f), y))
  /** root mean squared log error (metrics.py:568); needs y, f > -1. */
  def rmsle(y: Column, f: Column): Column = sqrt(avg(pow(log1p(y) - log1p(f), 2)))
  /** root mean squared percentage error (metrics.py:590); y=0 rows clamp
    * to sign(err), contributing 1 (or 0 for 0/0) to the mean of squares. */
  def rmspe(y: Column, f: Column): Column = sqrt(avg(pow(safeDiv(y - f, y), 2)))
  /** tracking signal Σerr / MAE (metrics.py:664). */
  def trackingSignal(y: Column, f: Column): Column = sum(y - f) / avg(abs(y - f))
  /** symmetric bias -2·mean(safe_divide(err, |y|+|f|)) (metrics.py:633);
    * 0/0 rows count as 0. */
  def sbias(y: Column, f: Column): Column =
    lit(-2.0) * avg(safeDiv(y - f, abs(y) + abs(f)))
  /** scaled sMAPE in [0,1] = sMAPE/2 (metrics.py:614); 0/0 rows count as 0. */
  def smapeScaled(y: Column, f: Column): Column =
    avg(safeDiv(abs(y - f), abs(y) + abs(f)))
  /** share of actuals ≥ threshold × forecast (metrics.py:335). */
  def exceedRate(y: Column, f: Column, threshold: Double): Column =
    avg((y >= f * threshold).cast("double"))

  /** pinball loss at quantile level t (metrics.py:732):
    * mean(max(d·t, d·(t−1))) with d = y − f, f the t-quantile forecast.
    */
  def pinball(y: Column, f: Column, t: Double): Column =
    avg(greatest((y - f) * t, (y - f) * (t - 1)))

  /** mult_exceed (metrics.py:682), single-series scalar-threshold form.
    * Follows the CODE, not the docstring (which states the opposite
    * mapping): mask = +1 for t > 0.5, −1 for t ≤ 0.5, rate =
    * mean((y − f)·mask > 0) — i.e. how often the t-quantile forecast
    * lands on the wrong side of the actual (≈ 1−t for t > 0.5, ≈ t for
    * t ≤ 0.5 when the quantiles are calibrated).
    */
  def multExceed(y: Column, f: Column, t: Double): Column =
    if (t > 0.5) avg((y > f).cast("double")) else avg((f > y).cast("double"))

  /** coverage (metrics.py:786): share of actuals inside [lo, hi]
    * (reference compares with ≤ on both ends). */
  def coverage(y: Column, lo: Column, hi: Column): Column =
    avg((lo <= y && y <= hi).cast("double"))

  /** interval_score (metrics.py:828) at significance alpha: interval
    * width plus 2/alpha-weighted penalties for actuals outside it
    * (strict <,> per the reference). */
  def intervalScore(y: Column, lo: Column, hi: Column, alpha: Double): Column =
    avg((hi - lo)
      + when(y < lo, (lo - y) * 2 / alpha).otherwise(0.0)
      + when(y > hi, (y - hi) * 2 / alpha).otherwise(0.0))

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
