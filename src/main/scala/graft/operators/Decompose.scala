package graft.operators

import graft.TSSchema
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classical additive seasonal decomposition (kats/utils/decomposition.py,
  * statsmodels seasonal_decompose flavor), window-function based:
  *
  *   trend_t    = centered moving average (±half)
  *   seasonal_i = mean of detrended grouped by seasonal index, re-centered
  *   resid_t    = x_t - trend_t - seasonal_t
  *
  * All components are plain window/group aggregates → one shuffle on the
  * series key, no UDFs, codegen throughout. Intermediates are rounded to
  * 6 dp so results are engine-reproducible.
  */
object Decompose {
  def additive(df: DataFrame, s: TSSchema, half: Int = 12): DataFrame = {
    val wTrend = s.orderedWindow.rowsBetween(-half, half)
    val withTrend = df
      .withColumn("trend", round(avg(s.value).over(wTrend), 6))
      .withColumn("detrended", col(s.value) - col("trend"))
      .withColumn("_hod", hour(col(s.ts)))
    val wHod = Window.partitionBy((s.keyCols :+ col("_hod")): _*)
    val wKey = Window.partitionBy(s.keyCols: _*)
    withTrend
      .withColumn("_seasonal_raw", avg("detrended").over(wHod))
      .withColumn("seasonal", round(col("_seasonal_raw") - avg("_seasonal_raw").over(wKey), 6))
      .withColumn("resid", round(col(s.value) - col("trend") - col("seasonal"), 6))
      .drop("_hod", "_seasonal_raw", "detrended")
  }

  /** Multiplicative decomposition (kats/utils/decomposition.py
    * decomposition="multiplicative"): x = trend · seasonal · resid, with
    * the seasonal factor normalized to mean 1 per series. Assumes a
    * positive-valued series (ratios) — callers on zero-filled grids
    * should use the raw resampled table.
    */
  def multiplicative(df: DataFrame, s: TSSchema, half: Int = 12): DataFrame = {
    val wTrend = s.orderedWindow.rowsBetween(-half, half)
    val withTrend = df
      .withColumn("trend", round(avg(s.value).over(wTrend), 6))
      .withColumn("_ratio", col(s.value) / col("trend"))
      .withColumn("_hod", hour(col(s.ts)))
    val wHod = Window.partitionBy((s.keyCols :+ col("_hod")): _*)
    val wKey = Window.partitionBy(s.keyCols: _*)
    withTrend
      .withColumn("_seasonal_raw", avg("_ratio").over(wHod))
      .withColumn("seasonal", round(col("_seasonal_raw") / avg("_seasonal_raw").over(wKey), 6))
      .withColumn("resid", round(col(s.value) / (col("trend") * col("seasonal")), 6))
      .drop("_hod", "_seasonal_raw", "_ratio")
  }

  /** Iterated decomposition (STL-flavored, loess replaced by the centered
    * MA): re-estimate the trend on the DESEASONALIZED series, then
    * re-estimate seasonality against the refined trend. Two passes remove
    * most of the seasonal leakage a single MA pass leaves in the trend.
    */
  def stlLite(df: DataFrame, s: TSSchema, half: Int = 12): DataFrame = {
    val pass1 = additive(df, s, half)
    val wTrend = s.orderedWindow.rowsBetween(-half, half)
    val wHod = Window.partitionBy((s.keyCols :+ col("_hod2")): _*)
    val wKey = Window.partitionBy(s.keyCols: _*)
    pass1
      .withColumn("_deseason", col(s.value) - col("seasonal"))
      .withColumn("trend2", round(avg("_deseason").over(wTrend), 6))
      .withColumn("_hod2", hour(col(s.ts)))
      .withColumn("_detr2", col(s.value) - col("trend2"))
      .withColumn("_sraw2", avg("_detr2").over(wHod))
      .withColumn("seasonal2", round(col("_sraw2") - avg("_sraw2").over(wKey), 6))
      .withColumn("resid2", round(col(s.value) - col("trend2") - col("seasonal2"), 6))
      .drop("_deseason", "_hod2", "_detr2", "_sraw2", "trend", "seasonal", "resid")
  }

  /** Oracle-side equivalent of [[stlLite]] on top of [[additiveSql]]'s
    * `decomp` CTE, yielding CTE `stl2` with trend2/seasonal2/resid2.
    */
  val stlLiteSql: String =
    """stl1 AS (
      |  SELECT event_type, ts, value, seasonal, value - seasonal AS deseason FROM decomp),
      |stl2a AS (
      |  SELECT event_type, ts, value,
      |    round(avg(deseason) OVER (PARTITION BY event_type ORDER BY ts ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING), 6) AS trend2,
      |    hour(ts) AS hod2
      |  FROM stl1),
      |stl2b AS (
      |  SELECT *, avg(value - trend2) OVER (PARTITION BY event_type, hod2) AS sraw2 FROM stl2a),
      |stl2 AS (
      |  SELECT event_type, ts, value, trend2,
      |    round(sraw2 - avg(sraw2) OVER (PARTITION BY event_type), 6) AS seasonal2,
      |    round(value - trend2 - round(sraw2 - avg(sraw2) OVER (PARTITION BY event_type), 6), 6) AS resid2
      |  FROM stl2b)""".stripMargin

  /** Oracle-side equivalent of [[additive]] over a CTE named `hourly`
    * (event_type/ts/value), yielding event_type, ts, value, trend,
    * seasonal, resid as CTE `decomp`.
    */
  val additiveSql: String =
    """dec1 AS (
      |  SELECT event_type, ts, value,
      |    round(avg(value) OVER (PARTITION BY event_type ORDER BY ts ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING), 6) AS trend,
      |    hour(ts) AS hod
      |  FROM hourly),
      |dec2 AS (
      |  SELECT *, value - trend AS detrended FROM dec1),
      |dec3 AS (
      |  SELECT *, avg(detrended) OVER (PARTITION BY event_type, hod) AS seasonal_raw FROM dec2),
      |decomp AS (
      |  SELECT event_type, ts, value, trend,
      |    round(seasonal_raw - avg(seasonal_raw) OVER (PARTITION BY event_type), 6) AS seasonal,
      |    round(value - trend - round(seasonal_raw - avg(seasonal_raw) OVER (PARTITION BY event_type), 6), 6) AS resid
      |  FROM dec3)""".stripMargin
}
