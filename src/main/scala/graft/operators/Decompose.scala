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
