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

  /** Tricube-weighted local-linear (LOESS) smoother over the row index —
    * the statsmodels-STL trend smoother's shape (Cleveland 1979;
    * kats/utils/decomposition.py delegates to statsmodels STL, whose
    * trend pass is a loess of the deseasonalized series). At the window
    * CENTER the symmetric tricube weights cancel the slope term, so
    * interior points are a weighted MA; at the BOUNDARIES the
    * local-linear fit keeps the slope — the systematic edge bias of the
    * plain centered MA (which flattens any trending series' first/last
    * `half` points) is gone, which was the largest numerical deviation
    * users saw against statsmodels.
    *
    * λ = half+1 keeps every window point at positive weight. All five
    * accumulators run ascending-index, so the oracle's list_sum replay
    * is the identical float sequence.
    */
  def loessSmooth(xs: Array[Double], half: Int): Array[Double] = {
    val n = xs.length
    val lam = (half + 1).toDouble
    Array.tabulate(n) { t =>
      val lo = math.max(0, t - half)
      val hi = math.min(n - 1, t + half)
      var s0 = 0.0; var s1 = 0.0; var s2 = 0.0; var t0 = 0.0; var t1 = 0.0
      var i = lo
      while (i <= hi) {
        val d = (i - t).toDouble
        val u = math.abs(d) / lam
        val c = 1.0 - u * u * u
        val w = c * c * c
        s0 += w; s1 += w * d; s2 += w * d * d; t0 += w * xs(i); t1 += w * d * xs(i)
        i += 1
      }
      val den = s0 * s2 - s1 * s1
      if (den > 0) (s2 * t0 - s1 * t1) / den else t0 / s0
    }
  }

  /** Iterated STL-flavored decomposition: pass-1 additive (MA trend),
    * then the trend is RE-estimated on the deseasonalized series with
    * the tricube local-linear smoother [[loessSmooth]] — the statsmodels
    * STL trend semantics — and seasonality is re-estimated against the
    * refined trend. The loess runs in the one-series-per-row kernel
    * (ONE keyed shuffle; O(n·half) per series); seasonal/resid stay
    * window-function plans.
    */
  def stlLite(df: DataFrame, s: TSSchema, half: Int = 12): DataFrame = {
    val pass1 = additive(df, s, half)
    val wHod = Window.partitionBy((s.keyCols :+ col("_hod2")): _*)
    val wKey = Window.partitionBy(s.keyCols: _*)
    val fn = udf { dvs: Seq[Double] => loessSmooth(dvs.toArray, half).toSeq }
    val sm = pass1
      .withColumn("_deseason", col(s.value) - col("seasonal"))
      .groupBy(s.keyCols: _*)
      .agg(sort_array(collect_list(struct(col(s.ts).as("t"),
        col(s.value).cast("double").as("v"),
        col("_deseason").cast("double").as("dv")))).as("_p"))
      .withColumn("_tr", fn(col("_p.dv")))
      .withColumn("_t", col("_p.t")).withColumn("_v", col("_p.v"))
      .withColumn("_z", explode(arrays_zip(col("_t"), col("_v"), col("_tr"))))
      .select((s.keyCols :+ col("_z._t").as(s.ts) :+ col("_z._v").as(s.value) :+
        round(col("_z._tr"), 6).as("trend2")): _*)
    sm
      .withColumn("_hod2", hour(col(s.ts)))
      .withColumn("_detr2", col(s.value) - col("trend2"))
      .withColumn("_sraw2", avg("_detr2").over(wHod))
      .withColumn("seasonal2", round(col("_sraw2") - avg("_sraw2").over(wKey), 6))
      .withColumn("resid2", round(col(s.value) - col("trend2") - col("seasonal2"), 6))
      .drop("_hod2", "_detr2", "_sraw2")
  }

  /** Oracle-side equivalent of [[stlLite]] on top of [[additiveSql]]'s
    * `decomp` CTE, yielding CTE `stl2` with trend2/seasonal2/resid2 —
    * the loess replayed per position with the same ascending-index
    * accumulation as [[loessSmooth]].
    */
  def stlLiteSql(half: Int = 12): String = {
    val lam = (half + 1).toDouble
    val u = s"(abs(i - t)::DOUBLE / $lam)"
    val c = s"(1.0 - $u * $u * $u)"
    val w = s"($c * $c * $c)"
    def sm(body: String) =
      s"list_sum(list_transform(range(greatest(1, t - $half), least(len(pts), t + $half) + 1), i -> $body))"
    s"""stl1 AS (
       |  SELECT event_type, ts, value, value - seasonal AS dv FROM decomp),
       |stlser AS (
       |  SELECT event_type,
       |    list_transform(list_sort(list_zip(list(ts), list(value), list(dv))),
       |                   z -> struct_pack(t := z[1], v := z[2], dv := z[3])) AS pts
       |  FROM stl1 GROUP BY 1),
       |stltr AS (
       |  SELECT event_type, pts,
       |    list_transform(
       |      list_transform(range(1, len(pts) + 1), t -> struct_pack(
       |        s0 := ${sm(w)},
       |        s1 := ${sm(s"$w * (i - t)")},
       |        s2 := ${sm(s"$w * (i - t) * (i - t)")},
       |        t0 := ${sm(s"$w * pts[i].dv")},
       |        t1 := ${sm(s"$w * (i - t) * pts[i].dv")})),
       |      q -> CASE WHEN q.s0 * q.s2 - q.s1 * q.s1 > 0
       |                THEN (q.s2 * q.t0 - q.s1 * q.t1) / (q.s0 * q.s2 - q.s1 * q.s1)
       |                ELSE q.t0 / q.s0 END) AS tr
       |  FROM stlser),
       |stl2a AS (
       |  SELECT event_type, unnest(pts).t AS ts, unnest(pts).v AS value,
       |    round(unnest(tr), 6) AS trend2, hour(unnest(pts).t) AS hod2
       |  FROM stltr),
       |stl2b AS (
       |  SELECT *, avg(value - trend2) OVER (PARTITION BY event_type, hod2) AS sraw2 FROM stl2a),
       |stl2 AS (
       |  SELECT event_type, ts, value, trend2,
       |    round(sraw2 - avg(sraw2) OVER (PARTITION BY event_type), 6) AS seasonal2,
       |    round(value - trend2 - round(sraw2 - avg(sraw2) OVER (PARTITION BY event_type), 6), 6) AS resid2
       |  FROM stl2b)""".stripMargin
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
