package graft.queries

import graft._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Forecast-uncertainty operators with reference-exact interval math:
  *
  *  - `q_theta_ci` — the theta model's prediction intervals exactly as the
  *    reference computes them (kats/models/theta.py:199-222 `predict`):
  *    SES forecast plus the drift correction
  *    `fcst_h = l_n + (b/2)·((h−1) + const)`, `const = (1−(1−α)^n)/α`,
  *    and the Hyndman-caveated standard error
  *    `se_h = sqrt(sse/(n−2))·sqrt((h−1)·α² + 1)` with the normal z at
  *    alpha=0.05 (`-norm.ppf(0.025)` inlined as its 17-digit literal —
  *    the significance level is a model constant, so no quantile
  *    inversion is needed at plan time).
  *
  * The SES recursion (level + running SSE over one-step-ahead errors) is
  * replayed step-for-step by the oracle's recursive CTE, with the SSE
  * accumulated in the same sequential order as the Scala kernel — the
  * engines execute the identical float sequence. One series-keyed shuffle;
  * the per-series kernel is O(n) after the one-row-per-series reduction.
  */
object CiQueries {
  private val S = TSSchema(keys = Seq("event_type"))
  private val H = Tables.hourlySql
  private def hourly(s: SparkSession, dir: String) =
    Tables.hourlyEvents(s, dir).drop("n")

  /** SES smoothing level (the deterministic stand-in for statsmodels'
    * MLE fit, as across the smoothing family) and the 95% normal z. */
  private val Alpha = 0.2
  private val Z95 = 1.959963984540054

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q_theta_ci" -> ((s, dir) =>
      SeriesOps.aggSeries(hourly(s, dir), S,
        Seq("yhat_1", "lo_1", "hi_1", "yhat_24", "lo_24", "hi_24")) { xs =>
        val n = xs.length
        // OLS slope of x on t = 0..n-1 (same moment accumulation as theta)
        var st = 0.0; var sx = 0.0; var stt = 0.0; var stx = 0.0
        var t = 0
        while (t < n) { st += t; sx += xs(t); stt += t.toDouble * t; stx += t * xs(t); t += 1 }
        val b = (n * stx - st * sx) / (n * stt - st * st)
        val drift = b / 2.0
        // SES(alpha) level + running one-step-ahead SSE, l_1 = x_1
        var l = xs(0); var sse = 0.0
        var i = 1
        while (i < n) { val e = xs(i) - l; sse += e * e; l = Alpha * xs(i) + (1 - Alpha) * l; i += 1 }
        val const = (1.0 - math.pow(1 - Alpha, n)) / Alpha
        val sigma = math.sqrt(sse / (n - 2))
        def f(h: Int) = l + drift * ((h - 1) + const)
        def se(h: Int) = sigma * math.sqrt((h - 1) * Alpha * Alpha + 1.0)
        Array(f(1), f(1) - Z95 * se(1), f(1) + Z95 * se(1),
          f(24), f(24) - Z95 * se(24), f(24) + Z95 * se(24))
      }),

    // ── ARIMA(2,1,1) forecast intervals via psi weights: the moving-
    // average representation of the fitted ARMA gives ψ₀=1, ψ₁=φ₁+θ₁,
    // ψ_j=φ₁ψ_{j−1}+φ₂ψ_{j−2}; after one integration the h-step forecast
    // variance is σ²·Σ_{j<h}(Σ_{i≤j}ψ_i)² and the interval is the normal
    // z band (the large-sample band statsmodels ships for ARIMA). The
    // psi/cumulative/variance recursion is sequential and the oracle
    // appends the same recursion to the shared Hannan-Rissanen core. ──
    "q_arima_ci" -> ((s, dir) =>
      SeriesOps.aggSeries(Tables.hourlyEvents(s, dir).drop("n"), S,
        Seq("yhat_1", "lo_1", "hi_1", "yhat_24", "lo_24", "hi_24")) { xs =>
        val f = graft.models.Arima.fit(xs, p = 2, d = 1, q = 1)
        val fc = graft.models.Arima.forecast(xs, p = 2, d = 1, q = 1, h = 24)
        val sigma = math.sqrt(f.sigma2)
        val se = new Array[Double](24)
        var psiPrev2 = 0.0; var psiPrev1 = 1.0
        var cum = 1.0
        var ssq = 1.0
        se(0) = sigma * math.sqrt(ssq)
        var j = 1
        while (j < 24) {
          val psi = if (j == 1) f.phi(0) + f.theta(0)
                    else f.phi(0) * psiPrev1 + f.phi(1) * psiPrev2
          psiPrev2 = psiPrev1; psiPrev1 = psi
          cum = cum + psi
          ssq = ssq + cum * cum
          se(j) = sigma * math.sqrt(ssq)
          j += 1
        }
        Array(fc(0), fc(0) - Z95 * se(0), fc(0) + Z95 * se(0),
          fc(23), fc(23) - Z95 * se(23), fc(23) + Z95 * se(23))
      })
  )

  val sql: Map[String, String] = Map(

    "q_theta_ci" ->
      s"""WITH RECURSIVE hourly AS ($H),
         |ord AS (SELECT event_type, value, row_number() OVER (PARTITION BY event_type ORDER BY ts) AS rn,
         |        count(*) OVER (PARTITION BY event_type) AS n FROM hourly),
         |fit AS (SELECT event_type, regr_slope(value, (rn - 1)::DOUBLE) AS b, max(n) AS n
         |        FROM ord GROUP BY 1),
         |rec AS (
         |  SELECT event_type, 1 AS i, value AS l, 0.0::DOUBLE AS sse, n FROM ord WHERE rn = 1
         |  UNION ALL
         |  SELECT r.event_type, r.i + 1,
         |    0.2E0 * o.value + (1 - 0.2E0) * r.l,
         |    r.sse + (o.value - r.l) * (o.value - r.l),
         |    r.n
         |  FROM rec r JOIN ord o ON o.event_type = r.event_type AND o.rn = r.i + 1
         |  WHERE r.i + 1 <= r.n),
         |fin AS (SELECT r.event_type, r.l, r.sse, r.n, f.b / 2.0E0 AS drift,
         |          (1.0E0 - pow(1 - 0.2E0, r.n)) / 0.2E0 AS cst,
         |          sqrt(r.sse / (r.n - 2)) AS sigma
         |        FROM rec r JOIN fit f ON r.event_type = f.event_type
         |        WHERE r.i = r.n)
         |SELECT event_type,
         |  round(l + drift * (0 + cst), 6) AS yhat_1,
         |  round((l + drift * (0 + cst)) - $Z95 * (sigma * sqrt((0 * 0.2E0) * 0.2E0 + 1.0E0)), 6) AS lo_1,
         |  round((l + drift * (0 + cst)) + $Z95 * (sigma * sqrt((0 * 0.2E0) * 0.2E0 + 1.0E0)), 6) AS hi_1,
         |  round(l + drift * (23 + cst), 6) AS yhat_24,
         |  round((l + drift * (23 + cst)) - $Z95 * (sigma * sqrt((23 * 0.2E0) * 0.2E0 + 1.0E0)), 6) AS lo_24,
         |  round((l + drift * (23 + cst)) + $Z95 * (sigma * sqrt((23 * 0.2E0) * 0.2E0 + 1.0E0)), 6) AS hi_24
         |FROM fin""".stripMargin,

    "q_arima_ci" ->
      s"""${ModelQueries.arimaCoreSql},
         |psirec AS (
         |  SELECT event_type, 0 AS j, 0.0::DOUBLE AS psi2, 1.0::DOUBLE AS psi1,
         |         1.0::DOUBLE AS cum, 1.0::DOUBLE AS ssq, b
         |  FROM g2beta
         |  UNION ALL
         |  SELECT event_type, j + 1, psi1, psin, cum + psin,
         |         ssq + (cum + psin) * (cum + psin), b
         |  FROM (SELECT *, CASE WHEN j = 0 THEN b[2] + b[4]
         |                       ELSE b[2] * psi1 + b[3] * psi2 END AS psin
         |        FROM psirec WHERE j < 23)),
         |se AS (SELECT p.event_type, p.j, $Z95 * (sqrt(s.sigma2) * sqrt(p.ssq)) AS zse
         |       FROM psirec p JOIN sig s ON p.event_type = s.event_type)
         |SELECT f.event_type,
         |  round(max(CASE WHEN f.h = 1 THEN f.acc END), 6) AS yhat_1,
         |  round(max(CASE WHEN f.h = 1 THEN f.acc END) - max(CASE WHEN e.j = 0 THEN e.zse END), 6) AS lo_1,
         |  round(max(CASE WHEN f.h = 1 THEN f.acc END) + max(CASE WHEN e.j = 0 THEN e.zse END), 6) AS hi_1,
         |  round(max(CASE WHEN f.h = 24 THEN f.acc END), 6) AS yhat_24,
         |  round(max(CASE WHEN f.h = 24 THEN f.acc END) - max(CASE WHEN e.j = 23 THEN e.zse END), 6) AS lo_24,
         |  round(max(CASE WHEN f.h = 24 THEN f.acc END) + max(CASE WHEN e.j = 23 THEN e.zse END), 6) AS hi_24
         |FROM fcrec f JOIN se e ON f.event_type = e.event_type
         |GROUP BY f.event_type""".stripMargin
  )
}
