package graft.queries

import graft._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** State-space + econometric operators over the hourly event series:
  *
  *  - `q_kalman_level` — local-level (random-walk + noise) Kalman filter
  *    per series: the steady-state online smoother production monitoring
  *    systems run where Kats users reach for `kats.models` trend fits
  *    (a structural-model complement to SES — same flat forecast shape,
  *    but with a principled innovation variance and gain). Fixed
  *    q/r noise ratio (gain depends only on q/r for the local-level
  *    model, so the filter is scale-free); the per-series recursion is
  *    replayed step-for-step by the oracle's recursive CTE — identical
  *    IEEE op sequence in both engines.
  *  - `q_cpd_window` — sliding-window divergence changepoint scores
  *    (the "window" method of the ruptures family; Truong et al. 2020):
  *    |mean(next 24h) − mean(prev 24h)| at full-window positions, top-5
  *    per series by (score, ts) — the cheap streaming-friendly
  *    complement to q_pelt/q_cusum that needs only two window frames,
  *    no DP. Pure window functions, whole-stage codegen end to end.
  *  - `q_cointegration` — Engle-Granger two-step cointegration test on
  *    every pair of event-type series: OLS y on x, then a
  *    Dickey-Fuller regression Δe_t = γ·e_{t−1} on the residuals;
  *    reject (cointegrated) when the DF t-statistic is below the
  *    MacKinnon 5% critical value −3.34. The multivariate long-run
  *    companion to q_granger (short-run lead/lag) and q_adf (single
  *    series unit root). Closed-form moment aggregates only — no UDF,
  *    no recursion; the pair join is keyed by timestamp and the scale
  *    axis is #pairs × series length.
  *
  * All three shuffle once per series (or pair) key; driver state is nil.
  */
object StateQueries {
  private val S = TSSchema(keys = Seq("event_type"))
  private val H = Tables.hourlySql
  private val Hc = Tables.hourlyCappedSql // pair-query series budget
  private def hourly(s: SparkSession, dir: String) =
    Tables.hourlyEvents(s, dir).drop("n")

  /** Local-level model noise variances (fixed ratio — see Scaladoc). */
  private val KQ = 1.0
  private val KR = 10.0

  /** Sliding-window half-width (hours) for q_cpd_window. */
  private val W = 24

  /** MacKinnon 5% critical value, Engle-Granger with 2 variables. */
  private val EgCrit = -3.34

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q_kalman_level" -> ((s, dir) =>
      SeriesOps.aggSeries(hourly(s, dir), S,
        Seq("n_obs", "kf_level", "kf_var", "kf_gain", "innov_rmse", "n_anom")) { xs =>
        val n = xs.length
        var l = xs(0); var p = KR
        var k = 0.0; var ss = 0.0; var na = 0.0
        var i = 1
        while (i < n) {
          val ppred = p + KQ
          val s2 = ppred + KR
          k = ppred / s2
          val innov = xs(i) - l
          // scale-free flag: innovation vs the filter's own running
          // innovation RMS (i-1 prior innovations) — not the absolute-unit
          // s2, which would make the threshold depend on the series scale
          if (i >= 2 && innov * innov > 9.0 * (ss / (i - 1))) na += 1
          ss += innov * innov
          l += k * innov
          p = (1 - k) * ppred
          i += 1
        }
        Array(n.toDouble, l, p, k, math.sqrt(ss / (n - 1)), na)
      }),

    "q_cpd_window" -> ((s, dir) => {
      val wOrd = Window.partitionBy("event_type").orderBy("ts")
      val wL = wOrd.rowsBetween(-W, -1)
      val wR = wOrd.rowsBetween(0, W - 1)
      val wK = Window.partitionBy("event_type")
      val scored = hourly(s, dir)
        .withColumn("rn", row_number().over(wOrd))
        .withColumn("n", count(lit(1)).over(wK))
        .withColumn("left_mean", round(avg("value").over(wL), 6))
        .withColumn("right_mean", round(avg("value").over(wR), 6))
        .where(col("rn") > W && col("rn") <= col("n") - (W - 1))
        .withColumn("score", round(abs(col("right_mean") - col("left_mean")), 6))
      scored
        .withColumn("rank", row_number().over(
          Window.partitionBy("event_type").orderBy(col("score").desc, col("ts"))))
        .where(col("rank") <= 5)
        .select(col("event_type"), col("rank"), col("ts"),
          col("score"), col("left_mean"), col("right_mean"))
    }),

    // Greedy binary-segmentation changepoint scan (detectors/Binseg.scala)
    // — the O(n·depth) complement of the exact O(n²) q_pelt DP, sharing
    // its penalty, prefix-sum discipline and first-argmax tie convention
    // so the oracle can replay every split decision relationally (two
    // unrolled argmax levels instead of a DP recursion). Fixed depth 2:
    // root + both child splits reported with gain + significance.
    "q_binseg" -> ((s, dir) => {
      val coll = SeriesOps.collect(hourly(s, dir), S)
      val fn = udf { xs: Seq[Double] => graft.detectors.Binseg.splits(xs.toArray) }
      coll.withColumn("sp", fn(col("xs")))
        .select(col("event_type"), explode(col("sp")).as("s"))
        .select(col("event_type"), col("s._1").as("split_no"),
          col("s._2").as("split_idx"), round(col("s._3"), 6).as("gain"),
          col("s._4").as("significant"))
    }),

    // Hourly OHLC + volume bars from RAW events — the bar-building
    // primitive the tech pack (MACD/RSI/BBands) consumes in a market-data
    // deployment: open/close by (ts, event_id) order within the bar,
    // high/low/count/sum aggregates. One (event_type, hour) keyed window
    // whose partitioning the following groupBy reuses — a single shuffle,
    // map-side partial aggregation for the min/max/sum half.
    "q_ohlc_bars" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_type"), date_trunc("hour", col("ts")).as("hour"),
          col("ts"), col("event_id"), col("value"))
      val w = Window.partitionBy("event_type", "hour").orderBy(col("ts"), col("event_id"))
      val wAll = Window.partitionBy("event_type", "hour")
      ev.withColumn("rn", row_number().over(w))
        .withColumn("cnt", count(lit(1)).over(wAll))
        .groupBy("event_type", "hour").agg(
          round(max(when(col("rn") === 1, col("value"))), 6).as("open"),
          round(max(when(col("rn") === col("cnt"), col("value"))), 6).as("close"),
          round(max("value"), 6).as("high"), round(min("value"), 6).as("low"),
          count(lit(1)).as("n_events"), round(sum("value"), 6).as("v_sum"))
    }),

    // Siegel repeated-median trend (Siegel 1982): slope = median over i of
    // median over j of pairwise slopes — the 50%-breakdown-point upgrade
    // of q_theil_sen's single-median (29%). Entirely order statistics on
    // deterministically-computed values (no float SUMS at all), so both
    // engines agree exactly by construction; slope snapped to 6 dp before
    // the intercept/MAD residual stages reuse it. O(n²) per series after
    // the one-row reduction — same class as theil_sen/matrix_profile.
    "q_siegel_trend" -> ((s, dir) => {
      val fn = udf { xs: Seq[Double] => graft.detectors.Siegel.fit(xs.toArray) }
      SeriesOps.collect(hourly(s, dir), S)
        .withColumn("_r", fn(col("xs")))
        .select(col("event_type"), col("_r._1").as("slope"),
          col("_r._2").as("intercept"), round(col("_r._3"), 6).as("mad_resid"),
          col("_r._4").as("n_points"))
    }),

    "q_cointegration" -> ((s, dir) => {
      val h = Tables.hourlyEventsCapped(s, dir).drop("n")
      val a = h.select(col("event_type").as("x_type"), col("ts"), col("value").as("x"))
      val b = h.select(col("event_type").as("y_type"), col("ts"), col("value").as("y"))
      val pairs = a.join(b, Seq("ts")).where(col("x_type") < col("y_type"))
      // stage 1: OLS y = alpha + beta x per pair, coefficients snapped to
      // 6 dp so stage 2's residuals are bit-identical in both engines
      val fit = pairs.groupBy("x_type", "y_type").agg(
        count(lit(1)).as("n_obs"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("y")).as("sxy"))
        .withColumn("beta", round((col("n_obs") * col("sxy") - col("sx") * col("sy")) /
          (col("n_obs") * col("sxx") - col("sx") * col("sx")), 6))
        .withColumn("alpha", round((col("sy") - col("beta") * col("sx")) / col("n_obs"), 6))
        .select("x_type", "y_type", "n_obs", "alpha", "beta")
      // stage 2: Dickey-Fuller on the 6-dp residuals (10-row fit side —
      // broadcast back onto the pair rows, one pair-keyed window)
      val res = pairs.join(broadcast(fit), Seq("x_type", "y_type"))
        .withColumn("e", round(col("y") - col("alpha") - col("beta") * col("x"), 6))
        .withColumn("e_lag", lag("e", 1).over(
          Window.partitionBy("x_type", "y_type").orderBy("ts")))
        .where(col("e_lag").isNotNull)
        .withColumn("de", col("e") - col("e_lag"))
      // one aggregation carries all four DF moments; the residual SSE
      // follows from them with the snapped gamma (sse = Σde² − 2γΣe·de
      // + γ²Σe²) — no second pass over the pair rows
      res.groupBy("x_type", "y_type").agg(
        count(lit(1)).as("m"),
        sum(col("e_lag") * col("de")).as("sld"),
        sum(col("e_lag") * col("e_lag")).as("sll"),
        sum(col("de") * col("de")).as("sdd"),
        first("n_obs").as("n_obs"), first("alpha").as("alpha"), first("beta").as("beta"))
        .withColumn("gamma", round(col("sld") / col("sll"), 6))
        .withColumn("sse", col("sdd") - lit(2.0) * col("gamma") * col("sld") +
          col("gamma") * col("gamma") * col("sll"))
        .withColumn("adf_t", round(col("gamma") /
          sqrt((col("sse") / (col("m") - 1)) / col("sll")), 6))
        .select(col("x_type"), col("y_type"), col("n_obs"),
          col("alpha"), col("beta"), col("gamma"), col("adf_t"),
          (col("adf_t") < EgCrit).as("cointegrated"))
    })
  )

  val sql: Map[String, String] = Map(

    "q_kalman_level" ->
      s"""WITH RECURSIVE hourly AS ($H),
         |ord AS (SELECT event_type, value, row_number() OVER (PARTITION BY event_type ORDER BY ts) AS rn,
         |        count(*) OVER (PARTITION BY event_type) AS n FROM hourly),
         |rec AS (
         |  SELECT event_type, 1 AS i, value AS l, $KR::DOUBLE AS p, 0.0::DOUBLE AS k,
         |         0.0::DOUBLE AS ss, 0.0::DOUBLE AS na, n FROM ord WHERE rn = 1
         |  UNION ALL
         |  SELECT r.event_type, r.i + 1,
         |    r.l + ((r.p + $KQ) / ((r.p + $KQ) + $KR)) * (o.value - r.l),
         |    (1 - (r.p + $KQ) / ((r.p + $KQ) + $KR)) * (r.p + $KQ),
         |    (r.p + $KQ) / ((r.p + $KQ) + $KR),
         |    r.ss + (o.value - r.l) * (o.value - r.l),
         |    r.na + CASE WHEN r.i >= 2 AND (o.value - r.l) * (o.value - r.l) > 9.0 * (r.ss / (r.i - 1))
         |           THEN 1.0 ELSE 0.0 END,
         |    r.n
         |  FROM rec r JOIN ord o ON o.event_type = r.event_type AND o.rn = r.i + 1
         |  WHERE r.i + 1 <= r.n)
         |SELECT event_type, round(n::DOUBLE, 6) AS n_obs, round(l, 6) AS kf_level,
         |  round(p, 6) AS kf_var, round(k, 6) AS kf_gain,
         |  round(sqrt(ss / (n - 1)), 6) AS innov_rmse, round(na, 6) AS n_anom
         |FROM rec WHERE i = n""".stripMargin,

    "q_cpd_window" ->
      s"""WITH hourly AS ($H),
         |scored AS (
         |  SELECT event_type, ts,
         |    row_number() OVER (PARTITION BY event_type ORDER BY ts) AS rn,
         |    count(*) OVER (PARTITION BY event_type) AS n,
         |    round(avg(value) OVER (PARTITION BY event_type ORDER BY ts
         |      ROWS BETWEEN $W PRECEDING AND 1 PRECEDING), 6) AS left_mean,
         |    round(avg(value) OVER (PARTITION BY event_type ORDER BY ts
         |      ROWS BETWEEN CURRENT ROW AND ${W - 1} FOLLOWING), 6) AS right_mean
         |  FROM hourly),
         |full_w AS (
         |  SELECT *, round(abs(right_mean - left_mean), 6) AS score
         |  FROM scored WHERE rn > $W AND rn <= n - ${W - 1}),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY score DESC, ts) AS rank
         |  FROM full_w)
         |SELECT event_type, rank::INT AS rank, ts, score, left_mean, right_mean
         |FROM ranked WHERE rank <= 5""".stripMargin,

    "q_binseg" -> {
      // shared SSE/gain fragments over the prefix lists (0-based segment
      // [u, v) — lists are 1-indexed with a prepended 0). Prefixes are
      // EXACT scaled integers (values ×10², squares ×10⁴ — the Binseg
      // kernel's quantization): a double cumulative window sum is
      // segment-tree-ordered in DuckDB and drifted an ulp at 3600 rows
      // (first full sf0.1 gate, round 10).
      def sse(u: String, v: String) =
        s"(((p.s2[($v) + 1] - p.s2[($u) + 1])::DOUBLE / 1e4) - " +
          s"((p.sx[($v) + 1] - p.sx[($u) + 1])::DOUBLE / 1e2) * ((p.sx[($v) + 1] - p.sx[($u) + 1])::DOUBLE / 1e2) / (($v) - ($u)))"
      def gain(a: String, b: String, t: String) =
        s"${sse(a, b)} - ${sse(a, t)} - ${sse(t, b)}"
      s"""WITH hourly AS ($H),
         |ord AS (SELECT event_type, round(value * 100)::BIGINT AS v100,
         |    row_number() OVER (PARTITION BY event_type ORDER BY ts) AS rn,
         |    count(*) OVER (PARTITION BY event_type) AS n
         |  FROM hourly),
         |pre AS (SELECT event_type, rn, n,
         |    (sum(v100) OVER (PARTITION BY event_type ORDER BY rn))::BIGINT AS sx,
         |    (sum(v100 * v100) OVER (PARTITION BY event_type ORDER BY rn))::BIGINT AS s2
         |  FROM ord),
         |arr AS (SELECT event_type, max(n) AS n,
         |    list_prepend(0::BIGINT, list(sx ORDER BY rn)) AS sx,
         |    list_prepend(0::BIGINT, list(s2 ORDER BY rn)) AS s2
         |  FROM pre GROUP BY 1),
         |par AS (SELECT *,
         |    2.0 * greatest(((s2[n + 1]::DOUBLE / 1e4) - (sx[n + 1]::DOUBLE / 1e2) * (sx[n + 1]::DOUBLE / 1e2) / n) / n, 0.0)
         |      * ln(CAST(n AS DOUBLE)) AS beta
         |  FROM arr),
         |c1 AS (SELECT o.event_type, o.rn AS t, ${gain("0", "p.n", "o.rn")} AS g
         |  FROM ord o JOIN par p USING (event_type)
         |  WHERE o.rn BETWEEN 24 AND p.n - 24),
         |s1 AS (SELECT event_type, t AS t1, g AS g1 FROM (
         |    SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY g DESC, t) AS rk
         |    FROM c1) WHERE rk = 1),
         |c2 AS (SELECT o.event_type, o.rn AS t,
         |    CASE WHEN o.rn < s.t1 THEN ${gain("0", "s.t1", "o.rn")}
         |         ELSE ${gain("s.t1", "p.n", "o.rn")} END AS g,
         |    CASE WHEN o.rn < s.t1 THEN 2 ELSE 3 END AS split_no
         |  FROM ord o JOIN s1 s USING (event_type) JOIN par p USING (event_type)
         |  WHERE (o.rn BETWEEN 24 AND s.t1 - 24) OR (o.rn BETWEEN s.t1 + 24 AND p.n - 24)),
         |s2s AS (SELECT event_type, split_no, t, g FROM (
         |    SELECT *, row_number() OVER (PARTITION BY event_type, split_no ORDER BY g DESC, t) AS rk
         |    FROM c2) WHERE rk = 1),
         |allsp AS (
         |  SELECT event_type, 1 AS split_no, t1 AS t, g1 AS g FROM s1
         |  UNION ALL SELECT event_type, split_no, t, g FROM s2s)
         |SELECT a.event_type, a.split_no::INT AS split_no, a.t::INT AS split_idx,
         |  round(a.g, 6) AS gain, a.g > p.beta AS significant
         |FROM allsp a JOIN par p USING (event_type)""".stripMargin
    },

    "q_ohlc_bars" ->
      """WITH ev AS (SELECT event_type, date_trunc('hour', ts) AS hour, ts, event_id, value
        |            FROM events),
        |r AS (SELECT *,
        |    row_number() OVER (PARTITION BY event_type, hour ORDER BY ts, event_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type, hour) AS cnt
        |  FROM ev)
        |SELECT event_type, hour,
        |  round(max(CASE WHEN rn = 1 THEN value END), 6) AS open,
        |  round(max(CASE WHEN rn = cnt THEN value END), 6) AS close,
        |  round(max(value), 6) AS high, round(min(value), 6) AS low,
        |  count(*)::BIGINT AS n_events, round(sum(value), 6) AS v_sum
        |FROM r GROUP BY 1, 2""".stripMargin,

    "q_siegel_trend" ->
      s"""WITH hourly AS ($H),
         |ord AS (SELECT event_type, value,
         |    row_number() OVER (PARTITION BY event_type ORDER BY ts) AS rn,
         |    count(*) OVER (PARTITION BY event_type) AS n
         |  FROM hourly),
         |pairs AS (SELECT a.event_type, a.rn AS i, (b.value - a.value) / (b.rn - a.rn) AS sl
         |  FROM ord a JOIN ord b ON b.event_type = a.event_type AND b.rn <> a.rn),
         |rk1 AS (SELECT *, row_number() OVER (PARTITION BY event_type, i ORDER BY sl) AS rk,
         |    count(*) OVER (PARTITION BY event_type, i) AS m FROM pairs),
         |med1 AS (SELECT event_type, i,
         |    (max(CASE WHEN rk = (m + 1) // 2 THEN sl END)
         |   + max(CASE WHEN rk = m // 2 + 1 THEN sl END)) / 2.0E0 AS mi
         |  FROM rk1 GROUP BY 1, 2),
         |rk2 AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY mi) AS rk,
         |    count(*) OVER (PARTITION BY event_type) AS nn FROM med1),
         |sl AS (SELECT event_type, round((max(CASE WHEN rk = (nn + 1) // 2 THEN mi END)
         |   + max(CASE WHEN rk = nn // 2 + 1 THEN mi END)) / 2.0E0, 6) AS slope
         |  FROM rk2 GROUP BY 1),
         |res AS (SELECT o.event_type, o.n, o.value - s.slope * (o.rn - 1) AS r, s.slope
         |  FROM ord o JOIN sl s USING (event_type)),
         |rk3 AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY r) AS rk
         |  FROM res),
         |ic AS (SELECT event_type, round((max(CASE WHEN rk = (n + 1) // 2 THEN r END)
         |   + max(CASE WHEN rk = n // 2 + 1 THEN r END)) / 2.0E0, 6) AS intercept
         |  FROM rk3 GROUP BY 1),
         |res2 AS (SELECT o.event_type, o.n, s.slope, c.intercept,
         |    abs(o.value - (c.intercept + s.slope * (o.rn - 1))) AS ar
         |  FROM ord o JOIN sl s USING (event_type) JOIN ic c USING (event_type)),
         |rk4 AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY ar) AS rk
         |  FROM res2)
         |SELECT event_type, max(slope) AS slope, max(intercept) AS intercept,
         |  round(1.4826E0 * ((max(CASE WHEN rk = (n + 1) // 2 THEN ar END)
         |    + max(CASE WHEN rk = n // 2 + 1 THEN ar END)) / 2.0E0), 6) AS mad_resid,
         |  max(n)::INT AS n_points
         |FROM rk4 GROUP BY 1""".stripMargin,

    "q_cointegration" ->
      s"""WITH hourly AS ($Hc),
         |pairs AS (
         |  SELECT a.event_type AS x_type, b.event_type AS y_type, a.ts,
         |         a.value AS x, b.value AS y
         |  FROM hourly a JOIN hourly b ON a.ts = b.ts AND a.event_type < b.event_type),
         |fit AS (
         |  SELECT x_type, y_type, count(*) AS n_obs, sum(x) AS sx, sum(y) AS sy,
         |         sum(x * x) AS sxx, sum(x * y) AS sxy
         |  FROM pairs GROUP BY 1, 2),
         |coef AS (
         |  SELECT x_type, y_type, n_obs,
         |    round((n_obs * sxy - sx * sy) / (n_obs * sxx - sx * sx), 6) AS beta,
         |    round((sy - round((n_obs * sxy - sx * sy) / (n_obs * sxx - sx * sx), 6) * sx) / n_obs, 6) AS alpha
         |  FROM fit),
         |res AS (
         |  SELECT p.x_type, p.y_type, p.ts,
         |    round(p.y - c.alpha - c.beta * p.x, 6) AS e,
         |    lag(round(p.y - c.alpha - c.beta * p.x, 6), 1)
         |      OVER (PARTITION BY p.x_type, p.y_type ORDER BY p.ts) AS e_lag,
         |    c.n_obs, c.alpha, c.beta
         |  FROM pairs p JOIN coef c USING (x_type, y_type)),
         |d AS (SELECT *, e - e_lag AS de FROM res WHERE e_lag IS NOT NULL),
         |g0 AS (
         |  SELECT x_type, y_type, count(*) AS m,
         |    sum(e_lag * de) AS sld, sum(e_lag * e_lag) AS sll, sum(de * de) AS sdd,
         |    max(n_obs) AS n_obs, max(alpha) AS alpha, max(beta) AS beta
         |  FROM d GROUP BY 1, 2),
         |g AS (SELECT *, round(sld / sll, 6) AS gamma FROM g0),
         |s AS (SELECT *, sdd - 2.0 * gamma * sld + gamma * gamma * sll AS sse FROM g)
         |SELECT x_type, y_type, n_obs, alpha, beta, gamma,
         |  round(gamma / sqrt((sse / (m - 1)) / sll), 6) AS adf_t,
         |  round(gamma / sqrt((sse / (m - 1)) / sll), 6) < $EgCrit AS cointegrated
         |FROM s""".stripMargin
  )
}
