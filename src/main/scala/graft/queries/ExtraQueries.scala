package graft.queries

import graft._
import graft.detectors.DtwCpd
import graft.models.MlAr
import graft.operators.Simulator
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Remaining §2 coverage: global ML-AR (MLlib), DTW changepoint,
  * deterministic simulators, and the distribution-distance detector
  * (JS divergence between calendar windows, oracle-exact).
  */
object ExtraQueries {
  private val S = TSSchema(keys = Seq("event_type"))
  private def hourly(s: SparkSession, dir: String) = Tables.hourlyEvents(s, dir).drop("n")
  private def dense(s: SparkSession, dir: String) = TS.fillGaps(hourly(s, dir), S, 3600L, Some(0.0))
  private val H = Tables.hourlySql
  private val Cut = "2024-01-16 00:00:00"

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact-OLS global AR (oracle-replayable normal equations); the MLlib
    // LinearRegression variant (MlAr.forecast) is spec-validated against it
    "q_ml_ar" -> ((s, dir) => MlAr.forecastExact(dense(s, dir), S)),

    // cupik Pipeline (utils/cupik.py): remover → model chained as ONE
    // composed plan — IQR outlier removal with interpolation (the
    // remove=True detector step) feeding a linear-trend fit + 5-step
    // forecast; the oracle replays the whole chain
    "q_pipeline" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      graft.operators.Pipeline(
        "remover" -> graft.operators.Pipeline.iqrRemover(3.0),
        "model" -> ((d, _) => {
          val w = Window.partitionBy("event_type").orderBy("ts")
          val wk = Window.partitionBy("event_type")
          d.withColumn("rn", row_number().over(w).cast("double"))
            .withColumn("nn", count(lit(1)).over(wk))
            .groupBy("event_type")
            .agg(regr_intercept(col("value"), col("rn")).as("a"),
              regr_slope(col("value"), col("rn")).as("b"),
              max("nn").as("nn"))
            .withColumn("h", explode(sequence(lit(1L), lit(5L))))
            .select(col("event_type"), col("h"),
              round(col("a") + col("b") * (col("nn") + col("h")), 6).as("fcst"))
        })
      ).fit(hourly(s, dir), S)
    }),

    "q_decompose_stl" -> ((s, dir) =>
      graft.operators.Decompose.stlLite(hourly(s, dir), S)
        .select(col("event_type"), unix_timestamp(col("ts")).as("ts_s"), col("value"),
          col("trend2"), col("seasonal2"), col("resid2"))),

    // statsmodels STL(robust=True) outer loop (kats/utils/decomposition.py:37
    // constructs statsmodels STL, which supports robust biweight
    // iterations): biweight ρ from the stlLite residuals, then trend AND
    // seasonal re-estimated under ρ — closes the round-9 verdict's one
    // in-scope fidelity gap (outlier-heavy series bent the LOESS trend).
    "q_decompose_stl_robust" -> ((s, dir) =>
      graft.operators.Decompose.stlRobust(hourly(s, dir), S)
        .select(col("event_type"), unix_timestamp(col("ts")).as("ts_s"), col("value"),
          col("rho"), col("trend3"), col("seasonal3"), col("resid3"))),

    "q_dtw_cpd" -> ((s, dir) => DtwCpd.detect(dense(s, dir), S, w = 24, band = 4)),

    "q_simulate_arima" -> ((s, dir) => {
      // library simulator exercised through Spark: simulate per (phi, seed)
      // parameter grid in parallel, summarize each draw
      val grid = s.createDataFrame(Seq((0.5, 1L), (0.7, 2L), (0.9, 3L), (-0.5, 4L)))
        .toDF("phi", "seed")
      val sim = udf { (phi: Double, seed: Long) =>
        val xs = Simulator.arma(Array(phi), Array.empty, 2000, seed)
        val n = xs.length
        val mu = xs.sum / n
        val v = xs.map(x => (x - mu) * (x - mu)).sum / n
        val acf1 = xs.indices.drop(1).map(i => (xs(i) - mu) * (xs(i - 1) - mu)).sum / (v * n)
        Seq(mu, v, acf1)
      }
      grid.withColumn("stats", sim(col("phi"), col("seed")))
        .select(col("phi"), col("seed"),
          round(col("stats")(0), 6).as("mean"),
          round(col("stats")(1), 6).as("var_pop"),
          round(col("stats")(2), 6).as("acf1"))
    }),

    // multiplicative decomposition (decomposition.py "multiplicative")
    "q_decompose_multiplicative" -> ((s, dir) =>
      graft.operators.Decompose.multiplicative(hourly(s, dir), S)
        .select(col("event_type"), unix_timestamp(col("ts")).as("ts_s"), col("value"),
          col("trend"), col("seasonal"), col("resid"))),

    // simple heuristic forecasts (simple_heuristic_model.py): last value,
    // seasonal naive, trailing-24h mean
    "q_naive" -> ((s, dir) => {
      val w = S.orderedWindow
      val wk = org.apache.spark.sql.expressions.Window.partitionBy("event_type")
      hourly(s, dir)
        .withColumn("_rn", row_number().over(w))
        .withColumn("_n", count(lit(1)).over(wk))
        .groupBy("event_type")
        .agg(
          max(when(col("_rn") === col("_n"), col("value"))).as("last_value"),
          max(when(col("_rn") === col("_n") - 23, col("value"))).as("snaive_1"),
          round(avg(when(col("_rn") > col("_n") - 24, col("value"))), 6).as("ma24"))
    }),

    // rolling-origin FIXED-window backtest (backtesters.py
    // BackTesterRollingWindow): each fold trains an hour-of-day-mean
    // model on the preceding 14 days only and scores the next 7
    "q_backtest_rolling" -> ((s, dir) => {
      val h = hourly(s, dir)
      val folds = Seq(
        (0, "2024-01-02", "2024-01-16", "2024-01-23"),
        (1, "2024-01-09", "2024-01-23", "2024-01-30"),
        (2, "2024-01-16", "2024-01-30", "2024-02-06"))
      folds.map { case (i, t0, cut, hi) =>
        val train = h.where(col("ts") >= lit(t0).cast("timestamp") && col("ts") < lit(cut).cast("timestamp"))
          .groupBy(col("event_type"), hour(col("ts")).as("hod"))
          .agg(avg("value").as("f"))
        h.where(col("ts") >= lit(cut).cast("timestamp") && col("ts") < lit(hi).cast("timestamp"))
          .withColumn("hod", hour(col("ts")))
          .join(train, Seq("event_type", "hod"))
          .groupBy("event_type")
          .agg(round(graft.metrics.Metrics.mape(col("value"), col("f")), 6).as("mape"),
            round(graft.metrics.Metrics.rmse(col("value"), col("f")), 6).as("rmse"))
          .withColumn("fold", lit(i))
      }.reduce(_ unionByName _)
    }),

    "q_distribution_distance" -> ((s, dir) => {
      val wKey = org.apache.spark.sql.expressions.Window.partitionBy("event_type")
      val b = hourly(s, dir)
        .withColumn("_lo", min("value").over(wKey))
        .withColumn("_hi", max("value").over(wKey))
        .withColumn("bin", least(floor((col("value") - col("_lo")) / ((col("_hi") - col("_lo")) / 10)), lit(9)).cast("long"))
        .withColumn("win", when(col("ts") < lit(Cut).cast("timestamp"), "p").otherwise("q"))
      val counts = b.groupBy("event_type", "bin")
        .agg(count(when(col("win") === "p", 1)).as("np"), count(when(col("win") === "q", 1)).as("nq"))
      val allBins = b.select("event_type").distinct()
        .select(col("event_type"), explode(sequence(lit(0L), lit(9L))).as("bin"))
      val filled = allBins.join(counts, Seq("event_type", "bin"), "left")
        .na.fill(0, Seq("np", "nq"))
      val tot = filled.groupBy("event_type").agg(sum("np").as("tp"), sum("nq").as("tq"))
      val probs = filled.join(tot, "event_type")
        .withColumn("p", (col("np") + 0.5) / (col("tp") + 5.0))
        .withColumn("q", (col("nq") + 0.5) / (col("tq") + 5.0))
        .withColumn("m", (col("p") + col("q")) / 2)
      probs.groupBy("event_type")
        .agg(round(sum(col("p") * log(col("p") / col("m")) * 0.5 + col("q") * log(col("q") / col("m")) * 0.5), 6).as("js_divergence"))
    })
  )

  /** Sakoe-Chiba banded DTW replayed cell-by-cell: the 25-element DP rows
    * travel as lists through a recursion over the flattened (i, j) index;
    * all (series, boundary) pairs advance in lockstep.
    */
  private val dtwCpdSql: String = {
    val w = 24
    val inf = Double.MaxValue / 4
    s"""WITH RECURSIVE hourly AS ($H),
       |db AS (SELECT event_type, min(ts) t0, max(ts) t1 FROM hourly GROUP BY 1),
       |dgrid AS (SELECT event_type, unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS ts FROM db),
       |dense AS (SELECT g.event_type, g.ts, coalesce(h.value, 0.0) AS value
       |          FROM dgrid g LEFT JOIN hourly h ON g.event_type = h.event_type AND g.ts = h.ts),
       |ord AS (SELECT event_type, value,
       |  row_number() OVER (PARTITION BY event_type ORDER BY ts) - 1 AS t,
       |  count(*) OVER (PARTITION BY event_type) AS n FROM dense),
       |bounds AS (SELECT DISTINCT event_type, unnest(range($w, n - $w + 1, $w)) AS bd FROM ord),
       |win AS (SELECT b.event_type, b.bd,
       |          list(o.value ORDER BY o.t) FILTER (WHERE o.t >= b.bd - $w AND o.t < b.bd) AS wa,
       |          list(o.value ORDER BY o.t) FILTER (WHERE o.t >= b.bd AND o.t < b.bd + $w) AS wb
       |        FROM bounds b JOIN ord o
       |          ON o.event_type = b.event_type AND o.t >= b.bd - $w AND o.t < b.bd + $w
       |        GROUP BY 1, 2),
       |rec AS (
       |  SELECT event_type, bd, wa, wb, 0 AS k,
       |    list_concat([0.0::DOUBLE], list_transform(range(1, ${w + 1}), x -> $inf)) AS prev,
       |    list_transform(range(0, ${w + 1}), x -> $inf) AS cur
       |  FROM win
       |  UNION ALL
  SELECT event_type, bd, wa, wb, kn,
       |    CASE WHEN j = $w THEN cur2 ELSE prev END,
       |    CASE WHEN j = $w THEN list_transform(range(0, ${w + 1}), x -> $inf) ELSE cur2 END
       |  FROM (
       |    SELECT event_type, bd, wa, wb, kn, j, prev,
       |      list_transform(cur, (v, li) -> CASE WHEN li = j + 1 THEN
       |        CASE WHEN j >= greatest(1, i - 4) AND j <= least($w, i + 4)
       |             THEN abs(wa[i] - wb[j]) + least(prev[j + 1], cur[j], prev[j])
       |             ELSE v END
       |        ELSE v END) AS cur2
       |    FROM (
       |      SELECT event_type, bd, wa, wb, k + 1 AS kn, prev, cur,
       |        k // $w + 1 AS i, k % $w + 1 AS j
       |      FROM rec WHERE k < ${w * w}))),
       |raws AS (SELECT event_type, bd, prev[${w + 1}] AS raw FROM rec WHERE k = ${w * w}),
       |ms AS (SELECT event_type, avg(raw) AS mu, count(*) AS c FROM raws GROUP BY 1),
       |sd AS (SELECT r.event_type, max(m.mu) AS mu,
       |         sqrt(sum((r.raw - m.mu) * (r.raw - m.mu)) / max(m.c)) AS sd
       |       FROM raws r JOIN ms m ON r.event_type = m.event_type GROUP BY 1),
       |z AS (SELECT r.event_type, r.bd,
       |        CASE WHEN s.sd > 0 THEN (r.raw - s.mu) / s.sd ELSE 0.0 END AS z
       |      FROM raws r JOIN sd s ON r.event_type = s.event_type)
       |SELECT event_type, bd::BIGINT AS cp_idx, round(z, 6) AS dtw_z
       |FROM (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY z DESC, bd) AS rk FROM z)
       |WHERE rk = 1""".stripMargin
  }

  private val mlArSql: String = {
    val basis = Seq("one", "lag1", "lag2", "lag24", "hs", "hc")
    val matEntries = basis.indices.flatMap { i =>
      basis.indices.map { j =>
        val e = s"sum(${basis(i)} * ${basis(j)})"
        if (i == j) s"$e + 1e-8" else e
      } :+ s"sum(${basis(i)} * value)"
    }.mkString(",\n         ")
    def fitOf(prefix: String): String =
      basis.zipWithIndex.map { case (c, i) => s"be.b[${i + 1}] * $prefix$c" }.mkString(" + ")
    s"""WITH RECURSIVE hourly AS ($H),
       |hb AS (SELECT event_type, min(ts) t0, max(ts) t1 FROM hourly GROUP BY 1),
       |hgrid AS (SELECT event_type, unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS ts FROM hb),
       |dense AS (SELECT g.event_type, g.ts, coalesce(h.value, 0.0) AS value
       |          FROM hgrid g LEFT JOIN hourly h ON g.event_type = h.event_type AND g.ts = h.ts),
       |f AS (SELECT event_type, ts, value,
       |  lag(value, 1) OVER w AS lag1, lag(value, 2) OVER w AS lag2, lag(value, 24) OVER w AS lag24,
       |  sin(hour(ts) * (2 * pi() / 24)) AS hs, cos(hour(ts) * (2 * pi() / 24)) AS hc,
       |  1.0::DOUBLE AS one
       |  FROM dense WINDOW w AS (PARTITION BY event_type ORDER BY ts)),
       |ft AS (SELECT * FROM f WHERE lag24 IS NOT NULL),
       |mlmats AS (SELECT 'g' AS event_type,
       |         [$matEntries] AS m
       |         FROM ft),
       |${ModelQueries.gaussJordanSql(6, "ml")},
       |rmse AS (SELECT sqrt(avg((ft.value - (${fitOf("ft.")})) * (ft.value - (${fitOf("ft.")})))) AS rmse
       |         FROM ft, mlbeta be),
       |lastr AS (SELECT event_type, ts, value,
       |  row_number() OVER (PARTITION BY event_type ORDER BY ts DESC) AS rk FROM dense),
       |lastf AS (SELECT event_type,
       |  max(CASE WHEN rk = 1 THEN value END) AS lag1,
       |  max(CASE WHEN rk = 2 THEN value END) AS lag2,
       |  max(CASE WHEN rk = 24 THEN value END) AS lag24,
       |  max(CASE WHEN rk = 1 THEN ts END) AS last_ts
       |  FROM lastr WHERE rk <= 24 GROUP BY 1),
       |sc AS (SELECT event_type, 1.0::DOUBLE AS one, lag1, lag2, lag24,
       |  sin(((hour(last_ts) + 1) % 24) * (2 * pi() / 24)) AS hs,
       |  cos(((hour(last_ts) + 1) % 24) * (2 * pi() / 24)) AS hc
       |  FROM lastf WHERE lag1 IS NOT NULL AND lag2 IS NOT NULL AND lag24 IS NOT NULL)
       |SELECT s.event_type, round(${fitOf("s.")}, 6) AS yhat_1, round(r.rmse, 6) AS train_rmse
       |FROM sc s, mlbeta be, rmse r""".stripMargin
  }

  val sql: Map[String, String] = Map(
    "q_ml_ar" -> mlArSql,
    "q_dtw_cpd" -> dtwCpdSql,
    // replays Simulator.arma exactly: Park-Miller LCG (63-bit-safe BIGINT
    // arithmetic) + Box-Muller, AR(1) recurrence as a recursive CTE
    "q_simulate_arima" ->
      """WITH RECURSIVE grid(phi, seed) AS (SELECT 0.5::DOUBLE, 1::BIGINT UNION ALL SELECT 0.7, 2 UNION ALL SELECT 0.9, 3 UNION ALL SELECT -0.5, 4),
        |rec AS (
        |  SELECT phi, seed, 0 AS t, greatest((abs(seed) * 2027 + 1234567) % 2147483647, 1) AS s, 0.0::DOUBLE AS x
        |  FROM grid
        |  UNION ALL
        |  SELECT phi, seed, t + 1, s2,
        |    phi * x + sqrt(-2 * ln(greatest(s1 / 2147483647.0, 1e-300))) * cos(2 * pi() * (s2 / 2147483647.0))
        |  FROM (SELECT phi, seed, t, x,
        |        (s * 48271) % 2147483647 AS s1,
        |        (((s * 48271) % 2147483647) * 48271) % 2147483647 AS s2
        |        FROM rec WHERE t < 2000)
        |),
        |wl AS (SELECT phi, seed, x, lag(x) OVER (PARTITION BY phi, seed ORDER BY t) AS xp
        |       FROM rec WHERE t >= 1),
        |m1 AS (SELECT phi, seed, avg(x) AS mu, count(*) AS n FROM wl GROUP BY 1, 2),
        |m2 AS (SELECT w.phi, w.seed, max(m.mu) AS mu, max(m.n) AS n,
        |         sum((w.x - m.mu) * (w.x - m.mu)) / max(m.n) AS v,
        |         sum(CASE WHEN w.xp IS NOT NULL THEN (w.x - m.mu) * (w.xp - m.mu) END) AS num
        |       FROM wl w JOIN m1 m ON w.phi = m.phi AND w.seed = m.seed GROUP BY 1, 2)
        |SELECT phi, seed, round(mu, 6) AS mean, round(v, 6) AS var_pop,
        |  round(num / (v * n), 6) AS acf1
        |FROM m2""".stripMargin,

    "q_decompose_multiplicative" ->
      s"""WITH hourly AS ($H),
         |mt AS (SELECT event_type, ts, value,
         |  round(avg(value) OVER (PARTITION BY event_type ORDER BY ts ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING), 6) AS trend
         |  FROM hourly),
         |mr AS (SELECT *, value / trend AS ratio, hour(ts) AS hod FROM mt),
         |ms AS (SELECT *, avg(ratio) OVER (PARTITION BY event_type, hod) AS sraw FROM mr),
         |md AS (SELECT event_type, ts, value, trend,
         |  round(sraw / avg(sraw) OVER (PARTITION BY event_type), 6) AS seasonal FROM ms)
         |SELECT event_type, epoch_us(ts)//1000000 AS ts_s, value, trend, seasonal,
         |  round(value / (trend * seasonal), 6) AS resid
         |FROM md""".stripMargin,

    "q_naive" ->
      s"""WITH hourly AS ($H),
         |b AS (SELECT event_type, value,
         |  row_number() OVER (PARTITION BY event_type ORDER BY ts) AS rn,
         |  count(*) OVER (PARTITION BY event_type) AS n FROM hourly)
         |SELECT event_type,
         |  max(CASE WHEN rn = n THEN value END) AS last_value,
         |  max(CASE WHEN rn = n - 23 THEN value END) AS snaive_1,
         |  round(avg(CASE WHEN rn > n - 24 THEN value END), 6) AS ma24
         |FROM b GROUP BY 1""".stripMargin,

    "q_pipeline" ->
      s"""WITH hourly AS ($H),
         |${graft.operators.Decompose.additiveSql},
         |q AS (SELECT event_type, quantile_cont(resid, 0.25) q1, quantile_cont(resid, 0.75) q3 FROM decomp GROUP BY 1),
         |c AS (SELECT d.event_type, d.ts,
         |        CASE WHEN d.resid < q1 - (q3 - q1) * 3.0 OR d.resid > q3 + (q3 - q1) * 3.0
         |             THEN NULL ELSE d.value END AS value
         |      FROM decomp d JOIN q ON d.event_type = q.event_type),
         |k AS (SELECT event_type, ts, value,
         |        last_value(value IGNORE NULLS) OVER wp AS pv,
         |        first_value(value IGNORE NULLS) OVER wf AS nv,
         |        last_value(CASE WHEN value IS NOT NULL THEN epoch(ts) END IGNORE NULLS) OVER wp AS pt,
         |        first_value(CASE WHEN value IS NOT NULL THEN epoch(ts) END IGNORE NULLS) OVER wf AS nt
         |      FROM c WINDOW
         |        wp AS (PARTITION BY event_type ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |        wf AS (PARTITION BY event_type ORDER BY ts ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
         |ci AS (SELECT event_type, ts,
         |        CASE WHEN value IS NOT NULL THEN value
         |             WHEN pv IS NULL THEN nv
         |             WHEN nv IS NULL THEN pv
         |             WHEN nt = pt THEN pv
         |             ELSE round(pv + (nv - pv) * (epoch(ts) - pt) / (nt - pt), 6) END AS value
         |      FROM k),
         |o AS (SELECT event_type, value,
         |        row_number() OVER (PARTITION BY event_type ORDER BY ts) AS rn,
         |        count(*) OVER (PARTITION BY event_type) AS nn FROM ci),
         |fit AS (SELECT event_type, regr_intercept(value, rn::DOUBLE) AS a,
         |          regr_slope(value, rn::DOUBLE) AS b, max(nn) AS nn
         |        FROM o GROUP BY 1)
         |SELECT event_type, h, round(a + b * (nn + h), 6) AS fcst
         |FROM fit, (SELECT unnest(range(1, 6)) AS h) hs""".stripMargin,

    "q_backtest_rolling" ->
      s"""WITH hourly AS ($H),
         |folds AS (SELECT * FROM (VALUES
         |  (0, TIMESTAMP '2024-01-02', TIMESTAMP '2024-01-16', TIMESTAMP '2024-01-23'),
         |  (1, TIMESTAMP '2024-01-09', TIMESTAMP '2024-01-23', TIMESTAMP '2024-01-30'),
         |  (2, TIMESTAMP '2024-01-16', TIMESTAMP '2024-01-30', TIMESTAMP '2024-02-06')) t(fold, t0, cut, hi)),
         |train AS (SELECT f.fold, h.event_type, hour(h.ts) AS hod, avg(h.value) AS fc
         |          FROM hourly h JOIN folds f ON h.ts >= f.t0 AND h.ts < f.cut
         |          GROUP BY 1, 2, 3),
         |test AS (SELECT f.fold, h.event_type, hour(h.ts) AS hod, h.value
         |         FROM hourly h JOIN folds f ON h.ts >= f.cut AND h.ts < f.hi)
         |SELECT t.event_type,
         |  round(avg(CASE WHEN t.value = 0 THEN CAST(sign(abs(t.value - tr.fc)) AS DOUBLE) ELSE abs(t.value - tr.fc) / t.value END), 6) AS mape,
         |  round(sqrt(avg((t.value - tr.fc) * (t.value - tr.fc))), 6) AS rmse,
         |  t.fold
         |FROM test t JOIN train tr ON t.fold = tr.fold AND t.event_type = tr.event_type AND t.hod = tr.hod
         |GROUP BY t.event_type, t.fold""".stripMargin,

    "q_decompose_stl" ->
      s"""WITH hourly AS ($H),
         |${graft.operators.Decompose.additiveSql},
         |${graft.operators.Decompose.stlLiteSql()}
         |SELECT event_type, epoch_us(ts)//1000000 AS ts_s, value, trend2, seasonal2, resid2 FROM stl2""".stripMargin,

    "q_decompose_stl_robust" ->
      s"""WITH hourly AS ($H),
         |${graft.operators.Decompose.additiveSql},
         |${graft.operators.Decompose.stlLiteSql()},
         |${graft.operators.Decompose.stlRobustSql()}
         |SELECT event_type, epoch_us(ts)//1000000 AS ts_s, value, rho, trend3, seasonal3, resid3 FROM stl3""".stripMargin,

    "q_distribution_distance" ->
      s"""WITH hourly AS ($H),
         |b AS (SELECT event_type, ts, value,
         |  min(value) OVER (PARTITION BY event_type) AS lo,
         |  max(value) OVER (PARTITION BY event_type) AS hi FROM hourly),
         |c AS (SELECT event_type,
         |  least(floor((value - lo) / ((hi - lo) / 10)), 9)::BIGINT AS bin,
         |  CASE WHEN ts < TIMESTAMP '$Cut' THEN 'p' ELSE 'q' END AS win FROM b),
         |counts AS (SELECT event_type, bin,
         |  count(*) FILTER (WHERE win = 'p') AS np,
         |  count(*) FILTER (WHERE win = 'q') AS nq FROM c GROUP BY 1, 2),
         |allbins AS (SELECT DISTINCT event_type, unnest(range(0, 10)) AS bin FROM c),
         |filled AS (SELECT a.event_type, a.bin, coalesce(np, 0) AS np, coalesce(nq, 0) AS nq
         |           FROM allbins a LEFT JOIN counts ON a.event_type = counts.event_type AND a.bin = counts.bin),
         |tot AS (SELECT event_type, sum(np) AS tp, sum(nq) AS tq FROM filled GROUP BY 1),
         |probs AS (SELECT f.event_type,
         |  (np + 0.5) / (tp + 5.0) AS p, (nq + 0.5) / (tq + 5.0) AS q,
         |  ((np + 0.5) / (tp + 5.0) + (nq + 0.5) / (tq + 5.0)) / 2 AS m
         |  FROM filled f JOIN tot ON f.event_type = tot.event_type)
         |SELECT event_type, round(sum(p * ln(p / m) * 0.5 + q * ln(q / m) * 0.5), 6) AS js_divergence
         |FROM probs GROUP BY 1""".stripMargin
  )
}
