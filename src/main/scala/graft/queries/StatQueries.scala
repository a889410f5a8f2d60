package graft.queries

import graft._
import graft.metrics.Metrics
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-3 additions past the r2 verdict list: the long tail of
  * kats/metrics/metrics.py (median / log / probability-space metrics),
  * granularity inference (kats/consts.py infer_freq_robust), and circular
  * calendar encodings (kats/utils/feature_engineering.py:circle_encode).
  *
  * CRPS / LEPS need the empirical CDF of the actuals evaluated at both the
  * actuals and the forecasts. ECDF(v) = count(y ≤ v)/n is computed
  * distributed: distinct actuals with a cumulative count per series (one
  * keyed window), then forecasts pick up the floor entry via the
  * union+ordered-window as-of shape — no self-join, no driver state, scales
  * with rows not rows².
  */
object StatQueries {
  private def hourly(s: SparkSession, dir: String) = Tables.hourlyEvents(s, dir)
  private val H = Tables.hourlySql

  /** per-series (value, f) rows for the seasonal-naive lag-24 forecast. */
  private def forecastBase(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("ts")
    hourly(s, dir)
      .withColumn("f", lag("value", 24).over(w))
      .where(col("f").isNotNull)
      .select(col("event_type"), col("ts"), col("value"), col("f"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ── the rest of the metrics.py battery ─────────────────────────────
    "q_metrics_extended" -> ((s, dir) => {
      val base = forecastBase(s, dir)
      // count(y <= v) per distinct actual value: one keyed window
      val sup = base.groupBy("event_type", "value").agg(count(lit(1)).as("c"))
        .withColumn("cum", sum("c").over(Window.partitionBy("event_type").orderBy("value")))
        .drop("c")
      // forecasts find count(y <= f) via the as-of union shape: support
      // rows sort before probe rows at equal v (tag 0 < 1), so ties on
      // v are counted inclusively, matching ECDF's <=
      val probes = base.select(col("event_type"), col("ts"), col("f").as("v"),
        lit(1).as("tag"), lit(null).cast("long").as("cum"))
      val supRows = sup.select(col("event_type"), lit(null).cast("timestamp").as("ts"),
        col("value").as("v"), lit(0).as("tag"), col("cum"))
      val wv = Window.partitionBy("event_type").orderBy(col("v"), col("tag"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cntF = supRows.unionByName(probes)
        .withColumn("cf", last("cum", ignoreNulls = true).over(wv))
        .where(col("tag") === 1)
        .select(col("event_type"), col("ts"), coalesce(col("cf"), lit(0L)).as("cf"))
      val y = col("value"); val f = col("f")
      base
        .join(sup.withColumnRenamed("cum", "cy"), Seq("event_type", "value"))
        .join(cntF, Seq("event_type", "ts"))
        .groupBy("event_type")
        .agg(
          round(Metrics.mdae(y, f), 6).as("mdae"),
          round(Metrics.mdape(y, f), 6).as("mdape"),
          round(Metrics.rmsle(y, f), 6).as("rmsle"),
          round(Metrics.rmspe(y, f), 6).as("rmspe"),
          round(Metrics.mpe(y, f), 6).as("mpe"),
          round(Metrics.trackingSignal(y, f), 6).as("tracking_signal"),
          round(Metrics.sbias(y, f), 6).as("sbias"),
          round(Metrics.smapeScaled(y, f), 6).as("smape_scaled"),
          round(Metrics.exceedRate(y, f, 1.0), 6).as("exceed_rate"),
          // ECDF deltas: ((cf-cy)/n)² averaged = avg((cf-cy)²)/n² since n
          // is constant per series — stays a plain aggregate
          round(avg(pow(col("cf") - col("cy"), 2)) / pow(count(lit(1)), 2), 6).as("crps"),
          round(avg(abs(col("cf") - col("cy"))) / count(lit(1)), 6).as("leps"),
          count(lit(1)).as("n")
        )
    }),

    // ── probabilistic / quantile-forecast metrics (metrics.py:682/:732) ─
    // Interval forecasts the emp-CI way (utils/emp_confidence_int.py):
    // per-series error quantiles from the train half shift the
    // seasonal-naive point forecast into q10/q50/q90 quantile forecasts;
    // the serve half scores them with pinball loss and mult_exceed.
    // One window pass + one train aggregate + one broadcast join — the
    // metric aggregates are plain codegen'd column math.
    "q_metrics_prob" -> ((s, dir) => {
      val w = Window.partitionBy("event_type").orderBy("ts")
      val wk = Window.partitionBy("event_type")
      val idx = forecastBase(s, dir)
        .withColumn("rn", row_number().over(w))
        .withColumn("nn", count(lit(1)).over(wk))
        .withColumn("e", col("value") - col("f"))
      val qs = idx.where(col("rn") <= expr("nn div 2")).groupBy("event_type").agg(
        percentile(col("e"), lit(0.1)).as("q10"),
        percentile(col("e"), lit(0.5)).as("q50"),
        percentile(col("e"), lit(0.9)).as("q90"))
      val y = col("value")
      idx.where(col("rn") > expr("nn div 2"))
        .join(broadcast(qs), Seq("event_type"))
        .withColumn("p10", col("f") + col("q10"))
        .withColumn("p50", col("f") + col("q50"))
        .withColumn("p90", col("f") + col("q90"))
        .groupBy("event_type")
        .agg(
          round(Metrics.pinball(y, col("p10"), 0.1), 6).as("pinball_10"),
          round(Metrics.pinball(y, col("p50"), 0.5), 6).as("pinball_50"),
          round(Metrics.pinball(y, col("p90"), 0.9), 6).as("pinball_90"),
          round(Metrics.multExceed(y, col("p10"), 0.1), 6).as("exceed_10"),
          round(Metrics.multExceed(y, col("p90"), 0.9), 6).as("exceed_90"),
          round(avg((y >= col("p10") && y <= col("p90")).cast("double")), 6).as("coverage_80"),
          count(lit(1)).as("n"))
    }),

    // ── interval-forecast metrics (metrics.py:786 coverage, :828
    // interval_score): the q_metrics_prob quantile pipeline's (p10, p90)
    // pair read as an 80% interval (alpha = 0.2), scored with the
    // reference's coverage and interval-score definitions plus the mean
    // width for context.
    "q_metrics_interval" -> ((s, dir) => {
      val w = Window.partitionBy("event_type").orderBy("ts")
      val wk = Window.partitionBy("event_type")
      val idx = forecastBase(s, dir)
        .withColumn("rn", row_number().over(w))
        .withColumn("nn", count(lit(1)).over(wk))
        .withColumn("e", col("value") - col("f"))
      val qs = idx.where(col("rn") <= expr("nn div 2")).groupBy("event_type").agg(
        percentile(col("e"), lit(0.1)).as("q10"),
        percentile(col("e"), lit(0.9)).as("q90"))
      val y = col("value")
      idx.where(col("rn") > expr("nn div 2"))
        .join(broadcast(qs), Seq("event_type"))
        .withColumn("lo", col("f") + col("q10"))
        .withColumn("hi", col("f") + col("q90"))
        .groupBy("event_type")
        .agg(
          round(Metrics.coverage(y, col("lo"), col("hi")), 6).as("coverage"),
          round(Metrics.intervalScore(y, col("lo"), col("hi"), 0.2), 6).as("interval_score"),
          round(avg(col("hi") - col("lo")), 6).as("mean_width"),
          count(lit(1)).as("n"))
    }),

    // ── granularity inference (consts.py infer_freq_robust) ────────────
    // mode of consecutive-timestamp deltas per series + how regular the
    // grid is; top-1 via rank → WindowGroupLimit, no global sort
    "q_infer_freq" -> ((s, dir) => {
      val w = Window.partitionBy("event_type").orderBy("ts")
      val d = Tables.events(s, dir).select(col("event_type"), col("ts"))
        .withColumn("d_us", unix_micros(col("ts")) - unix_micros(lag("ts", 1).over(w)))
        .where(col("d_us").isNotNull)
      val counted = d.groupBy("event_type", "d_us").agg(count(lit(1)).as("c"))
        .withColumn("tot", sum("c").over(Window.partitionBy("event_type")))
        .withColumn("rk", row_number().over(
          Window.partitionBy("event_type").orderBy(col("c").desc, col("d_us"))))
      counted.where(col("rk") === 1)
        .select(col("event_type"), col("d_us").as("freq_us"),
          round(col("c").cast("double") / col("tot"), 6).as("share"),
          col("tot").as("n_deltas"))
    }),

    // ── circular calendar encodings (feature_engineering.circle_encode) ─
    "q_time_features_circular" -> ((s, dir) => {
      val t = col("ts")
      // `+ 0` canonicalizes IEEE -0.0 to +0.0 so serialized hashes agree
      // across engines; dow is Monday=0 (pandas/kats dayofweek convention).
      def enc(x: Column, period: Double, name: String): Seq[Column] = Seq(
        (round(sin(x * (2 * math.Pi / period)), 6) + 0).as(s"${name}_sin"),
        (round(cos(x * (2 * math.Pi / period)), 6) + 0).as(s"${name}_cos"))
      Tables.events(s, dir).select(col("event_id"), col("ts"))
        .select(col("event_id") +: unix_timestamp(t).as("ts_s") +:
          (enc(hour(t), 24, "hour") ++
           enc(pmod(dayofweek(t) + 5, lit(7)), 7, "dow") ++
           enc(month(t) - 1, 12, "month")): _*)
    })
  )

  val sql: Map[String, String] = Map(
    // ECDF counts via the same union+window shape as the Spark side (one
    // sort per series, no O(n²) self-join — the oracle stays the mirror,
    // not a quadratic re-derivation): support rows carry cumulative
    // counts, probe rows (tag 1) pick up the last support cum at v,
    // ties counted inclusively because tag 0 sorts first.
    "q_metrics_extended" ->
      s"""WITH hourly AS ($H),
         |fc AS (SELECT event_type, ts, value, lag(value, 24) OVER (PARTITION BY event_type ORDER BY ts) AS f FROM hourly),
         |b AS (SELECT * FROM fc WHERE f IS NOT NULL),
         |sup AS (SELECT event_type, value AS v, sum(count(*)) OVER (PARTITION BY event_type ORDER BY value) AS cum
         |        FROM b GROUP BY 1, 2),
         |u AS (SELECT event_type, CAST(NULL AS TIMESTAMP) AS ts, v, 0 AS tag, cum FROM sup
         |      UNION ALL
         |      SELECT event_type, ts, f AS v, 1 AS tag, NULL FROM b),
         |cf AS (SELECT event_type, ts, cf FROM (
         |        SELECT event_type, ts, tag,
         |          coalesce(last_value(cum IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY v, tag
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS cf
         |        FROM u) WHERE tag = 1),
         |c AS (SELECT b.event_type, b.ts, b.value, b.f, sup.cum AS cy, cf.cf
         |      FROM b JOIN sup ON b.event_type = sup.event_type AND b.value = sup.v
         |             JOIN cf ON b.event_type = cf.event_type AND b.ts = cf.ts)
         |SELECT event_type,
         |  round(median(abs(value - f)), 6) AS mdae,
         |  round(median(CASE WHEN value = 0 THEN CAST(sign(abs(value - f)) AS DOUBLE) ELSE abs(value - f) / value END), 6) AS mdape,
         |  round(sqrt(avg((ln(1 + value) - ln(1 + f))^2)), 6) AS rmsle,
         |  round(sqrt(avg((CASE WHEN value = 0 THEN CAST(sign(value - f) AS DOUBLE) ELSE (value - f) / value END)^2)), 6) AS rmspe,
         |  round(avg(CASE WHEN value = 0 THEN CAST(sign(value - f) AS DOUBLE) ELSE (value - f) / value END), 6) AS mpe,
         |  round(sum(value - f) / avg(abs(value - f)), 6) AS tracking_signal,
         |  round(-2 * avg(CASE WHEN abs(value) + abs(f) = 0 THEN 0.0 ELSE (value - f) / (abs(value) + abs(f)) END), 6) AS sbias,
         |  round(avg(CASE WHEN abs(value) + abs(f) = 0 THEN 0.0 ELSE abs(value - f) / (abs(value) + abs(f)) END), 6) AS smape_scaled,
         |  round(avg(CASE WHEN value >= f THEN 1.0 ELSE 0.0 END), 6) AS exceed_rate,
         |  round(avg((cf - cy)^2) / count(*)^2, 6) AS crps,
         |  round(avg(abs(cf - cy)) / count(*), 6) AS leps,
         |  count(*) AS n
         |FROM c GROUP BY 1""".stripMargin,

    // quantile constants interpolated from the same Scala doubles the
    // Spark side multiplies by (::DOUBLE keeps DuckDB off its DECIMAL
    // literal path, so both engines scale by bit-identical constants)
    "q_metrics_prob" -> {
      def pb(p: String, t: Double) =
        s"avg(greatest((value - $p) * (${t}::DOUBLE), (value - $p) * (${t - 1}::DOUBLE)))"
      s"""WITH hourly AS ($H),
         |fc AS (SELECT event_type, ts, value, lag(value, 24) OVER (PARTITION BY event_type ORDER BY ts) AS f FROM hourly),
         |b AS (SELECT event_type, ts, value, f, value - f AS e,
         |        row_number() OVER (PARTITION BY event_type ORDER BY ts) AS rn,
         |        count(*) OVER (PARTITION BY event_type) AS nn
         |      FROM fc WHERE f IS NOT NULL),
         |q AS (SELECT event_type, quantile_cont(e, 0.1) AS q10, quantile_cont(e, 0.5) AS q50,
         |        quantile_cont(e, 0.9) AS q90
         |      FROM b WHERE rn <= nn // 2 GROUP BY 1),
         |t AS (SELECT b.event_type, b.value, b.f + q.q10 AS p10, b.f + q.q50 AS p50, b.f + q.q90 AS p90
         |      FROM b JOIN q ON b.event_type = q.event_type WHERE b.rn > b.nn // 2)
         |SELECT event_type,
         |  round(${pb("p10", 0.1)}, 6) AS pinball_10,
         |  round(${pb("p50", 0.5)}, 6) AS pinball_50,
         |  round(${pb("p90", 0.9)}, 6) AS pinball_90,
         |  round(avg((p10 > value)::INT::DOUBLE), 6) AS exceed_10,
         |  round(avg((value > p90)::INT::DOUBLE), 6) AS exceed_90,
         |  round(avg((value >= p10 AND value <= p90)::INT::DOUBLE), 6) AS coverage_80,
         |  count(*) AS n
         |FROM t GROUP BY 1""".stripMargin
    },

    "q_metrics_interval" ->
      s"""WITH hourly AS ($H),
         |fc AS (SELECT event_type, ts, value, lag(value, 24) OVER (PARTITION BY event_type ORDER BY ts) AS f FROM hourly),
         |b AS (SELECT event_type, value, f, value - f AS e,
         |        row_number() OVER (PARTITION BY event_type ORDER BY ts) AS rn,
         |        count(*) OVER (PARTITION BY event_type) AS nn
         |      FROM fc WHERE f IS NOT NULL),
         |q AS (SELECT event_type, quantile_cont(e, 0.1) AS q10, quantile_cont(e, 0.9) AS q90
         |      FROM b WHERE rn <= nn // 2 GROUP BY 1),
         |t AS (SELECT b.event_type, b.value, b.f + q.q10 AS lo, b.f + q.q90 AS hi
         |      FROM b JOIN q ON b.event_type = q.event_type WHERE b.rn > b.nn // 2)
         |SELECT event_type,
         |  round(avg((lo <= value AND value <= hi)::INT::DOUBLE), 6) AS coverage,
         |  round(avg((hi - lo)
         |    + CASE WHEN value < lo THEN (lo - value) * 2 / 0.2 ELSE 0.0 END
         |    + CASE WHEN value > hi THEN (value - hi) * 2 / 0.2 ELSE 0.0 END), 6) AS interval_score,
         |  round(avg(hi - lo), 6) AS mean_width,
         |  count(*) AS n
         |FROM t GROUP BY 1""".stripMargin,

    "q_infer_freq" ->
      """WITH d AS (SELECT event_type,
        |    epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY event_type ORDER BY ts) AS d_us
        |  FROM events),
        |cnt AS (SELECT event_type, d_us, count(*) AS c FROM d WHERE d_us IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT event_type, d_us, c, sum(c) OVER (PARTITION BY event_type) AS tot,
        |    row_number() OVER (PARTITION BY event_type ORDER BY c DESC, d_us) AS rk FROM cnt)
        |SELECT event_type, d_us AS freq_us, round(c::DOUBLE / tot, 6) AS share, tot::BIGINT AS n_deltas
        |FROM tot WHERE rk = 1""".stripMargin,

    "q_time_features_circular" ->
      """SELECT event_id, epoch_us(date_trunc('microsecond', ts))//1000000 AS ts_s,
        |  round(sin(hour(ts) * 2 * pi() / 24), 6) + 0 AS hour_sin,
        |  round(cos(hour(ts) * 2 * pi() / 24), 6) + 0 AS hour_cos,
        |  round(sin((isodow(ts) - 1) * 2 * pi() / 7), 6) + 0 AS dow_sin,
        |  round(cos((isodow(ts) - 1) * 2 * pi() / 7), 6) + 0 AS dow_cos,
        |  round(sin((month(ts) - 1) * 2 * pi() / 12), 6) + 0 AS month_sin,
        |  round(cos((month(ts) - 1) * 2 * pi() / 12), 6) + 0 AS month_cos
        |FROM events""".stripMargin
  )
}
