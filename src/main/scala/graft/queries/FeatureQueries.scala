package graft.queries

import graft._
import graft.features.{FeatureKernels, TsFeatures}
import graft.operators.Decompose
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.3 TsFeatures battery. Every feature is DuckDB-oracle-checked:
  * aggregate/window features directly, and the statsmodels-equivalent
  * kernels (PACF, spectral entropy, Hurst, ARCH-LM, special AC, KPSS)
  * through oracle REPLAYS — pair-join ACFs, periodogram sums, and a
  * recursive-CTE Durbin-Levinson with list state.
  */
object FeatureQueries {
  private val S = TSSchema(keys = Seq("event_type"))
  private def hourly(s: SparkSession, dir: String) = Tables.hourlyEvents(s, dir).drop("n")
  private val H = Tables.hourlySql

  private def sumsq(cols: Seq[String]) =
    cols.map(c => col(c) * col(c)).reduce(_ + _)

  /** Durbin-Levinson PACF replay for one source CTE: biased ACF to
    * `maxLag` via the pair join, then the recursion with the φ vector and
    * the diagonal (the PACF itself) carried as lists in a recursive CTE.
    */
  private def pacfCtes(t: String, src: String, maxLag: Int): String =
    s"""${t}dev AS (SELECT event_type, rn, value - avg(value) OVER (PARTITION BY event_type) AS dev FROM $src),
       |${t}den AS (SELECT event_type, sum(dev*dev) AS d FROM ${t}dev GROUP BY 1),
       |${t}ac AS (SELECT a.event_type, b.rn - a.rn AS k, sum(a.dev * b.dev) AS num
       |           FROM ${t}dev a JOIN ${t}dev b ON a.event_type = b.event_type AND b.rn - a.rn BETWEEN 1 AND $maxLag
       |           GROUP BY 1, 2),
       |${t}rho AS (SELECT ac.event_type, list(CASE WHEN dn.d > 0 THEN ac.num / dn.d ELSE 0.0 END ORDER BY ac.k) AS rho
       |            FROM ${t}ac ac JOIN ${t}den dn ON ac.event_type = dn.event_type GROUP BY 1),
       |${t}rec AS (
       |  SELECT event_type, 1 AS k, rho, [rho[1]] AS phi, [rho[1]] AS outl FROM ${t}rho
       |  UNION ALL
       |  SELECT event_type, k + 1, rho,
       |    list_transform(phi, (p, j) -> p - pk * phi[k + 1 - j]) || [pk],
       |    outl || [pk]
       |  FROM (
       |    SELECT event_type, k, rho, phi, outl,
       |      CASE WHEN abs(1 - list_sum(list_transform(phi, (p, j) -> p * rho[j]))) > 1e-12
       |           THEN (rho[k + 1] - list_sum(list_transform(phi, (p, j) -> p * rho[k + 1 - j])))
       |              / (1 - list_sum(list_transform(phi, (p, j) -> p * rho[j])))
       |           ELSE 0.0 END AS pk
       |    FROM ${t}rec WHERE k < $maxLag)),
       |${t}pacf AS (SELECT event_type, outl FROM ${t}rec WHERE k = $maxLag)""".stripMargin

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_feat_basic" -> ((s, dir) => TsFeatures.basic(hourly(s, dir), S)
      .withColumnRenamed("min", "vmin").withColumnRenamed("max", "vmax")
      .withColumnRenamed("length", "n_obs")),

    // get_time (tsfeatures.py:1996): calendar coverage of the index —
    // distinct years/months/weeks/days + day-of-week frequencies, pandas
    // Monday=0. `time_days` reproduces the reference's '%Y-%d' format
    // EXACTLY (year + day-of-MONTH, not a full date — a quirk of the
    // reference code, kept for fidelity). length_days is the pandas
    // Timedelta.days floor, not a calendar-date diff.
    "q_feat_time" -> ((s, dir) => {
      val ts = col("ts")
      def dowFrac(i: Int) = // pandas Monday=0: Spark dayofweek is Sunday=1
        round(avg((((dayofweek(ts) + lit(5)) % 7) === i).cast("double")), 6)
      hourly(s, dir).groupBy("event_type").agg(
        countDistinct(year(ts)).as("time_years"),
        countDistinct(date_format(ts, "yyyy-MM")).as("time_months"),
        countDistinct(month(ts)).as("time_monthsofyear"),
        countDistinct(concat(expr("extract(YEAROFWEEK FROM ts)"), lit("-"), weekofyear(ts))).as("time_weeks"),
        countDistinct(weekofyear(ts)).as("time_weeksofyear"),
        countDistinct(date_format(ts, "yyyy-dd")).as("time_days"),
        countDistinct(dayofyear(ts)).as("time_daysofyear"),
        floor((unix_timestamp(max(ts)) - unix_timestamp(min(ts))) / 86400L).as("time_length_days"),
        dowFrac(0).as("freq_monday"), dowFrac(1).as("freq_tuesday"),
        dowFrac(2).as("freq_wednesday"), dowFrac(3).as("freq_thursday"),
        dowFrac(4).as("freq_friday"), dowFrac(5).as("freq_saturday"),
        dowFrac(6).as("freq_sunday"))
    }),

    "q_feat_crossing_points" -> ((s, dir) => TsFeatures.crossingPoints(hourly(s, dir), S)),

    "q_feat_flat_spots" -> ((s, dir) => TsFeatures.flatSpots(hourly(s, dir), S)),

    "q_feat_lumpiness" -> ((s, dir) =>
      TsFeatures.lumpinessStability(hourly(s, dir), S).select(col("event_type"), col("lumpiness"))),

    "q_feat_stability" -> ((s, dir) =>
      TsFeatures.lumpinessStability(hourly(s, dir), S).select(col("event_type"), col("stability"))),

    "q_feat_std1st_der" -> ((s, dir) => TsFeatures.std1stDer(hourly(s, dir), S)),

    "q_feat_binarize_mean" -> ((s, dir) => TsFeatures.binarizeMean(hourly(s, dir), S)),

    "q_feat_histogram_mode" -> ((s, dir) => TsFeatures.histogramMode(hourly(s, dir), S)),

    "q_feat_linearity" -> ((s, dir) => TsFeatures.linearity(hourly(s, dir), S)),

    "q_feat_level_shift" -> ((s, dir) => TsFeatures.levelShiftFeatures(hourly(s, dir), S)),

    "q_feat_acf" -> ((s, dir) => {
      val h = hourly(s, dir)
      val raw = TsFeatures.acfAtLags(h, S, Seq(1, 2, 3, 4, 5, 24), "y_")
      val d1 = TsFeatures.acfAtLags(TsFeatures.diffSeries(h, S, 1), S, Seq(1, 2, 3, 4, 5), "d1_")
      val d2 = TsFeatures.acfAtLags(TsFeatures.diffSeries(h, S, 2), S, Seq(1, 2, 3, 4, 5), "d2_")
      raw.join(d1, S.keys).join(d2, S.keys).select(
        col("event_type"),
        round(col("y_acf_1"), 6).as("y_acf1"),
        round(sumsq(Seq("y_acf_1", "y_acf_2", "y_acf_3", "y_acf_4", "y_acf_5")), 6).as("y_acf5"),
        round(col("d1_acf_1"), 6).as("diff1y_acf1"),
        round(sumsq(Seq("d1_acf_1", "d1_acf_2", "d1_acf_3", "d1_acf_4", "d1_acf_5")), 6).as("diff1y_acf5"),
        round(col("d2_acf_1"), 6).as("diff2y_acf1"),
        round(sumsq(Seq("d2_acf_1", "d2_acf_2", "d2_acf_3", "d2_acf_4", "d2_acf_5")), 6).as("diff2y_acf5"),
        round(col("y_acf_24"), 6).as("seas_acf1"))
    }),

    // strengths from the LOESS-trend STL (statsmodels STL semantics via
    // Decompose.stlLite), not the single-pass MA decomposition
    "q_feat_stl" -> ((s, dir) => TsFeatures.stlStrength(
      Decompose.stlLite(hourly(s, dir), S)
        .withColumnRenamed("trend2", "trend")
        .withColumnRenamed("seasonal2", "seasonal")
        .withColumnRenamed("resid2", "resid"), S)),

    "q_feat_pacf" -> ((s, dir) =>
      SeriesOps.aggSeries(hourly(s, dir), S, Seq("y_pacf5", "diff1y_pacf5", "diff2y_pacf5", "seas_pacf1")) { xs =>
        def ss(a: Array[Double]) = a.take(5).map(v => v * v).sum
        val p = FeatureKernels.pacf(xs, 24)
        val d1 = xs.indices.drop(1).map(i => xs(i) - xs(i - 1)).toArray
        val d2 = d1.indices.drop(1).map(i => d1(i) - d1(i - 1)).toArray
        Array(ss(p), ss(FeatureKernels.pacf(d1, 5)), ss(FeatureKernels.pacf(d2, 5)), p(23))
      }),

    "q_feat_entropy" -> ((s, dir) =>
      SeriesOps.aggSeries(hourly(s, dir), S, Seq("spectral_entropy")) { xs =>
        Array(FeatureKernels.spectralEntropy(xs))
      }),

    "q_feat_hurst" -> ((s, dir) =>
      SeriesOps.aggSeries(hourly(s, dir), S, Seq("hurst")) { xs =>
        Array(FeatureKernels.hurst(xs))
      }),

    // ARCH-LM with nlags=2: the 2-regressor OLS R² has a closed form in
    // pairwise correlations, so the statistic is fully oracle-checkable
    // (the kernel supports general p; the spec exercises p=10 too)
    "q_feat_heterogeneity" -> ((s, dir) =>
      SeriesOps.aggSeries(hourly(s, dir), S, Seq("arch_lm")) { xs =>
        Array(FeatureKernels.archLm(xs, Some(2)))
      }),

    "q_feat_special_ac" -> ((s, dir) =>
      SeriesOps.aggSeries(hourly(s, dir), S, Seq("firstmin_ac", "firstzero_ac")) { xs =>
        val (m, z) = FeatureKernels.specialAc(xs)
        Array(m.toDouble, z.toDouble)
      }),

    "q_feat_unitroot_kpss" -> ((s, dir) =>
      SeriesOps.aggSeries(hourly(s, dir), S, Seq("kpss_stat")) { xs =>
        Array(FeatureKernels.kpss(xs))
      }),

    // kats get_seasonalities: FFT-peak period of the diffed series (else 7),
    // period-parametric two-pass MA decomposition, then the 4 features
    "q_feat_seasonalities" -> ((s, dir) =>
      SeriesOps.aggSeries(hourly(s, dir), S,
        Seq("seasonal_period", "trend_mag", "seasonality_mag", "residual_std")) { xs =>
        graft.features.Seasonalities.features(xs)
      })
  )

  val sql: Map[String, String] = Map(
    "q_feat_time" -> {
      def dowFrac(i: Int) = s"round(avg(((isodow(ts) - 1) = $i)::INT::DOUBLE), 6)"
      s"""WITH hourly AS ($H)
         |SELECT event_type,
         |  count(DISTINCT year(ts))::BIGINT AS time_years,
         |  count(DISTINCT strftime(ts, '%Y-%m'))::BIGINT AS time_months,
         |  count(DISTINCT month(ts))::BIGINT AS time_monthsofyear,
         |  count(DISTINCT (isoyear(ts) || '-' || weekofyear(ts)))::BIGINT AS time_weeks,
         |  count(DISTINCT weekofyear(ts))::BIGINT AS time_weeksofyear,
         |  count(DISTINCT strftime(ts, '%Y-%d'))::BIGINT AS time_days,
         |  count(DISTINCT dayofyear(ts))::BIGINT AS time_daysofyear,
         |  floor((epoch(max(ts)) - epoch(min(ts))) / 86400)::BIGINT AS time_length_days,
         |  ${dowFrac(0)} AS freq_monday, ${dowFrac(1)} AS freq_tuesday,
         |  ${dowFrac(2)} AS freq_wednesday, ${dowFrac(3)} AS freq_thursday,
         |  ${dowFrac(4)} AS freq_friday, ${dowFrac(5)} AS freq_saturday,
         |  ${dowFrac(6)} AS freq_sunday
         |FROM hourly GROUP BY 1""".stripMargin
    },

    "q_feat_basic" ->
      s"""WITH hourly AS ($H),
         |m AS (SELECT event_type, avg(value) AS mu FROM hourly GROUP BY 1)
         |SELECT h.event_type, count(*) AS n_obs, round(avg(value), 6) AS mean,
         |  round(avg((value - mu)^2), 6) AS var_pop,
         |  round(sqrt(avg((value - mu)^2)), 6) AS std_pop,
         |  round(sqrt(avg((value - mu)^2)) / avg(value), 6) AS cv,
         |  min(value) AS vmin, max(value) AS vmax,
         |  round(avg((value - mu)^3) / avg((value - mu)^2)^1.5, 6) AS skew,
         |  round(avg((value - mu)^4) / avg((value - mu)^2)^2 - 3.0, 6) AS kurt
         |FROM hourly h JOIN m ON h.event_type = m.event_type GROUP BY 1""".stripMargin,

    "q_feat_crossing_points" ->
      s"""WITH hourly AS ($H),
         |b AS (SELECT event_type, value,
         |  quantile_cont(value, 0.5) OVER (PARTITION BY event_type) AS m,
         |  lead(value) OVER (PARTITION BY event_type ORDER BY ts) AS nx
         |  FROM hourly)
         |SELECT event_type,
         |  count(*) FILTER (WHERE (value <= m AND nx > m) OR (value >= m AND nx < m)) AS crossing_points
         |FROM b GROUP BY 1""".stripMargin,

    "q_feat_flat_spots" ->
      s"""WITH hourly AS ($H),
         |b AS (SELECT event_type, ts, value,
         |  row_number() OVER (PARTITION BY event_type ORDER BY ts) AS rn,
         |  count(*) OVER (PARTITION BY event_type) AS n FROM hourly),
         |c AS (SELECT *, (rn - 1) // (n // 10) AS seg FROM b),
         |e AS (SELECT event_type, seg, value,
         |  rn - row_number() OVER (PARTITION BY event_type, seg, value ORDER BY ts) AS grp FROM c),
         |f AS (SELECT event_type, count(*) AS run FROM e GROUP BY event_type, seg, value, grp)
         |SELECT event_type, max(run) AS flat_spots FROM f GROUP BY 1""".stripMargin,

    "q_feat_lumpiness" ->
      s"""WITH hourly AS ($H),
         |b AS (SELECT event_type, ts, value,
         |  row_number() OVER (PARTITION BY event_type ORDER BY ts) AS rn,
         |  count(*) OVER (PARTITION BY event_type) AS n FROM hourly),
         |c AS (SELECT *, n // 20 + 1 AS k FROM b),
         |d AS (SELECT *, n // k AS q, n % k AS r FROM c),
         |e AS (SELECT event_type, value,
         |  CASE WHEN rn <= r * (q + 1) THEN (rn - 1) // (q + 1)
         |       ELSE r + (rn - 1 - r * (q + 1)) // q END AS chunk FROM d),
         |f AS (SELECT event_type, chunk, avg(value * value) - avg(value) * avg(value) AS cvar FROM e GROUP BY 1, 2)
         |SELECT event_type, round(avg(cvar * cvar) - avg(cvar) * avg(cvar), 4) AS lumpiness FROM f GROUP BY 1""".stripMargin,

    "q_feat_stability" ->
      s"""WITH hourly AS ($H),
         |b AS (SELECT event_type, ts, value,
         |  row_number() OVER (PARTITION BY event_type ORDER BY ts) AS rn,
         |  count(*) OVER (PARTITION BY event_type) AS n FROM hourly),
         |c AS (SELECT *, n // 20 + 1 AS k FROM b),
         |d AS (SELECT *, n // k AS q, n % k AS r FROM c),
         |e AS (SELECT event_type, value,
         |  CASE WHEN rn <= r * (q + 1) THEN (rn - 1) // (q + 1)
         |       ELSE r + (rn - 1 - r * (q + 1)) // q END AS chunk FROM d),
         |f AS (SELECT event_type, chunk, avg(value) AS cmean FROM e GROUP BY 1, 2)
         |SELECT event_type, round(avg(cmean * cmean) - avg(cmean) * avg(cmean), 6) AS stability FROM f GROUP BY 1""".stripMargin,

    "q_feat_std1st_der" ->
      s"""WITH hourly AS ($H),
         |b AS (SELECT event_type, value,
         |  row_number() OVER w AS rn, count(*) OVER (PARTITION BY event_type) AS n,
         |  lead(value) OVER w AS nx, lag(value) OVER w AS pv
         |  FROM hourly WINDOW w AS (PARTITION BY event_type ORDER BY ts)),
         |g AS (SELECT event_type,
         |  CASE WHEN rn = 1 THEN nx - value WHEN rn = n THEN value - pv ELSE (nx - pv) / 2 END AS gr FROM b)
         |SELECT event_type, round(sqrt(avg(gr * gr) - avg(gr) * avg(gr)), 6) AS std1st_der FROM g GROUP BY 1""".stripMargin,

    "q_feat_binarize_mean" ->
      s"""WITH hourly AS ($H),
         |b AS (SELECT event_type, value, avg(value) OVER (PARTITION BY event_type) AS mu FROM hourly)
         |SELECT event_type, round(avg(CASE WHEN value > mu THEN 1.0 ELSE 0.0 END), 6) AS binarize_mean
         |FROM b GROUP BY 1""".stripMargin,

    "q_feat_histogram_mode" ->
      s"""WITH hourly AS ($H),
         |b AS (SELECT event_type, value,
         |  min(value) OVER (PARTITION BY event_type) AS lo,
         |  max(value) OVER (PARTITION BY event_type) AS hi FROM hourly),
         |c AS (SELECT event_type, lo, hi,
         |  least(floor((value - lo) / ((hi - lo) / 10)), 9)::BIGINT AS bin FROM b),
         |d AS (SELECT event_type, bin, lo, hi, count(*) AS cnt FROM c GROUP BY 1, 2, 3, 4),
         |r AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY cnt DESC, bin) AS rk FROM d)
         |SELECT event_type, round(lo + bin * ((hi - lo) / 10), 6) AS histogram_mode FROM r WHERE rk = 1""".stripMargin,

    "q_feat_linearity" ->
      s"""WITH hourly AS ($H),
         |b AS (SELECT event_type, value,
         |  (row_number() OVER (PARTITION BY event_type ORDER BY ts) - 1)::DOUBLE AS t FROM hourly)
         |SELECT event_type, round(regr_r2(value, t), 6) AS linearity FROM b GROUP BY 1""".stripMargin,

    "q_feat_level_shift" ->
      s"""WITH hourly AS ($H),
         |b AS (SELECT event_type, ts, value,
         |  row_number() OVER w AS rn,
         |  round(abs(lead(value, 20) OVER w - value) / 20, 6) AS d
         |  FROM hourly WINDOW w AS (PARTITION BY event_type ORDER BY ts)),
         |r AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY d DESC, rn) AS rk
         |      FROM b WHERE d IS NOT NULL)
         |SELECT event_type, (rn - 1)::BIGINT AS level_shift_idx, d AS level_shift_size FROM r WHERE rk = 1""".stripMargin,

    "q_feat_acf" -> {
      def acfBlock(src: String, tag: String, lags: Seq[Int]): String = {
        val lagCols = lags.map(k => s"lag(dev, $k) OVER w AS k$k").mkString(", ")
        val aggCols = lags.map(k => s"sum(dev * k$k) / sum(dev * dev) AS a$k").mkString(", ")
        s"""${tag}dev AS (SELECT event_type, ts, value - avg(value) OVER (PARTITION BY event_type) AS dev FROM $src),
           |${tag}l AS (SELECT event_type, dev, $lagCols FROM ${tag}dev WINDOW w AS (PARTITION BY event_type ORDER BY ts)),
           |${tag}acf AS (SELECT event_type, $aggCols FROM ${tag}l GROUP BY 1)""".stripMargin
      }
      s"""WITH hourly AS ($H),
         |d1 AS (SELECT event_type, ts, value FROM (
         |  SELECT event_type, ts, value - lag(value) OVER (PARTITION BY event_type ORDER BY ts) AS value FROM hourly)
         |  WHERE value IS NOT NULL),
         |d2 AS (SELECT event_type, ts, value FROM (
         |  SELECT event_type, ts, value - lag(value) OVER (PARTITION BY event_type ORDER BY ts) AS value FROM d1)
         |  WHERE value IS NOT NULL),
         |${acfBlock("hourly", "r", Seq(1, 2, 3, 4, 5, 24))},
         |${acfBlock("d1", "e", Seq(1, 2, 3, 4, 5))},
         |${acfBlock("d2", "f", Seq(1, 2, 3, 4, 5))}
         |SELECT r.event_type,
         |  round(r.a1, 6) AS y_acf1,
         |  round(r.a1^2 + r.a2^2 + r.a3^2 + r.a4^2 + r.a5^2, 6) AS y_acf5,
         |  round(e.a1, 6) AS diff1y_acf1,
         |  round(e.a1^2 + e.a2^2 + e.a3^2 + e.a4^2 + e.a5^2, 6) AS diff1y_acf5,
         |  round(f.a1, 6) AS diff2y_acf1,
         |  round(f.a1^2 + f.a2^2 + f.a3^2 + f.a4^2 + f.a5^2, 6) AS diff2y_acf5,
         |  round(r.a24, 6) AS seas_acf1
         |FROM racf r JOIN eacf e ON r.event_type = e.event_type JOIN facf f ON r.event_type = f.event_type""".stripMargin
    },

    // PACF via Durbin-Levinson replayed over raw (24 lags) + first/second
    // differences (5 lags each); ss5 = Σ of the first five PACF values²
    "q_feat_pacf" ->
      s"""WITH RECURSIVE hourly AS ($H),
         |rawsrc AS (SELECT event_type, value, row_number() OVER (PARTITION BY event_type ORDER BY ts) AS rn FROM hourly),
         |d1base AS (SELECT event_type, ts, value - lag(value) OVER (PARTITION BY event_type ORDER BY ts) AS value FROM hourly),
         |d1src AS (SELECT event_type, value, row_number() OVER (PARTITION BY event_type ORDER BY ts) AS rn
         |          FROM d1base WHERE value IS NOT NULL),
         |d2base AS (SELECT event_type, ts, value - lag(value) OVER (PARTITION BY event_type ORDER BY ts) AS value
         |           FROM (SELECT event_type, ts, value FROM d1base WHERE value IS NOT NULL)),
         |d2src AS (SELECT event_type, value, row_number() OVER (PARTITION BY event_type ORDER BY ts) AS rn
         |          FROM d2base WHERE value IS NOT NULL),
         |${pacfCtes("r", "rawsrc", 24)},
         |${pacfCtes("e", "d1src", 5)},
         |${pacfCtes("f", "d2src", 5)}
         |SELECT r.event_type,
         |  round(list_sum(list_transform(r.outl[1:5], x -> x * x)), 6) AS y_pacf5,
         |  round(list_sum(list_transform(e.outl[1:5], x -> x * x)), 6) AS diff1y_pacf5,
         |  round(list_sum(list_transform(f.outl[1:5], x -> x * x)), 6) AS diff2y_pacf5,
         |  round(r.outl[24], 6) AS seas_pacf1
         |FROM rpacf r JOIN epacf e ON r.event_type = e.event_type
         |JOIN fpacf f ON r.event_type = f.event_type""".stripMargin,

    // normalized Shannon entropy of the one-sided periodogram PSD
    // (scipy periodogram semantics: k=0 and the Nyquist bin not doubled)
    "q_feat_entropy" ->
      s"""WITH hourly AS ($H),
         |ord AS (SELECT event_type, value,
         |  row_number() OVER (PARTITION BY event_type ORDER BY ts) - 1 AS t,
         |  count(*) OVER (PARTITION BY event_type) AS n,
         |  avg(value) OVER (PARTITION BY event_type) AS mu
         |  FROM hourly),
         |ks AS (SELECT DISTINCT event_type, unnest(range(0, n // 2 + 1)) AS k FROM ord),
         |sp AS (SELECT o.event_type, ks.k, max(o.n) AS n,
         |         sum((o.value - o.mu) * cos((2 * pi() * ks.k / o.n) * o.t)) AS re,
         |         sum((o.value - o.mu) * sin((2 * pi() * ks.k / o.n) * o.t)) AS im
         |       FROM ord o JOIN ks ON o.event_type = ks.event_type GROUP BY 1, 2),
         |psd AS (SELECT event_type, k, n,
         |          (re * re + im * im) / n *
         |            (CASE WHEN k = 0 OR (n % 2 = 0 AND k = n // 2) THEN 1 ELSE 2 END) AS p
         |        FROM sp),
         |tot AS (SELECT event_type, sum(p) AS total, max(n) AS n FROM psd GROUP BY 1)
         |SELECT psd.event_type,
         |  round(-sum(CASE WHEN psd.p / t.total > 0
         |                  THEN (psd.p / t.total) * ln(psd.p / t.total) / ln(2) END)
         |        / (ln(max(t.n) // 2 + 1) / ln(2)), 6) AS spectral_entropy
         |FROM psd JOIN tot t ON psd.event_type = t.event_type
         |GROUP BY 1""".stripMargin,

    // firstmin_ac / firstzero_ac over the full-length biased ACF — the
    // oracle computes every lag via the O(n²) pair join
    "q_feat_special_ac" ->
      s"""WITH hourly AS ($H),
         |ord AS (SELECT event_type, value,
         |  row_number() OVER (PARTITION BY event_type ORDER BY ts) AS rn,
         |  avg(value) OVER (PARTITION BY event_type) AS mu
         |  FROM hourly),
         |dv AS (SELECT event_type, rn, value - mu AS dev FROM ord),
         |den AS (SELECT event_type, sum(dev * dev) AS d FROM dv GROUP BY 1),
         |ac AS (SELECT a.event_type, b.rn - a.rn AS k, sum(a.dev * b.dev) AS num
         |       FROM dv a JOIN dv b ON a.event_type = b.event_type AND b.rn > a.rn
         |       GROUP BY 1, 2),
         |acf AS (SELECT ac.event_type, ac.k, CASE WHEN den.d > 0 THEN ac.num / den.d ELSE 0.0 END AS a
         |        FROM ac JOIN den ON ac.event_type = den.event_type),
         |l AS (SELECT event_type, k, a, lead(a) OVER (PARTITION BY event_type ORDER BY k) AS an FROM acf),
         |mins AS (SELECT event_type,
         |           min(CASE WHEN an IS NOT NULL AND a <= an THEN k END) AS fm,
         |           min(CASE WHEN an IS NOT NULL AND a > 0 AND an < 0 THEN k END) AS fz,
         |           max(k) AS maxk
         |         FROM l GROUP BY 1)
         |SELECT event_type,
         |  round(coalesce(fm, maxk)::DOUBLE, 6) AS firstmin_ac,
         |  round(coalesce(fz + 1, maxk + 1)::DOUBLE, 6) AS firstzero_ac
         |FROM mins""".stripMargin,

    // Hurst: slope of ln(popstd(x_{t+τ}-x_t)) on ln(τ), τ = 2..29
    "q_feat_hurst" ->
      s"""WITH hourly AS ($H),
         |ord AS (SELECT event_type, value, row_number() OVER (PARTITION BY event_type ORDER BY ts) AS rn FROM hourly),
         |lags AS (SELECT unnest(range(2, 30)) AS lag),
         |d AS (SELECT a.event_type, l.lag, b.value - a.value AS diff
         |      FROM ord a JOIN lags l ON true
         |      JOIN ord b ON b.event_type = a.event_type AND b.rn = a.rn + l.lag),
         |v AS (SELECT event_type, lag,
         |        ln(sqrt(greatest(avg(diff*diff) - avg(diff)*avg(diff), 1e-300))) AS ly,
         |        ln(lag) AS lx
         |      FROM d GROUP BY 1, 2)
         |SELECT event_type, round(regr_slope(ly, lx), 6) AS hurst FROM v GROUP BY 1""".stripMargin,

    // KPSS (trend-stationary, nlags=1): residuals of x on [1, t], partial
    // sums, eta/nˉ², Bartlett long-run variance γ0 + γ1
    "q_feat_unitroot_kpss" ->
      s"""WITH hourly AS ($H),
         |ord AS (SELECT event_type, value, row_number() OVER (PARTITION BY event_type ORDER BY ts) AS rn FROM hourly),
         |fit AS (SELECT event_type, regr_slope(value, rn) AS b, regr_intercept(value, rn) AS a FROM ord GROUP BY 1),
         |e AS (SELECT o.event_type, rn, value - a - b * rn AS e FROM ord o JOIN fit f ON o.event_type = f.event_type),
         |c AS (SELECT event_type, e,
         |        sum(e) OVER (PARTITION BY event_type ORDER BY rn) AS cum,
         |        lag(e) OVER (PARTITION BY event_type ORDER BY rn) AS ep
         |      FROM e),
         |s AS (SELECT event_type, count(*) AS n, sum(cum*cum) AS eta, sum(e*e) AS g0,
         |        sum(CASE WHEN ep IS NOT NULL THEN e * ep END) AS g1
         |      FROM c GROUP BY 1)
         |SELECT event_type,
         |  round(CASE WHEN (g0/n + g1/n) <= 0 THEN 0.0 ELSE (eta / (n::DOUBLE * n)) / (g0/n + g1/n) END, 6) AS kpss_stat
         |FROM s""".stripMargin,

    // ARCH-LM(p=2): m·R², R² of y² on [1, y²_{-1}, y²_{-2}] via the
    // multiple-correlation identity (r1² + r2² − 2·r1·r2·r12)/(1 − r12²)
    "q_feat_heterogeneity" ->
      s"""WITH hourly AS ($H),
         |y2 AS (SELECT event_type, value*value AS y,
         |         row_number() OVER (PARTITION BY event_type ORDER BY ts) AS rn FROM hourly),
         |l AS (SELECT event_type, y,
         |        lag(y, 1) OVER w AS l1, lag(y, 2) OVER w AS l2
         |      FROM y2 WINDOW w AS (PARTITION BY event_type ORDER BY rn)),
         |f AS (SELECT * FROM l WHERE l2 IS NOT NULL),
         |c AS (SELECT event_type, count(*) AS m, corr(y, l1) AS r1, corr(y, l2) AS r2, corr(l1, l2) AS r12
         |      FROM f GROUP BY 1)
         |SELECT event_type,
         |  round(m * (r1*r1 + r2*r2 - 2*r1*r2*r12) / (1 - r12*r12), 6) AS arch_lm
         |FROM c""".stripMargin,

    "q_feat_stl" ->
      s"""WITH hourly AS ($H),
         |${Decompose.additiveSql},
         |${Decompose.stlLiteSql()},
         |decomp2 AS (SELECT event_type, trend2 AS trend, seasonal2 AS seasonal, resid2 AS resid
         |            FROM stl2),
         |mo AS (SELECT event_type, count(*)::DOUBLE AS n,
         |         sum(resid) AS s1, sum(resid*resid) AS s2,
         |         sum(resid*resid*resid) AS s3, sum(resid*resid*resid*resid) AS s4,
         |         avg(resid*resid) - avg(resid)*avg(resid) AS vr,
         |         avg((trend + resid)*(trend + resid)) - avg(trend + resid)*avg(trend + resid) AS vtr,
         |         avg((seasonal + resid)*(seasonal + resid)) - avg(seasonal + resid)*avg(seasonal + resid) AS vsr
         |       FROM decomp2 GROUP BY 1),
         |sp AS (SELECT *,
         |         ((n - 1) * s2 - s1 * s1) / ((n - 1) * (n - 1)) AS alpha,
         |         2.0 * s1 / ((n - 1) * (n - 1)) AS beta,
         |         -n / ((n - 1) * (n - 1)) AS gamma
         |       FROM mo),
         |sp2 AS (SELECT *,
         |          n * alpha + beta * s1 + gamma * s2 AS sv,
         |          n * alpha * alpha + beta * beta * s2 + gamma * gamma * s4
         |            + 2.0 * alpha * beta * s1 + 2.0 * alpha * gamma * s2 + 2.0 * beta * gamma * s3 AS sv2
         |        FROM sp)
         |SELECT event_type,
         |  round(greatest(0.0, 1 - vr / vtr), 6) AS trend_strength,
         |  round(greatest(0.0, 1 - vr / vsr), 6) AS seasonal_strength,
         |  round(sv2 / n - (sv / n) * (sv / n), 2) AS spikiness
         |FROM sp2""".stripMargin,

    // get_seasonalities replay: DFT of the first-diff, dB peak gating
    // (median + 6·MAD), harmonic anti-join (the reference loop consults
    // removed peaks as removers, so the filter is order-free), then the
    // period-parametric two-pass MA decomposition via banded self-joins
    "q_feat_seasonalities" ->
      s"""WITH hourly AS ($H),
         |ord AS (SELECT event_type, value,
         |  row_number() OVER (PARTITION BY event_type ORDER BY ts) - 1 AS t,
         |  count(*) OVER (PARTITION BY event_type) AS n
         |  FROM hourly),
         |df AS (SELECT event_type, t - 1 AS td, n - 1 AS m,
         |         value - lag(value) OVER (PARTITION BY event_type ORDER BY t) AS d
         |       FROM ord QUALIFY d IS NOT NULL),
         |ks AS (SELECT DISTINCT event_type, m, unnest(range(1, (m + 1) // 2)) AS k FROM df),
         |sp AS (SELECT f.event_type, ks.k, max(f.m) AS m,
         |         sum(f.d * cos(2 * pi() * ks.k / f.m * f.td)) AS re,
         |         sum(f.d * sin(2 * pi() * ks.k / f.m * f.td)) AS im
         |       FROM df f JOIN ks ON f.event_type = ks.event_type GROUP BY 1, 2),
         |amp AS (SELECT event_type, k, m,
         |          CASE WHEN re * re + im * im > 0 THEN 10 * log10(re * re + im * im) ELSE -1e308 END AS ampl
         |        FROM sp),
         |med AS (SELECT event_type, quantile_cont(ampl, 0.5) FILTER (WHERE ampl > 0) AS med FROM amp GROUP BY 1),
         |abv AS (SELECT a.event_type, a.ampl FROM amp a JOIN med USING (event_type) WHERE a.ampl > med.med),
         |mu AS (SELECT event_type, avg(ampl) AS mu FROM abv GROUP BY 1),
         |mad AS (SELECT a.event_type, avg(abs(a.ampl - mu.mu)) AS mad FROM abv a JOIN mu USING (event_type) GROUP BY 1),
         |thr AS (SELECT med.event_type, med.med + 6.0 * mad.mad AS thr FROM med JOIN mad USING (event_type)),
         |pk AS (SELECT *, ampl - lag(ampl) OVER w AS dl, ampl - lead(ampl) OVER w AS dr
         |       FROM amp WINDOW w AS (PARTITION BY event_type ORDER BY k)),
         |selp AS (SELECT pk.event_type, pk.k, pk.m FROM pk JOIN thr USING (event_type)
         |         WHERE pk.dl >= 0.1 AND pk.dr >= 0.1 AND pk.ampl > thr.thr),
         |kept AS (SELECT s1.event_type, s1.k, s1.m FROM selp s1
         |         WHERE NOT EXISTS (SELECT 1 FROM selp s2
         |           WHERE s2.event_type = s1.event_type AND s2.k < s1.k
         |             AND ((s1.k::DOUBLE / s2.k) % 1 < 0.01 OR (s1.k::DOUBLE / s2.k) % 1 > 0.99))),
         |per AS (SELECT o.event_type, coalesce(kp.p, 7) AS period
         |        FROM (SELECT DISTINCT event_type FROM ord) o
         |        LEFT JOIN (SELECT event_type, floor(max(m)::DOUBLE / max(k))::INT AS p FROM kept GROUP BY 1) kp
         |        USING (event_type)),
         |base AS (SELECT o.event_type, o.t, o.value, p.period, p.period // 2 AS half
         |         FROM ord o JOIN per p USING (event_type)),
         |t1 AS (SELECT a.event_type, a.t, avg(b.value) AS trend1
         |       FROM base a JOIN base b ON a.event_type = b.event_type AND b.t BETWEEN a.t - a.half AND a.t + a.half
         |       GROUP BY 1, 2),
         |d1 AS (SELECT b.*, b.value - t1.trend1 AS detr1, b.t % b.period AS si
         |       FROM base b JOIN t1 USING (event_type, t)),
         |s1g AS (SELECT event_type, si, avg(detr1) AS g FROM d1 GROUP BY 1, 2),
         |s1c AS (SELECT d1.*, s1g.g - avg(s1g.g) OVER (PARTITION BY d1.event_type) AS seasonal1
         |        FROM d1 JOIN s1g ON d1.event_type = s1g.event_type AND d1.si = s1g.si),
         |p2 AS (SELECT event_type, t, value, period, half, si, value - seasonal1 AS deseason FROM s1c),
         |t2 AS (SELECT a.event_type, a.t, avg(b.deseason) AS trend2
         |       FROM p2 a JOIN p2 b ON a.event_type = b.event_type AND b.t BETWEEN a.t - a.half AND a.t + a.half
         |       GROUP BY 1, 2),
         |d2 AS (SELECT p2.*, t2.trend2, p2.value - t2.trend2 AS detr2 FROM p2 JOIN t2 USING (event_type, t)),
         |s2g AS (SELECT event_type, si, avg(detr2) AS g FROM d2 GROUP BY 1, 2),
         |s2c AS (SELECT d2.*, s2g.g - avg(s2g.g) OVER (PARTITION BY d2.event_type) AS seasonal2
         |        FROM d2 JOIN s2g ON d2.event_type = s2g.event_type AND d2.si = s2g.si),
         |fin AS (SELECT event_type, t, period, trend2, seasonal2,
         |          value - trend2 - seasonal2 AS resid FROM s2c),
         |tr0 AS (SELECT event_type, arg_min(trend2, t) AS tr0 FROM fin GROUP BY 1)
         |SELECT f.event_type,
         |  round(max(f.period)::DOUBLE, 6) AS seasonal_period,
         |  round(sum(f.t * (f.trend2 - tr0.tr0)) / sum(f.t::DOUBLE * f.t), 6) AS trend_mag,
         |  round(floor(quantile_cont(f.seasonal2, 0.95) - quantile_cont(f.seasonal2, 0.05) + 0.5), 6) AS seasonality_mag,
         |  round(sqrt(greatest(avg(f.resid * f.resid) - avg(f.resid) * avg(f.resid), 0)), 6) AS residual_std
         |FROM fin f JOIN tr0 USING (event_type)
         |GROUP BY f.event_type""".stripMargin
  )
}
