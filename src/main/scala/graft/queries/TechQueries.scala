package graft.queries

import graft._
import graft.expressions.ewm_array
import graft.models.GaussJordan
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Nowcasting technical-indicator battery
  * (kats/models/nowcasting/feature_extraction.py): MACD (:117), BBANDS
  * (:308), TRIX (:341), EMA (:375), TSI (:402), RSI (:432). These complete
  * the nowcasting surface beyond the ROC/MOM/MA/LAG columns q_nowcasting
  * already emits.
  *
  * All the EWMA chains ride the one-series-per-row reduction
  * ([[SeriesOps.collect]]) with the native [[graft.expressions.EwmArray]]
  * kernel — one O(n) compiled pass per smoothing stage, the scale axis is
  * the number of series. BBANDS is pure window frames (no collect at all).
  * min_periods masks surface as NULL rows exactly where pandas emits NaN.
  *
  * Oracle side: each adjusted EWMA stage is replayed as a power-weight pair
  * join (Σ x·(1−α)^Δ / Σ (1−α)^Δ over the valid prefix), chained through
  * CTEs at full precision; the recursive RSI form uses its closed-form
  * weights (first-obs weight (1−α)^Δ, later α·(1−α)^Δ). Decay bases are
  * written as the same IEEE expression (`1 - 2.0/span`) on both engines.
  */
object TechQueries {
  private val S = TSSchema(keys = Seq("event_type"))
  private def hourly(s: SparkSession, dir: String) = Tables.hourlyEvents(s, dir)
  private val H = Tables.hourlySql

  /** NaN (the expression-level missing marker) → NULL, rounded — the tidy
    * output convention shared with the oracle's CASE masks. */
  private def nn(c: Column): Column = round(when(isnan(c), lit(null).cast("double")).otherwise(c), 6)

  /** diff array: [NaN, x2−x1, x3−x2, …] (pandas Series.diff(1)). */
  private def diffArr(xs: Column): Column =
    concat(array(lit(Double.NaN)),
      zip_with(slice(xs, lit(2), size(xs) - 1), slice(xs, lit(1), size(xs) - 1), _ - _))

  /** Shift-by-one array: [NaN, a1, a2, …] — array-level lag, no extra sort. */
  private def lag1(a: Column): Column =
    concat(array(lit(Double.NaN)), slice(a, lit(1), size(a) - 1))

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // VWAP + OBV per series on the hourly (value=price, n=volume) frame:
    // daily volume-weighted average price (ratio of snapped sums) and
    // the on-balance-volume cumulative — OBV is an INTEGER cumsum
    // (±volume by price direction), so the running value is exact on
    // both engines; the day's last OBV is reported.
    "q_tech_vwap_obv" -> ((s, dir) => {
      val w = Window.partitionBy("event_type").orderBy("ts")
      val base = hourly(s, dir)
        .withColumn("pv", lag("value", 1).over(w))
        .withColumn("sgn",
          when(col("pv").isNull, 0L)
            .when(col("value") > col("pv"), col("n"))
            .when(col("value") < col("pv"), -col("n"))
            .otherwise(0L))
        .withColumn("obv", sum("sgn").over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("day", to_date(col("ts")))
      val wd = Window.partitionBy("event_type", "day").orderBy(col("ts").desc)
      base
        .withColumn("rk", row_number().over(wd))
        .groupBy("event_type", "day").agg(
          round(sum(col("value") * col("n")), 4).as("pvsum"),
          sum("n").as("vol"),
          max(when(col("rk") === 1, col("obv"))).as("obv_close"))
        .select(col("event_type"), col("day"),
          round(col("pvsum") / col("vol"), 6).as("vwap"),
          col("vol").as("volume"), col("obv_close"))
    }),

    // MACD(n_fast=12, n_slow=21): EMA12/EMA21 both masked at min_periods
    // n_slow−1=20; signal line = EWMA(span 9, mp 8) over the valid MACD
    // subsequence (feature_extraction.py:117).
    "q_tech_macd" -> ((s, dir) => {
      val base = SeriesOps.collect(hourly(s, dir).drop("n"), S)
        .withColumn("fast", ewm_array(col("xs"), 2.0 / 13, 20, adjust = true))
        .withColumn("slow", ewm_array(col("xs"), 2.0 / 22, 20, adjust = true))
        .withColumn("macd", zip_with(col("fast"), col("slow"), _ - _))
        .withColumn("sign", ewm_array(col("macd"), 2.0 / 10, 8, adjust = true))
      base.select(col("event_type"),
          posexplode(arrays_zip(col("tss"), col("xs"), col("fast"), col("slow"), col("macd"), col("sign"))))
        .select(col("event_type"), unix_timestamp(col("col.tss")).as("ts_s"), col("col.xs").as("value"),
          nn(col("col.fast")).as("ema_fast"), nn(col("col.slow")).as("ema_slow"),
          nn(col("col.macd")).as("macd"), nn(col("col.sign")).as("macd_sign"),
          nn(col("col.macd") - col("col.sign")).as("macd_diff"))
    }),

    // Bollinger bands over a 24-point rolling window (feature_extraction
    // .py:308): b1 = 4·σ/μ, b2 = (x−μ+2σ)/(4σ); pandas rolling(24) masks
    // the first 23 rows. Pure window frames — stays in whole-stage codegen.
    "q_tech_bbands" -> ((s, dir) => {
      val w = Window.partitionBy("event_type").orderBy("ts").rowsBetween(-23, 0)
      hourly(s, dir).drop("n")
        .withColumn("cnt", count(lit(1)).over(w))
        .withColumn("ma", avg("value").over(w))
        .withColumn("msd", stddev_samp("value").over(w))
        .select(col("event_type"), unix_timestamp(col("ts")).as("ts_s"), col("value"),
          round(when(col("cnt") === 24 && col("ma") =!= 0, lit(4) * col("msd") / col("ma")), 6).as("bb1"),
          round(when(col("cnt") === 24 && col("msd") =!= 0,
            (col("value") - col("ma") + lit(2) * col("msd")) / (lit(4) * col("msd"))), 6).as("bb2"))
    }),

    // TRIX(n=24): triple EWMA (span 24, mp 23 each stage, chained over the
    // surviving subsequence), then 1-step rate of change; the reference
    // seeds the output with a literal 0 at the first row
    // (feature_extraction.py:341 `ROC_l = [0]`), reproduced here. EX1 is
    // also the reference's EMA(24) column (:375), emitted as ema_24.
    "q_tech_trix" -> ((s, dir) => {
      val base = SeriesOps.collect(hourly(s, dir).drop("n"), S)
        .withColumn("ex1", ewm_array(col("xs"), 2.0 / 25, 23, adjust = true))
        .withColumn("ex2", ewm_array(col("ex1"), 2.0 / 25, 23, adjust = true))
        .withColumn("ex3", ewm_array(col("ex2"), 2.0 / 25, 23, adjust = true))
        .withColumn("ex3l", lag1(col("ex3")))
      base.select(col("event_type"),
          posexplode(arrays_zip(col("tss"), col("xs"), col("ex1"), col("ex3"), col("ex3l"))))
        .select(col("event_type"), unix_timestamp(col("col.tss")).as("ts_s"), col("col.xs").as("value"),
          nn(col("col.ex1")).as("ema_24"),
          // round + 0.0 normalizes −0.0 (a tiny negative rate rounds to
          // −0.0 in one engine and +0.0 in the other — the q_heaps
          // convention; first caught by the full sf0.1 gate, round 10)
          (round(when(col("pos") === 0, lit(0.0))
            .otherwise(nn(when(col("col.ex3l") =!= 0, (col("col.ex3") - col("col.ex3l")) / col("col.ex3l")))), 6)
            + lit(0.0)).as("trix"))
    }),

    // RSI(14) (feature_extraction.py:432): up/down gain series (pandas
    // `where` maps the leading diff-NaN to 0, so the series is dense from
    // the first row), UNadjusted EWMA α=1/14 masked at 14 obs, and the
    // emadn=0 → 100 clamp.
    "q_tech_rsi" -> ((s, dir) => {
      val base = SeriesOps.collect(hourly(s, dir).drop("n"), S)
        .withColumn("d", diffArr(col("xs")))
        .withColumn("up", transform(col("d"), x => when(isnan(x), lit(0.0)).otherwise(when(x > 0, x).otherwise(lit(0.0)))))
        .withColumn("dn", transform(col("d"), x => when(isnan(x), lit(0.0)).otherwise(when(x < 0, -x).otherwise(lit(0.0)))))
        .withColumn("eu", ewm_array(col("up"), 1.0 / 14, 14, adjust = false))
        .withColumn("ed", ewm_array(col("dn"), 1.0 / 14, 14, adjust = false))
      base.select(col("event_type"), posexplode(arrays_zip(col("tss"), col("xs"), col("eu"), col("ed"))))
        .select(col("event_type"), unix_timestamp(col("col.tss")).as("ts_s"), col("col.xs").as("value"),
          when(isnan(col("col.eu")) || isnan(col("col.ed")), lit(null).cast("double"))
            .otherwise(round(when(col("col.ed") === 0, lit(100.0))
              .otherwise(lit(100.0) - lit(100.0) / (lit(1.0) + col("col.eu") / col("col.ed"))), 6))
            .as("rsi_14"))
    }),

    // TSI(r=25, s=13) (feature_extraction.py:402): double-smoothed momentum
    // EMA(EMA(diff, 25), 13) / EMA(EMA(|diff|, 25), 13); each stage masked
    // at span−1 obs of its (already masked) input, aEMA2=0 → NULL guard.
    "q_tech_tsi" -> ((s, dir) => {
      val base = SeriesOps.collect(hourly(s, dir).drop("n"), S)
        .withColumn("d", diffArr(col("xs")))
        .withColumn("ad", transform(col("d"), x => abs(x)))
        .withColumn("e1", ewm_array(col("d"), 2.0 / 26, 24, adjust = true))
        .withColumn("a1", ewm_array(col("ad"), 2.0 / 26, 24, adjust = true))
        .withColumn("e2", ewm_array(col("e1"), 2.0 / 14, 12, adjust = true))
        .withColumn("a2", ewm_array(col("a1"), 2.0 / 14, 12, adjust = true))
      base.select(col("event_type"), posexplode(arrays_zip(col("tss"), col("xs"), col("e2"), col("a2"))))
        .select(col("event_type"), unix_timestamp(col("col.tss")).as("ts_s"), col("col.xs").as("value"),
          nn(when(col("col.a2") =!= 0, col("col.e2") / col("col.a2"))).as("tsi"))
    }),

    // Dynamic nowcasting's polynomial seasonal model
    // (nowcasting/dynamic_nowcasting.py:40 poly / :163 LinearRegression on
    // poly_0..poly_5 of x = hour·60+minute): per-series degree-5 OLS on
    // CENTERED minute-of-day u = (x − 719.5)/719.5 ∈ [−1, 1] — raw minute
    // powers reach 6e15 and destroy double-precision normal equations; the
    // affine map is a pure reparameterization (identical fitted values in
    // exact arithmetic) AND keeps κ(XᵀX) ≈ 1e4, so cross-engine
    // sum-order noise (~1e-15 rel) stays ~1e-10 in the coefficients — far
    // inside the 6-dp gate with NO moment snapping. (A 4-dp snap is
    // actively unsafe here: u is rational on a 6-dp-value grid, so moment
    // sums land EXACTLY on half-way rounding points and the engines flip
    // them differently.) poly_0 doubles as the intercept (the reference's
    // sklearn intercept is collinear with poly_0 and adds nothing to the
    // prediction space). Both engines run the SAME Gauss-Jordan
    // elimination.
    "q_nowcast_poly" -> ((s, dir) => {
      val h = hourly(s, dir).drop("n")
        .withColumn("u", ((hour(col("ts")) * 60 + minute(col("ts"))) - lit(719.5)) / lit(719.5))
      val ms: Seq[Column] =
        (0 to 10).map(k => sum(pow(col("u"), k)).as(s"s$k")) ++
        (0 to 5).map(k => sum(pow(col("u"), k) * col("value")).as(s"t$k"))
      val mats = h.groupBy("event_type").agg(ms.head, ms.tail: _*)
        .withColumn("m", array((for (i <- 0 to 5; j <- 0 to 6) yield
          if (j < 6) col(s"s${i + j}") else col(s"t$i")): _*))
      // μ rides the moment pass (t0/s0) — no separate mean scan of the corpus
      val beta = GaussJordan.eliminate(mats, "m", 6, 7)
        .select(col("event_type") +: (col("t0") / col("s0")).as("mu") +:
          (0 to 5).map(i => col("m")(i * 7 + 6).as(s"b$i")): _*)
      val yhat = (0 to 5).map(j => col(s"b$j") * pow(col("u"), j)).reduce(_ + _)
      def profile(u: Double) = (0 to 5).map(j => col(s"b$j") * lit(math.pow(u, j))).reduce(_ + _)
      val stats = h.join(broadcast(beta), "event_type")
        .withColumn("res2", (col("value") - yhat) * (col("value") - yhat))
        .withColumn("dev2", (col("value") - col("mu")) * (col("value") - col("mu")))
        .groupBy("event_type")
        .agg(first(col("b0")).as("b0"), (1 to 5).map(i => first(col(s"b$i")).as(s"b$i")) ++ Seq(
          round(lit(1) - sum("res2") / sum("dev2"), 6).as("r2")): _*)
      stats.select(col("event_type") +: (0 to 5).map(i => round(col(s"b$i"), 6).as(s"b$i")) :+ col("r2") :+
        round(profile(TechQueries.uOfHour(0)), 6).as("season_h0") :+
        round(profile(TechQueries.uOfHour(6)), 6).as("season_h6") :+
        round(profile(TechQueries.uOfHour(12)), 6).as("season_h12") :+
        round(profile(TechQueries.uOfHour(18)), 6).as("season_h18"): _*)
    })
  )

  private val ORD =
    s"""ord AS (SELECT event_type, ts, value,
       |  row_number() OVER (PARTITION BY event_type ORDER BY ts) AS rn FROM hourly)""".stripMargin

  /** Centered minute-of-day basis point for hour h (both engines share the
    * exact double: shortest-repr literals round-trip). */
  private[queries] def uOfHour(h: Int): Double = (h * 60 - 719.5) / 719.5

  /** q_nowcast_poly oracle, assembled programmatically so the moment
    * layout, fit polynomial, and profile constants are term-for-term the
    * Spark plan's arithmetic. */
  private val nowcastPolySql: String = {
    val moms = ((0 to 10).map(k => s"sum(pow(u, $k)) AS s$k") ++
      (0 to 5).map(k => s"sum(pow(u, $k) * value) AS t$k")).mkString(", ")
    val matEntries = (for (i <- 0 to 5; j <- 0 to 6) yield
      if (j < 6) s"s${i + j}" else s"t$i").mkString(", ")
    val fit = (0 to 5).map(j => s"be.b[${j + 1}] * pow(h.u, $j)").mkString(" + ")
    def profile(u: Double) = (0 to 5).map(j => s"be.b[${j + 1}] * ${math.pow(u, j)}").mkString(" + ")
    s"""WITH RECURSIVE hourly AS ($H),
       |hb AS (SELECT event_type, ts, value, ((hour(ts) * 60 + minute(ts)) - 719.5) / 719.5 AS u FROM hourly),
       |moms AS (SELECT event_type, $moms FROM hb GROUP BY 1),
       |mats AS (SELECT event_type, [$matEntries] AS m FROM moms),
       |${ModelQueries.gaussJordanSql(6)},
       |mu AS (SELECT event_type, t0 / s0 AS mu FROM moms),
       |fr AS (SELECT h.event_type,
       |         sum((h.value - ($fit)) * (h.value - ($fit))) AS sse,
       |         sum((h.value - m.mu) * (h.value - m.mu)) AS sst
       |       FROM hb h JOIN beta be ON h.event_type = be.event_type
       |       JOIN mu m ON h.event_type = m.event_type GROUP BY 1)
       |SELECT f.event_type,
       |  ${(0 to 5).map(j => s"round(be.b[${j + 1}], 6) AS b$j").mkString(", ")},
       |  round(1 - f.sse / f.sst, 6) AS r2,
       |  round(${profile(uOfHour(0))}, 6) AS season_h0,
       |  round(${profile(uOfHour(6))}, 6) AS season_h6,
       |  round(${profile(uOfHour(12))}, 6) AS season_h12,
       |  round(${profile(uOfHour(18))}, 6) AS season_h18
       |FROM fr f JOIN beta be ON f.event_type = be.event_type""".stripMargin
  }

  val sql: Map[String, String] = Map(

    "q_tech_vwap_obv" ->
      s"""WITH hourly AS (${Tables.hourlySql}),
         |lg AS (SELECT event_type, ts, value, n,
         |    lag(value, 1) OVER w AS pv
         |  FROM hourly WINDOW w AS (PARTITION BY event_type ORDER BY ts)),
         |sg AS (SELECT event_type, ts, value, n,
         |    CASE WHEN pv IS NULL THEN 0
         |         WHEN value > pv THEN n
         |         WHEN value < pv THEN -n ELSE 0 END AS sgn
         |  FROM lg),
         |ob AS (SELECT *, sum(sgn) OVER (PARTITION BY event_type ORDER BY ts
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS obv,
         |    ts::DATE AS day,
         |    row_number() OVER (PARTITION BY event_type, ts::DATE ORDER BY ts DESC) AS rk
         |  FROM sg)
         |SELECT event_type, day,
         |  round(round(sum(value * n), 4) / sum(n), 6) AS vwap,
         |  sum(n)::BIGINT AS volume,
         |  max(CASE WHEN rk = 1 THEN obv END)::BIGINT AS obv_close
         |FROM ob GROUP BY 1, 2""".stripMargin,

    "q_nowcast_poly" -> nowcastPolySql,

    "q_tech_macd" ->
      s"""WITH hourly AS ($H), $ORD,
         |ew AS (SELECT a.event_type, a.rn,
         |  sum(b.value * pow(1 - 2.0/13, a.rn - b.rn)) / sum(pow(1 - 2.0/13, a.rn - b.rn)) AS fast,
         |  sum(b.value * pow(1 - 2.0/22, a.rn - b.rn)) / sum(pow(1 - 2.0/22, a.rn - b.rn)) AS slow
         |  FROM ord a JOIN ord b ON b.event_type = a.event_type AND b.rn <= a.rn
         |  WHERE a.rn >= 20 GROUP BY 1, 2),
         |macd AS (SELECT event_type, rn, fast, slow, fast - slow AS macd FROM ew),
         |sgn AS (SELECT a.event_type, a.rn,
         |  sum(b.macd * pow(1 - 2.0/10, a.rn - b.rn)) / sum(pow(1 - 2.0/10, a.rn - b.rn)) AS sign
         |  FROM macd a JOIN macd b ON b.event_type = a.event_type AND b.rn <= a.rn
         |  WHERE a.rn >= 27 GROUP BY 1, 2)
         |SELECT o.event_type, epoch_us(o.ts)//1000000 AS ts_s, o.value,
         |  round(m.fast, 6) AS ema_fast, round(m.slow, 6) AS ema_slow,
         |  round(m.macd, 6) AS macd, round(g.sign, 6) AS macd_sign,
         |  round(m.macd - g.sign, 6) AS macd_diff
         |FROM ord o
         |LEFT JOIN macd m ON m.event_type = o.event_type AND m.rn = o.rn
         |LEFT JOIN sgn g ON g.event_type = o.event_type AND g.rn = o.rn""".stripMargin,

    "q_tech_bbands" ->
      s"""WITH hourly AS ($H)
         |SELECT event_type, epoch_us(ts)//1000000 AS ts_s, value,
         |  round(CASE WHEN cnt = 24 AND ma <> 0 THEN 4 * msd / ma END, 6) AS bb1,
         |  round(CASE WHEN cnt = 24 AND msd <> 0 THEN (value - ma + 2 * msd) / (4 * msd) END, 6) AS bb2
         |FROM (SELECT event_type, ts, value, count(*) OVER w AS cnt,
         |        avg(value) OVER w AS ma, stddev_samp(value) OVER w AS msd
         |      FROM hourly
         |      WINDOW w AS (PARTITION BY event_type ORDER BY ts ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))""".stripMargin,

    "q_tech_trix" ->
      s"""WITH hourly AS ($H), $ORD,
         |x1 AS (SELECT a.event_type, a.rn,
         |  sum(b.value * pow(1 - 2.0/25, a.rn - b.rn)) / sum(pow(1 - 2.0/25, a.rn - b.rn)) AS ex1
         |  FROM ord a JOIN ord b ON b.event_type = a.event_type AND b.rn <= a.rn
         |  WHERE a.rn >= 23 GROUP BY 1, 2),
         |x2 AS (SELECT a.event_type, a.rn,
         |  sum(b.ex1 * pow(1 - 2.0/25, a.rn - b.rn)) / sum(pow(1 - 2.0/25, a.rn - b.rn)) AS ex2
         |  FROM x1 a JOIN x1 b ON b.event_type = a.event_type AND b.rn <= a.rn
         |  WHERE a.rn >= 45 GROUP BY 1, 2),
         |x3 AS (SELECT a.event_type, a.rn,
         |  sum(b.ex2 * pow(1 - 2.0/25, a.rn - b.rn)) / sum(pow(1 - 2.0/25, a.rn - b.rn)) AS ex3
         |  FROM x2 a JOIN x2 b ON b.event_type = a.event_type AND b.rn <= a.rn
         |  WHERE a.rn >= 67 GROUP BY 1, 2)
         |SELECT o.event_type, epoch_us(o.ts)//1000000 AS ts_s, o.value,
         |  round(e.ex1, 6) AS ema_24,
         |  round(CASE WHEN o.rn = 1 THEN 0.0
         |             WHEN p.ex3 IS NOT NULL AND c.ex3 IS NOT NULL AND p.ex3 <> 0
         |             THEN (c.ex3 - p.ex3) / p.ex3 END, 6) + 0.0 AS trix
         |FROM ord o
         |LEFT JOIN x1 e ON e.event_type = o.event_type AND e.rn = o.rn
         |LEFT JOIN x3 c ON c.event_type = o.event_type AND c.rn = o.rn
         |LEFT JOIN x3 p ON p.event_type = o.event_type AND p.rn = o.rn - 1""".stripMargin,

    "q_tech_rsi" ->
      s"""WITH hourly AS ($H), $ORD,
         |m AS (SELECT event_type, ts, value, rn,
         |  value - lag(value) OVER (PARTITION BY event_type ORDER BY rn) AS d FROM ord),
         |ew AS (SELECT a.event_type, a.rn,
         |  sum((CASE WHEN b.d > 0 THEN b.d ELSE 0 END) *
         |      (CASE WHEN b.rn = 1 THEN pow(1 - 1.0/14, a.rn - b.rn)
         |            ELSE pow(1 - 1.0/14, a.rn - b.rn) / 14 END)) AS eu,
         |  sum((CASE WHEN b.d < 0 THEN -b.d ELSE 0 END) *
         |      (CASE WHEN b.rn = 1 THEN pow(1 - 1.0/14, a.rn - b.rn)
         |            ELSE pow(1 - 1.0/14, a.rn - b.rn) / 14 END)) AS ed
         |  FROM m a JOIN m b ON b.event_type = a.event_type AND b.rn <= a.rn
         |  WHERE a.rn >= 14 GROUP BY 1, 2)
         |SELECT o.event_type, epoch_us(o.ts)//1000000 AS ts_s, o.value,
         |  round(CASE WHEN e.rn IS NULL THEN NULL
         |             WHEN e.ed = 0 THEN 100.0
         |             ELSE 100.0 - 100.0 / (1.0 + e.eu / e.ed) END, 6) AS rsi_14
         |FROM ord o LEFT JOIN ew e ON e.event_type = o.event_type AND e.rn = o.rn""".stripMargin,

    "q_tech_tsi" ->
      s"""WITH hourly AS ($H), $ORD,
         |m AS (SELECT event_type, rn,
         |  value - lag(value) OVER (PARTITION BY event_type ORDER BY rn) AS d FROM ord),
         |e1 AS (SELECT a.event_type, a.rn,
         |  sum(b.d * pow(1 - 2.0/26, a.rn - b.rn)) / sum(pow(1 - 2.0/26, a.rn - b.rn)) AS e1,
         |  sum(abs(b.d) * pow(1 - 2.0/26, a.rn - b.rn)) / sum(pow(1 - 2.0/26, a.rn - b.rn)) AS a1
         |  FROM m a JOIN m b ON b.event_type = a.event_type AND b.rn BETWEEN 2 AND a.rn
         |  WHERE a.rn >= 25 GROUP BY 1, 2),
         |e2 AS (SELECT a.event_type, a.rn,
         |  sum(b.e1 * pow(1 - 2.0/14, a.rn - b.rn)) / sum(pow(1 - 2.0/14, a.rn - b.rn)) AS e2,
         |  sum(b.a1 * pow(1 - 2.0/14, a.rn - b.rn)) / sum(pow(1 - 2.0/14, a.rn - b.rn)) AS a2
         |  FROM e1 a JOIN e1 b ON b.event_type = a.event_type AND b.rn <= a.rn
         |  WHERE a.rn >= 36 GROUP BY 1, 2)
         |SELECT o.event_type, epoch_us(o.ts)//1000000 AS ts_s, o.value,
         |  round(CASE WHEN e.a2 <> 0 THEN e.e2 / e.a2 END, 6) AS tsi
         |FROM ord o LEFT JOIN e2 e ON e.event_type = o.event_type AND e.rn = o.rn""".stripMargin
  )
}
