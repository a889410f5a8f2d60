package graft.queries

import graft.operators.Simulator
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Simulator battery (kats/utils/simulator.py): STL composition (:300),
  * level-shift (:416) and trend-shift (:562) series with seasonality +
  * point anomalies, and the anomaly-injection family (:728/:760/:796)
  * composed end-to-end.
  *
  * Execution shape: the only sequential piece is the seeded gaussian
  * stream (Simulator.gaussians, one short array per grid row); everything
  * else — segment levels, continuity-adjusted trends, seasonality,
  * anomaly overrides, spike scale — is closed-form column math over the
  * posexploded (seed, t, g) rows, so a 10⁶-seed grid parallelizes as
  * 10⁶ independent partitionable series. The DuckDB oracle replays the
  * identical LCG + Box–Muller stream with a recursive CTE (the
  * q_simulate_arima pattern) and the same closed forms.
  */
object SimQueries {

  // ── shared grid → (seed, t, g) exploded gaussian stream ──────────────
  private def gaussRows(s: SparkSession, seeds: Seq[Long], n: Int): DataFrame = {
    import s.implicits._
    val g = udf((seed: Long) => Simulator.gaussians(n, seed))
    seeds.toDF("seed")
      .withColumn("gs", g(col("seed")))
      .select(col("seed"), posexplode(col("gs")).as(Seq("t", "g")))
  }

  /** Recursive-CTE replay of Simulator.gaussians: Park–Miller LCG (63-bit
    * safe BIGINT arithmetic) + Box–Muller; row t carries the t-th gaussian.
    */
  private def gaussSql(seeds: Seq[Long], n: Int): String =
    s"""seeds AS (SELECT CAST(unnest([${seeds.mkString(", ")}]) AS BIGINT) AS seed),
       |rec AS (
       |  SELECT seed, -1 AS t, greatest((abs(seed) * 2027 + 1234567) % 2147483647, 1) AS s, 0.0::DOUBLE AS g
       |  FROM seeds
       |  UNION ALL
       |  SELECT seed, t + 1, s2,
       |    sqrt(-2 * ln(greatest(s1 / 2147483647.0, 1e-300))) * cos(2 * pi() * (s2 / 2147483647.0))
       |  FROM (SELECT seed, t, (s * 48271) % 2147483647 AS s1,
       |        (((s * 48271) % 2147483647) * 48271) % 2147483647 AS s2
       |        FROM rec WHERE t < ${n - 1})
       |),
       |gauss AS (SELECT seed, t, g FROM rec WHERE t >= 0)""".stripMargin

  // ── q_simulate_stl: trend + seasonality + noise composition ──────────
  object Stl {
    val N = 500
    val Period = 50.0
    // (trend magnitude, seasonal magnitude, noise magnitude, seed)
    val Grid: Seq[(Double, Double, Double, Long)] =
      Seq((10.0, 5.0, 2.0, 1L), (20.0, 3.0, 1.0, 2L), (0.0, 8.0, 3.0, 3L), (15.0, 0.0, 2.0, 4L))
  }

  // ── q_simulate_level_shift: kats example params (simulator.py:487) ───
  object Lvl {
    val N = 450
    val Cp = Array(100, 200)
    val Levels = Array(3.0, 20.0, 2.0)
    val Noise = 3.0
    val Period = 7
    val SeasMag = 3.0
    val Anoms = Array(50, 150, 250)
    val Z = Array(10.0, -10.0, 20.0)
    val Seeds = Seq(1L, 2L, 3L)

    def levelCase(t: Column): Column =
      when(t < Cp(0), Levels(0)).when(t < Cp(1), Levels(1)).otherwise(Levels(2))
    val levelCaseSql =
      s"CASE WHEN t < ${Cp(0)} THEN ${Levels(0)} WHEN t < ${Cp(1)} THEN ${Levels(1)} ELSE ${Levels(2)} END"
    def segment(t: Column): Column =
      when(t < Cp(0), 0).when(t < Cp(1), 1).otherwise(2)
    val segmentSql = s"CASE WHEN t < ${Cp(0)} THEN 0 WHEN t < ${Cp(1)} THEN 1 ELSE 2 END"
  }

  // ── q_simulate_trend_shift: kats example params (simulator.py:600) ───
  object Trend {
    val N = 450
    val Cp = Array(100, 200)
    val Trends = Array(3.0, 20.0, 2.0)
    val Intercept = 30.0
    val Noise = 5.0
    val Period = 7
    val SeasMag = 3.0
    val Anoms = Array(50, 250)
    val Z = Array(12.0, -12.0)
    val Seeds = Seq(1L, 2L, 3L)
    // continuity offsets per segment, precomputed in closed form
    val Offsets: Array[Double] = Simulator.trendShiftOffsets(Cp, Trends)

    def base(t: Column): Column =
      lit(Intercept) + when(t < Cp(0), lit(Trends(0)) * t - Offsets(0))
        .when(t < Cp(1), lit(Trends(1)) * t - Offsets(1))
        .otherwise(lit(Trends(2)) * t - Offsets(2))
    val baseSql =
      s"""${Intercept} + CASE WHEN t < ${Cp(0)} THEN ${Trends(0)} * t - (${Offsets(0)})
         | WHEN t < ${Cp(1)} THEN ${Trends(1)} * t - (${Offsets(1)})
         | ELSE ${Trends(2)} * t - (${Offsets(2)}) END""".stripMargin.replace("\n", "")
  }

  // ── q_simulate_inject: stl base → level + trend + spike injection ────
  object Inj {
    val N = 450
    val Seeds = Seq(1L, 2L)
    // base stlSim(450, 5, 2, 50, 1, seed)
    val TrendMag = 5.0; val SeasMag = 2.0; val Period = 50.0; val NoiseMag = 1.0
    // injectLevelShift(cp=[100,200,300], levels=[6,-6])
    val LvlCp = Array(100, 200, 300); val LvlAdd = Array(6.0, -6.0)
    // injectTrendShift(cp=[300,400,450], trends=[0.4,-0.2])
    val TrCp = Array(300, 400, 450); val TrAdd = Array(0.4, -0.2)
    // injectSpikes([50,250], [8,-8])
    val Anoms = Array(50, 250); val Z = Array(8.0, -8.0)

    def lvlCase(t: Column): Column =
      when(t >= LvlCp(0) && t < LvlCp(1), LvlAdd(0))
        .when(t >= LvlCp(1) && t < LvlCp(2), LvlAdd(1)).otherwise(0.0)
    val lvlCaseSql =
      s"""CASE WHEN t >= ${LvlCp(0)} AND t < ${LvlCp(1)} THEN ${LvlAdd(0)}
         | WHEN t >= ${LvlCp(1)} AND t < ${LvlCp(2)} THEN ${LvlAdd(1)} ELSE 0.0 END""".stripMargin.replace("\n", "")
    // segment [300,400): 0.4·(t−300); tail ≥400 keeps 0.4·99 then −0.2·(t−400)
    private val tail0 = TrAdd(0) * (TrCp(1) - TrCp(0) - 1)
    def trCase(t: Column): Column =
      when(t >= TrCp(0) && t < TrCp(1), lit(TrAdd(0)) * (t - TrCp(0)))
        .when(t >= TrCp(1), lit(tail0) + lit(TrAdd(1)) * (t - TrCp(1)))
        .otherwise(0.0)
    val trCaseSql =
      s"""CASE WHEN t >= ${TrCp(0)} AND t < ${TrCp(1)} THEN ${TrAdd(0)} * (t - ${TrCp(0)})
         | WHEN t >= ${TrCp(1)} THEN ${tail0} + (${TrAdd(1)}) * (t - ${TrCp(1)}) ELSE 0.0 END""".stripMargin.replace("\n", "")
    def segment(t: Column): Column =
      when(t < 100, 0).when(t < 200, 1).when(t < 300, 2).when(t < 400, 3).otherwise(4)
    val segmentSql =
      "CASE WHEN t < 100 THEN 0 WHEN t < 200 THEN 1 WHEN t < 300 THEN 2 WHEN t < 400 THEN 3 ELSE 4 END"
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_simulate_stl" -> ((s, _) => {
      import s.implicits._
      import Stl._
      val g = udf((seed: Long) => Simulator.gaussians(N, seed))
      val grid = Grid.toDF("trend_mag", "seas_mag", "noise_mag", "seed")
      grid.withColumn("gs", g(col("seed")))
        .select(col("trend_mag"), col("seas_mag"), col("noise_mag"), col("seed"),
          posexplode(col("gs")).as(Seq("t", "g")))
        .withColumn("tp", col("t") / lit((N - 1).toDouble))
        .withColumn("v",
          col("trend_mag") * col("tp") +
            col("seas_mag") * sin(lit(2 * math.Pi) * col("t") / lit(Period)) +
            col("noise_mag") * col("g"))
        .groupBy("trend_mag", "seas_mag", "noise_mag", "seed")
        .agg(
          round(avg("v"), 6).as("mean"),
          round(var_pop("v"), 6).as("var_val"),
          round(regr_slope(col("v"), col("tp")), 6).as("slope"))
    }),

    "q_simulate_level_shift" -> ((s, _) => {
      import Lvl._
      val t = col("t")
      gaussRows(s, Seeds, N)
        .withColumn("lvl", levelCase(t))
        .withColumn("v",
          when(t === Anoms(0), col("lvl") + Z(0) * Noise)
            .when(t === Anoms(1), col("lvl") + Z(1) * Noise)
            .when(t === Anoms(2), col("lvl") + Z(2) * Noise)
            .otherwise(col("lvl") + col("g") * Noise)
            + lit(SeasMag) * sin(lit(math.Pi / Period) * t))
        .withColumn("segment", segment(t))
        .groupBy("seed", "segment")
        .agg(count(lit(1)).as("n_pts"),
          round(avg("v"), 6).as("mean"),
          round(var_pop("v"), 6).as("var_val"))
    }),

    "q_simulate_trend_shift" -> ((s, _) => {
      import Trend._
      val t = col("t")
      gaussRows(s, Seeds, N)
        .withColumn("v",
          base(t)
            + lit(SeasMag) * sin(lit(math.Pi / Period) * t)
            + when(t === Anoms(0), Z(0) * Noise)
              .when(t === Anoms(1), Z(1) * Noise)
              .otherwise(col("g") * Noise))
        .withColumn("segment", Lvl.segment(t))
        .groupBy("seed", "segment")
        .agg(count(lit(1)).as("n_pts"),
          round(avg("v"), 6).as("mean"),
          round(regr_slope(col("v"), t.cast("double")), 6).as("slope"))
    }),

    "q_simulate_inject" -> ((s, _) => {
      import Inj._
      injectedV3(s)
        .withColumn("segment", segment(col("t")))
        .groupBy("seed", "segment")
        .agg(count(lit(1)).as("n_pts"),
          round(avg("v3"), 6).as("mean"),
          round(var_pop("v3"), 6).as("var_val"),
          round(max("sigma"), 6).as("sigma_est"))
    }),

    // ── Detector calibration against planted ground truth: the injected
    // series (q_simulate_inject's exact construction — ±8σ spikes at
    // known positions) scored by the global-z detector; per seed the
    // confusion counts and precision/recall/F1. The harness that answers
    // "does the detector actually find what the simulator planted" —
    // closing the simulate → detect → evaluate loop the reference keeps
    // in separate modules (kats/utils/simulator.py + detectors/outlier
    // .py) without ever scoring one against the other. μ/σ snap to 6 dp
    // before the flag compare so the binary decisions are engine-exact.
    // ── Forecast-fit calibration against planted ground truth (the
    // q_detector_eval of the model family): a pure trend+season+noise
    // series with KNOWN parameters (slope 5 over the span, sin amplitude
    // 2, σ=1 noise) fit by the engine's own OLS path — the SAME
    // moments → GaussJordan.eliminate machinery the production models
    // use — and the recovered slope/amplitude errors + in-sample RMSE
    // reported per seed. Betas snap to 6 dp before the residual pass so
    // both engines score identical predictions. ──
    "q_forecast_eval" -> ((s, _) => {
      import Inj._
      val t = col("t")
      val base = gaussRows(s, Seeds, N)
        .withColumn("y", lit(TrendMag) * (t / lit((N - 1).toDouble)) +
          lit(SeasMag) * sin(lit(2 * math.Pi) * t / lit(Period)) + lit(NoiseMag) * col("g"))
        .withColumn("x2", t / lit((N - 1).toDouble))
        .withColumn("x3", sin(lit(2 * math.Pi) * t / lit(Period)))
        .withColumn("x4", cos(lit(2 * math.Pi) * t / lit(Period)))
      val bc: Seq[Column] = Seq(lit(1.0), col("x2"), col("x3"), col("x4"))
      val sums: Seq[Column] = (0 until 4).flatMap { i =>
        (0 until 4).map { j =>
          val sm = sum(bc(i) * bc(j))
          (if (i == j) sm + lit(1e-8) else sm).as(s"m${i}_$j")
        } :+ sum(bc(i) * col("y")).as(s"r$i")
      }
      val mats = base.groupBy("seed").agg(sums.head, sums.tail: _*)
        .withColumn("m", array((for (i <- 0 until 4; j <- 0 to 4) yield
          if (j < 4) col(s"m${i}_$j") else col(s"r$i")): _*))
      val beta = graft.models.GaussJordan.eliminate(mats, "m", 4, 5)
        .select(col("seed") +: (1 to 4).map(k =>
          round(col("m")((k - 1) * 5 + 4), 6).as(s"b$k")): _*)
      base.join(broadcast(beta), "seed")
        .withColumn("r", col("y") - (col("b1") + col("b2") * col("x2") +
          col("b3") * col("x3") + col("b4") * col("x4")))
        .groupBy("seed").agg(
          first("b1").as("b1"), first("b2").as("b2"),
          first("b3").as("b3"), first("b4").as("b4"),
          round(sqrt(avg(col("r") * col("r"))), 6).as("rmse"))
        .withColumn("amp_hat", round(sqrt(col("b3") * col("b3") + col("b4") * col("b4")), 6))
        .withColumn("slope_err", round(abs(col("b2") - lit(TrendMag)), 6))
        .withColumn("amp_err", round(abs(col("amp_hat") - lit(SeasMag)), 6))
    }),

    "q_detector_eval" -> ((s, _) => {
      import Inj._
      // detector: z on the trailing-3-mean residual (the construction's
      // own detrending — a GLOBAL z would drown the ±8σ spikes in the
      // level/trend-shift variance and find nothing)
      val y = injectedV3(s)
      val w = Window.partitionBy("seed").orderBy("t")
      val r = y.withColumn("dd",
        col("v3") - (lag("v3", 2).over(w) + lag("v3", 1).over(w) + col("v3")) / 3.0)
        .where(col("dd").isNotNull)
      val st = r.groupBy("seed").agg(round(stddev_pop("dd"), 6).as("sg"))
      val flagged = r.join(broadcast(st), "seed")
        .withColumn("pred", abs(col("dd")) > lit(3.0) * col("sg"))
        .withColumn("actual", col("t") === Anoms(0) || col("t") === Anoms(1))
      flagged.groupBy("seed").agg(
        sum(when(col("pred") && col("actual"), 1L).otherwise(0L)).as("tp"),
        sum(when(col("pred") && !col("actual"), 1L).otherwise(0L)).as("fp"),
        sum(when(!col("pred") && col("actual"), 1L).otherwise(0L)).as("fn"))
        .withColumn("precision",
          round(col("tp") / expr("nullif(tp + fp, 0)"), 6))
        .withColumn("recall",
          round(col("tp") / expr("nullif(tp + fn, 0)"), 6))
        .withColumn("f1", round(lit(2.0) * col("precision") * col("recall") /
          expr("nullif(precision + recall, 0.0)"), 6))
    })
  )

  /** The injected series shared by q_simulate_inject / q_detector_eval:
    * (seed, t, v3, sigma) — stl base + level/trend shifts + ±8σ spikes
    * at Inj.Anoms. One definition so the detector is scored against
    * EXACTLY the series the simulator query certifies.
    */
  private def injectedV3(s: SparkSession): DataFrame = {
    import Inj._
    val t = col("t")
    val w = Window.partitionBy("seed").orderBy("t")
    val v2 = gaussRows(s, Seeds, N)
      .withColumn("v0",
        lit(TrendMag) * (t / lit((N - 1).toDouble)) +
          lit(SeasMag) * sin(lit(2 * math.Pi) * t / lit(Period)) +
          lit(NoiseMag) * col("g"))
      .withColumn("v2", col("v0") + lvlCase(t) + trCase(t))
    // spike scale: population std of x[t] − trailing 3-point mean
    val d = v2
      .withColumn("d", col("v2") - (lag("v2", 2).over(w) + lag("v2", 1).over(w) + col("v2")) / 3.0)
      .where(col("d").isNotNull)
    val sigma = d.groupBy("seed").agg(stddev_pop("d").as("sigma"))
    v2.join(broadcast(sigma), "seed")
      .withColumn("v3", col("v2") +
        when(t === Anoms(0), lit(Z(0)) * col("sigma"))
          .when(t === Anoms(1), lit(Z(1)) * col("sigma"))
          .otherwise(0.0))
  }

  val sql: Map[String, String] = Map(
    "q_simulate_stl" -> {
      import Stl._
      val gridSql = Grid.map { case (tm, sm, nm, sd) => s"($tm, $sm, $nm, $sd)" }.mkString(", ")
      s"""WITH RECURSIVE grid(trend_mag, seas_mag, noise_mag, gseed) AS (SELECT * FROM (VALUES $gridSql) v),
         |${gaussSql(Grid.map(_._4), N)},
         |pts AS (SELECT gr.trend_mag, gr.seas_mag, gr.noise_mag, g.seed, g.t / ${(N - 1).toDouble} AS tp,
         |    gr.trend_mag * (g.t / ${(N - 1).toDouble})
         |      + gr.seas_mag * sin(2 * pi() * g.t / $Period)
         |      + gr.noise_mag * g.g AS v
         |  FROM gauss g JOIN grid gr ON g.seed = gr.gseed)
         |SELECT trend_mag, seas_mag, noise_mag, seed,
         |  round(avg(v), 6) AS mean, round(var_pop(v), 6) AS var_val,
         |  round(regr_slope(v, tp), 6) AS slope
         |FROM pts GROUP BY 1, 2, 3, 4""".stripMargin
    },

    "q_simulate_level_shift" -> {
      import Lvl._
      s"""WITH RECURSIVE ${gaussSql(Seeds, N)},
         |pts AS (SELECT seed, t, $levelCaseSql AS lvl, g FROM gauss),
         |y AS (SELECT seed, t,
         |    CASE WHEN t = ${Anoms(0)} THEN lvl + ${Z(0)} * $Noise
         |         WHEN t = ${Anoms(1)} THEN lvl + (${Z(1)}) * $Noise
         |         WHEN t = ${Anoms(2)} THEN lvl + ${Z(2)} * $Noise
         |         ELSE lvl + g * $Noise END
         |      + $SeasMag * sin((pi() / $Period) * t) AS v,
         |    $segmentSql AS segment
         |  FROM pts)
         |SELECT seed, segment, count(*) AS n_pts,
         |  round(avg(v), 6) AS mean, round(var_pop(v), 6) AS var_val
         |FROM y GROUP BY 1, 2""".stripMargin
    },

    "q_simulate_trend_shift" -> {
      import Trend._
      s"""WITH RECURSIVE ${gaussSql(Seeds, N)},
         |y AS (SELECT seed, t,
         |    ($baseSql)
         |      + $SeasMag * sin((pi() / $Period) * t)
         |      + CASE WHEN t = ${Anoms(0)} THEN ${Z(0)} * $Noise
         |             WHEN t = ${Anoms(1)} THEN (${Z(1)}) * $Noise
         |             ELSE g * $Noise END AS v,
         |    ${Lvl.segmentSql} AS segment
         |  FROM gauss)
         |SELECT seed, segment, count(*) AS n_pts,
         |  round(avg(v), 6) AS mean, round(regr_slope(v, t::DOUBLE), 6) AS slope
         |FROM y GROUP BY 1, 2""".stripMargin
    },

    "q_simulate_inject" -> {
      import Inj._
      s"""WITH RECURSIVE ${gaussSql(Seeds, N)},
         |v2 AS (SELECT seed, t,
         |    ($TrendMag * (t / ${(N - 1).toDouble})
         |      + $SeasMag * sin(2 * pi() * t / $Period)
         |      + $NoiseMag * g)
         |    + ($lvlCaseSql) + ($trCaseSql) AS v2
         |  FROM gauss),
         |d AS (SELECT seed,
         |    v2 - (lag(v2, 2) OVER w + lag(v2, 1) OVER w + v2) / 3.0 AS d
         |  FROM v2 WINDOW w AS (PARTITION BY seed ORDER BY t)),
         |sig AS (SELECT seed, stddev_pop(d) AS sigma FROM d WHERE d IS NOT NULL GROUP BY 1),
         |y AS (SELECT v2.seed, t,
         |    v2.v2 + CASE WHEN t = ${Anoms(0)} THEN ${Z(0)} * sigma
         |                 WHEN t = ${Anoms(1)} THEN (${Z(1)}) * sigma
         |                 ELSE 0.0 END AS v3,
         |    sigma, $segmentSql AS segment
         |  FROM v2 JOIN sig ON v2.seed = sig.seed)
         |SELECT seed, segment, count(*) AS n_pts,
         |  round(avg(v3), 6) AS mean, round(var_pop(v3), 6) AS var_val,
         |  round(max(sigma), 6) AS sigma_est
         |FROM y GROUP BY 1, 2""".stripMargin
    },

    "q_forecast_eval" -> {
      import Inj._
      val bases = Seq("1.0E0", "x2", "x3", "x4")
      val entries = (0 until 4).flatMap { i =>
        (0 until 4).map { j =>
          val s0 = s"sum(${bases(i)} * ${bases(j)})"
          if (i == j) s"$s0 + 1e-8" else s0
        } :+ s"sum(${bases(i)} * y)"
      }.mkString(", ")
      s"""WITH RECURSIVE ${gaussSql(Seeds, N)},
         |base AS (SELECT seed AS event_type, t,
         |    ($TrendMag * (t / ${(N - 1).toDouble})
         |      + $SeasMag * sin(2 * pi() * t / $Period)
         |      + $NoiseMag * g) AS y,
         |    (t / ${(N - 1).toDouble}) AS x2,
         |    sin(2 * pi() * t / $Period) AS x3,
         |    cos(2 * pi() * t / $Period) AS x4
         |  FROM gauss),
         |mats AS (SELECT event_type, [$entries] AS m FROM base GROUP BY 1),
         |${ModelQueries.gaussJordanSql(4)},
         |bt AS (SELECT event_type, round(b[1], 6) AS b1, round(b[2], 6) AS b2,
         |         round(b[3], 6) AS b3, round(b[4], 6) AS b4 FROM beta),
         |sc AS (SELECT b.event_type, bt.b1, bt.b2, bt.b3, bt.b4,
         |        b.y - (bt.b1 + bt.b2 * b.x2 + bt.b3 * b.x3 + bt.b4 * b.x4) AS r
         |      FROM base b JOIN bt USING (event_type)),
         |ag AS (SELECT event_type AS seed, b1, b2, b3, b4,
         |         round(sqrt(avg(r * r)), 6) AS rmse
         |       FROM sc GROUP BY 1, 2, 3, 4, 5)
         |SELECT seed, b1, b2, b3, b4, rmse,
         |  round(sqrt(b3 * b3 + b4 * b4), 6) AS amp_hat,
         |  round(abs(b2 - $TrendMag), 6) AS slope_err,
         |  round(abs(round(sqrt(b3 * b3 + b4 * b4), 6) - $SeasMag), 6) AS amp_err
         |FROM ag""".stripMargin
    },

    "q_detector_eval" -> {
      import Inj._
      s"""WITH RECURSIVE ${gaussSql(Seeds, N)},
         |v2 AS (SELECT seed, t,
         |    ($TrendMag * (t / ${(N - 1).toDouble})
         |      + $SeasMag * sin(2 * pi() * t / $Period)
         |      + $NoiseMag * g)
         |    + ($lvlCaseSql) + ($trCaseSql) AS v2
         |  FROM gauss),
         |d AS (SELECT seed,
         |    v2 - (lag(v2, 2) OVER w + lag(v2, 1) OVER w + v2) / 3.0 AS d
         |  FROM v2 WINDOW w AS (PARTITION BY seed ORDER BY t)),
         |sig AS (SELECT seed, stddev_pop(d) AS sigma FROM d WHERE d IS NOT NULL GROUP BY 1),
         |y AS (SELECT v2.seed, t,
         |    v2.v2 + CASE WHEN t = ${Anoms(0)} THEN ${Z(0)} * sigma
         |                 WHEN t = ${Anoms(1)} THEN (${Z(1)}) * sigma
         |                 ELSE 0.0 END AS v3
         |  FROM v2 JOIN sig ON v2.seed = sig.seed),
         |r AS (SELECT seed, t,
         |    v3 - (lag(v3, 2) OVER w2 + lag(v3, 1) OVER w2 + v3) / 3.0 AS dd
         |  FROM y WINDOW w2 AS (PARTITION BY seed ORDER BY t)),
         |rn AS (SELECT * FROM r WHERE dd IS NOT NULL),
         |st AS (SELECT seed, round(stddev_pop(dd), 6) AS sg FROM rn GROUP BY 1),
         |fl AS (SELECT rn.seed, rn.t,
         |    abs(rn.dd) > 3.0 * st.sg AS pred,
         |    rn.t IN (${Anoms(0)}, ${Anoms(1)}) AS actual
         |  FROM rn JOIN st USING (seed)),
         |c AS (SELECT seed,
         |    sum(CASE WHEN pred AND actual THEN 1 ELSE 0 END) AS tp,
         |    sum(CASE WHEN pred AND NOT actual THEN 1 ELSE 0 END) AS fp,
         |    sum(CASE WHEN NOT pred AND actual THEN 1 ELSE 0 END) AS fn
         |  FROM fl GROUP BY 1),
         |pr AS (SELECT seed, tp::BIGINT AS tp, fp::BIGINT AS fp, fn::BIGINT AS fn,
         |    round(tp / nullif(tp + fp, 0), 6) AS "precision",
         |    round(tp / nullif(tp + fn, 0), 6) AS recall
         |  FROM c)
         |SELECT seed, tp, fp, fn, "precision", recall,
         |  round(2.0 * "precision" * recall / nullif("precision" + recall, 0.0), 6) AS f1
         |FROM pr""".stripMargin
    }
  )
}
