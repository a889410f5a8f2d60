package graft.queries

import graft._
import graft.models.{Regressors, Smoothers}
import graft.operators.Decompose
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.4 forecasting models. Closed-form fits (linear, quadratic via
  * centered-Cramer normal equations, AR(2) via Yule-Walker, STL-forecast,
  * median ensemble, nowcasting features) are DuckDB-oracle-exact; the
  * smoothing/design-matrix models are deterministic fixed-parameter
  * kernels with rows-only checks + specs.
  */
object ModelQueries {
  private val S = TSSchema(keys = Seq("event_type"))
  private def hourly(s: SparkSession, dir: String) = Tables.hourlyEvents(s, dir).drop("n")
  private def dense(s: SparkSession, dir: String) = TS.fillGaps(hourly(s, dir), S, 3600L, Some(0.0))
  private val H = Tables.hourlySql

  // ---- Spark-side closed-form fits ------------------------------------

  private def linearFit(df: DataFrame): DataFrame =
    df.withColumn("_t", (row_number().over(S.orderedWindow) - 1).cast("double"))
      .groupBy("event_type")
      .agg(regr_intercept(col("value"), col("_t")).as("a"),
           regr_slope(col("value"), col("_t")).as("b"),
           count(lit(1)).as("n"))

  private def quadraticFit(df: DataFrame): DataFrame = {
    val wKey = Window.partitionBy("event_type")
    val base = df
      .withColumn("_rn", row_number().over(S.orderedWindow))
      .withColumn("_n", count(lit(1)).over(wKey))
      .withColumn("_u", col("_rn") - 1 - (col("_n") - 1) / 2.0)
    val u = col("_u"); val y = col("value")
    base.groupBy("event_type").agg(
      count(lit(1)).cast("double").as("s0"),
      sum(u).as("s1"), sum(u * u).as("s2"), sum(u * u * u).as("s3"), sum(u * u * u * u).as("s4"),
      sum(y).as("t0"), sum(u * y).as("t1"), sum(u * u * y).as("t2"))
      .withColumn("det",
        col("s0") * (col("s2") * col("s4") - col("s3") * col("s3"))
          - col("s1") * (col("s1") * col("s4") - col("s3") * col("s2"))
          + col("s2") * (col("s1") * col("s3") - col("s2") * col("s2")))
      .withColumn("qa",
        (col("t0") * (col("s2") * col("s4") - col("s3") * col("s3"))
          - col("s1") * (col("t1") * col("s4") - col("s3") * col("t2"))
          + col("s2") * (col("t1") * col("s3") - col("s2") * col("t2"))) / col("det"))
      .withColumn("qb",
        (col("s0") * (col("t1") * col("s4") - col("s3") * col("t2"))
          - col("t0") * (col("s1") * col("s4") - col("s3") * col("s2"))
          + col("s2") * (col("s1") * col("t2") - col("t1") * col("s2"))) / col("det"))
      .withColumn("qc",
        (col("s0") * (col("s2") * col("t2") - col("t1") * col("s3"))
          - col("s1") * (col("s1") * col("t2") - col("t1") * col("s2"))
          + col("t0") * (col("s1") * col("s3") - col("s2") * col("s2"))) / col("det"))
  }

  private def quadF(h: Int): Column = {
    val uf = (col("s0") - 1) / 2.0 + h
    col("qa") + col("qb") * uf + col("qc") * uf * uf
  }

  private def ar2Fit(df: DataFrame): DataFrame = {
    val wKey = Window.partitionBy("event_type")
    val base = df
      .withColumn("_mu", avg("value").over(wKey))
      .withColumn("_dev", col("value") - col("_mu"))
      .withColumn("_d1", lag("_dev", 1).over(S.orderedWindow))
      .withColumn("_d2", lag("_dev", 2).over(S.orderedWindow))
      .withColumn("_rn", row_number().over(S.orderedWindow))
      .withColumn("_n", count(lit(1)).over(wKey))
    base.groupBy("event_type").agg(
      (sum(col("_dev") * col("_d1")) / sum(col("_dev") * col("_dev"))).as("r1"),
      (sum(col("_dev") * col("_d2")) / sum(col("_dev") * col("_dev"))).as("r2"),
      max("_mu").as("mu"),
      max(when(col("_rn") === col("_n"), col("value"))).as("xn"),
      max(when(col("_rn") === col("_n") - 1, col("value"))).as("xn1"))
      .withColumn("phi1", col("r1") * (lit(1.0) - col("r2")) / (lit(1.0) - col("r1") * col("r1")))
      .withColumn("phi2", (col("r2") - col("r1") * col("r1")) / (lit(1.0) - col("r1") * col("r1")))
      .withColumn("f1", col("mu") + col("phi1") * (col("xn") - col("mu")) + col("phi2") * (col("xn1") - col("mu")))
      .withColumn("f2", col("mu") + col("phi1") * (col("f1") - col("mu")) + col("phi2") * (col("xn") - col("mu")))
  }

  /** STL-forecast (stlf.py): linear trend on the deseasonalized series,
    * re-seasonalized at the forecast hour. `seasonal` is constant per
    * (series, hour-of-day) by construction of Decompose.additive.
    */
  private def stlfFit(df: DataFrame): DataFrame = {
    val d = Decompose.additive(df, S)
      .withColumn("_deseason", col("value") - col("seasonal"))
      .withColumn("_t", (row_number().over(S.orderedWindow) - 1).cast("double"))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy("event_type")))
      .withColumn("_hod", hour(col("ts")))
    val fit = d.groupBy("event_type")
      .agg(regr_intercept(col("_deseason"), col("_t")).as("a"),
           regr_slope(col("_deseason"), col("_t")).as("b"),
           count(lit(1)).as("n"),
           max(when(col("_t") === col("_n") - 1, col("_hod"))).as("last_hod"))
    val seas = d.select(col("event_type"), col("_hod"), col("seasonal")).distinct()
    // horizon 1 and 24: hod_f = (last_hod + h) mod 24
    fit
      .withColumn("hod1", (col("last_hod") + 1) % 24)
      .withColumn("hod24", (col("last_hod") + 24) % 24)
      .join(seas.withColumnRenamed("_hod", "hod1").withColumnRenamed("seasonal", "seas1"), Seq("event_type", "hod1"))
      .join(seas.withColumnRenamed("_hod", "hod24").withColumnRenamed("seasonal", "seas24"), Seq("event_type", "hod24"))
      .withColumn("f1", col("a") + col("b") * (col("n") - 1 + 1) + col("seas1"))
      .withColumn("f24", col("a") + col("b") * (col("n") - 1 + 24) + col("seas24"))
  }

  // ---- SQL fragments ----------------------------------------------------

  private val linearSqlCte =
    """lin AS (
      |  SELECT event_type, regr_intercept(value, t) AS a, regr_slope(value, t) AS b, count(*) AS n
      |  FROM (SELECT event_type, value,
      |        (row_number() OVER (PARTITION BY event_type ORDER BY ts) - 1)::DOUBLE AS t FROM hourly)
      |  GROUP BY 1)""".stripMargin

  private val quadSqlCte =
    """qsum AS (
      |  SELECT event_type, count(*)::DOUBLE AS s0,
      |    sum(u) AS s1, sum(u*u) AS s2, sum(u*u*u) AS s3, sum(u*u*u*u) AS s4,
      |    sum(value) AS t0, sum(u*value) AS t1, sum(u*u*value) AS t2
      |  FROM (SELECT event_type, value,
      |        (row_number() OVER (PARTITION BY event_type ORDER BY ts)) - 1
      |          - (count(*) OVER (PARTITION BY event_type) - 1) / 2.0 AS u
      |        FROM hourly)
      |  GROUP BY 1),
      |quad AS (
      |  SELECT *,
      |    s0*(s2*s4 - s3*s3) - s1*(s1*s4 - s3*s2) + s2*(s1*s3 - s2*s2) AS det,
      |    (t0*(s2*s4 - s3*s3) - s1*(t1*s4 - s3*t2) + s2*(t1*s3 - s2*t2)) /
      |      (s0*(s2*s4 - s3*s3) - s1*(s1*s4 - s3*s2) + s2*(s1*s3 - s2*s2)) AS qa,
      |    (s0*(t1*s4 - s3*t2) - t0*(s1*s4 - s3*s2) + s2*(s1*t2 - t1*s2)) /
      |      (s0*(s2*s4 - s3*s3) - s1*(s1*s4 - s3*s2) + s2*(s1*s3 - s2*s2)) AS qb,
      |    (s0*(s2*t2 - t1*s3) - s1*(s1*t2 - t1*s2) + t0*(s1*s3 - s2*s2)) /
      |      (s0*(s2*s4 - s3*s3) - s1*(s1*s4 - s3*s2) + s2*(s1*s3 - s2*s2)) AS qc
      |  FROM qsum)""".stripMargin

  private val stlfSqlCte =
    s"""${Decompose.additiveSql},
       |ds AS (SELECT event_type, ts, value - seasonal AS deseason, seasonal, hour(ts) AS hod,
       |  (row_number() OVER (PARTITION BY event_type ORDER BY ts) - 1)::DOUBLE AS t,
       |  count(*) OVER (PARTITION BY event_type) AS n
       |  FROM decomp),
       |sfit AS (SELECT event_type, regr_intercept(deseason, t) AS a, regr_slope(deseason, t) AS b,
       |  max(n) AS n, max(CASE WHEN t = n - 1 THEN hod END) AS last_hod
       |  FROM ds GROUP BY 1),
       |seas AS (SELECT DISTINCT event_type, hod, seasonal FROM ds),
       |stlf AS (
       |  SELECT f.event_type,
       |    f.a + f.b * (f.n - 1 + 1) + s1.seasonal AS f1,
       |    f.a + f.b * (f.n - 1 + 24) + s24.seasonal AS f24
       |  FROM sfit f
       |  JOIN seas s1 ON f.event_type = s1.event_type AND s1.hod = (f.last_hod + 1) % 24
       |  JOIN seas s24 ON f.event_type = s24.event_type AND s24.hod = (f.last_hod + 24) % 24)""".stripMargin

  // ---- queries ----------------------------------------------------------

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_linear_trend" -> ((s, dir) =>
      linearFit(hourly(s, dir)).select(
        col("event_type"), round(col("a"), 6).as("intercept"), round(col("b"), 6).as("slope"),
        round(col("a") + col("b") * (col("n") - 1 + 1), 6).as("yhat_1"),
        round(col("a") + col("b") * (col("n") - 1 + 24), 6).as("yhat_24"))),

    "q_quadratic_trend" -> ((s, dir) =>
      quadraticFit(hourly(s, dir)).select(
        col("event_type"), round(col("qa"), 6).as("qa"), round(col("qb"), 6).as("qb"), round(col("qc"), 6).as("qc"),
        round(quadF(1), 6).as("yhat_1"), round(quadF(24), 6).as("yhat_24"))),

    "q_ar2" -> ((s, dir) =>
      ar2Fit(hourly(s, dir)).select(
        col("event_type"), round(col("phi1"), 6).as("phi1"), round(col("phi2"), 6).as("phi2"),
        round(col("f1"), 6).as("yhat_1"), round(col("f2"), 6).as("yhat_2"))),

    "q_stlf" -> ((s, dir) =>
      stlfFit(hourly(s, dir)).select(
        col("event_type"), round(col("f1"), 6).as("yhat_1"), round(col("f24"), 6).as("yhat_24"))),

    "q_ensemble" -> ((s, dir) => {
      val h = hourly(s, dir)
      val lin = linearFit(h).select(col("event_type"), (col("a") + col("b") * (col("n") - 1 + 24)).as("f_lin"))
      val quad = quadraticFit(h).select(col("event_type"), quadF(24).as("f_quad"))
      val stlf = stlfFit(h).select(col("event_type"), col("f24").as("f_stlf"))
      lin.join(quad, "event_type").join(stlf, "event_type")
        .withColumn("ens_median",
          col("f_lin") + col("f_quad") + col("f_stlf")
            - greatest(col("f_lin"), col("f_quad"), col("f_stlf"))
            - least(col("f_lin"), col("f_quad"), col("f_stlf")))
        .select(col("event_type"), round(col("f_lin"), 6).as("f_lin"), round(col("f_quad"), 6).as("f_quad"),
          round(col("f_stlf"), 6).as("f_stlf"), round(col("ens_median"), 6).as("ens_median"))
    }),

    "q_nowcasting" -> ((s, dir) => {
      val w = S.orderedWindow
      val wk = w.rowsBetween(-11, 0)
      hourly(s, dir)
        .withColumn("lag_12", lag("value", 12).over(w))
        .withColumn("roc_12", round(when(col("lag_12") =!= 0, (col("value") - col("lag_12")) / col("lag_12")), 6))
        .withColumn("mom_12", round(col("value") - col("lag_12"), 6))
        .withColumn("ma_12", round(avg("value").over(wk), 6))
        .select(col("event_type"), unix_timestamp(col("ts")).as("ts_s"), col("value"),
          col("lag_12"), col("roc_12"), col("mom_12"), col("ma_12"))
    }),

    "q_ses" -> ((s, dir) =>
      SeriesOps.aggSeries(hourly(s, dir), S, Seq("level")) { xs =>
        Array(Smoothers.ses(xs, 0.3))
      }),

    "q_holt" -> ((s, dir) =>
      SeriesOps.aggSeries(hourly(s, dir), S, Seq("level", "trend", "yhat_1", "yhat_24")) { xs =>
        val (l, b) = Smoothers.holt(xs, 0.3, 0.1)
        Array(l, b, l + b, l + 24 * b)
      }),

    "q_holtwinters" -> ((s, dir) =>
      SeriesOps.aggSeries(dense(s, dir), S, Seq("level", "trend", "yhat_1", "yhat_24")) { xs =>
        val m = 24
        val (l, b, seas) = Smoothers.holtWinters(xs, m, 0.3, 0.05, 0.1)
        val n = xs.length
        def f(h: Int) = l + h * b + seas((n + h - 1) % m)
        Array(l, b, f(1), f(24))
      }),

    "q_theta" -> ((s, dir) =>
      SeriesOps.aggSeries(hourly(s, dir), S, Seq("yhat_1", "yhat_24")) { xs =>
        Array(Smoothers.theta(xs, 1), Smoothers.theta(xs, 24))
      }),

    "q_harmonic_regression" -> ((s, dir) =>
      SeriesOps.aggSeries(dense(s, dir), S, Seq("yhat_1", "yhat_24", "r2")) { xs =>
        val (fc, r2) = Regressors.harmonic(xs, period = 24, orders = 3, h = 24)
        Array(fc(0), fc(23), r2)
      }),

    "q_prophet_lite" -> ((s, dir) =>
      SeriesOps.aggSeries(dense(s, dir), S, Seq("yhat_1", "yhat_12", "yhat_24")) { xs =>
        val fc = Regressors.prophetLite(xs, period = 24, orders = 3, nChangepoints = 4, h = 24)
        Array(fc(0), fc(11), fc(23))
      }),

    "q_var" -> ((s, dir) => {
      val d = dense(s, dir)
      val types = d.select("event_type").distinct().collect().map(_.getString(0)).sorted
      val pivoted = d.groupBy("ts").pivot("event_type", types).agg(first("value")).na.drop()
      val assemble = udf { (rows: Seq[Seq[Double]]) =>
        val obs = rows.map(_.toArray).toArray
        val (c, a, fc) = Regressors.var1(obs)
        types.indices.map(i => (types(i), c(i), fc(i), a(i).toSeq)).toSeq
      }
      val one = pivoted
        .select(sort_array(collect_list(struct(col("ts") +: types.map(col): _*))).as("_rows"))
        .select(explode(assemble(expr("transform(_rows, r -> array(" + types.map(t => s"r.`$t`").mkString(",") + "))"))).as("_r"))
      one.select(
        col("_r._1").as("event_type"), round(col("_r._2"), 6).as("intercept"),
        round(col("_r._3"), 6).as("yhat_1"),
        round(element_at(col("_r._4"), 1), 6).as("coef_1"))
    })
  )

  val sql: Map[String, String] = Map(
    "q_linear_trend" ->
      s"""WITH hourly AS ($H),
         |$linearSqlCte
         |SELECT event_type, round(a, 6) AS intercept, round(b, 6) AS slope,
         |  round(a + b * (n - 1 + 1), 6) AS yhat_1,
         |  round(a + b * (n - 1 + 24), 6) AS yhat_24
         |FROM lin""".stripMargin,

    "q_quadratic_trend" ->
      s"""WITH hourly AS ($H),
         |$quadSqlCte
         |SELECT event_type, round(qa, 6) AS qa, round(qb, 6) AS qb, round(qc, 6) AS qc,
         |  round(qa + qb * ((s0 - 1) / 2.0 + 1) + qc * ((s0 - 1) / 2.0 + 1)^2, 6) AS yhat_1,
         |  round(qa + qb * ((s0 - 1) / 2.0 + 24) + qc * ((s0 - 1) / 2.0 + 24)^2, 6) AS yhat_24
         |FROM quad""".stripMargin,

    "q_ar2" ->
      s"""WITH hourly AS ($H),
         |b AS (SELECT event_type, ts, value,
         |  value - avg(value) OVER (PARTITION BY event_type) AS dev,
         |  row_number() OVER (PARTITION BY event_type ORDER BY ts) AS rn,
         |  count(*) OVER (PARTITION BY event_type) AS n,
         |  avg(value) OVER (PARTITION BY event_type) AS mu
         |  FROM hourly),
         |l AS (SELECT *, lag(dev, 1) OVER w AS d1, lag(dev, 2) OVER w AS d2
         |      FROM b WINDOW w AS (PARTITION BY event_type ORDER BY ts)),
         |r AS (SELECT event_type,
         |  sum(dev * d1) / sum(dev * dev) AS r1,
         |  sum(dev * d2) / sum(dev * dev) AS r2,
         |  max(mu) AS mu,
         |  max(CASE WHEN rn = n THEN value END) AS xn,
         |  max(CASE WHEN rn = n - 1 THEN value END) AS xn1
         |  FROM l GROUP BY 1),
         |p AS (SELECT *,
         |  r1 * (1 - r2) / (1 - r1 * r1) AS phi1,
         |  (r2 - r1 * r1) / (1 - r1 * r1) AS phi2 FROM r),
         |f AS (SELECT *, mu + phi1 * (xn - mu) + phi2 * (xn1 - mu) AS f1 FROM p)
         |SELECT event_type, round(phi1, 6) AS phi1, round(phi2, 6) AS phi2,
         |  round(f1, 6) AS yhat_1,
         |  round(mu + phi1 * (f1 - mu) + phi2 * (xn - mu), 6) AS yhat_2
         |FROM f""".stripMargin,

    "q_stlf" ->
      s"""WITH hourly AS ($H),
         |$stlfSqlCte
         |SELECT event_type, round(f1, 6) AS yhat_1, round(f24, 6) AS yhat_24 FROM stlf""".stripMargin,

    "q_ensemble" ->
      s"""WITH hourly AS ($H),
         |$linearSqlCte,
         |$quadSqlCte,
         |$stlfSqlCte,
         |j AS (SELECT l.event_type,
         |  l.a + l.b * (l.n - 1 + 24) AS f_lin,
         |  q.qa + q.qb * ((q.s0 - 1) / 2.0 + 24) + q.qc * ((q.s0 - 1) / 2.0 + 24)^2 AS f_quad,
         |  s.f24 AS f_stlf
         |  FROM lin l JOIN quad q ON l.event_type = q.event_type
         |  JOIN stlf s ON l.event_type = s.event_type)
         |SELECT event_type, round(f_lin, 6) AS f_lin, round(f_quad, 6) AS f_quad, round(f_stlf, 6) AS f_stlf,
         |  round(f_lin + f_quad + f_stlf - greatest(f_lin, f_quad, f_stlf) - least(f_lin, f_quad, f_stlf), 6) AS ens_median
         |FROM j""".stripMargin,

    "q_nowcasting" ->
      s"""WITH hourly AS ($H)
         |SELECT event_type, epoch_us(ts)//1000000 AS ts_s, value,
         |  lag(value, 12) OVER w AS lag_12,
         |  CASE WHEN lag(value, 12) OVER w <> 0
         |       THEN round((value - lag(value, 12) OVER w) / (lag(value, 12) OVER w), 6) END AS roc_12,
         |  round(value - lag(value, 12) OVER w, 6) AS mom_12,
         |  round(avg(value) OVER (PARTITION BY event_type ORDER BY ts ROWS BETWEEN 11 PRECEDING AND CURRENT ROW), 6) AS ma_12
         |FROM hourly WINDOW w AS (PARTITION BY event_type ORDER BY ts)""".stripMargin
  )
}
