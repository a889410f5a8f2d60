package graft.queries

import graft._
import graft.detectors.{Detectors, MannKendall}
import graft.operators.Decompose
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-2 detector surface: interval detector (test-of-means over daily
  * intervals, kats/detectors/interval_detector.py), VAR-residual
  * multivariate anomaly detector (kats/detectors/multivariate_detector.py),
  * residual-translation anomaly post-processing
  * (kats/detectors/residual_translation.py, anomaly_postprocessing.py),
  * and the detector-based TsFeatures battery (kats/tsfeatures/tsfeatures.py
  * get_cusum_detector/get_robust_stat_detector/get_outlier_detector/
  * get_trend_detector). Every query here is fully DuckDB-oracle-checked.
  */
object AdvancedQueries {
  private val S = TSSchema(keys = Seq("event_type"))
  private def hourly(s: SparkSession, dir: String) = Tables.hourlyEvents(s, dir).drop("n")
  private val H = Tables.hourlySql

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    /** Two-sample interval detection: each DAY's mean vs the series'
      * expanding prior baseline via a Welch z; consecutive significant
      * days merge into anomaly intervals (gaps-and-islands). One keyed
      * day-level aggregate + one window pass — day count per series is
      * the scale axis, never raw points.
      */
    "q_interval_detector" -> ((s, dir) => {
      val day = hourly(s, dir)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).cast("double").as("nb"), sum("value").as("sb"),
          sum(col("value") * col("value")).as("qb"))
      val w = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
      val z = day
        .withColumn("na", sum("nb").over(w))
        .withColumn("sa", sum("sb").over(w))
        .withColumn("qa", sum("qb").over(w))
        // day rank BEFORE the testability filters (mirrored in the oracle's
        // `cum` CTE): a day that can't be tested breaks an island rather
        // than letting an interval silently bridge it
        .withColumn("_rn", row_number().over(Window.partitionBy("event_type").orderBy("day")))
        .where(col("na") >= 2 && col("nb") >= 2) // Welch needs ≥2 points per side
        .withColumn("mb", col("sb") / col("nb"))
        .withColumn("ma", col("sa") / col("na"))
        .withColumn("vb", (col("qb") - col("nb") * col("mb") * col("mb")) / (col("nb") - 1))
        .withColumn("va", (col("qa") - col("na") * col("ma") * col("ma")) / (col("na") - 1))
        .where(col("va") / col("na") + col("vb") / col("nb") > 0) // constant windows carry no test
        .withColumn("z", (col("mb") - col("ma")) / sqrt(col("va") / col("na") + col("vb") / col("nb")))
      val flagged = z.where(abs(col("z")) > 1.96)
      flagged
        .withColumn("_grp", col("_rn") - row_number().over(Window.partitionBy("event_type").orderBy("day")))
        .groupBy(col("event_type"), col("_grp"))
        .agg(unix_timestamp(min("day")).as("start_day_s"), unix_timestamp(max("day")).as("end_day_s"),
          count(lit(1)).as("ndays"), round(max(abs(col("z"))), 6).as("peak_z"))
        .drop("_grp")
    }),

    /** Multivariate (VAR-residual) anomaly detector: per-entity VAR(1) of
      * the 2-dim series (value, n) via the same closed-form normal
      * equations as q_var; a row is anomalous when the χ²(2) score of its
      * standardized residual pair exceeds the 99% critical value.
      */
    "q_var_anomaly" -> ((s, dir) => {
      val w = Window.partitionBy("event_type").orderBy("ts")
      val lagged = Tables.hourlyEvents(s, dir)
        .withColumn("y1", col("value"))
        .withColumn("y2", col("n").cast("double"))
        .withColumn("u", lag("y1", 1).over(w))
        .withColumn("v", lag("y2", 1).over(w))
        .where(col("u").isNotNull)
      val fit = lagged.groupBy("event_type")
        .agg(
          count(lit(1)).cast("double").as("s0"),
          sum("u").as("su"), sum("v").as("sv"),
          sum(col("u") * col("u")).as("suu"), sum(col("v") * col("v")).as("svv"),
          sum(col("u") * col("v")).as("suv"),
          sum("y1").as("sy1"), sum(col("y1") * col("u")).as("sy1u"), sum(col("y1") * col("v")).as("sy1v"),
          sum("y2").as("sy2"), sum(col("y2") * col("u")).as("sy2u"), sum(col("y2") * col("v")).as("sy2v"))
        .select(col("event_type"),
          expr(ModelQueries.VarSql.c("sy1")).as("c1"), expr(ModelQueries.VarSql.a("sy1")).as("a1"),
          expr(ModelQueries.VarSql.b("sy1")).as("b1"),
          expr(ModelQueries.VarSql.c("sy2")).as("c2"), expr(ModelQueries.VarSql.a("sy2")).as("a2"),
          expr(ModelQueries.VarSql.b("sy2")).as("b2"))
      val resid = lagged.join(broadcast(fit), "event_type")
        .withColumn("r1", col("y1") - (col("c1") + col("a1") * col("u") + col("b1") * col("v")))
        .withColumn("r2", col("y2") - (col("c2") + col("a2") * col("u") + col("b2") * col("v")))
      val wk = Window.partitionBy("event_type")
      resid
        .withColumn("sd1", stddev_samp(col("r1")).over(wk))
        .withColumn("sd2", stddev_samp(col("r2")).over(wk))
        .withColumn("score",
          (col("r1") / col("sd1")) * (col("r1") / col("sd1")) +
            (col("r2") / col("sd2")) * (col("r2") / col("sd2")))
        .where(col("score") > 9.21034037197618)
        .select(col("event_type"), unix_timestamp(col("ts")).as("ts_s"), round(col("score"), 6).as("score"))
    }),

    /** Residual translation + anomaly post-processing: decomposition
      * residual → per-series z-score → centered 5-point smoothing →
      * flag |z| > 1.2 (the smoothing shrinks variance ~1/√5) → merge islands, keep windows of ≥ 2 points.
      */
    "q_anomaly_postproc" -> ((s, dir) => {
      val d = Decompose.additive(hourly(s, dir), S)
      val wk = Window.partitionBy("event_type")
      val wo = Window.partitionBy("event_type").orderBy("ts")
      val sm = d
        .withColumn("rz", (col("resid") - avg("resid").over(wk)) / stddev_samp(col("resid")).over(wk))
        .withColumn("srz", avg("rz").over(wo.rowsBetween(-2, 2)))
        .withColumn("_rn", row_number().over(wo))
      sm.where(abs(col("srz")) > 1.2)
        .withColumn("_grp", col("_rn") - row_number().over(wo))
        .groupBy(col("event_type"), col("_grp"))
        .agg(unix_timestamp(min("ts")).as("win_start_s"), unix_timestamp(max("ts")).as("win_end_s"),
          count(lit(1)).as("npoints"), round(max(abs(col("srz"))), 6).as("peak_score"))
        .where(col("npoints") >= 2)
        .drop("_grp")
    }),

    /** Cross-series clustering: embed every series as a SCALE-FREE shape
      * vector (cv, skew, kurtosis, acf1, linearity — no normalization
      * needed) and cluster with the deterministic Lloyd k-means. The
      * "cluster millions of series by shape" meta-operation; one feature
      * aggregate + k-means rounds, fully oracle-replayed.
      */
    "q_series_cluster" -> ((s, dir) => {
      val h = hourly(s, dir)
      val wKey = Window.partitionBy("event_type")
      val wOrd = Window.partitionBy("event_type").orderBy("ts")
      val base = h
        .withColumn("_mu", avg("value").over(wKey))
        .withColumn("_dev", col("value") - col("_mu"))
        .withColumn("_devk", lag("_dev", 1).over(wOrd))
        .withColumn("_t", (row_number().over(wOrd) - 1).cast("double"))
      val fv = base.groupBy("event_type").agg(
        (sqrt(avg(col("_dev") * col("_dev"))) / avg("value")).as("cv"),
        (avg(pow(col("_dev"), 3)) / pow(avg(col("_dev") * col("_dev")), 1.5)).as("skw"),
        (avg(pow(col("_dev"), 4)) / pow(avg(col("_dev") * col("_dev")), 2) - 3.0).as("krt"),
        (sum(when(col("_devk").isNotNull, col("_dev") * col("_devk"))) / sum(col("_dev") * col("_dev"))).as("acf1"),
        regr_r2(col("value"), col("_t")).as("lin"))
        .select(col("event_type"),
          array(col("cv"), col("skw"), col("krt"), col("acf1"), col("lin")).as("fvec"))
      val cents = graft.ann.KMeansDet.fit(fv, k = 2, iters = 2, id = "event_type", vec = "fvec")
      graft.ann.KMeansDet.assign(fv, cents, id = "event_type", vec = "fvec")
        .select(col("event_type"), col("cell"), round(col("d2"), 6).as("d2"))
    }),

    /** Detector-based TsFeatures: per-series detector summary stats
      * (outlier share, robust-stat share, Mann-Kendall trend, CUSUM
      * statistic, level-shift size) — each building block is the
      * oracle-proven detector, reduced to one feature row per series.
      */
    "q_feat_detectors" -> ((s, dir) => {
      val h = hourly(s, dir)
      val n = h.groupBy("event_type").agg(count(lit(1)).cast("double").as("n"))
      val outliers = Detectors.outlierIqr(h, S).groupBy("event_type").agg(count(lit(1)).cast("double").as("n_out"))
      val robust = Detectors.robustStat(h, S, 5, 12, 2.5).groupBy("event_type")
        .agg(count(lit(1)).cast("double").as("n_rob"))
      val mk = MannKendall.detect(h, S).select(col("event_type"), col("z").as("mk_z"), col("trend").as("mk_trend"))
      val cs = Detectors.cusum(h, S).select(col("event_type"), col("cusum").as("cusum_stat"))
      val ls = Detectors.levelShift(h, S, 24).select(col("event_type"), col("shift").as("level_shift_size"))
      n.join(outliers, Seq("event_type"), "left").join(robust, Seq("event_type"), "left")
        .join(mk, "event_type").join(cs, "event_type").join(ls, "event_type")
        .select(col("event_type"),
          round(coalesce(col("n_out"), lit(0.0)) / col("n"), 6).as("outlier_frac"),
          round(coalesce(col("n_rob"), lit(0.0)) / col("n"), 6).as("robust_frac"),
          col("mk_z"), col("mk_trend"), round(col("cusum_stat"), 6).as("cusum_stat"),
          col("level_shift_size"))
    })
  )

  private val seriesClusterSql: String = {
    def d2(v: String, c: String) =
      s"list_sum(list_transform(list_zip($v, $c), p -> (p[1] - p[2]) * (p[1] - p[2])))"
    def assignSql(i: Int, out: String) =
      s"""$out AS (SELECT event_type, fvec, cell, d2 FROM (
         |  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY d2, cell) AS rk FROM (
         |    SELECT f.event_type, f.fvec, c.cell, ${d2("f.fvec", "c.centroid")} AS d2
         |    FROM fv f CROSS JOIN cents$i c))
         |  WHERE rk = 1)""".stripMargin
    def updateSql(src: String, i: Int) =
      s"""cents${i + 1} AS (
         |  SELECT cell, list(cx ORDER BY dim) AS centroid FROM (
         |    SELECT cell, dim, avg(x) AS cx FROM (
         |      SELECT a.cell, generate_subscripts(a.fvec, 1) - 1 AS dim, unnest(a.fvec) AS x FROM $src a)
         |    GROUP BY 1, 2) GROUP BY 1)""".stripMargin
    s"""WITH hourly AS ($H),
       |b AS (SELECT event_type, ts, value, avg(value) OVER (PARTITION BY event_type) AS mu FROM hourly),
       |b2 AS (SELECT event_type, value, value - mu AS dev,
       |         lag(value - mu) OVER (PARTITION BY event_type ORDER BY ts) AS devk,
       |         (row_number() OVER (PARTITION BY event_type ORDER BY ts) - 1)::DOUBLE AS t
       |       FROM b),
       |fv AS (SELECT event_type, [
       |    sqrt(avg(dev*dev)) / avg(value),
       |    avg(dev*dev*dev) / (avg(dev*dev) ^ 1.5),
       |    avg(dev*dev*dev*dev) / (avg(dev*dev) ^ 2) - 3.0,
       |    sum(CASE WHEN devk IS NOT NULL THEN dev * devk END) / sum(dev * dev),
       |    regr_r2(value, t)
       |  ] AS fvec FROM b2 GROUP BY 1),
       |cents0 AS (SELECT row_number() OVER (ORDER BY event_type) - 1 AS cell, fvec AS centroid
       |           FROM (SELECT * FROM fv ORDER BY event_type LIMIT 2)),
       |${assignSql(0, "as0")},
       |${updateSql("as0", 0)},
       |${assignSql(1, "as1")},
       |${updateSql("as1", 1)},
       |${assignSql(2, "asf")}
       |SELECT event_type, cell, round(d2, 6) AS d2 FROM asf""".stripMargin
  }

  val sql: Map[String, String] = Map(
    "q_series_cluster" -> seriesClusterSql,

    "q_interval_detector" ->
      s"""WITH hourly AS ($H),
         |day AS (SELECT event_type, date_trunc('day', ts) AS day, count(*)::DOUBLE AS nb,
         |          sum(value) AS sb, sum(value * value) AS qb
         |        FROM hourly GROUP BY 1, 2),
         |cum AS (SELECT *,
         |  sum(nb) OVER w AS na, sum(sb) OVER w AS sa, sum(qb) OVER w AS qa,
         |  row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
         |  FROM day WINDOW w AS (PARTITION BY event_type ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
         |z AS (SELECT event_type, day, rn,
         |  (sb / nb - sa / na) /
         |    sqrt(((qa - na * (sa / na) * (sa / na)) / (na - 1)) / na
         |       + ((qb - nb * (sb / nb) * (sb / nb)) / (nb - 1)) / nb) AS z
         |  FROM cum WHERE na >= 2 AND nb >= 2
         |    AND ((qa - na * (sa / na) * (sa / na)) / (na - 1)) / na
         |      + ((qb - nb * (sb / nb) * (sb / nb)) / (nb - 1)) / nb > 0),
         |fl AS (SELECT *, rn - row_number() OVER (PARTITION BY event_type ORDER BY day) AS grp
         |       FROM z WHERE abs(z) > 1.96)
         |SELECT event_type, epoch_us(min(day))//1000000 AS start_day_s, epoch_us(max(day))//1000000 AS end_day_s,
         |  count(*) AS ndays, round(max(abs(z)), 6) AS peak_z
         |FROM fl GROUP BY event_type, grp""".stripMargin,

    "q_var_anomaly" -> {
      import ModelQueries.VarSql
      s"""WITH hourly AS ($H),
         |l AS (SELECT event_type, ts, value AS y1, n::DOUBLE AS y2,
         |        lag(value) OVER w AS u, lag(n::DOUBLE) OVER w AS v
         |      FROM hourly WINDOW w AS (PARTITION BY event_type ORDER BY ts)),
         |lf AS (SELECT * FROM l WHERE u IS NOT NULL),
         |fit AS (SELECT event_type, count(*)::DOUBLE AS s0, sum(u) AS su, sum(v) AS sv,
         |          sum(u*u) AS suu, sum(v*v) AS svv, sum(u*v) AS suv,
         |          sum(y1) AS sy1, sum(y1*u) AS sy1u, sum(y1*v) AS sy1v,
         |          sum(y2) AS sy2, sum(y2*u) AS sy2u, sum(y2*v) AS sy2v
         |        FROM lf GROUP BY 1),
         |co AS (SELECT event_type, ${VarSql.c("sy1")} AS c1, ${VarSql.a("sy1")} AS a1, ${VarSql.b("sy1")} AS b1,
         |         ${VarSql.c("sy2")} AS c2, ${VarSql.a("sy2")} AS a2, ${VarSql.b("sy2")} AS b2 FROM fit),
         |res AS (SELECT lf.event_type, lf.ts,
         |          lf.y1 - (co.c1 + co.a1 * lf.u + co.b1 * lf.v) AS r1,
         |          lf.y2 - (co.c2 + co.a2 * lf.u + co.b2 * lf.v) AS r2
         |        FROM lf JOIN co ON lf.event_type = co.event_type),
         |sc AS (SELECT event_type, ts,
         |  (r1 / stddev_samp(r1) OVER (PARTITION BY event_type)) * (r1 / stddev_samp(r1) OVER (PARTITION BY event_type))
         |    + (r2 / stddev_samp(r2) OVER (PARTITION BY event_type)) * (r2 / stddev_samp(r2) OVER (PARTITION BY event_type)) AS score
         |  FROM res)
         |SELECT event_type, epoch_us(ts)//1000000 AS ts_s, round(score, 6) AS score
         |FROM sc WHERE score > 9.21034037197618""".stripMargin
    },

    "q_anomaly_postproc" ->
      s"""WITH hourly AS ($H),
         |${Decompose.additiveSql},
         |rz AS (SELECT event_type, ts,
         |  (resid - avg(resid) OVER (PARTITION BY event_type)) / stddev_samp(resid) OVER (PARTITION BY event_type) AS rz
         |  FROM decomp),
         |sm AS (SELECT event_type, ts,
         |  avg(rz) OVER (PARTITION BY event_type ORDER BY ts ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS srz,
         |  row_number() OVER (PARTITION BY event_type ORDER BY ts) AS rn
         |  FROM rz),
         |fl AS (SELECT *, rn - row_number() OVER (PARTITION BY event_type ORDER BY ts) AS grp
         |       FROM sm WHERE abs(srz) > 1.2),
         |win AS (SELECT event_type, epoch_us(min(ts))//1000000 AS win_start_s, epoch_us(max(ts))//1000000 AS win_end_s,
         |          count(*) AS npoints, round(max(abs(srz)), 6) AS peak_score
         |        FROM fl GROUP BY event_type, grp)
         |SELECT * FROM win WHERE npoints >= 2""".stripMargin,

    "q_feat_detectors" ->
      s"""WITH hourly AS ($H),
         |${Decompose.additiveSql},
         |nq AS (SELECT event_type, count(*)::DOUBLE AS n FROM hourly GROUP BY 1),
         |iqrq AS (SELECT event_type, quantile_cont(resid, 0.25) q1, quantile_cont(resid, 0.75) q3 FROM decomp GROUP BY 1),
         |outc AS (SELECT d.event_type, count(*)::DOUBLE AS n_out
         |         FROM decomp d JOIN iqrq q ON d.event_type = q.event_type
         |         WHERE d.resid < q.q1 - 3.0 * (q.q3 - q.q1) OR d.resid > q.q3 + 3.0 * (q.q3 - q.q1)
         |         GROUP BY 1),
         |rsm AS (SELECT event_type, ts,
         |  round(avg(value) OVER (PARTITION BY event_type ORDER BY ts ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS smv
         |  FROM hourly),
         |rd AS (SELECT *, smv - lag(smv, 12) OVER (PARTITION BY event_type ORDER BY ts) AS dd FROM rsm),
         |rz2 AS (SELECT event_type,
         |  round((dd - avg(dd) OVER (PARTITION BY event_type)) / stddev_samp(dd) OVER (PARTITION BY event_type), 6) AS zscore
         |  FROM rd),
         |robc AS (SELECT event_type, count(*)::DOUBLE AS n_rob FROM rz2 WHERE abs(zscore) > 2.5 GROUP BY 1),
         |mkp AS (SELECT a.event_type, sign(b.value - a.value) AS sg
         |        FROM hourly a JOIN hourly b ON a.event_type = b.event_type AND a.ts < b.ts),
         |mks AS (SELECT event_type, sum(sg)::BIGINT AS s FROM mkp GROUP BY 1),
         |mkn AS (SELECT event_type, count(*)::BIGINT AS n FROM hourly GROUP BY 1),
         |mkt AS (SELECT event_type, sum(c * (c - 1) * (2 * c + 5)) AS tie_sum
         |        FROM (SELECT event_type, value, count(*)::BIGINT AS c FROM hourly GROUP BY 1, 2) GROUP BY 1),
         |mk AS (SELECT mks.event_type,
         |         round(CASE WHEN mks.s > 0 THEN (mks.s - 1) / sqrt((mkn.n * (mkn.n - 1) * (2 * mkn.n + 5) - coalesce(mkt.tie_sum, 0)) / 18.0)
         |                    WHEN mks.s < 0 THEN (mks.s + 1) / sqrt((mkn.n * (mkn.n - 1) * (2 * mkn.n + 5) - coalesce(mkt.tie_sum, 0)) / 18.0)
         |                    ELSE 0.0 END, 6) AS mk_z
         |       FROM mks JOIN mkn ON mks.event_type = mkn.event_type
         |       LEFT JOIN mkt ON mks.event_type = mkt.event_type),
         |mk2 AS (SELECT event_type, mk_z,
         |          CASE WHEN mk_z > 1.96 THEN 1 WHEN mk_z < -1.96 THEN -1 ELSE 0 END AS mk_trend FROM mk),
         |cmm AS (SELECT event_type, avg(value) AS mu FROM hourly GROUP BY 1),
         |cc AS (SELECT h.event_type, h.ts,
         |         sum(h.value - cmm.mu) OVER (PARTITION BY h.event_type ORDER BY h.ts) AS cum
         |       FROM hourly h JOIN cmm ON h.event_type = cmm.event_type),
         |cr AS (SELECT event_type, cum, row_number() OVER (PARTITION BY event_type ORDER BY abs(cum) DESC, ts) AS rn FROM cc),
         |cus AS (SELECT event_type, round(cum, 6) AS cusum_stat FROM cr WHERE rn = 1),
         |lsw AS (SELECT event_type, ts,
         |  avg(value) OVER (PARTITION BY event_type ORDER BY ts ROWS BETWEEN 23 PRECEDING AND CURRENT ROW) AS lm,
         |  avg(value) OVER (PARTITION BY event_type ORDER BY ts ROWS BETWEEN 1 FOLLOWING AND 24 FOLLOWING) AS rm,
         |  count(*) OVER (PARTITION BY event_type ORDER BY ts ROWS BETWEEN 23 PRECEDING AND CURRENT ROW) AS nl,
         |  count(*) OVER (PARTITION BY event_type ORDER BY ts ROWS BETWEEN 1 FOLLOWING AND 24 FOLLOWING) AS nr
         |  FROM hourly),
         |lsf AS (SELECT event_type, round(abs(rm - lm), 6) AS shift, ts FROM lsw WHERE nl = 24 AND nr = 24),
         |lsr AS (SELECT event_type, shift, row_number() OVER (PARTITION BY event_type ORDER BY shift DESC, ts) AS rn FROM lsf),
         |ls AS (SELECT event_type, shift AS level_shift_size FROM lsr WHERE rn = 1)
         |SELECT nq.event_type,
         |  round(coalesce(outc.n_out, 0) / nq.n, 6) AS outlier_frac,
         |  round(coalesce(robc.n_rob, 0) / nq.n, 6) AS robust_frac,
         |  mk2.mk_z, mk2.mk_trend, cus.cusum_stat, ls.level_shift_size
         |FROM nq LEFT JOIN outc ON nq.event_type = outc.event_type
         |LEFT JOIN robc ON nq.event_type = robc.event_type
         |JOIN mk2 ON nq.event_type = mk2.event_type
         |JOIN cus ON nq.event_type = cus.event_type
         |JOIN ls ON nq.event_type = ls.event_type""".stripMargin
  )
}
