package graft.queries

import graft._
import graft.models.NowcastGbt
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GBT nowcasting (kats/models/nowcasting/nowcasting.py:33 — the last
  * portable reference model without a graft counterpart): the ROC/LAG
  * feature battery boosted for a 1-step-ahead forecast per series.
  *
  * The query runs models/NowcastGbt.run — deterministic integer-scaled
  * boosted stumps — inside the one-series-per-row reduction, and the
  * oracle replays the ENTIRE fit: the feature build, the quartile
  * candidate grid, and all 20 boosting rounds (per-round best split by
  * (gain DESC, candidate ASC) on exact integer sums) as a recursive CTE
  * over the per-series row-list state. The MLlib GBTRegressor twin
  * (NowcastGbt.forecastMllib) is spec-validated against this path —
  * the q_ml_ar exact-OLS/MLlib split, applied to trees.
  */
object GbtQueries {
  private val S = TSSchema(keys = Seq("event_type"))
  private val H = Tables.hourlySql

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_nowcast_gbt" -> ((s, dir) => {
      val fn = udf { xs: Seq[Double] => NowcastGbt.run(xs.toArray) }
      SeriesOps.collect(Tables.hourlyEvents(s, dir).drop("n"), S)
        .withColumn("_r", fn(col("xs")))
        .where(col("_r").isNotNull)
        .select(col("event_type"), col("_r._1").as("n_train"),
          round(col("_r._2") / lit(1e6), 6).as("yhat_1"),
          round(col("_r._3") / lit(1e6), 6).as("train_rmse"))
    })
  )

  val sql: Map[String, String] = Map(
    "q_nowcast_gbt" -> {
      val nF = 2 * NowcastGbt.Ns.length
      val rocs = NowcastGbt.Ns.map { n =>
        s"CASE WHEN t - ${n - 1} >= 1 AND iv[t - ${n - 1}] <> 0 " +
          s"THEN round((iv[t] - iv[t - ${n - 1}])::DOUBLE / iv[t - ${n - 1}] * 1000000.0)::BIGINT " +
          "ELSE NULL END"
      }
      val lags = NowcastGbt.Ns.map { n =>
        s"CASE WHEN t - $n >= 1 THEN iv[t - $n] ELSE NULL END"
      }
      val xList = (rocs ++ lags).mkString("[", ", ", "]")
      s"""WITH RECURSIVE hourly AS ($H),
         |ser AS (SELECT event_type,
         |          list_transform(list_sort(list_zip(list(epoch(ts)::BIGINT), list(value))),
         |                         z -> round(z[2] * 1e6)::BIGINT) AS iv
         |        FROM hourly GROUP BY 1),
         |rws AS (SELECT event_type,
         |          list_filter(list_transform(range(1, len(iv) + 1), t -> struct_pack(
         |              t := t,
         |              x := $xList,
         |              lbl := CASE WHEN t < len(iv) THEN iv[t + 1] ELSE NULL END)),
         |            rr -> len(list_filter(rr.x, e -> e IS NULL)) = 0) AS rows
         |        FROM ser),
         |ini AS (SELECT event_type, rows,
         |          len(list_filter(rows, r -> r.lbl IS NOT NULL))::BIGINT AS ntr,
         |          (list_sum(list_transform(list_filter(rows, r -> r.lbl IS NOT NULL),
         |                                   r -> r.lbl)))::BIGINT AS slbl
         |        FROM rws
         |        WHERE len(list_filter(rows, r -> r.lbl IS NOT NULL)) >= ${NowcastGbt.MinTrain}
         |          AND len(list_filter(rows, r -> r.lbl IS NULL)) = 1),
         |cand AS (SELECT i.event_type, (f * 3 + k) AS ci, f,
         |           (list_sort(list_transform(list_filter(i.rows, r -> r.lbl IS NOT NULL),
         |              r -> r.x[f + 1])))[(k * i.ntr) // 4] AS th
         |         FROM ini i, range(0, $nF) uf(f), range(1, 4) uk(k)),
         |candl AS (SELECT event_type, list(struct_pack(ci := ci, f := f, th := th) ORDER BY ci) AS cands
         |          FROM cand GROUP BY 1),
         |bst AS (
         |  SELECT i.event_type, 0 AS m,
         |    list_transform(i.rows, r -> struct_pack(t := r.t, x := r.x, lbl := r.lbl,
         |      f := (slbl // ntr)::BIGINT)) AS st,
         |    c.cands, i.ntr
         |  FROM ini i JOIN candl c USING (event_type)
         |  UNION ALL
         |  SELECT b.event_type, b.m + 1,
         |    list_transform(b.st, r -> struct_pack(t := r.t, x := r.x, lbl := r.lbl,
         |      f := r.f + CASE WHEN u.bf IS NULL THEN 0
         |                      WHEN r.x[u.bf + 1] <= u.bth THEN u.dl ELSE u.dr END)),
         |    b.cands, b.ntr
         |  FROM bst b LEFT JOIN LATERAL (
         |    SELECT ca.bf, ca.bth, (ca.gl // ${NowcastGbt.NuDen}) AS dl,
         |           (ca.gr // ${NowcastGbt.NuDen}) AS dr
         |    FROM (
         |      SELECT cx.bf, cx.bth, (cx.sl // cx.nl) AS gl,
         |        ((cx.str - cx.sl) // (b.ntr - cx.nl)) AS gr
         |      FROM (
         |        SELECT ci, f AS bf, th AS bth,
         |          len(list_filter(b.st, r -> r.lbl IS NOT NULL AND r.x[f + 1] <= th))::BIGINT AS nl,
         |          coalesce(list_sum(list_transform(
         |            list_filter(b.st, r -> r.lbl IS NOT NULL AND r.x[f + 1] <= th),
         |            r -> r.lbl - r.f)), 0)::BIGINT AS sl,
         |          (list_sum(list_transform(list_filter(b.st, r -> r.lbl IS NOT NULL),
         |            r -> r.lbl - r.f)))::BIGINT AS str
         |        FROM (SELECT unnest(b.cands, recursive := true))
         |      ) cx WHERE cx.nl > 0 AND cx.nl < b.ntr
         |      ORDER BY (cx.sl::DOUBLE * cx.sl / cx.nl
         |        + (cx.str - cx.sl)::DOUBLE * (cx.str - cx.sl) / (b.ntr - cx.nl)) DESC,
         |        cx.ci ASC
         |      LIMIT 1
         |    ) ca
         |  ) u ON true
         |  WHERE b.m < ${NowcastGbt.Rounds}
         |),
         |fin AS (SELECT event_type, st, ntr FROM bst WHERE m = ${NowcastGbt.Rounds}),
         |outp AS (SELECT event_type, ntr,
         |          (list_filter(st, r -> r.lbl IS NULL))[1].f AS pred,
         |          sqrt(list_sum(list_transform(list_filter(st, r -> r.lbl IS NOT NULL),
         |               r -> (r.lbl - r.f)::DOUBLE * (r.lbl - r.f))) / ntr) AS rmse
         |         FROM fin)
         |SELECT event_type, ntr AS n_train, round(pred / 1e6, 6) AS yhat_1,
         |  round(rmse / 1e6, 6) AS train_rmse
         |FROM outp""".stripMargin
    }
  )
}
