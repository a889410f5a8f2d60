package graft.queries

import graft._
import graft.models.{GaussJordan, NowcastGbt, NowcastPlus}
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
    }),

    // NowcastingPlus (nowcastingplus.py:84): poly-in-minute-of-day
    // seasonal baseline + the standardized MOM/ROC/LAG/MA battery + a
    // deterministic ridge (the LassoCV stand-in) on the deseasonalized
    // diff(−1) label; ŷ = (y_now − season_now) − model(x̃) + season_next.
    // models/NowcastPlus runs the whole fit in the one-series-per-row
    // kernel; the oracle replays it end to end — poly moments → GJ →
    // features from 1e6-scaled BIGINTs → StandardScaler moments → ridge
    // normal equations → GJ → the prediction identity, op for op.
    "q_nowcast_plus" -> ((s, dir) => {
      val fn = udf { (tss: Seq[java.sql.Timestamp], xs: Seq[Double]) =>
        NowcastPlus.run(tss.map(_.getTime / 1000L).toArray, xs.toArray)
      }
      SeriesOps.collect(Tables.hourlyEvents(s, dir).drop("n"), S)
        .withColumn("_r", fn(col("tss"), col("xs")))
        .where(col("_r").isNotNull)
        .select(col("event_type"), col("_r._1").as("n_train"),
          round(col("_r._2"), 6).as("yhat_1"),
          round(col("_r._3"), 6).as("season_next"))
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
    },

    "q_nowcast_plus" -> {
      // feature order MUST mirror models/NowcastPlus.feats: MOM(10..30),
      // ROC(10..30), LAG(1..5), MA(10,20,30)
      val featDefs: Seq[String] =
        NowcastPlus.MomNs.map(nn =>
          s"(v - lag(v, $nn) OVER w)::DOUBLE / 1000000.0") ++
        NowcastPlus.RocNs.map(nn =>
          s"(v - lag(v, ${nn - 1}) OVER w)::DOUBLE / (lag(v, ${nn - 1}) OVER w)::DOUBLE") ++
        NowcastPlus.LagNs.map(nn =>
          s"(lag(v, $nn) OVER w)::DOUBLE / 1000000.0") ++
        NowcastPlus.MaNs.map(nn =>
          s"(sum(v) OVER (w ROWS BETWEEN ${nn - 1} PRECEDING AND CURRENT ROW))::DOUBLE / ${nn * 1000000}.0")
      val nF = NowcastPlus.NF
      val fCols = featDefs.zipWithIndex.map { case (e, i) => s"$e AS f${i + 1}" }
        .mkString(",\n           ")
      val rocOk = NowcastPlus.RocNs
        .map(nn => s"lag(v, ${nn - 1}) OVER w <> 0").mkString(" AND ")
      def seasonOf(uE: String, bE: String): String =
        (0 to 5).map(j => s"$bE[${j + 1}] * pow($uE, $j)").mkString(" + ")
      val pMoms = ((0 to 10).map(k => s"sum(pow(u, $k)) AS s$k") ++
        (0 to 5).map(k => s"sum(pow(u, $k) * y) AS t$k")).mkString(", ")
      val pMat = (for (r <- 0 to 5; c <- 0 to 6) yield
        if (c < 6) s"s${r + c}" else s"t$r").mkString(", ")
      val sMoms = (1 to nF).map(k => s"sum(f$k) AS s$k, sum(f$k * f$k) AS q$k")
        .mkString(", ")
      val means = (1 to nF).map(k => s"s$k / mm2 AS m$k").mkString(", ")
      val sds = (1 to nF).map(k =>
        s"CASE WHEN smom.q$k / scm.mm2 - scm.m$k * scm.m$k > 0 " +
          s"THEN sqrt(smom.q$k / scm.mm2 - scm.m$k * scm.m$k) ELSE 1.0 END AS e$k")
        .mkString(",\n           ")
      val stds = (1 to nF).map(k => s"(vr.f$k - sc.m$k) / sc.e$k AS x$k")
        .mkString(",\n           ")
      val grams = ((for (a <- 1 to nF; b <- 1 to nF) yield
        s"sum(x$a * x$b) AS g_${a}_$b") ++
        (1 to nF).map(a => s"sum(x$a * (lab - lmean)) AS c_$a")).mkString(",\n           ")
      val rMat = (for (a <- 1 to nF; b <- 1 to nF + 1) yield
        if (b == nF + 1) s"c_$a"
        else if (a == b) s"g_${a}_$b + 0.01 * l.ntrain"
        else s"g_${a}_$b").mkString(", ")
      val predSum = (1 to nF).map(a => s"rb.b1[$a] * x.x$a").mkString(" + ")
      s"""WITH RECURSIVE hourly AS ($H),
         |ord AS (SELECT event_type, value AS y,
         |    round(value * 1000000.0)::BIGINT AS v,
         |    (epoch(ts)::BIGINT % 86400) // 60 AS md,
         |    ((epoch(ts)::BIGINT % 86400) // 60 - 719.5) / 719.5 AS u,
         |    row_number() OVER (PARTITION BY event_type ORDER BY ts) AS rn,
         |    count(*) OVER (PARTITION BY event_type) AS n
         |  FROM hourly),
         |pmoms AS (SELECT event_type, $pMoms FROM ord GROUP BY 1),
         |pmats AS (SELECT event_type, [$pMat] AS m FROM pmoms),
         |${GaussJordan.sqlAug(6, 1, "p")},
         |fe AS (SELECT event_type, rn, n, y, u, md,
         |           $fCols,
         |           (rn > 30 AND $rocOk) AS vok
         |       FROM ord WINDOW w AS (PARTITION BY event_type ORDER BY rn)),
         |se AS (SELECT f.*, ${seasonOf("f.u", "pb.b1")} AS season
         |       FROM fe f JOIN pbeta pb USING (event_type) WHERE f.vok),
         |vr AS (SELECT *, y - season AS d,
         |        row_number() OVER (PARTITION BY event_type ORDER BY rn) AS vj,
         |        count(*) OVER (PARTITION BY event_type) AS mm
         |       FROM se),
         |ok AS (SELECT event_type FROM vr GROUP BY 1
         |       HAVING max(rn) = max(n) AND count(*) >= ${NowcastPlus.MinTrain + 1}
         |          AND max(n) >= ${NowcastPlus.MinSeries}),
         |smom AS (SELECT event_type, count(*) AS mm2, $sMoms FROM vr GROUP BY 1),
         |scm AS (SELECT event_type, mm2, $means FROM smom),
         |sc AS (SELECT scm.event_type, scm.mm2,
         |           ${(1 to nF).map(k => s"scm.m$k").mkString(", ")},
         |           $sds
         |       FROM scm JOIN smom USING (event_type)),
         |sx AS (SELECT vr.event_type, vr.vj, vr.mm, vr.d,
         |           $stds,
         |           vr.d - lead(vr.d) OVER (PARTITION BY vr.event_type ORDER BY vr.vj) AS lab
         |       FROM vr JOIN sc USING (event_type)),
         |lmc AS (SELECT event_type, sum(lab) / (max(mm) - 1) AS lmean,
         |           (max(mm) - 1)::BIGINT AS ntrain
         |        FROM sx WHERE vj <= mm - 1 GROUP BY 1),
         |gm AS (SELECT sx.event_type,
         |           $grams
         |       FROM sx JOIN lmc USING (event_type) WHERE sx.vj <= sx.mm - 1 GROUP BY 1),
         |rmats AS (SELECT g.event_type, [$rMat] AS m
         |          FROM gm g JOIN lmc l USING (event_type)),
         |${GaussJordan.sqlAug(nF, 1, "r")},
         |xt AS (SELECT event_type, d AS dn,
         |           ${(1 to nF).map(k => s"x$k").mkString(", ")}
         |       FROM sx WHERE vj = mm),
         |fo AS (SELECT o.event_type, min(o.rn) AS forn
         |       FROM ord o JOIN (SELECT event_type, md AS lmd FROM ord WHERE rn = n) lz
         |         USING (event_type)
         |       WHERE o.md = lz.lmd GROUP BY 1),
         |un AS (SELECT f.event_type, o2.u AS unext
         |       FROM fo f JOIN ord o2 ON o2.event_type = f.event_type AND o2.rn = f.forn + 1)
         |SELECT x.event_type, l.ntrain AS n_train,
         |  round(x.dn - (l.lmean + $predSum) + (${seasonOf("un.unext", "pb.b1")}), 6) AS yhat_1,
         |  round(${seasonOf("un.unext", "pb.b1")}, 6) AS season_next
         |FROM xt x JOIN lmc l USING (event_type) JOIN rbeta rb USING (event_type)
         |  JOIN un USING (event_type) JOIN pbeta pb USING (event_type)
         |  JOIN ok USING (event_type)""".stripMargin
    }
  )
}
