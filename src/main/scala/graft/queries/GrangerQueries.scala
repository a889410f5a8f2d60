package graft.queries

import graft._
import graft.models.GaussJordan
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pairwise Granger causality over the event-type series — the
  * multivariate companion the reference's VAR models stop short of
  * (kats/models/var.py fits the joint dynamics but never tests
  * lag-predictiveness between series).
  *
  * For every ordered pair (cause → effect), with p = 2 lags on the shared
  * dense hourly grid: restricted OLS y_t ~ [1, y_{t-1}, y_{t-2}] vs
  * unrestricted + [x_{t-1}, x_{t-2}], F = ((RSS_r − RSS_u)/p) /
  * (RSS_u/(n − 2p − 1)). The plan is the q_var/q_bayes_var moment shape:
  * per-series lag windows (ONE series shuffle), a ts-equality join that
  * fans each timestamp out to the #series² pairs, one 21-moment aggregate
  * per pair, then two unrolled Gauss-Jordan solves (5×6 and 3×4) as
  * chained codegen'd `transform` Projects. Scale axis = #pairs; nothing
  * collects. Moments snap to a 4-dp grid so cross-engine summation-order
  * noise cannot leak into the algebra (the BayesVarSql discipline); both
  * engines then run an identical float-op sequence.
  */
object GrangerQueries {
  private val S = TSSchema(keys = Seq("event_type"))

  /** F-statistic threshold for the causal flag: the 5% critical value of
    * F(2, ∞) ≈ 3.0 — fixed, so the flag is deterministic. */
  private val FCrit = 3.0

  /** 1e-8 diagonal ridge, same convention as the repo's other OLS fits. */
  private val Ridge = "1e-8"

  private object Frag {
    // row-major 5×6 unrestricted augmented system over z=[1,y1,y2,x1,x2]
    val uEntries: Seq[String] = Seq(
      s"s0 + $Ridge", "sy1", "sy2", "sx1", "sx2", "sy",
      "sy1", s"sy1y1 + $Ridge", "sy1y2", "sy1x1", "sy1x2", "syy1",
      "sy2", "sy1y2", s"sy2y2 + $Ridge", "sy2x1", "sy2x2", "syy2",
      "sx1", "sy1x1", "sy2x1", s"sx1x1 + $Ridge", "sx1x2", "syx1",
      "sx2", "sy1x2", "sy2x2", "sx1x2", s"sx2x2 + $Ridge", "syx2")
    // 3×4 restricted system over z=[1,y1,y2]
    val rEntries: Seq[String] = Seq(
      s"s0 + $Ridge", "sy1", "sy2", "sy",
      "sy1", s"sy1y1 + $Ridge", "sy1y2", "syy1",
      "sy2", "sy1y2", s"sy2y2 + $Ridge", "syy2")
    val rssU = "(syy - (bu1*sy + bu2*syy1 + bu3*syy2 + bu4*syx1 + bu5*syx2))"
    val rssR = "(syy - (br1*sy + br2*syy1 + br3*syy2))"
    val fStat = s"CASE WHEN $rssU > 0 THEN (($rssR - $rssU) / 2.0) / ($rssU / (s0 - 5)) ELSE NULL END"
    val moments: Seq[(String, String)] = Seq(
      "s0" -> "count(*)",
      "sy" -> "round(sum(y), 4)", "syy" -> "round(sum(y*y), 4)",
      "sy1" -> "round(sum(y1), 4)", "sy2" -> "round(sum(y2), 4)",
      "sx1" -> "round(sum(x1), 4)", "sx2" -> "round(sum(x2), 4)",
      "sy1y1" -> "round(sum(y1*y1), 4)", "sy1y2" -> "round(sum(y1*y2), 4)",
      "sy1x1" -> "round(sum(y1*x1), 4)", "sy1x2" -> "round(sum(y1*x2), 4)",
      "sy2y2" -> "round(sum(y2*y2), 4)", "sy2x1" -> "round(sum(y2*x1), 4)",
      "sy2x2" -> "round(sum(y2*x2), 4)", "sx1x1" -> "round(sum(x1*x1), 4)",
      "sx1x2" -> "round(sum(x1*x2), 4)", "sx2x2" -> "round(sum(x2*x2), 4)",
      "syy1" -> "round(sum(y*y1), 4)", "syy2" -> "round(sum(y*y2), 4)",
      "syx1" -> "round(sum(y*x1), 4)", "syx2" -> "round(sum(y*x2), 4)")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_granger" -> ((s, dir) => {
      val w = Window.partitionBy("event_type").orderBy("ts")
      val lagged = TS.fillGaps(Tables.hourlyEventsCapped(s, dir).drop("n"), S, 3600L, Some(0.0))
        .withColumn("l1", lag("value", 1).over(w))
        .withColumn("l2", lag("value", 2).over(w))
        .where(col("l2").isNotNull)
      val ys = lagged.select(col("event_type").as("effect"), col("ts"),
        col("value").as("y"), col("l1").as("y1"), col("l2").as("y2"))
      val xs = lagged.select(col("event_type").as("cause"), col("ts"),
        col("l1").as("x1"), col("l2").as("x2"))
      val rows = ys.join(xs, "ts").where(col("cause") =!= col("effect"))
      val mom = rows.groupBy("cause", "effect")
        .agg(expr(Frag.moments.head._2).as(Frag.moments.head._1),
          Frag.moments.tail.map { case (n, e) => expr(e).as(n) }: _*)
        .where(col("s0") > 10)
      val solvedU = GaussJordan.eliminate(
        mom.withColumn("_u", expr(Frag.uEntries.mkString("array(", ", ", ")"))), "_u", 5, 6)
      val withBu = (1 to 5).foldLeft(solvedU) { (d, r) =>
        d.withColumn(s"bu$r", expr(s"_u[${(r - 1) * 6 + 5}]"))
      }
      val solvedR = GaussJordan.eliminate(
        withBu.withColumn("_r", expr(Frag.rEntries.mkString("array(", ", ", ")"))), "_r", 3, 4)
      val withBr = (1 to 3).foldLeft(solvedR) { (d, r) =>
        d.withColumn(s"br$r", expr(s"_r[${(r - 1) * 4 + 3}]"))
      }
      withBr
        .withColumn("rss_u", expr(Frag.rssU))
        .withColumn("rss_r", expr(Frag.rssR))
        .withColumn("f_stat", round(expr(Frag.fStat), 6))
        .select(col("cause"), col("effect"), col("s0").as("n_obs"),
          round(col("rss_r"), 6).as("rss_r"), round(col("rss_u"), 6).as("rss_u"),
          col("f_stat"),
          when(col("f_stat") > FCrit, 1).otherwise(0).as("causal"))
    })
  )

  private val H = Tables.hourlySql
  private val Hc = Tables.hourlyCappedSql // pair-query series budget
  private val DenseSql = Tables.denseHourlySql

  val sql: Map[String, String] = Map(
    "q_granger" -> {
      val momSql = Frag.moments.map { case (n, e) =>
        (if (n == "s0") s"count(*)::BIGINT" else e) + s" AS $n"
      }.mkString(",\n         ")
      s"""WITH RECURSIVE hourly AS ($Hc),
         |$DenseSql,
         |lagged AS (SELECT event_type, ts, value,
         |             lag(value, 1) OVER (PARTITION BY event_type ORDER BY ts) AS l1,
         |             lag(value, 2) OVER (PARTITION BY event_type ORDER BY ts) AS l2
         |           FROM dense),
         |pr AS (SELECT x.event_type AS cause, y.event_type AS effect,
         |         y.value AS y, y.l1 AS y1, y.l2 AS y2, x.l1 AS x1, x.l2 AS x2
         |       FROM lagged y JOIN lagged x
         |         ON y.ts = x.ts AND x.event_type <> y.event_type
         |       WHERE y.l2 IS NOT NULL AND x.l2 IS NOT NULL),
         |mom AS (SELECT cause, effect,
         |$momSql
         |        FROM pr GROUP BY 1, 2 HAVING count(*) > 10),
         |umats AS (SELECT cause || '|' || effect AS event_type,
         |            [${Frag.uEntries.mkString(", ")}] AS m FROM mom),
         |${GaussJordan.sqlAug(5, 1, "u")},
         |rmats AS (SELECT cause || '|' || effect AS event_type,
         |            [${Frag.rEntries.mkString(", ")}] AS m FROM mom),
         |${GaussJordan.sqlAug(3, 1, "r")},
         |fin AS (SELECT mom.*,
         |          ub.b1[1] AS bu1, ub.b1[2] AS bu2, ub.b1[3] AS bu3,
         |          ub.b1[4] AS bu4, ub.b1[5] AS bu5,
         |          rb.b1[1] AS br1, rb.b1[2] AS br2, rb.b1[3] AS br3
         |        FROM mom
         |        JOIN ubeta ub ON ub.event_type = mom.cause || '|' || mom.effect
         |        JOIN rbeta rb ON rb.event_type = mom.cause || '|' || mom.effect)
         |SELECT cause, effect, s0 AS n_obs,
         |  round(${Frag.rssR}, 6) AS rss_r,
         |  round(${Frag.rssU}, 6) AS rss_u,
         |  round(${Frag.fStat}, 6) AS f_stat,
         |  CASE WHEN round(${Frag.fStat}, 6) > $FCrit THEN 1 ELSE 0 END AS causal
         |FROM fin""".stripMargin
    }
  )
}
