package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{TS, TSSchema, Tables}

/** Count-data regression — the GLM the Gaussian trend fits quietly get
  * wrong on event counts:
  *
  *  - `q_poisson_glm` — per-series Poisson regression (log link) of the
  *    dense hourly counts on (1, t/n, sin 2πt/24, cos 2πt/24), fit by
  *    FOUR unrolled IRLS iterations — each one distributed 6-dp-snapped
  *    weighted-moment pass (the 4×5 normal equations per series) + the
  *    shared keyed GaussJordan solve, exactly the q_quality_logreg
  *    discipline but keyed by series, so all five fits solve in the
  *    same jobs. Emits the fitted coefficients plus the two diagnostics
  *    a count model must ship: the Pearson dispersion φ =
  *    Σ(y−μ)²/μ/(n−p) (φ ≫ 1 ⇒ overdispersed ⇒ a negative-binomial
  *    layer is needed) and the zero-inflation excess (observed zeros −
  *    Σe^(−μ))/n. Diagnostic sums reduce as scaled BIGINTs; the oracle
  *    replays all four IRLS iterations keyed per series.
  */
object GlmQueries {

  private val H = Tables.hourlySql

  /** Linear predictor over (1, tf, s24, c24) — shared verbatim. */
  private val Eta = "b1 + b2 * tf + b3 * s24 + b4 * c24"

  private val Xs = Seq("1.0E0", "tf", "s24", "c24")

  /** The row-major 4×5 weighted normal-equation entries, 6-dp-snapped. */
  private val Moments: Seq[String] =
    for { i <- 0 until 4; j <- 0 to 4 } yield {
      val t = if (j == 4) "z" else Xs(j)
      s"round(sum(w * ${Xs(i)} * $t), 6)"
    }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q_poisson_glm" -> ((s, dir) => {
      val wo = Window.partitionBy("event_type").orderBy("ts")
      val wp = Window.partitionBy("event_type")
      val dense = TS.fillGaps(
        Tables.hourlyEvents(s, dir).drop("value").withColumn("value", col("n").cast("double")).drop("n"),
        TSSchema(keys = Seq("event_type")), 3600L, Some(0.0))
      val feats = graft.Scratch.materialize(
        dense
          .withColumn("rn", row_number().over(wo))
          .withColumn("nn", count(lit(1)).over(wp))
          .select(col("event_type"), col("value").as("y"),
            (col("rn").cast("double") / col("nn").cast("double")).as("tf"),
            expr("sin(2.0E0 * pi() * rn / 24.0E0)").as("s24"),
            expr("cos(2.0E0 * pi() * rn / 24.0E0)").as("c24")),
        "pglm_feats")
      def iterate(beta: DataFrame): DataFrame = {
        val scored = feats.join(broadcast(beta), "event_type")
          .withColumn("eta", expr(Eta))
          .withColumn("mu", expr("greatest(exp(eta), 1e-6)"))
          .withColumn("w", col("mu"))
          .withColumn("z", expr("eta + (y - mu) / mu"))
        val mats = scored.groupBy("event_type")
          .agg(expr(s"array(${Moments.mkString(", ")})").as("_m"))
        graft.models.GaussJordan.eliminate(mats, "_m", 4, 5)
          .select(col("event_type") +:
            (1 to 4).map(k => expr(s"_m[${(k - 1) * 5 + 4}]").as(s"b$k")): _*)
      }
      // intercept at ln(ȳ): from β = 0 the first linearization fits the
      // raw counts on the LOG scale and diverges for large rates
      val beta0 = feats.groupBy("event_type")
        .agg((round(sum("y"), 4) / count(lit(1))).as("mu0"))
        .select(col("event_type"), expr("ln(mu0 + 1e-6)").as("b1"),
          lit(0.0).as("b2"), lit(0.0).as("b3"), lit(0.0).as("b4"))
      val beta = iterate(iterate(iterate(iterate(beta0))))
      feats.join(broadcast(beta), "event_type")
        .withColumn("eta", expr(Eta))
        .withColumn("mu", expr("greatest(exp(eta), 1e-6)"))
        .withColumn("pe6", expr("CAST(round((y - mu) * (y - mu) / mu * 1e4) AS BIGINT)"))
        .withColumn("pz6", expr("CAST(round(exp(-mu) * 1e6) AS BIGINT)"))
        .groupBy("event_type").agg(
          count(lit(1)).as("n"),
          first("b1").as("b1"), first("b2").as("b2"),
          first("b3").as("b3"), first("b4").as("b4"),
          sum("pe6").as("pe6"), sum("pz6").as("pz6"),
          sum(when(col("y") === 0.0, 1L).otherwise(0L)).as("zeros"))
        .withColumn("phi", expr("(pe6 / 1e4) / CAST(n - 4 AS DOUBLE)"))
        .select(col("event_type"), col("n").as("n_obs"),
          round(col("b1"), 6).as("b_intercept"), round(col("b2"), 6).as("b_trend"),
          round(col("b3"), 6).as("b_sin24"), round(col("b4"), 6).as("b_cos24"),
          round(col("phi"), 6).as("dispersion"),
          when(col("phi") > 1.5, 1).otherwise(0).as("overdispersed"),
          round((col("zeros").cast("double") - col("pz6").cast("double") / 1e6) /
            col("n").cast("double"), 6).as("zero_excess"))
    })
  )

  val sql: Map[String, String] = Map(

    "q_poisson_glm" -> {
      def iterBlock(k: Int, prevBeta: String): String =
        s"""p${k}e AS (SELECT f.*, bb.b1[1] + bb.b1[2] * tf + bb.b1[3] * s24 + bb.b1[4] * c24 AS eta
           |  FROM feats f JOIN $prevBeta bb USING (event_type)),
           |p${k}m AS (SELECT *, greatest(exp(eta), 1e-6) AS mu FROM p${k}e),
           |p${k}z AS (SELECT *, mu AS w, eta + (y - mu) / mu AS z FROM p${k}m),
           |p${k}mats AS (SELECT event_type, [${Moments.mkString(", ")}] AS m
           |  FROM p${k}z GROUP BY event_type),
           |${graft.models.GaussJordan.sqlAug(4, 1, s"p$k")}""".stripMargin
      s"""WITH RECURSIVE hourly AS ($H),
         |hb AS (SELECT event_type, min(ts) t0, max(ts) t1 FROM hourly GROUP BY 1),
         |hgrid AS (SELECT event_type, unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS ts FROM hb),
         |dcnt AS (SELECT g.event_type, g.ts, coalesce(h.n, 0)::DOUBLE AS y
         |         FROM hgrid g LEFT JOIN hourly h ON g.event_type = h.event_type AND g.ts = h.ts),
         |feats AS (SELECT event_type, y,
         |    rn::DOUBLE / nn::DOUBLE AS tf,
         |    sin(2.0E0 * pi() * rn / 24.0E0) AS s24,
         |    cos(2.0E0 * pi() * rn / 24.0E0) AS c24
         |  FROM (SELECT event_type, y,
         |          row_number() OVER (PARTITION BY event_type ORDER BY ts) AS rn,
         |          count(*) OVER (PARTITION BY event_type) AS nn
         |        FROM dcnt)),
         |b0 AS (SELECT event_type,
         |         [ln(round(sum(y), 4) / count(*) + 1e-6), 0.0E0, 0.0E0, 0.0E0] AS b1
         |       FROM feats GROUP BY 1),
         |${iterBlock(1, "b0")},
         |${iterBlock(2, "p1beta")},
         |${iterBlock(3, "p2beta")},
         |${iterBlock(4, "p3beta")},
         |fin AS (SELECT f.event_type, f.y,
         |    bb.b1[1] + bb.b1[2] * f.tf + bb.b1[3] * f.s24 + bb.b1[4] * f.c24 AS eta,
         |    bb.b1[1] AS c1, bb.b1[2] AS c2, bb.b1[3] AS c3, bb.b1[4] AS c4
         |  FROM feats f JOIN p4beta bb USING (event_type)),
         |fm AS (SELECT *, greatest(exp(eta), 1e-6) AS mu FROM fin),
         |agg AS (SELECT event_type, count(*)::BIGINT AS n,
         |    max(c1) AS b1, max(c2) AS b2, max(c3) AS b3, max(c4) AS b4,
         |    sum(round((y - mu) * (y - mu) / mu * 1e4)::BIGINT)::BIGINT AS pe6,
         |    sum(round(exp(-mu) * 1e6)::BIGINT)::BIGINT AS pz6,
         |    sum(CASE WHEN y = 0.0 THEN 1 ELSE 0 END)::BIGINT AS zeros
         |  FROM fm GROUP BY 1),
         |st AS (SELECT *, (pe6 / 1e4) / CAST(n - 4 AS DOUBLE) AS phi FROM agg)
         |SELECT event_type, n AS n_obs,
         |  round(b1, 6) AS b_intercept, round(b2, 6) AS b_trend,
         |  round(b3, 6) AS b_sin24, round(b4, 6) AS b_cos24,
         |  round(phi, 6) AS dispersion,
         |  CASE WHEN phi > 1.5E0 THEN 1 ELSE 0 END AS overdispersed,
         |  round((zeros::DOUBLE - pz6::DOUBLE / 1e6) / n::DOUBLE, 6) AS zero_excess
         |FROM st""".stripMargin
    }
  )
}
