package graft.queries

import graft._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mixture modeling + sequential experimentation:
  *
  *  - `q_gmm_em` — two-component 1-D Gaussian mixture per series via EM
  *    (20 fixed iterations; the soft-assignment complement of the hard
  *    Viterbi regimes in q_hmm_regimes). Deterministic quartile init
  *    (μ = exact order statistics, σ = 4-dp-snapped global moment,
  *    π = 0.5); each E/M step is a sequential pass over the ts-ordered
  *    series, replayed by the oracle as a recursive CTE whose state is
  *    five scalars + the series list — responsibilities never leave the
  *    step. The normal kernel drops the shared 1/√2π (cancels in the
  *    responsibility ratio, and the emitted log-likelihood re-adds it).
  *  - `q_ab_sequential` — always-valid sequential A/B testing (the mSPRT
  *    of Robbins 1970 / Johari et al. 2017): per hour, cumulative
  *    per-arm purchase counts (md5-parity arms shared with q_ab_test —
  *    exact integers), the normal-approximation mixture likelihood
  *    ratio with prior τ² = SE², always-valid p = running min of 1/Λ,
  *    and the first hour the experiment could have stopped. One scan +
  *    cumulative windows; every input to the closed-form Λ is an
  *    integer count until the final scalar math.
  */
object MixtureQueries {
  private val S = TSSchema(keys = Seq("event_type"))
  private val H = Tables.hourlySql

  private val EmIters = 20

  /** mSPRT mixture-prior scale on the proportion-difference axis. */
  private val MsprtTau = 0.05

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q_gmm_em" -> ((s, dir) =>
      SeriesOps.aggSeries(Tables.hourlyEvents(s, dir).drop("n"), S,
        Seq("mu1", "mu2", "sigma1", "sigma2", "pi1", "loglik")) { xs =>
        val n = xs.length
        val sorted = xs.sorted
        var mu1 = sorted(n / 4)
        var mu2 = sorted(3 * n / 4)
        var s1 = 0.0; var s2 = 0.0
        var p = 0
        while (p < n) { s1 += xs(p); p += 1 }
        p = 0
        while (p < n) { s2 += xs(p) * xs(p); p += 1 }
        s1 = math.signum(s1) * math.floor(math.abs(s1) * 1e4 + 0.5) / 1e4
        s2 = math.signum(s2) * math.floor(math.abs(s2) * 1e4 + 0.5) / 1e4
        val sd0 = math.sqrt((s2 - s1 * s1 / n) / (n - 1))
        var sg1 = sd0; var sg2 = sd0; var pi1 = 0.5
        var ll = 0.0
        var it = 0
        while (it < EmIters) {
          var rs = 0.0; var rx1 = 0.0; var rq1 = 0.0; var rx2 = 0.0; var rq2 = 0.0
          ll = 0.0
          var i = 0
          while (i < n) {
            val z1 = (xs(i) - mu1) / sg1
            val z2 = (xs(i) - mu2) / sg2
            val f1 = math.exp(-0.5 * z1 * z1) / sg1
            val f2 = math.exp(-0.5 * z2 * z2) / sg2
            val w1 = pi1 * f1
            val w2 = (1.0 - pi1) * f2
            val r = w1 / (w1 + w2)
            rs += r
            rx1 += r * xs(i); rq1 += r * (xs(i) * xs(i))
            rx2 += (1.0 - r) * xs(i); rq2 += (1.0 - r) * (xs(i) * xs(i))
            ll += math.log(w1 + w2)
            i += 1
          }
          mu1 = rx1 / rs; mu2 = rx2 / (n - rs)
          sg1 = math.sqrt(math.max(rq1 / rs - mu1 * mu1, 1e-6))
          sg2 = math.sqrt(math.max(rq2 / (n - rs) - mu2 * mu2, 1e-6))
          pi1 = rs / n
          it += 1
        }
        Array(mu1, mu2, sg1, sg2, pi1, ll - n * 0.9189385332046727) // − n·ln√(2π)
      }),

    "q_ab_sequential" -> ((s, dir) => {
      val tau2 = MsprtTau * MsprtTau
      val ev = Tables.events(s, dir)
        .withColumn("arm",
          conv(substring(md5(concat(col("user_id").cast("string"), lit(":ab1"))), 1, 1), 16, 10)
            .cast("int") % 2)
        .withColumn("h", date_trunc("hour", col("ts")))
      val hourly = ev.groupBy("h").agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("e1"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("e2"),
        sum(when(col("arm") === 0 && col("event_type") === "purchase", 1L).otherwise(0L)).as("b1"),
        sum(when(col("arm") === 1 && col("event_type") === "purchase", 1L).otherwise(0L)).as("b2"))
      val one = substring(col("h").cast("string"), 1, 0)
      val w = Window.partitionBy(one).orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = hourly
        .withColumn("n1", sum("e1").over(w)).withColumn("n2", sum("e2").over(w))
        .withColumn("c1", sum("b1").over(w)).withColumn("c2", sum("b2").over(w))
      val scored = cum
        .withColumn("delta", col("c1") / col("n1") - col("c2") / col("n2"))
        .withColumn("pp", (col("c1") + col("c2")) / (col("n1") + col("n2")))
        .withColumn("vn",
          (col("pp") * (lit(1.0) - col("pp"))) * (lit(1.0) / col("n1") + lit(1.0) / col("n2")))
        .withColumn("lr",
          when(col("n1") === 0 || col("n2") === 0 || col("vn") <= 0, lit(1.0))
            .otherwise(sqrt(col("vn") / (col("vn") + tau2)) *
              exp((col("delta") * col("delta")) * tau2 /
                (lit(2.0) * col("vn") * (col("vn") + tau2)))))
        .withColumn("p_n", least(lit(1.0), lit(1.0) / col("lr")))
        .withColumn("p_av", min("p_n").over(w))
      scored.select(unix_timestamp(col("h")).as("ts"),
        col("n1"), col("n2"), col("c1"), col("c2"),
        round(col("delta"), 6).as("delta"), round(col("lr"), 6).as("lr"),
        round(col("p_av"), 6).as("p_always_valid"),
        when(col("p_av") < 0.05, 1).otherwise(0).as("can_stop"))
    })
  )

  val sql: Map[String, String] = Map(

    "q_gmm_em" -> {
      // one E/M pass over the series list, expressed on (mu1, mu2, sg1,
      // sg2, pi1) scalar state; the r-weighted sums are evaluated with
      // list_sum over the ts-ordered list — the same sequential order as
      // the kernel loop
      def r(x: String) =
        s"""((e.pi1 * (exp(-0.5 * (($x - e.mu1) / e.sg1) * (($x - e.mu1) / e.sg1)) / e.sg1))
           | / ((e.pi1 * (exp(-0.5 * (($x - e.mu1) / e.sg1) * (($x - e.mu1) / e.sg1)) / e.sg1))
           |    + ((1.0E0 - e.pi1) * (exp(-0.5 * (($x - e.mu2) / e.sg2) * (($x - e.mu2) / e.sg2)) / e.sg2))))""".stripMargin.replaceAll("\n", " ")
      def w12(x: String) =
        s"""((e.pi1 * (exp(-0.5 * (($x - e.mu1) / e.sg1) * (($x - e.mu1) / e.sg1)) / e.sg1))
           | + ((1.0E0 - e.pi1) * (exp(-0.5 * (($x - e.mu2) / e.sg2) * (($x - e.mu2) / e.sg2)) / e.sg2)))""".stripMargin.replaceAll("\n", " ")
      s"""WITH RECURSIVE hourly AS ($H),
         |ser AS (SELECT event_type, list(value ORDER BY ts) AS xs,
         |          count(*)::BIGINT AS n,
         |          round(sum(value), 4) AS s1, round(sum(value * value), 4) AS s2
         |        FROM hourly GROUP BY 1),
         |init AS (SELECT event_type, xs, n,
         |           (list_sort(xs))[n // 4 + 1] AS mu1,
         |           (list_sort(xs))[3 * n // 4 + 1] AS mu2,
         |           sqrt((s2 - s1 * s1 / n) / (n - 1)) AS sd0
         |         FROM ser),
         |em AS (
         |  SELECT event_type, 0 AS it, xs, n, mu1, mu2,
         |         sd0 AS sg1, sd0 AS sg2, 0.5E0 AS pi1, 0.0::DOUBLE AS ll
         |  FROM init
         |  UNION ALL
         |  SELECT e.event_type, e.it + 1, e.xs, e.n,
         |    m.rx1 / m.rs,
         |    m.rx2 / (e.n - m.rs),
         |    sqrt(greatest(m.rq1 / m.rs - (m.rx1 / m.rs) * (m.rx1 / m.rs), 1e-6)),
         |    sqrt(greatest(m.rq2 / (e.n - m.rs) - (m.rx2 / (e.n - m.rs)) * (m.rx2 / (e.n - m.rs)), 1e-6)),
         |    m.rs / e.n,
         |    m.ll
         |  FROM em e, LATERAL (
         |    SELECT list_sum(list_transform(e.xs, x -> ${r("x")})) AS rs,
         |           list_sum(list_transform(e.xs, x -> ${r("x")} * x)) AS rx1,
         |           list_sum(list_transform(e.xs, x -> ${r("x")} * (x * x))) AS rq1,
         |           list_sum(list_transform(e.xs, x -> (1.0E0 - ${r("x")}) * x)) AS rx2,
         |           list_sum(list_transform(e.xs, x -> (1.0E0 - ${r("x")}) * (x * x))) AS rq2,
         |           list_sum(list_transform(e.xs, x -> ln(${w12("x")}))) AS ll
         |  ) m
         |  WHERE e.it < $EmIters)
         |SELECT event_type, round(mu1, 6) AS mu1, round(mu2, 6) AS mu2,
         |  round(sg1, 6) AS sigma1, round(sg2, 6) AS sigma2, round(pi1, 6) AS pi1,
         |  round(ll - n * 0.9189385332046727, 6) AS loglik
         |FROM em WHERE it = $EmIters""".stripMargin
    },

    "q_ab_sequential" -> {
      val tau2 = MsprtTau * MsprtTau
      s"""WITH ev AS (
         |  SELECT date_trunc('hour', ts) AS h, event_type,
         |    ('0x' || substr(md5(user_id::VARCHAR || ':ab1'), 1, 1))::BIGINT % 2 AS arm
         |  FROM events),
         |hourly AS (SELECT h,
         |  sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS e1,
         |  sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT AS e2,
         |  sum(CASE WHEN arm = 0 AND event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS b1,
         |  sum(CASE WHEN arm = 1 AND event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS b2
         |  FROM ev GROUP BY 1),
         |cum AS (SELECT h,
         |  sum(e1) OVER wc::BIGINT AS n1, sum(e2) OVER wc::BIGINT AS n2,
         |  sum(b1) OVER wc::BIGINT AS c1, sum(b2) OVER wc::BIGINT AS c2
         |  FROM hourly
         |  WINDOW wc AS (ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |sc AS (SELECT h, n1, n2, c1, c2,
         |  c1 / n1 - c2 / n2 AS delta,
         |  (c1 + c2) / (n1 + n2) AS pp
         |  FROM cum),
         |vv AS (SELECT *, (pp * (1.0E0 - pp)) * (1.0E0 / n1 + 1.0E0 / n2) AS vn FROM sc),
         |lrt AS (SELECT *,
         |  CASE WHEN n1 = 0 OR n2 = 0 OR vn <= 0 THEN 1.0E0
         |       ELSE sqrt(vn / (vn + ${tau2}E0)) *
         |            exp((delta * delta) * ${tau2}E0 / (2.0E0 * vn * (vn + ${tau2}E0))) END AS lr
         |  FROM vv),
         |pn AS (SELECT *, least(1.0E0, 1.0E0 / lr) AS p_n FROM lrt),
         |pa AS (SELECT *, min(p_n) OVER (ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p_av
         |       FROM pn)
         |SELECT epoch(h)::BIGINT AS ts, n1, n2, c1, c2,
         |  round(delta, 6) AS delta, round(lr, 6) AS lr,
         |  round(p_av, 6) AS p_always_valid,
         |  CASE WHEN p_av < 0.05 THEN 1 ELSE 0 END AS can_stop
         |FROM pa""".stripMargin
    }
  )
}
