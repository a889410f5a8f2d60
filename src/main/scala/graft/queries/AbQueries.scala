package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Experimentation-hygiene pack — the production A/B machinery around
  * q_ab_test / q_ab_sequential / q_interval_ab:
  *
  *  - `q_cuped` — CUPED variance reduction (Deng, Xu, Kohavi & Walker
  *    2013): the experiment-period metric is adjusted by the
  *    pre-period covariate, ŷ = y − θ(x − x̄) with θ = cov(x,y)/var(x)
  *    pooled, shrinking variance by the squared pre/post correlation.
  *    One user-keyed aggregation + a 1-row pooled-moment broadcast —
  *    the scale axis is users, driver state is O(1).
  *  - `q_srm` — sample-ratio-mismatch check: χ²(1) goodness-of-fit of
  *    the observed arm split against 50/50, flagged at the standard
  *    p < 0.001 guardrail. The first thing a real experimentation
  *    platform checks before reading any metric.
  *  - `q_ab_winsorized` — heavy-tail-robust A/B: the user metric is
  *    winsorized at the pooled p99 computed by VALUE-DOMAIN counting
  *    over integer-dollar bins (the q_leadtime discipline — the
  *    cumulative-count frame is bounded by the value RANGE, not the
  *    user count, so it survives 100 TB), then the z-test reruns on
  *    the capped metric next to the raw one.
  *
  * Treatment assignment is the repo's deterministic hash-as-randomness
  * convention (md5 first hex digit mod 2, per-query salt), identical in
  * both engines.
  */
object AbQueries {

  /** Per-user experiment metric + deterministic arm, as shared SQL (the
    * q_ab_test convention with a per-query salt). */
  private def userSql(salt: String): String =
    s"""SELECT user_id,
       |  round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END), 6) AS metric,
       |  ('0x' || substr(md5(user_id::VARCHAR || ':$salt'), 1, 1))::BIGINT % 2 AS arm
       |FROM events GROUP BY user_id""".stripMargin

  private def userDf(s: SparkSession, dir: String, salt: String): DataFrame =
    Tables.events(s, dir).groupBy("user_id")
      .agg(round(sum(when(col("event_type") === "purchase", col("value")).otherwise(0.0)), 6).as("metric"))
      .withColumn("arm",
        conv(substring(md5(concat(col("user_id").cast("string"), lit(s":$salt"))), 1, 1), 16, 10)
          .cast("int") % 2)

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q_cuped" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      // pre-period = first half of the stream's time range (midpoint cut,
      // microsecond integer math — no float epoch on either side)
      val cut = ev.agg(timestamp_micros(
        expr("(unix_micros(min(ts)) + unix_micros(max(ts))) DIV 2")).as("cut"))
      val u = ev.crossJoin(broadcast(cut)).groupBy("user_id")
        .agg(
          round(sum(when(col("event_type") === "purchase" && col("ts") < col("cut"),
            col("value")).otherwise(0.0)), 6).as("x"),
          round(sum(when(col("event_type") === "purchase" && col("ts") >= col("cut"),
            col("value")).otherwise(0.0)), 6).as("y"))
        .withColumn("arm",
          conv(substring(md5(concat(col("user_id").cast("string"), lit(":cuped"))), 1, 1), 16, 10)
            .cast("int") % 2)
      // pooled θ = cov(x,y)/var(x) and x̄, snapped before the adjustment
      val pool = u.agg(
        round(avg("x"), 6).as("xbar"),
        round(covar_samp(col("x"), col("y")) / var_samp(col("x")), 6).as("theta"))
      val adj = u.crossJoin(broadcast(pool))
        .withColumn("yc", col("y") - col("theta") * (col("x") - col("xbar")))
      val arms = adj.groupBy("arm").agg(
        count(lit(1)).as("n"),
        avg("y").as("my"), var_samp("y").as("vy"),
        avg("yc").as("myc"), var_samp("yc").as("vyc"),
        first("theta").as("theta"))
      val a = arms.where(col("arm") === 0)
        .select(col("n").as("n_a"), col("my").as("my_a"), col("vy").as("vy_a"),
          col("myc").as("myc_a"), col("vyc").as("vyc_a"), col("theta"))
      val b = arms.where(col("arm") === 1)
        .select(col("n").as("n_b"), col("my").as("my_b"), col("vy").as("vy_b"),
          col("myc").as("myc_b"), col("vyc").as("vyc_b"))
      a.crossJoin(b)
        .withColumn("z_raw",
          (col("my_a") - col("my_b")) / sqrt(col("vy_a") / col("n_a") + col("vy_b") / col("n_b")))
        .withColumn("z_cuped",
          (col("myc_a") - col("myc_b")) / sqrt(col("vyc_a") / col("n_a") + col("vyc_b") / col("n_b")))
        .withColumn("var_reduction",
          lit(1.0) - (col("vyc_a") + col("vyc_b")) / (col("vy_a") + col("vy_b")))
        .select(col("n_a"), col("n_b"), col("theta"),
          round(col("z_raw"), 6).as("z_raw"), round(col("z_cuped"), 6).as("z_cuped"),
          round(col("var_reduction"), 6).as("var_reduction"))
    }),

    // Panel difference-in-differences on the CUPED pre/post split:
    // per-user change d = post − pre, DiD = mean(d | treat) −
    // mean(d | control) with the Welch z — the causal-inference staple
    // when assignment isn't randomized per-metric. Same microsecond
    // midpoint cut and md5-parity arms as q_cuped (salt ':did').
    "q_did" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val cut = ev.agg(timestamp_micros(
        expr("(unix_micros(min(ts)) + unix_micros(max(ts))) DIV 2")).as("cut"))
      val u = ev.crossJoin(broadcast(cut)).groupBy("user_id")
        .agg(
          round(sum(when(col("event_type") === "purchase" && col("ts") < col("cut"),
            col("value")).otherwise(0.0)), 6).as("x"),
          round(sum(when(col("event_type") === "purchase" && col("ts") >= col("cut"),
            col("value")).otherwise(0.0)), 6).as("y"))
        .withColumn("arm",
          conv(substring(md5(concat(col("user_id").cast("string"), lit(":did"))), 1, 1), 16, 10)
            .cast("int") % 2)
        .withColumn("d", col("y") - col("x"))
      val arms = u.groupBy("arm").agg(
        count(lit(1)).as("n"),
        (round(sum("d"), 4) / count(lit(1))).as("md"), var_samp("d").as("vd"),
        (round(sum("x"), 4) / count(lit(1))).as("mx"),
        (round(sum("y"), 4) / count(lit(1))).as("my"))
      val t = arms.where(col("arm") === 1)
        .select(col("n").as("n_t"), col("md").as("md_t"), col("vd").as("vd_t"),
          col("mx").as("pre_t"), col("my").as("post_t"))
      val c = arms.where(col("arm") === 0)
        .select(col("n").as("n_c"), col("md").as("md_c"), col("vd").as("vd_c"),
          col("mx").as("pre_c"), col("my").as("post_c"))
      t.crossJoin(c)
        .withColumn("did", col("md_t") - col("md_c"))
        .withColumn("z", col("did") / sqrt(col("vd_t") / col("n_t") + col("vd_c") / col("n_c")))
        .select(col("n_t"), col("n_c"),
          round(col("pre_t"), 6).as("pre_treat"), round(col("post_t"), 6).as("post_treat"),
          round(col("pre_c"), 6).as("pre_control"), round(col("post_c"), 6).as("post_control"),
          round(col("did"), 6).as("did"), round(col("z"), 6).as("z"),
          (abs(col("z")) >= 1.96).cast("int").as("significant"))
    }),

    "q_srm" -> ((s, dir) => {
      val chi = udf { x: Double => graft.detectors.ChiSq.sf(x, 1) }
      userDf(s, dir, "ab1").groupBy("arm").agg(count(lit(1)).as("n"))
        .agg(
          sum(when(col("arm") === 0, col("n")).otherwise(0L)).as("n_a"),
          sum(when(col("arm") === 1, col("n")).otherwise(0L)).as("n_b"))
        .withColumn("e", (col("n_a") + col("n_b")).cast("double") / 2.0)
        .withColumn("chi2",
          (col("n_a") - col("e")) * (col("n_a") - col("e")) / col("e") +
            (col("n_b") - col("e")) * (col("n_b") - col("e")) / col("e"))
        .withColumn("p", chi(col("chi2")))
        .select(col("n_a"), col("n_b"), round(col("chi2"), 6).as("chi2"),
          round(col("p"), 6).as("p_value"),
          when(col("p") < 0.001, 1).otherwise(0).as("srm_detected"))
    }),

    "q_ab_winsorized" -> ((s, dir) => {
      val u = userDf(s, dir, "ab1")
      // pooled p99 over integer-dollar bins: the cum-count frame is
      // bounded by the metric RANGE, never the user count
      val bins = u.withColumn("d", ceil(col("metric")).cast("long"))
        .groupBy("d").agg(count(lit(1)).as("c"))
      val one = substring(col("d").cast("string"), 1, 0)
      val wCum = Window.partitionBy(one).orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
      val wAll = Window.partitionBy(one)
      val cap = bins
        .withColumn("cum", sum("c").over(wCum))
        .withColumn("n", sum("c").over(wAll))
        .where(col("cum") * 100 >= col("n") * 99)
        .agg(min("d").as("cap"))
      val w = u.crossJoin(broadcast(cap))
        .withColumn("mw", least(col("metric"), col("cap").cast("double")))
      val arms = w.groupBy("arm").agg(
        count(lit(1)).as("n"),
        avg("metric").as("m"), var_samp("metric").as("v"),
        avg("mw").as("mw"), var_samp("mw").as("vw"),
        first("cap").as("cap"))
      val a = arms.where(col("arm") === 0)
        .select(col("n").as("n_a"), col("m").as("m_a"), col("v").as("v_a"),
          col("mw").as("mw_a"), col("vw").as("vw_a"), col("cap"))
      val b = arms.where(col("arm") === 1)
        .select(col("n").as("n_b"), col("m").as("m_b"), col("v").as("v_b"),
          col("mw").as("mw_b"), col("vw").as("vw_b"))
      a.crossJoin(b)
        .withColumn("z_raw",
          (col("m_a") - col("m_b")) / sqrt(col("v_a") / col("n_a") + col("v_b") / col("n_b")))
        .withColumn("z_wins",
          (col("mw_a") - col("mw_b")) / sqrt(col("vw_a") / col("n_a") + col("vw_b") / col("n_b")))
        .select(col("n_a"), col("n_b"), col("cap"),
          round(col("mw_a"), 6).as("mean_wins_a"), round(col("mw_b"), 6).as("mean_wins_b"),
          round(col("z_raw"), 6).as("z_raw"), round(col("z_wins"), 6).as("z_wins"))
    })
  )

  val sql: Map[String, String] = Map(

    "q_cuped" ->
      """WITH c AS (SELECT make_timestamp((epoch_us(min(ts)) + epoch_us(max(ts))) // 2) AS cut
        |           FROM events),
        |u AS (SELECT user_id,
        |    round(sum(CASE WHEN event_type = 'purchase' AND ts < c.cut THEN value ELSE 0.0 END), 6) AS x,
        |    round(sum(CASE WHEN event_type = 'purchase' AND ts >= c.cut THEN value ELSE 0.0 END), 6) AS y,
        |    ('0x' || substr(md5(user_id::VARCHAR || ':cuped'), 1, 1))::BIGINT % 2 AS arm
        |  FROM events, c GROUP BY user_id, c.cut),
        |pool AS (SELECT round(avg(x), 6) AS xbar,
        |    round(covar_samp(x, y) / var_samp(x), 6) AS theta FROM u),
        |adj AS (SELECT u.arm, u.y, u.y - p.theta * (u.x - p.xbar) AS yc, p.theta
        |        FROM u, pool p),
        |arms AS (SELECT arm, count(*)::BIGINT AS n,
        |    avg(y) AS my, var_samp(y) AS vy,
        |    avg(yc) AS myc, var_samp(yc) AS vyc, any_value(theta) AS theta
        |  FROM adj GROUP BY 1)
        |SELECT a.n AS n_a, b.n AS n_b, a.theta,
        |  round((a.my - b.my) / sqrt(a.vy / a.n + b.vy / b.n), 6) AS z_raw,
        |  round((a.myc - b.myc) / sqrt(a.vyc / a.n + b.vyc / b.n), 6) AS z_cuped,
        |  round(1.0 - (a.vyc + b.vyc) / (a.vy + b.vy), 6) AS var_reduction
        |FROM (SELECT * FROM arms WHERE arm = 0) a,
        |     (SELECT * FROM arms WHERE arm = 1) b""".stripMargin,

    "q_did" ->
      """WITH c AS (SELECT make_timestamp((epoch_us(min(ts)) + epoch_us(max(ts))) // 2) AS cut
        |           FROM events),
        |u AS (SELECT user_id,
        |    round(sum(CASE WHEN event_type = 'purchase' AND ts < c.cut THEN value ELSE 0.0 END), 6) AS x,
        |    round(sum(CASE WHEN event_type = 'purchase' AND ts >= c.cut THEN value ELSE 0.0 END), 6) AS y,
        |    ('0x' || substr(md5(user_id::VARCHAR || ':did'), 1, 1))::BIGINT % 2 AS arm
        |  FROM events, c GROUP BY user_id, c.cut),
        |ud AS (SELECT *, y - x AS d FROM u),
        |arms AS (SELECT arm, count(*)::BIGINT AS n,
        |    round(sum(d), 4) / count(*) AS md, var_samp(d) AS vd,
        |    round(sum(x), 4) / count(*) AS mx, round(sum(y), 4) / count(*) AS my
        |  FROM ud GROUP BY 1)
        |SELECT t.n AS n_t, c2.n AS n_c,
        |  round(t.mx, 6) AS pre_treat, round(t.my, 6) AS post_treat,
        |  round(c2.mx, 6) AS pre_control, round(c2.my, 6) AS post_control,
        |  round(t.md - c2.md, 6) AS did,
        |  round((t.md - c2.md) / sqrt(t.vd / t.n + c2.vd / c2.n), 6) AS z,
        |  CASE WHEN abs((t.md - c2.md) / sqrt(t.vd / t.n + c2.vd / c2.n)) >= 1.96
        |       THEN 1 ELSE 0 END AS significant
        |FROM (SELECT * FROM arms WHERE arm = 1) t,
        |     (SELECT * FROM arms WHERE arm = 0) c2""".stripMargin,

    "q_srm" ->
      s"""WITH RECURSIVE u AS (${userSql("ab1")}),
         |cnt AS (SELECT
         |    sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS n_a,
         |    sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT AS n_b
         |  FROM u),
         |st AS (SELECT n_a, n_b, (n_a + n_b)::DOUBLE / 2.0 AS e FROM cnt),
         |s2 AS (SELECT n_a, n_b,
         |    (n_a - e) * (n_a - e) / e + (n_b - e) * (n_b - e) / e AS chi2 FROM st),
         |chsrc AS (SELECT 1 AS gid, chi2 AS x, 1 AS k FROM s2),
         |${graft.detectors.ChiSq.sqlReplay("chsrc", Seq("gid"))}
         |SELECT s.n_a, s.n_b, round(s.chi2, 6) AS chi2, round(f.p, 6) AS p_value,
         |  CASE WHEN f.p < 0.001 THEN 1 ELSE 0 END AS srm_detected
         |FROM s2 s CROSS JOIN (SELECT p FROM chisf) f""".stripMargin,

    "q_ab_winsorized" ->
      s"""WITH u AS (${userSql("ab1")}),
         |bins AS (SELECT ceil(metric)::BIGINT AS d, count(*) AS c FROM u GROUP BY 1),
         |w AS (SELECT *,
         |    sum(c) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |    sum(c) OVER () AS n
         |  FROM bins),
         |cap AS (SELECT min(d) AS cap FROM w WHERE cum * 100 >= n * 99),
         |uw AS (SELECT u.arm, u.metric, least(u.metric, cap.cap::DOUBLE) AS mw, cap.cap
         |       FROM u, cap),
         |arms AS (SELECT arm, count(*)::BIGINT AS n,
         |    avg(metric) AS m, var_samp(metric) AS v,
         |    avg(mw) AS mw, var_samp(mw) AS vw, any_value(cap) AS cap
         |  FROM uw GROUP BY 1)
         |SELECT a.n AS n_a, b.n AS n_b, a.cap,
         |  round(a.mw, 6) AS mean_wins_a, round(b.mw, 6) AS mean_wins_b,
         |  round((a.m - b.m) / sqrt(a.v / a.n + b.v / b.n), 6) AS z_raw,
         |  round((a.mw - b.mw) / sqrt(a.vw / a.n + b.vw / b.n), 6) AS z_wins
         |FROM (SELECT * FROM arms WHERE arm = 0) a,
         |     (SELECT * FROM arms WHERE arm = 1) b""".stripMargin
  )
}
