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

    // ── Delta-method A/B test for a RATIO metric (revenue per event —
    // the metric shape most real experiments ship, where the naive
    // per-user t-test is simply wrong because numerator and denominator
    // covary): per arm R = x̄/ȳ and var(R) ≈ (σx² − 2Rσxy + R²σy²)/(n·ȳ²),
    // z on the difference. User-level moments snapped; md5-parity arms
    // (salt :ratio). One user-keyed aggregation + a 2-row frame. ──
    "q_ab_ratio_delta" -> ((s, dir) => {
      val u = Tables.events(s, dir).groupBy("user_id")
        .agg(
          round(sum(when(col("event_type") === "purchase", col("value")).otherwise(0.0)), 6).as("x"),
          count(lit(1)).cast("double").as("y"))
        .withColumn("arm",
          conv(substring(md5(concat(col("user_id").cast("string"), lit(":ratio"))), 1, 1), 16, 10)
            .cast("int") % 2)
      val mom = u.groupBy("arm").agg(
        count(lit(1)).as("n"),
        round(sum("x"), 4).as("sx"), round(sum("y"), 4).as("sy"),
        round(sum(col("x") * col("x")), 2).as("sxx"),
        round(sum(col("y") * col("y")), 2).as("syy"),
        round(sum(col("x") * col("y")), 2).as("sxy"))
        .withColumn("xb", expr("sx / n")).withColumn("yb", expr("sy / n"))
        .withColumn("r", expr("xb / yb"))
        .withColumn("vx", expr("(sxx - sx * sx / n) / (n - 1)"))
        .withColumn("vy", expr("(syy - sy * sy / n) / (n - 1)"))
        .withColumn("cxy", expr("(sxy - sx * sy / n) / (n - 1)"))
        .withColumn("vr", expr("(vx - 2.0E0 * r * cxy + r * r * vy) / (n * yb * yb)"))
      val a0 = mom.where(col("arm") === 0).select(col("n").as("n0"), col("r").as("r0"), col("vr").as("vr0"))
      val a1 = mom.where(col("arm") === 1).select(col("n").as("n1"), col("r").as("r1"), col("vr").as("vr1"))
      a0.crossJoin(broadcast(a1))
        .withColumn("z", expr("(r1 - r0) / sqrt(vr0 + vr1)"))
        .select(col("n0"), col("n1"), round(col("r0"), 6).as("ratio_control"),
          round(col("r1"), 6).as("ratio_treat"),
          round(expr("r1 - r0"), 6).as("delta"),
          round(col("z"), 6).as("z"),
          when(abs(col("z")) >= 1.96, 1).otherwise(0).as("significant"))
    }),

    // ── A/A calibration of the experimentation pipeline: the SAME Welch
    // z machinery run over 20 independent md5-salted null splits — the
    // false-positive share must sit near 5%, or the assignment/metric
    // pipeline is broken (correlated users, heavy tails, SRM). Salts are
    // plan literals; one user scan exploded ×20, moments per (salt, arm).
    // The health check every platform runs before trusting any p-value. ──
    "q_aa_calibration" -> ((s, dir) => {
      import s.implicits._
      val u = Tables.events(s, dir).groupBy("user_id")
        .agg(round(sum(when(col("event_type") === "purchase", col("value")).otherwise(0.0)), 6).as("metric"))
      val salts = (1 to 20).toDF("salt_id")
      val mom = u.crossJoin(broadcast(salts))
        .withColumn("arm",
          conv(substring(md5(concat(col("user_id").cast("string"), lit(":aa"), col("salt_id").cast("string"))), 1, 1), 16, 10)
            .cast("int") % 2)
        .groupBy("salt_id", "arm").agg(
          count(lit(1)).as("n"),
          round(sum("metric"), 4).as("sm"),
          round(sum(col("metric") * col("metric")), 2).as("smm"))
        .withColumn("mu", expr("sm / n"))
        .withColumn("v", expr("(smm - sm * sm / n) / (n - 1)"))
      val a0 = mom.where(col("arm") === 0).select(col("salt_id"), col("n").as("n0"), col("mu").as("m0"), col("v").as("v0"))
      val a1 = mom.where(col("arm") === 1).select(col("salt_id"), col("n").as("n1"), col("mu").as("m1"), col("v").as("v1"))
      val z = a0.join(a1, "salt_id")
        .withColumn("z", expr("(m1 - m0) / sqrt(v0 / n0 + v1 / n1)"))
        .withColumn("fp", when(abs(col("z")) >= 1.96, 1L).otherwise(0L))
      val wAll = Window.partitionBy(substring(col("salt_id").cast("string"), 1, 0))
      z.withColumn("fp_share",
        round(sum("fp").over(wAll).cast("double") / count(lit(1)).over(wAll).cast("double"), 6))
        .select(col("salt_id"), col("n0"), col("n1"),
          round(col("z"), 6).as("z"), col("fp").cast("int").as("false_positive"),
          col("fp_share"))
    }),

    // ── Stratified ATT (exact matching on activity strata): users
    // stratify by integer activity bucket (n_events DIV 5, capped at 9 —
    // fixed-width, no sort), the treatment effect is the n₁-weighted
    // within-stratum mean difference with the delta variance
    // Σw²(v₁/n₁+v₀/n₀) — the observational-causal counterpart to the
    // randomized tests: even under randomization it removes activity
    // imbalance. Snapped stratum moments; md5-parity arms (salt :att);
    // ≤10-stratum frame. ──
    "q_stratified_att" -> ((s, dir) => {
      val u = Tables.events(s, dir).groupBy("user_id")
        .agg(
          round(sum(when(col("event_type") === "purchase", col("value")).otherwise(0.0)), 6).as("metric"),
          count(lit(1)).as("acts"))
        .withColumn("arm",
          conv(substring(md5(concat(col("user_id").cast("string"), lit(":att"))), 1, 1), 16, 10)
            .cast("int") % 2)
        .withColumn("bucket", least(expr("acts DIV 5"), lit(9L)))
      val strat = u.groupBy("bucket").agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"),
        round(sum(when(col("arm") === 0, col("metric")).otherwise(0.0)), 4).as("s0"),
        round(sum(when(col("arm") === 1, col("metric")).otherwise(0.0)), 4).as("s1"),
        round(sum(when(col("arm") === 0, col("metric") * col("metric")).otherwise(0.0)), 2).as("ss0"),
        round(sum(when(col("arm") === 1, col("metric") * col("metric")).otherwise(0.0)), 2).as("ss1"))
        .where(col("n0") >= 2 && col("n1") >= 2)
        .withColumn("y0", expr("s0 / n0")).withColumn("y1", expr("s1 / n1"))
        .withColumn("v0", expr("(ss0 - s0 * s0 / n0) / (n0 - 1)"))
        .withColumn("v1", expr("(ss1 - s1 * s1 / n1) / (n1 - 1)"))
        .withColumn("diff", expr("y1 - y0"))
      val zk = substring(col("bucket").cast("string"), 1, 0)
      val wAll = Window.partitionBy(zk)
      strat
        .withColumn("tn1", sum("n1").over(wAll))
        .withColumn("w", expr("n1 / CAST(tn1 AS DOUBLE)"))
        .withColumn("att6", sum(expr("CAST(round(n1 * diff * 1e6) AS BIGINT)")).over(wAll))
        .withColumn("att", expr("att6 / 1e6 / tn1"))
        .withColumn("vatt", sum(expr("w * w * (v1 / n1 + v0 / n0)")).over(wAll))
        .select(col("bucket").as("stratum"), col("n0"), col("n1"),
          round(col("y0"), 6).as("mean_control"), round(col("y1"), 6).as("mean_treat"),
          round(col("diff"), 6).as("stratum_effect"),
          round(col("att"), 6).as("att"),
          round(expr("att / sqrt(vatt)"), 6).as("z"))
    }),

    // ── Quantile treatment effects at the metric deciles: arm-wise exact
    // deciles by value-domain counting over the 1e6-scaled user metric
    // (never a per-arm sort), QTE = q_treat − q_control per decile — the
    // DISTRIBUTIONAL A/B view that catches treatments helping the median
    // while hurting the tail (invisible to every mean test above).
    // md5-parity arms (salt :qte). ──
    "q_qte" -> ((s, dir) => {
      import s.implicits._
      val u = Tables.events(s, dir).groupBy("user_id")
        .agg(round(sum(when(col("event_type") === "purchase", col("value")).otherwise(0.0)), 6).as("metric"))
        .withColumn("arm",
          conv(substring(md5(concat(col("user_id").cast("string"), lit(":qte"))), 1, 1), 16, 10)
            .cast("int") % 2)
        .withColumn("m6", round(col("metric") * 1e6).cast("long"))
      val dom = u.groupBy("arm", "m6").agg(count(lit(1)).as("c"))
      val w = Window.partitionBy("arm").orderBy("m6")
      val wAll = Window.partitionBy("arm")
      val cum = dom
        .withColumn("cum", sum("c").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("n", sum("c").over(wAll))
      val qs = (1 to 9).toDF("decile")
      val picks = cum.crossJoin(broadcast(qs))
        .where(col("cum") * 10 >= col("n") * col("decile"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("arm", "decile").orderBy("m6")))
        .where(col("rk") === 1)
        .select(col("arm"), col("decile"), (col("m6").cast("double") / 1e6).as("q"))
      val q0 = picks.where(col("arm") === 0).select(col("decile"), col("q").as("q_control"))
      val q1 = picks.where(col("arm") === 1).select(col("decile"), col("q").as("q_treat"))
      q0.join(q1, "decile")
        .select(col("decile"), round(col("q_control"), 6).as("q_control"),
          round(col("q_treat"), 6).as("q_treat"),
          round(col("q_treat") - col("q_control"), 6).as("qte"))
    }),

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

    "q_ab_ratio_delta" ->
      """WITH u AS (SELECT user_id,
        |    round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END), 6) AS x,
        |    count(*)::DOUBLE AS y,
        |    ('0x' || substr(md5(user_id::VARCHAR || ':ratio'), 1, 1))::BIGINT % 2 AS arm
        |  FROM events GROUP BY user_id),
        |mom AS (SELECT arm, count(*)::BIGINT AS n,
        |    round(sum(x), 4) AS sx, round(sum(y), 4) AS sy,
        |    round(sum(x * x), 2) AS sxx, round(sum(y * y), 2) AS syy,
        |    round(sum(x * y), 2) AS sxy
        |  FROM u GROUP BY 1),
        |st AS (SELECT *, sx / n AS xb, sy / n AS yb FROM mom),
        |s2 AS (SELECT *, xb / yb AS r,
        |    (sxx - sx * sx / n) / (n - 1) AS vx,
        |    (syy - sy * sy / n) / (n - 1) AS vy,
        |    (sxy - sx * sy / n) / (n - 1) AS cxy
        |  FROM st),
        |s3 AS (SELECT *, (vx - 2.0E0 * r * cxy + r * r * vy) / (n * yb * yb) AS vr FROM s2),
        |a0 AS (SELECT n AS n0, r AS r0, vr AS vr0 FROM s3 WHERE arm = 0),
        |a1 AS (SELECT n AS n1, r AS r1, vr AS vr1 FROM s3 WHERE arm = 1),
        |z AS (SELECT *, (r1 - r0) / sqrt(vr0 + vr1) AS z FROM a0 CROSS JOIN a1)
        |SELECT n0, n1, round(r0, 6) AS ratio_control, round(r1, 6) AS ratio_treat,
        |  round(r1 - r0, 6) AS delta, round(z, 6) AS z,
        |  CASE WHEN abs(z) >= 1.96E0 THEN 1 ELSE 0 END AS significant
        |FROM z""".stripMargin,

    "q_aa_calibration" ->
      """WITH u AS (SELECT user_id,
        |    round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END), 6) AS metric
        |  FROM events GROUP BY user_id),
        |salts AS (SELECT unnest(range(1, 21)) AS salt_id),
        |asg AS (SELECT u.metric, s.salt_id,
        |    ('0x' || substr(md5(u.user_id::VARCHAR || ':aa' || s.salt_id::VARCHAR), 1, 1))::BIGINT % 2 AS arm
        |  FROM u CROSS JOIN salts s),
        |mom AS (SELECT salt_id, arm, count(*)::BIGINT AS n,
        |    round(sum(metric), 4) AS sm, round(sum(metric * metric), 2) AS smm
        |  FROM asg GROUP BY 1, 2),
        |st AS (SELECT *, sm / n AS mu, (smm - sm * sm / n) / (n - 1) AS v FROM mom),
        |a0 AS (SELECT salt_id, n AS n0, mu AS m0, v AS v0 FROM st WHERE arm = 0),
        |a1 AS (SELECT salt_id, n AS n1, mu AS m1, v AS v1 FROM st WHERE arm = 1),
        |z AS (SELECT a0.salt_id, n0, n1, (m1 - m0) / sqrt(v0 / n0 + v1 / n1) AS z
        |      FROM a0 JOIN a1 USING (salt_id)),
        |fp AS (SELECT *, CASE WHEN abs(z) >= 1.96E0 THEN 1 ELSE 0 END AS fp FROM z),
        |sh AS (SELECT *, round(sum(fp) OVER ()::DOUBLE / count(*) OVER ()::DOUBLE, 6) AS fp_share FROM fp)
        |SELECT salt_id::INT AS salt_id, n0, n1, round(z, 6) AS z,
        |  fp::INT AS false_positive, fp_share
        |FROM sh""".stripMargin,

    "q_stratified_att" ->
      """WITH u AS (SELECT user_id,
        |    round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END), 6) AS metric,
        |    count(*)::BIGINT AS acts,
        |    ('0x' || substr(md5(user_id::VARCHAR || ':att'), 1, 1))::BIGINT % 2 AS arm
        |  FROM events GROUP BY user_id),
        |ub AS (SELECT *, least(acts // 5, 9) AS bucket FROM u),
        |strat AS (SELECT bucket,
        |    sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS n0,
        |    sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT AS n1,
        |    round(sum(CASE WHEN arm = 0 THEN metric ELSE 0.0 END), 4) AS s0,
        |    round(sum(CASE WHEN arm = 1 THEN metric ELSE 0.0 END), 4) AS s1,
        |    round(sum(CASE WHEN arm = 0 THEN metric * metric ELSE 0.0 END), 2) AS ss0,
        |    round(sum(CASE WHEN arm = 1 THEN metric * metric ELSE 0.0 END), 2) AS ss1
        |  FROM ub GROUP BY 1),
        |ok AS (SELECT * FROM strat WHERE n0 >= 2 AND n1 >= 2),
        |st AS (SELECT *, s0 / n0 AS y0, s1 / n1 AS y1,
        |    (ss0 - s0 * s0 / n0) / (n0 - 1) AS v0,
        |    (ss1 - s1 * s1 / n1) / (n1 - 1) AS v1
        |  FROM ok),
        |d AS (SELECT *, y1 - y0 AS diff FROM st),
        |wn AS (SELECT *,
        |    sum(n1) OVER ()::BIGINT AS tn1,
        |    sum(round(n1 * (y1 - y0) * 1e6)::BIGINT) OVER ()::BIGINT AS att6
        |  FROM d),
        |w2 AS (SELECT *, n1 / CAST(tn1 AS DOUBLE) AS w, att6 / 1e6 / tn1 AS att FROM wn),
        |vv AS (SELECT *, sum(w * w * (v1 / n1 + v0 / n0)) OVER () AS vatt FROM w2)
        |SELECT bucket AS stratum, n0, n1,
        |  round(y0, 6) AS mean_control, round(y1, 6) AS mean_treat,
        |  round(diff, 6) AS stratum_effect, round(att, 6) AS att,
        |  round(att / sqrt(vatt), 6) AS z
        |FROM vv""".stripMargin,

    "q_qte" ->
      """WITH u AS (SELECT user_id,
        |    round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END), 6) AS metric,
        |    ('0x' || substr(md5(user_id::VARCHAR || ':qte'), 1, 1))::BIGINT % 2 AS arm
        |  FROM events GROUP BY user_id),
        |dom AS (SELECT arm, round(metric * 1e6)::BIGINT AS m6, count(*)::BIGINT AS c
        |        FROM u GROUP BY 1, 2),
        |cum AS (SELECT *,
        |    sum(c) OVER (PARTITION BY arm ORDER BY m6
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum,
        |    sum(c) OVER (PARTITION BY arm)::BIGINT AS n
        |  FROM dom),
        |qs AS (SELECT unnest(range(1, 10)) AS decile),
        |picks AS (SELECT arm, decile, m6,
        |    row_number() OVER (PARTITION BY arm, decile ORDER BY m6) AS rk
        |  FROM cum CROSS JOIN qs WHERE cum * 10 >= n * decile),
        |p AS (SELECT arm, decile, m6::DOUBLE / 1e6 AS q FROM picks WHERE rk = 1),
        |q0 AS (SELECT decile, q AS q_control FROM p WHERE arm = 0),
        |q1 AS (SELECT decile, q AS q_treat FROM p WHERE arm = 1)
        |SELECT decile::INT AS decile, round(q_control, 6) AS q_control,
        |  round(q_treat, 6) AS q_treat, round(q_treat - q_control, 6) AS qte
        |FROM q0 JOIN q1 USING (decile)""".stripMargin,

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
