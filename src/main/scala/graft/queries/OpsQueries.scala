package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Retail/ops analytics — lifecycle, pricing, and inventory-classification
  * operators over the warehouse tables:
  *
  *  - `q_churn_hazard` — discrete-time churn hazard by tenure week:
  *    h(w) = churners(w)/at_risk(w) with right-censoring for users still
  *    active in the stream's final week (the hazard-rate view next to
  *    q_kaplan_meier's survival view). One user-keyed aggregation → a
  *    ≤#weeks-row frame; at-risk from a reverse cumulative count, the KM
  *    shape.
  *  - `q_price_index` — monthly Laspeyres / Paasche / Fisher price
  *    indices over lineitem (base = first shipping month, matched on
  *    parts present in both periods): L = Σp_t·q_0/Σp_0·q_0,
  *    P = Σp_t·q_t/Σp_0·q_t, F = √(L·P). One (part, month) aggregate +
  *    one partkey-keyed join against the base-month slice.
  *  - `q_pareto_abc` — ABC inventory classification: parts ranked by
  *    revenue, A/B/C split at 80%/95% cumulative share. Class boundaries
  *    come from the ordered cumulative sum itself (total = max(cum), the
  *    same float sequence in both engines) — never a second unordered
  *    re-sum that could disagree by an ulp at a boundary. The ranking
  *    window is #parts-sized — dimension-scale, not fact-scale.
  */
object OpsQueries {

  /** Erlang-C service rate (jobs per hour per agent). */
  private[queries] val Mu = 12.0

  private val H = Tables.hourlySql

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q_churn_hazard" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val mx = ev.agg(to_date(max(col("ts"))).as("mx"))
      val u = ev.groupBy("user_id")
        .agg(to_date(min(col("ts"))).as("d0"), to_date(max(col("ts"))).as("d1"))
        .crossJoin(broadcast(mx))
        .select(
          (datediff(col("d1"), col("d0")).cast("long") / 7L).cast("long").as("w"),
          (datediff(col("mx"), col("d1")) < 7).as("censored"))
      val total = u.agg(count(lit(1)).as("n_users"))
      val byW = u.groupBy("w").agg(
        count(lit(1)).as("n_end"),
        sum(when(!col("censored"), 1L).otherwise(0L)).as("churned"),
        sum(when(col("censored"), 1L).otherwise(0L)).as("censored_n"))
      val one = substring(col("w").cast("string"), 1, 0)
      val wCum = Window.partitionBy(one).orderBy("w")
        .rowsBetween(Window.unboundedPreceding, -1)
      byW.crossJoin(broadcast(total))
        .withColumn("at_risk", col("n_users") - coalesce(sum("n_end").over(wCum), lit(0L)))
        .select(col("w").as("tenure_w"), col("at_risk"), col("churned"),
          col("censored_n"),
          round(col("churned").cast("double") / col("at_risk"), 6).as("hazard"))
    }),

    "q_price_index" -> ((s, dir) => {
      val pm = Tables.lineitem(s, dir)
        .groupBy(col("l_partkey"), trunc(to_date(col("l_shipdate")), "month").as("m"))
        .agg(round(sum("l_extendedprice") / sum("l_quantity"), 6).as("p"),
          sum(col("l_quantity").cast("long")).as("q"))
      val m0 = pm.agg(min("m").as("m0"))
      val base = pm.crossJoin(broadcast(m0)).where(col("m") === col("m0"))
        .select(col("l_partkey"), col("p").as("p0"), col("q").as("q0"))
      pm.join(base, "l_partkey")
        .groupBy("m").agg(
          count(lit(1)).as("n_parts"),
          sum(col("p") * col("q0")).as("ptq0"), sum(col("p0") * col("q0")).as("p0q0"),
          sum(col("p") * col("q")).as("ptqt"), sum(col("p0") * col("q")).as("p0qt"))
        .withColumn("laspeyres", col("ptq0") / col("p0q0"))
        .withColumn("paasche", col("ptqt") / col("p0qt"))
        .select(col("m").as("month"), col("n_parts"),
          round(col("laspeyres"), 6).as("laspeyres"),
          round(col("paasche"), 6).as("paasche"),
          round(sqrt(col("laspeyres") * col("paasche")), 6).as("fisher"))
    }),

    // Join-key skew diagnostics — the pipeline-health screen a 100 TB
    // join needs BEFORE it runs: key-multiplicity profile (max / p99 via
    // count-of-counts value-domain lookup, never a sort of the fact
    // rows), skew factor = max/avg, and the share of the biggest key.
    // One count aggregate per relation + a ≤#distinct-multiplicities
    // frame.
    "q_skew_diag" -> ((s, dir) => {
      def profile(df: DataFrame, rel: String, key: String): DataFrame = {
        val mult = df.groupBy(col(key).as("k")).agg(count(lit(1)).as("m"))
        val cc = mult.groupBy("m").agg(count(lit(1)).as("nk"))
        val one = substring(col("m").cast("string"), 1, 0)
        val wCum = Window.partitionBy(one).orderBy("m")
          .rowsBetween(Window.unboundedPreceding, 0)
        val wAll = Window.partitionBy(one)
        cc.withColumn("cum", sum("nk").over(wCum))
          .withColumn("keys", sum("nk").over(wAll))
          .withColumn("rows", sum(col("m") * col("nk")).over(wAll))
          .withColumn("maxm", max("m").over(wAll))
          .groupBy().agg(
            first("keys").as("n_keys"), first("rows").as("n_rows"),
            first("maxm").as("max_mult"),
            min(when(col("cum") * 100 >= col("keys") * 99, col("m"))).as("p99_mult"))
          .select(lit(rel).as("relation"), lit(key).as("key"),
            col("n_keys"), col("n_rows"), col("max_mult"), col("p99_mult"),
            round(col("max_mult") * col("n_keys").cast("double") / col("n_rows"), 6).as("skew_factor"),
            round(col("max_mult").cast("double") / col("n_rows"), 6).as("max_key_share"))
      }
      profile(Tables.lineitem(s, dir).select("l_orderkey"), "lineitem", "l_orderkey")
        .unionAll(profile(Tables.events(s, dir).select("user_id"), "events", "user_id"))
        .unionAll(profile(Tables.orders(s, dir).select("o_custkey"), "orders", "o_custkey"))
    }),

    // Alert-budget threshold tuning: smallest z-threshold whose alert
    // count fits one-alert-per-week (alerts·168 ≤ n hours, integer
    // math) — the detector-calibration step an on-call rotation
    // actually performs. Per-series mean+σ thresholds are 6-dp-snapped;
    // the threshold grid is a 5-row broadcast.
    "q_alert_budget" -> ((s, dir) => {
      import s.implicits._
      val thrs = Seq(2.0, 2.5, 3.0, 3.5, 4.0).toDF("t")
      val hourly = Tables.hourlyEvents(s, dir).drop("n")
      // mean/σ from snapped moment sums — a raw window avg/stddev differs
      // across engines at ~1e-12, and the alert compare sits on the same
      // 6-dp grid as the values, where a flipped cut changes a count
      val mom = hourly.groupBy("event_type").agg(
        count(lit(1)).as("n"),
        round(sum("value"), 4).as("sv"),
        round(sum(col("value") * col("value")), 2).as("svv"))
        .withColumn("mu", expr("sv / n"))
        .withColumn("sd", expr("sqrt((svv - sv * sv / n) / (n - 1))"))
      val counts = hourly.join(broadcast(mom), "event_type")
        .crossJoin(broadcast(thrs))
        .withColumn("cut", round(col("mu") + col("t") * col("sd"), 6))
        .groupBy("event_type", "t").agg(
          first("n").as("n"),
          sum(when(col("value") > col("cut"), 1L).otherwise(0L)).as("alerts"))
      counts
        .withColumn("fits", col("alerts") * 168 <= col("n"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("event_type")
            .orderBy(col("fits").desc, when(col("fits"), col("t")).otherwise(-col("t")))))
        .where(col("rk") === 1)
        .select(col("event_type"), col("n").as("n_hours"),
          round(col("t"), 6).as("z_threshold"), col("alerts"),
          when(col("fits"), 1).otherwise(0).as("within_budget"))
    }),

    // Lorenz concentration curve of customer revenue by decile: ntile(10)
    // over (revenue, custkey) — the "what share of revenue do the top 10%
    // hold" view next to q_pareto_abc's part-level ABC; decile sums are
    // dimension-scale, shares are ratios of 2-dp-snapped sums, the
    // cumulative share accumulates the already-rounded decile shares so
    // the running order is engine-identical.
    "q_lorenz_deciles" -> ((s, dir) => {
      val rev = Tables.orders(s, dir)
        .groupBy("o_custkey").agg(round(sum("o_totalprice"), 6).as("rev"))
      val one = substring(col("o_custkey").cast("string"), 1, 0)
      val wT = Window.partitionBy(one).orderBy(col("rev"), col("o_custkey"))
      val dec = rev.withColumn("decile", ntile(10).over(wT))
        .groupBy("decile").agg(
          count(lit(1)).as("n_customers"),
          round(sum("rev"), 2).as("revenue"))
      val wAll = Window.partitionBy(substring(col("decile").cast("string"), 1, 0))
      val wCum = Window.partitionBy(substring(col("decile").cast("string"), 1, 0))
        .orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
      dec
        .withColumn("total", sum("revenue").over(wAll))
        .withColumn("share", round(col("revenue") / col("total"), 6))
        .withColumn("cum_share", round(sum(col("share")).over(wCum), 6))
        .select(col("decile").cast("int").as("decile"), col("n_customers"),
          col("revenue"), col("share"), col("cum_share"))
    }),

    // Erlang-C capacity planning per event stream: arrivals λ = events
    // per hour (count/expected span — a ratio of integers), service rate
    // μ = 12/hour, smallest agent count c with wait probability ≤ 0.2
    // via the Erlang-B recursion B(c) = a·B(c−1)/(c + a·B(c−1)) then
    // C = c·B/(c − a(1−B)) — the SRE/call-center staffing primitive.
    // The recursion is a fixed-order scalar loop (≤60 steps) on a
    // #series-row frame; the oracle replays it as a recursive CTE with
    // the identical float sequence.
    "q_erlang_c" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val lam = ev.groupBy("event_type").agg(
        count(lit(1)).as("n_events"),
        expr("(unix_timestamp(max(ts)) - unix_timestamp(min(ts))) DIV 3600 + 1").as("hours"))
        .withColumn("lambda", col("n_events").cast("double") / col("hours"))
        .withColumn("a", col("lambda") / lit(OpsQueries.Mu))
      val fit = udf { a: Double =>
        var bb = 1.0
        var c = 0
        var res: (Int, Double) = (0, 1.0)
        var found = false
        while (c < 60 && !found) {
          c += 1
          bb = a * bb / (c + a * bb)
          if (c > a) {
            val cw = c * bb / (c - a * (1.0 - bb))
            if (cw <= 0.2) { res = (c, cw); found = true }
          }
        }
        res
      }
      lam.withColumn("_f", fit(col("a")))
        .select(col("event_type"), col("n_events"), round(col("lambda"), 6).as("lambda"),
          round(col("a"), 6).as("offered_load"),
          col("_f._1").as("c_star"), round(col("_f._2"), 6).as("wait_prob"))
    }),

    // ABC-XYZ inventory matrix: the q_pareto_abc revenue classes crossed
    // with demand-variability classes from the monthly coefficient of
    // variation (X: cv ≤ 0.5 steady, Y: ≤ 1 variable, Z: erratic) — the
    // classic planning grid (AX = automate, CZ = make-to-order). CV from
    // snapped monthly-demand moments; both classifications are
    // dimension-scale.
    "q_abc_xyz" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val rev = li.groupBy("l_partkey").agg(round(sum("l_extendedprice"), 6).as("rev"))
      val one = substring(col("l_partkey").cast("string"), 1, 0)
      val wOrd = Window.partitionBy(one).orderBy(col("rev").desc, col("l_partkey"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val wAll = Window.partitionBy(one)
      val abc = rev
        .withColumn("cum", sum("rev").over(wOrd))
        .withColumn("total", max(col("cum")).over(wAll))
        .withColumn("abc",
          when(col("cum") <= col("total") * 0.80, "A")
            .when(col("cum") <= col("total") * 0.95, "B")
            .otherwise("C"))
        .select("l_partkey", "abc")
      val mdem = li.groupBy(col("l_partkey"), trunc(to_date(col("l_shipdate")), "month").as("m"))
        .agg(sum(col("l_quantity").cast("long")).as("d"))
      val xyz = mdem.groupBy("l_partkey").agg(
        count(lit(1)).as("nm"),
        sum("d").as("sd"), sum(col("d") * col("d")).as("sdd"))
        .where(col("nm") >= 2)
        .withColumn("mu", expr("CAST(sd AS DOUBLE) / nm"))
        .withColumn("cv", expr(
          "sqrt((CAST(sdd AS DOUBLE) - (CAST(sd AS DOUBLE) * sd) / nm) / (nm - 1)) / (CAST(sd AS DOUBLE) / nm)"))
        .withColumn("xyz",
          when(col("cv") <= 0.5, "X").when(col("cv") <= 1.0, "Y").otherwise("Z"))
        .select("l_partkey", "xyz")
      abc.join(xyz, "l_partkey")
        .groupBy("abc", "xyz").agg(count(lit(1)).as("n_parts"))
    }),

    // Syntetos-Boylan demand-pattern taxonomy (2005): each part classed
    // by mean inter-demand interval p (months-span / demand-months) and
    // CV² of nonzero demand sizes into smooth / intermittent / erratic /
    // lumpy at the standard (1.32, 0.49) cut points — WHICH forecaster
    // (SES vs Croston vs TSB) each SKU should get. p is a ratio of
    // integers; CV² from snapped moments; one (part, month) aggregate.
    "q_demand_classes" -> ((s, dir) => {
      val mdem = Tables.lineitem(s, dir)
        .groupBy(col("l_partkey"), trunc(to_date(col("l_shipdate")), "month").as("m"))
        .agg(sum(col("l_quantity").cast("long")).as("d"))
      val stats = mdem.groupBy("l_partkey").agg(
        count(lit(1)).as("k"),
        (months_between(max("m"), min("m")).cast("long") + 1L).as("span"),
        sum("d").as("sd"), sum(col("d") * col("d")).as("sdd"))
        .where(col("k") >= 2)
        .withColumn("p", expr("CAST(span AS DOUBLE) / k"))
        .withColumn("cv2", expr(
          "((CAST(sdd AS DOUBLE) - (CAST(sd AS DOUBLE) * sd) / k) / (k - 1)) / ((CAST(sd AS DOUBLE) / k) * (CAST(sd AS DOUBLE) / k))"))
        .withColumn("klass",
          when(col("p") < 1.32 && col("cv2") < 0.49, "smooth")
            .when(col("p") >= 1.32 && col("cv2") < 0.49, "intermittent")
            .when(col("p") < 1.32, "erratic")
            .otherwise("lumpy"))
      stats.groupBy("klass").agg(
        count(lit(1)).as("n_parts"),
        round(avg("p"), 6).as("mean_interval"),
        round(avg("cv2"), 6).as("mean_cv2"))
    }),

    // Hourly session-concurrency profile: each 30-min-gap session
    // (q_sessionize conventions) exploded into its covered hours →
    // active-session counts per hour → mean/peak by hour of day — the
    // capacity-planning companion to q_erlang_c measured from real
    // overlap instead of a Poisson model. Explosion is bounded by
    // session duration (hours), never user count.
    "q_concurrency" -> ((s, dir) => {
      val sess = graft.TS.sessionize(
        Tables.events(s, dir).select(col("user_id"), col("ts"), col("value")),
        graft.TSSchema(keys = Seq("user_id")), gapSeconds = 1800)
        .groupBy("user_id", "session")
        .agg(min(unix_timestamp(col("ts"))).as("start_s"),
          max(unix_timestamp(col("ts"))).as("end_s"))
      val hours = sess
        .withColumn("h0", expr("start_s DIV 3600"))
        .withColumn("h1", expr("end_s DIV 3600"))
        .withColumn("h", explode(expr("sequence(h0, h1)")))
      val perHour = hours.groupBy("h").agg(count(lit(1)).as("active"))
      val one = substring(col("h").cast("string"), 1, 0)
      perHour
        .withColumn("hod", expr("h % 24"))
        .groupBy("hod").agg(
          count(lit(1)).as("n_hours"),
          round(sum("active").cast("double") / count(lit(1)), 6).as("mean_active"),
          max("active").as("peak_active"))
    }),

    // Index-of-dispersion (Poisson) screen on per-customer order counts:
    // D = (n−1)s²/x̄ with the Wilson-Hilferty normal approximation
    // z = √(2D) − √(2(n−1)−1) — over- vs under-dispersion tells a
    // planner whether order arrivals are bursty or regular. Integer
    // counts, snapped moments.
    "q_dispersion" -> ((s, dir) => {
      val cnt = Tables.orders(s, dir).groupBy("o_custkey").agg(count(lit(1)).as("c"))
      cnt.agg(
        count(lit(1)).as("n"),
        sum("c").as("sc"), sum(col("c") * col("c")).as("scc"))
        .withColumn("mean", expr("CAST(sc AS DOUBLE) / n"))
        .withColumn("s2", expr("(CAST(scc AS DOUBLE) - (CAST(sc AS DOUBLE) * sc) / n) / (n - 1)"))
        .withColumn("d", expr("(n - 1) * s2 / mean"))
        .withColumn("z", expr("sqrt(2.0E0 * d) - sqrt(2.0E0 * (n - 1) - 1.0E0)"))
        .select(col("n").as("n_customers"), round(col("mean"), 6).as("mean_orders"),
          round(col("s2") / col("mean"), 6).as("dispersion_ratio"),
          round(col("z"), 6).as("z"),
          when(col("z") > 1.96, lit("overdispersed"))
            .when(col("z") < -1.96, lit("underdispersed"))
            .otherwise(lit("poisson_like")).as("verdict"))
    }),

    "q_pareto_abc" -> ((s, dir) => {
      val rev = Tables.lineitem(s, dir)
        .groupBy("l_partkey").agg(round(sum("l_extendedprice"), 6).as("rev"))
      val one = substring(col("l_partkey").cast("string"), 1, 0)
      val wOrd = Window.partitionBy(one).orderBy(col("rev").desc, col("l_partkey"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val wAll = Window.partitionBy(one)
      val ranked = rev
        .withColumn("cum", sum("rev").over(wOrd))
        .withColumn("total", max(col("cum")).over(wAll))
        .withColumn("abc_class",
          when(col("cum") <= col("total") * 0.80, "A")
            .when(col("cum") <= col("total") * 0.95, "B")
            .otherwise("C"))
      // cum_revenue at 2 dp: the cumulative sits at ~1e9-1e12 magnitude
      // where a 6-dp grid is below the double ulp (and DuckDB's windowed
      // sum is a segment-tree reduction, not sequential) — cents are the
      // honest precision; the share ratio stays at 6 dp
      ranked.groupBy("abc_class").agg(
        count(lit(1)).as("n_parts"),
        round(max("cum"), 2).as("cum_revenue"),
        round(max("cum") / max("total"), 6).as("cum_share"))
    })
  )

  val sql: Map[String, String] = Map(

    "q_churn_hazard" ->
      """WITH mx AS (SELECT max(ts)::DATE AS mx FROM events),
        |u AS (SELECT date_diff('day', min(e.ts)::DATE, max(e.ts)::DATE) // 7 AS w,
        |        date_diff('day', max(e.ts)::DATE, m.mx) < 7 AS censored
        |      FROM events e, mx m GROUP BY e.user_id, m.mx),
        |d AS (SELECT w, count(*) AS n_end,
        |        sum(CASE WHEN NOT censored THEN 1 ELSE 0 END) AS churned,
        |        sum(CASE WHEN censored THEN 1 ELSE 0 END) AS censored_n
        |      FROM u GROUP BY 1),
        |o AS (SELECT *, (SELECT count(*) FROM u)
        |        - coalesce(sum(n_end) OVER (ORDER BY w
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS at_risk
        |      FROM d)
        |SELECT w AS tenure_w, at_risk::BIGINT AS at_risk, churned::BIGINT AS churned,
        |  censored_n::BIGINT AS censored_n,
        |  round(churned::DOUBLE / at_risk, 6) AS hazard
        |FROM o""".stripMargin,

    "q_price_index" ->
      """WITH pm AS (SELECT l_partkey, date_trunc('month', l_shipdate::DATE)::DATE AS m,
        |    round(sum(l_extendedprice) / sum(l_quantity), 6) AS p,
        |    sum(l_quantity::BIGINT) AS q
        |  FROM lineitem GROUP BY 1, 2),
        |base AS (SELECT l_partkey, p AS p0, q AS q0 FROM pm
        |         WHERE m = (SELECT min(m) FROM pm)),
        |j AS (SELECT pm.m, count(*) AS n_parts,
        |    sum(pm.p * b.q0) AS ptq0, sum(b.p0 * b.q0) AS p0q0,
        |    sum(pm.p * pm.q) AS ptqt, sum(b.p0 * pm.q) AS p0qt
        |  FROM pm JOIN base b USING (l_partkey) GROUP BY 1)
        |SELECT m AS month, n_parts::BIGINT AS n_parts,
        |  round(ptq0 / p0q0, 6) AS laspeyres,
        |  round(ptqt / p0qt, 6) AS paasche,
        |  round(sqrt((ptq0 / p0q0) * (ptqt / p0qt)), 6) AS fisher
        |FROM j""".stripMargin,

    "q_skew_diag" -> {
      def profile(rel: String, table: String, key: String): String =
        s"""SELECT '$rel' AS relation, '$key' AS key,
           |  max(keys)::BIGINT AS n_keys, max(rws)::BIGINT AS n_rows,
           |  max(maxm)::BIGINT AS max_mult,
           |  min(CASE WHEN cum * 100 >= keys * 99 THEN m END)::BIGINT AS p99_mult,
           |  round(max(maxm) * max(keys)::DOUBLE / max(rws), 6) AS skew_factor,
           |  round(max(maxm)::DOUBLE / max(rws), 6) AS max_key_share
           |FROM (SELECT m, nk,
           |    sum(nk) OVER (ORDER BY m ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           |    sum(nk) OVER () AS keys, sum(m * nk) OVER () AS rws,
           |    max(m) OVER () AS maxm
           |  FROM (SELECT m, count(*) AS nk FROM
           |    (SELECT $key AS k, count(*) AS m FROM $table GROUP BY 1) GROUP BY 1))""".stripMargin
      s"""WITH a AS (${profile("lineitem", "lineitem", "l_orderkey")}),
         |b AS (${profile("events", "events", "user_id")}),
         |c AS (${profile("orders", "orders", "o_custkey")})
         |SELECT * FROM a UNION ALL SELECT * FROM b UNION ALL SELECT * FROM c""".stripMargin
    },

    "q_alert_budget" ->
      s"""WITH hourly AS ($H),
         |mom AS (SELECT event_type, count(*)::BIGINT AS n,
         |    round(sum(value), 4) AS sv, round(sum(value * value), 2) AS svv
         |  FROM hourly GROUP BY 1),
         |ms AS (SELECT event_type, n, sv / n AS mu,
         |    sqrt((svv - sv * sv / n) / (n - 1)) AS sd FROM mom),
         |thr AS (SELECT unnest([2.0E0, 2.5E0, 3.0E0, 3.5E0, 4.0E0]) AS t),
         |cnt AS (SELECT h.event_type, th.t, max(m.n) AS n,
         |    sum(CASE WHEN h.value > round(m.mu + th.t * m.sd, 6) THEN 1 ELSE 0 END)::BIGINT AS alerts
         |  FROM hourly h JOIN ms m USING (event_type) CROSS JOIN thr th
         |  GROUP BY 1, 2),
         |pick AS (SELECT *, alerts * 168 <= n AS fits,
         |    row_number() OVER (PARTITION BY event_type
         |      ORDER BY (alerts * 168 <= n) DESC,
         |        CASE WHEN alerts * 168 <= n THEN t ELSE -t END) AS rk
         |  FROM cnt)
         |SELECT event_type, n AS n_hours, round(t, 6) AS z_threshold, alerts,
         |  CASE WHEN fits THEN 1 ELSE 0 END AS within_budget
         |FROM pick WHERE rk = 1""".stripMargin,

    "q_lorenz_deciles" ->
      """WITH rev AS (SELECT o_custkey, round(sum(o_totalprice), 6) AS rev
        |             FROM orders GROUP BY 1),
        |dec AS (SELECT ntile(10) OVER (ORDER BY rev, o_custkey) AS decile, rev FROM rev),
        |d AS (SELECT decile, count(*)::BIGINT AS n_customers,
        |        round(sum(rev), 2) AS revenue
        |      FROM dec GROUP BY 1),
        |t AS (SELECT *, sum(revenue) OVER () AS total FROM d),
        |sh AS (SELECT *, round(revenue / total, 6) AS share FROM t)
        |SELECT decile::INT AS decile, n_customers, revenue, share,
        |  round(sum(share) OVER (ORDER BY decile
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS cum_share
        |FROM sh""".stripMargin,

    "q_erlang_c" ->
      s"""WITH RECURSIVE lam AS (SELECT event_type, count(*)::BIGINT AS n_events,
         |    ((epoch_us(max(ts)) // 1000000 - epoch_us(min(ts)) // 1000000) // 3600 + 1)::BIGINT AS hours
         |  FROM events GROUP BY 1),
         |aa AS (SELECT event_type, n_events, hours,
         |    n_events::DOUBLE / hours AS lambda,
         |    (n_events::DOUBLE / hours) / $Mu AS a
         |  FROM lam),
         |rec AS (
         |  SELECT event_type, a, 0 AS c, 1.0E0 AS b FROM aa
         |  UNION ALL
         |  SELECT event_type, a, c + 1, a * b / ((c + 1) + a * b)
         |  FROM rec WHERE c < 60),
         |erl AS (SELECT event_type, a, c, b,
         |    c * b / (c - a * (1.0 - b)) AS cw
         |  FROM rec WHERE c >= 1 AND c > a),
         |pick AS (SELECT event_type, c, cw FROM (
         |    SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY c) AS rk
         |    FROM erl WHERE cw <= 0.2) WHERE rk = 1)
         |SELECT l.event_type, l.n_events, round(l.lambda, 6) AS lambda,
         |  round(l.a, 6) AS offered_load,
         |  coalesce(p.c, 0)::INT AS c_star,
         |  round(coalesce(p.cw, 1.0), 6) AS wait_prob
         |FROM aa l LEFT JOIN pick p USING (event_type)""".stripMargin,

    "q_abc_xyz" ->
      """WITH rev AS (SELECT l_partkey, round(sum(l_extendedprice), 6) AS rev
        |             FROM lineitem GROUP BY 1),
        |rk AS (SELECT *,
        |    sum(rev) OVER (ORDER BY rev DESC, l_partkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM rev),
        |tt AS (SELECT *, max(cum) OVER () AS total FROM rk),
        |abc AS (SELECT l_partkey,
        |    CASE WHEN cum <= total * 0.80 THEN 'A'
        |         WHEN cum <= total * 0.95 THEN 'B' ELSE 'C' END AS abc
        |  FROM tt),
        |mdem AS (SELECT l_partkey, date_trunc('month', l_shipdate::DATE)::DATE AS m,
        |    sum(l_quantity::BIGINT) AS d
        |  FROM lineitem GROUP BY 1, 2),
        |mm AS (SELECT l_partkey, count(*)::BIGINT AS nm,
        |    sum(d)::BIGINT AS sd, sum(d * d)::BIGINT AS sdd
        |  FROM mdem GROUP BY 1 HAVING count(*) >= 2),
        |xyz AS (SELECT l_partkey,
        |    CASE WHEN cv <= 0.5 THEN 'X' WHEN cv <= 1.0 THEN 'Y' ELSE 'Z' END AS xyz
        |  FROM (SELECT l_partkey,
        |      sqrt((CAST(sdd AS DOUBLE) - (CAST(sd AS DOUBLE) * sd) / nm) / (nm - 1))
        |        / (CAST(sd AS DOUBLE) / nm) AS cv
        |    FROM mm))
        |SELECT a.abc, x.xyz, count(*)::BIGINT AS n_parts
        |FROM abc a JOIN xyz x USING (l_partkey) GROUP BY 1, 2""".stripMargin,

    "q_demand_classes" ->
      """WITH mdem AS (SELECT l_partkey, date_trunc('month', l_shipdate::DATE)::DATE AS m,
        |    sum(l_quantity::BIGINT) AS d
        |  FROM lineitem GROUP BY 1, 2),
        |st AS (SELECT l_partkey, count(*)::BIGINT AS k,
        |    (date_diff('month', min(m), max(m)) + 1)::BIGINT AS span,
        |    sum(d)::BIGINT AS sd, sum(d * d)::BIGINT AS sdd
        |  FROM mdem GROUP BY 1 HAVING count(*) >= 2),
        |cl AS (SELECT l_partkey,
        |    CAST(span AS DOUBLE) / k AS p,
        |    ((CAST(sdd AS DOUBLE) - (CAST(sd AS DOUBLE) * sd) / k) / (k - 1))
        |      / ((CAST(sd AS DOUBLE) / k) * (CAST(sd AS DOUBLE) / k)) AS cv2
        |  FROM st),
        |kk AS (SELECT *,
        |    CASE WHEN p < 1.32 AND cv2 < 0.49 THEN 'smooth'
        |         WHEN p >= 1.32 AND cv2 < 0.49 THEN 'intermittent'
        |         WHEN p < 1.32 THEN 'erratic' ELSE 'lumpy' END AS klass
        |  FROM cl)
        |SELECT klass, count(*)::BIGINT AS n_parts,
        |  round(sum(p) / count(*), 6) AS mean_interval,
        |  round(sum(cv2) / count(*), 6) AS mean_cv2
        |FROM kk GROUP BY 1""".stripMargin,

    "q_concurrency" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 1000000 AS ts_s FROM events),
        |lg AS (SELECT user_id, ts_s,
        |    CASE WHEN ts_s - lag(ts_s) OVER (PARTITION BY user_id ORDER BY ts_s) > 1800
        |           OR lag(ts_s) OVER (PARTITION BY user_id ORDER BY ts_s) IS NULL
        |         THEN 1 ELSE 0 END AS brk
        |  FROM e),
        |sess0 AS (SELECT user_id, ts_s,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts_s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session
        |  FROM lg),
        |sess AS (SELECT user_id, session, min(ts_s) AS start_s, max(ts_s) AS end_s
        |         FROM sess0 GROUP BY 1, 2),
        |hrs AS (SELECT user_id, session,
        |    unnest(generate_series(start_s // 3600, end_s // 3600)) AS h
        |  FROM sess),
        |ph AS (SELECT h, count(*) AS active FROM hrs GROUP BY 1)
        |SELECT h % 24 AS hod, count(*)::BIGINT AS n_hours,
        |  round(sum(active)::DOUBLE / count(*), 6) AS mean_active,
        |  max(active)::BIGINT AS peak_active
        |FROM ph GROUP BY 1""".stripMargin,

    "q_dispersion" ->
      """WITH cnt AS (SELECT o_custkey, count(*)::BIGINT AS c FROM orders GROUP BY 1),
        |mom AS (SELECT count(*)::BIGINT AS n, sum(c)::BIGINT AS sc,
        |    sum(c * c)::BIGINT AS scc FROM cnt),
        |st AS (SELECT n, CAST(sc AS DOUBLE) / n AS mean,
        |    (CAST(scc AS DOUBLE) - (CAST(sc AS DOUBLE) * sc) / n) / (n - 1) AS s2
        |  FROM mom),
        |dd AS (SELECT *, (n - 1) * s2 / mean AS d FROM st),
        |zz AS (SELECT *, sqrt(2.0E0 * d) - sqrt(2.0E0 * (n - 1) - 1.0E0) AS z FROM dd)
        |SELECT n AS n_customers, round(mean, 6) AS mean_orders,
        |  round(s2 / mean, 6) AS dispersion_ratio, round(z, 6) AS z,
        |  CASE WHEN z > 1.96 THEN 'overdispersed'
        |       WHEN z < -1.96 THEN 'underdispersed'
        |       ELSE 'poisson_like' END AS verdict
        |FROM zz""".stripMargin,

    "q_pareto_abc" ->
      """WITH rev AS (SELECT l_partkey, round(sum(l_extendedprice), 6) AS rev
        |             FROM lineitem GROUP BY 1),
        |rk AS (SELECT *,
        |    sum(rev) OVER (ORDER BY rev DESC, l_partkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM rev),
        |tt AS (SELECT *, max(cum) OVER () AS total FROM rk),
        |cl AS (SELECT *,
        |    CASE WHEN cum <= total * 0.80 THEN 'A'
        |         WHEN cum <= total * 0.95 THEN 'B'
        |         ELSE 'C' END AS abc_class
        |  FROM tt)
        |SELECT abc_class, count(*)::BIGINT AS n_parts,
        |  round(max(cum), 2) AS cum_revenue,
        |  round(max(cum) / max(total), 6) AS cum_share
        |FROM cl GROUP BY 1""".stripMargin
  )
}
