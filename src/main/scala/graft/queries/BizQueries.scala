package graft.queries

import graft._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Business/ops analytics over the relational (TPC-H-shaped) tables —
  * the queries a production deployment runs against the same warehouse
  * the time-series operators read:
  *
  *  - `q_kaplan_meier` — Kaplan-Meier survival curve for time-to-first-
  *    purchase (right-censored at a fixed observation cutoff): the
  *    conversion-analysis estimator behind "how long until users
  *    convert", with genuine censoring (users who never purchase inside
  *    the window). Shapes: one user-keyed aggregation (the scale axis),
  *    a ≤#days-row
  *    day table, and the KM product as a one-row sequential kernel the
  *    oracle replays as a recursive CTE — survival factors multiply in
  *    the identical order in both engines.
  *  - `q_elasticity` — log-log price elasticity of demand per part
  *    brand: OLS of ln(quantity) on ln(effective unit price) via
  *    closed-form moment aggregates (slope snapped to 6 dp before the
  *    intercept uses it, the cointegration discipline). One
  *    partkey-keyed dim join + one brand-keyed aggregate.
  *  - `q_leadtime` — order→ship lead-time distribution per order
  *    priority with EXACT p50/p90/p99 computed by value-domain counting:
  *    lead times are small integer day counts, so the quantile is a
  *    cumulative-count lookup over a ≤(priorities × days)-row frame —
  *    never a per-group sort (the shape that survives a 100 TB lineitem
  *    where a sort-based percentile would put 1/5 of the table in one
  *    partition). All-integer math until the final mean division.
  */
object BizQueries {

  /** Observation window (days from the first event in the stream): users
    * without a purchase inside it are right-censored at the cutoff. */
  private val ObsWindowDays = 5

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── Weekly growth accounting (the Social Capital decomposition):
    // active(w) splits exactly into new + retained + resurrected, with
    // churned(w) = active last week but not this one and the quick
    // ratio (new + resurrected)/churned. The FLOW view next to
    // q_retention's cohort matrix — "MAU grew" decomposes into who
    // arrived, who came back, who left. Pure integer counting on one
    // distinct (user, week) relation + two key-equality self-joins;
    // scale axis = users. ──
    "q_growth_accounting" -> ((s, dir) => {
      val act = Scratch.materialize(
        Tables.events(s, dir)
          .select(col("user_id"), date_trunc("week", col("ts")).as("w")).distinct(),
        "growth_act")
      val first = act.groupBy("user_id").agg(min("w").as("fw"))
      val prev = act.select(col("user_id"), (col("w") + expr("INTERVAL 7 DAYS")).as("w"))
        .withColumn("was_prev", lit(1))
      val flows = act.join(first, "user_id").join(prev, Seq("user_id", "w"), "left")
        .groupBy("w").agg(
          count(lit(1)).as("active"),
          sum(when(col("fw") === col("w"), 1L).otherwise(0L)).as("new_users"),
          sum(when(col("fw") =!= col("w") && col("was_prev") === 1, 1L).otherwise(0L)).as("retained"),
          sum(when(col("fw") =!= col("w") && col("was_prev").isNull, 1L).otherwise(0L)).as("resurrected"))
      val churn = act.select(col("user_id"), (col("w") + expr("INTERVAL 7 DAYS")).as("w"))
        .join(act, Seq("user_id", "w"), "left_anti")
        .groupBy("w").agg(count(lit(1)).as("churned"))
      flows.join(churn, Seq("w"), "left")
        .withColumn("churned", coalesce(col("churned"), lit(0L)))
        .select(unix_timestamp(col("w")).as("week_s"), col("active"), col("new_users"),
          col("retained"), col("resurrected"), col("churned"),
          when(col("churned") > 0,
            round((col("new_users") + col("resurrected")).cast("double") /
              col("churned").cast("double"), 6)).as("quick_ratio"))
    }),

    // ── Retention half-life per weekly cohort: ln(retention share) is
    // near-linear in cohort age for the standard exponential-decay
    // regime, so the OLS slope of ln(share) on offset gives λ and
    // half-life = ln2/(−λ) — the single number a growth team quotes
    // from the whole q_retention triangle. Shares are exact integer
    // ratios; the log-linear fit runs per cohort over its ≤#offsets
    // rows with 6-dp-snapped moments; cohorts need ≥3 points and a
    // negative slope to emit a half-life (else null, declared). ──
    "q_retention_halflife" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val first = ev.groupBy("user_id").agg(date_trunc("week", min("ts")).as("cw"))
      val active = ev.select(col("user_id"), date_trunc("week", col("ts")).as("aw")).distinct()
      val tri = active.join(first, "user_id")
        .withColumn("off", ((unix_timestamp(col("aw")) - unix_timestamp(col("cw"))) / lit(604800L)).cast("long"))
        .groupBy("cw", "off").agg(count(lit(1)).as("n_users"))
      val w0 = Window.partitionBy("cw")
      val pts = tri
        .withColumn("n0", max(when(col("off") === 0, col("n_users"))).over(w0))
        .where(col("off") >= 1 && col("n_users") > 0)
        .withColumn("ly", log(col("n_users").cast("double") / col("n0").cast("double")))
        .withColumn("x", col("off").cast("double"))
      pts.groupBy("cw").agg(
        count(lit(1)).as("np"),
        max("n0").as("cohort_size"),
        round(sum("x"), 6).as("sx"), round(sum("ly"), 6).as("sy"),
        round(sum(col("x") * col("x")), 6).as("sxx"),
        round(sum(col("x") * col("ly")), 6).as("sxy"))
        .where(col("np") >= 3)
        .withColumn("lam", expr("(np * sxy - sx * sy) / (np * sxx - sx * sx)"))
        .select(unix_timestamp(col("cw")).as("cohort_w_s"), col("cohort_size"),
          col("np").as("n_points"),
          round(col("lam"), 6).as("decay_rate"),
          when(col("lam") < 0,
            round(expr("ln(2.0E0) / (-lam)"), 6)).as("halflife_weeks"))
    }),

    // ── Funnel step-timing: per user, the gap between FIRST view →
    // first click → first purchase (ordered pairs only), with exact
    // p50/p90 by value-domain counting over integer minute gaps (the
    // q_leadtime discipline — a ≤#distinct-gaps frame, never a per-group
    // sort) — q_funnel says how many convert, THIS says how long they
    // take. One user-keyed aggregation, scale axis = users. ──
    "q_funnel_timing" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val firsts = ev.where(col("event_type").isin("view", "click", "purchase"))
        .groupBy("user_id").agg(
          min(when(col("event_type") === "view", expr("unix_micros(ts)"))).as("tv"),
          min(when(col("event_type") === "click", expr("unix_micros(ts)"))).as("tc"),
          min(when(col("event_type") === "purchase", expr("unix_micros(ts)"))).as("tp"))
      val gaps = firsts.select(lit("view->click").as("step_pair"),
        when(col("tc") >= col("tv"), expr("(tc - tv) DIV 60000000")).as("gap_min"))
        .unionAll(firsts.select(lit("click->purchase").as("step_pair"),
          when(col("tp") >= col("tc"), expr("(tp - tc) DIV 60000000")).as("gap_min")))
        .where(col("gap_min").isNotNull)
      val cnt = gaps.groupBy("step_pair", "gap_min").agg(count(lit(1)).as("c"))
      val w = Window.partitionBy("step_pair").orderBy("gap_min")
      val wAll = Window.partitionBy("step_pair")
      val cum = cnt
        .withColumn("cum", sum("c").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("n", sum("c").over(wAll))
        .withColumn("sg", sum(col("c") * col("gap_min")).over(wAll))
      def pick(q: Int) = min(when(col("cum") * 100 >= col("n") * q, col("gap_min")))
      cum.groupBy("step_pair").agg(
        max("n").as("n_users"),
        round((max("sg").cast("double") / max("n").cast("double")), 6).as("mean_min"),
        pick(50).as("p50_min"), pick(90).as("p90_min"))
    }),

    // ── Adtributor root-cause attribution (Bhagwan et al. 2014): when
    // the metric moves between the halves, which dimension values
    // explain it? Per event_type: explanatory power EP = Δv_i/ΔV and
    // JS-divergence surprise between the before/after share
    // distributions. High-EP + high-surprise values are the incident
    // candidates. One conditional aggregate per event_type from the
    // 4-dp-snapped period sums; #dimension-values output rows. ──
    "q_adtributor" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      // microsecond midpoint of the observed span (the q_did convention)
      val bounds = ev.agg(
        expr("min(unix_micros(ts))").as("t0"), expr("max(unix_micros(ts))").as("t1"))
        .withColumn("midus", expr("t0 + (t1 - t0) DIV 2"))
        .select("midus")
      val per = ev.crossJoin(broadcast(bounds))
        .withColumn("half", when(expr("unix_micros(ts)") < col("midus"), 1).otherwise(2))
        .groupBy("event_type").agg(
          round(sum(when(col("half") === 1, col("value")).otherwise(0.0)), 4).as("v1"),
          round(sum(when(col("half") === 2, col("value")).otherwise(0.0)), 4).as("v2"))
      val tot = per.agg(round(sum("v1"), 4).as("tv1"), round(sum("v2"), 4).as("tv2"))
      per.crossJoin(broadcast(tot))
        .withColumn("p", col("v1") / col("tv1"))
        .withColumn("q", col("v2") / col("tv2"))
        .withColumn("surprise", expr(
          "0.5E0 * (CASE WHEN p > 0 THEN p * ln(2.0E0 * p / (p + q)) ELSE 0.0E0 END" +
            " + CASE WHEN q > 0 THEN q * ln(2.0E0 * q / (p + q)) ELSE 0.0E0 END)"))
        .withColumn("ep",
          when(col("tv2") =!= col("tv1"),
            (col("v2") - col("v1")) / (col("tv2") - col("tv1"))))
        .select(col("event_type"),
          round(col("v1"), 4).as("v_before"), round(col("v2"), 4).as("v_after"),
          round(col("p"), 6).as("share_before"), round(col("q"), 6).as("share_after"),
          round(col("surprise"), 6).as("surprise"), round(col("ep"), 6).as("explanatory_power"))
    }),

    "q_kaplan_meier" -> ((s, dir) => {
      val ev0 = Tables.events(s, dir)
      val cut = ev0.agg(date_add(to_date(min(col("ts"))), ObsWindowDays).as("cut"))
      val ev = ev0.crossJoin(broadcast(cut)).where(to_date(col("ts")) < col("cut"))
      val users = ev.groupBy("user_id").agg(
        to_date(min(col("ts"))).as("t0"),
        to_date(min(when(col("event_type") === "purchase", col("ts")))).as("tp"),
        first("cut").as("cut"))
        .select(
          when(col("tp").isNotNull, datediff(col("tp"), col("t0")))
            .otherwise(datediff(col("cut"), col("t0"))).as("life_days"),
          col("tp").isNull.as("censored"))
      val total = users.agg(count(lit(1)).as("n_users"))
      val byDay = users.groupBy("life_days").agg(
        count(lit(1)).as("n_all"),
        sum(when(!col("censored"), 1L).otherwise(0L)).as("n_churn"))
      // non-foldable constant partition key (PlanSpec discipline) over the
      // <=#distinct-days-row frame
      val wCum = Window.partitionBy(substring(col("life_days").cast("string"), 1, 0))
        .orderBy("life_days").rowsBetween(Window.unboundedPreceding, -1)
      val steps = byDay.crossJoin(broadcast(total))
        .withColumn("at_risk", col("n_users") - coalesce(sum("n_all").over(wCum), lit(0L)))
        .where(col("n_churn") > 0)
      val survFn = udf { (risk: Seq[Long], churn: Seq[Long]) =>
        var p = 1.0
        risk.zip(churn).map { case (r, c) => p *= (1.0 - c.toDouble / r); p }
      }
      steps
        .agg(sort_array(collect_list(struct(col("life_days"), col("at_risk"), col("n_churn")))).as("st"))
        .select(col("st.life_days").as("ds"), col("st.at_risk").as("rs"), col("st.n_churn").as("cs"))
        .withColumn("surv", survFn(col("rs"), col("cs")))
        .select(explode(arrays_zip(col("ds"), col("rs"), col("cs"), col("surv"))).as("z"))
        .select(col("z.ds").as("life_days"), col("z.rs").as("at_risk"),
          col("z.cs").as("churned"), round(col("z.surv"), 6).as("surv"))
    }),

    "q_elasticity" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .where(col("l_quantity") > 0 && col("l_extendedprice") > 0)
      val pt = Tables.part(s, dir).select("p_partkey", "p_brand")
      val pts = li.join(pt, col("l_partkey") === col("p_partkey"))
        .select(col("p_brand"),
          log(col("l_quantity")).as("ly"),
          log(col("l_extendedprice") / col("l_quantity") * (lit(1.0) - col("l_discount"))).as("lx"))
      pts.groupBy("p_brand").agg(
        count(lit(1)).as("n_lines"),
        sum("lx").as("sx"), sum("ly").as("sy"),
        sum(col("lx") * col("lx")).as("sxx"), sum(col("lx") * col("ly")).as("sxy"),
        sum(col("ly") * col("ly")).as("syy"))
        .withColumn("elasticity", round((col("n_lines") * col("sxy") - col("sx") * col("sy")) /
          (col("n_lines") * col("sxx") - col("sx") * col("sx")), 6))
        .withColumn("intercept",
          round((col("sy") - col("elasticity") * col("sx")) / col("n_lines"), 6))
        .withColumn("r2", round(
          pow(col("n_lines") * col("sxy") - col("sx") * col("sy"), 2) /
            ((col("n_lines") * col("sxx") - col("sx") * col("sx")) *
              (col("n_lines") * col("syy") - col("sy") * col("sy"))), 6))
        .select("p_brand", "n_lines", "elasticity", "intercept", "r2")
    }),

    // U-shaped (position-based) multi-touch attribution: every purchase
    // credits its user's view/click touches inside a 7-day lookback —
    // first touch 40%, last touch 40%, middle touches share 20% (1 touch
    // → 100%, 2 → 50/50). The marketing-analytics staple next to q_funnel
    // / q_rfm. Shapes: one user-keyed join (range predicate rides the
    // equi-join as a filter; candidates bounded by per-user 7-day
    // activity), one purchase-keyed window, one #touch-types aggregate.
    "q_attribution" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("pts"), col("event_id").as("pid"))
      val touches = ev.where(col("event_type").isin("view", "click"))
        .select(col("user_id"), col("ts").as("tts"),
          col("event_type").as("touch_type"), col("event_id").as("tid"))
      val j = purchases.join(touches, Seq("user_id"))
        .where(col("tts") <= col("pts") &&
          col("tts") > col("pts") - expr("INTERVAL 7 DAY"))
      val w = Window.partitionBy("pid").orderBy(col("tts"), col("tid"))
      val wc = Window.partitionBy("pid")
      j.withColumn("rn", row_number().over(w))
        .withColumn("m", count(lit(1)).over(wc))
        .withColumn("credit",
          when(col("m") === 1, lit(1.0))
            .when(col("m") === 2, lit(0.5))
            .when(col("rn") === 1 || col("rn") === col("m"), lit(0.4))
            .otherwise(lit(0.2) / (col("m") - 2)))
        .groupBy("touch_type").agg(
          count(lit(1)).as("n_touches"),
          countDistinct("pid").as("purchases_touched"),
          round(sum("credit"), 6).as("credit"))
    }),

    // RFM segment-migration matrix: q_rfm's scoring run independently on
    // the first and second halves of the order history (midpoint date
    // cut, per-half recency reference), customers present in both halves
    // counted by (segment_then → segment_now) — the churn-risk movement
    // report behind lifecycle marketing. Two customer-keyed aggregations
    // + deterministic ntile scoring per half + one custkey join.
    "q_rfm_migration" -> ((s, dir) => {
      val orders = Tables.orders(s, dir)
      val cut = orders.agg(to_date(timestamp_micros(expr(
        "(unix_micros(CAST(min(o_orderdate) AS TIMESTAMP)) + unix_micros(CAST(max(o_orderdate) AS TIMESTAMP))) DIV 2"))).as("cut"))
      def half(pred: Column => Column): DataFrame = {
        val o = orders.crossJoin(broadcast(cut)).where(pred(col("cut")))
        val mx = o.agg(max("o_orderdate").as("mx"))
        val cust = o.crossJoin(broadcast(mx)).groupBy("o_custkey")
          .agg(expr("datediff(max(mx), max(o_orderdate))").as("recency_days"),
            count(lit(1)).as("frequency"),
            round(sum("o_totalprice"), 6).as("monetary"))
        val one = substring(col("o_custkey").cast("string"), 1, 0)
        cust
          .withColumn("r_score", ntile(5).over(
            Window.partitionBy(one).orderBy(col("recency_days").desc, col("o_custkey"))))
          .withColumn("f_score", ntile(5).over(
            Window.partitionBy(one).orderBy(col("frequency"), col("o_custkey"))))
          .withColumn("segment",
            when(col("r_score") >= 4 && col("f_score") >= 4, "champion")
              .when(col("r_score") >= 4, "recent")
              .when(col("f_score") >= 4, "loyal")
              .when(col("r_score") <= 2 && col("f_score") <= 2, "at_risk")
              .otherwise("regular"))
          .select(col("o_custkey"), col("segment"))
      }
      val before = half(c => to_date(col("o_orderdate")) < c)
        .withColumnRenamed("segment", "segment_then")
      val after = half(c => to_date(col("o_orderdate")) >= c)
        .withColumnRenamed("segment", "segment_now")
      before.join(after, "o_custkey")
        .groupBy("segment_then", "segment_now").agg(count(lit(1)).as("n_customers"))
    }),

    // Markov-chain (removal-effect) attribution — the data-driven
    // counterpart to q_attribution's positional rules (Anderl et al.
    // 2016): user journeys (purchase closes a journey; trailing touches
    // end at 'null') become a first-order Markov chain over
    // {start, touch channels, conv, null}; a channel's removal effect is
    // the relative drop in start→conv absorption probability when every
    // transition into it is redirected to null; attribution shares
    // normalize the removal effects. Shapes: journey/transition
    // construction is two user-keyed windows + one vocabulary-scale
    // aggregate; the transition matrix is ≤(#event-types+2)² cells —
    // driver state bounded by construction (the q_stationary_dist
    // discipline) — and the 200-round value iteration runs over it, with
    // the oracle replaying the identical iteration as a recursive CTE.
    "q_markov_attribution" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val ev = Tables.events(s, dir)
        .withColumn("jid", coalesce(
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      val wj = Window.partitionBy("user_id", "jid").orderBy(col("ts"), col("event_id"))
      val wjd = Window.partitionBy("user_id", "jid").orderBy(col("ts").desc, col("event_id").desc)
      val st = ev
        .withColumn("prev", coalesce(lag("event_type", 1).over(wj), lit("start")))
        .withColumn("cur", when(col("event_type") === "purchase", "conv").otherwise(col("event_type")))
        .withColumn("rd", row_number().over(wjd))
      val tr = st.select(col("prev"), col("cur"))
        .unionAll(st.where(col("rd") === 1 && col("event_type") =!= "purchase")
          .select(col("event_type").as("prev"), lit("null").as("cur")))
      val pairs = tr.groupBy("prev", "cur").agg(count(lit(1)).as("c")).collect()
      val states = pairs.flatMap(r => Seq(r.getString(0), r.getString(1))).distinct.sorted
      val k = states.length
      val si = states.zipWithIndex.toMap
      val cnt = Array.ofDim[Long](k, k)
      pairs.foreach(r => cnt(si(r.getString(0)))(si(r.getString(1))) = r.getLong(2))
      val rowTot = cnt.map(_.sum)
      val pm = Array.tabulate(k, k) { (i, j) =>
        if (rowTot(i) == 0L) 0.0 else cnt(i)(j).toDouble / rowTot(i).toDouble
      }
      val (iConv, iNull, iStart) = (si("conv"), si("null"), si("start"))
      def absorb(removed: Int): Double = {
        var v = Array.tabulate(k)(i => if (i == iConv) 1.0 else 0.0)
        var it = 0
        while (it < 200) {
          v = Array.tabulate(k) { i =>
            if (i == iConv) 1.0
            else if (i == iNull || i == removed) 0.0
            else {
              var acc = 0.0; var j = 0
              while (j < k) { acc = acc + pm(i)(j) * v(j); j += 1 }
              acc
            }
          }
          it += 1
        }
        v(iStart)
      }
      val base = absorb(-1)
      val channels = states.filterNot(Set("conv", "null", "start")).sorted
      val re = channels.map(c => 1.0 - absorb(si(c)) / base)
      val reSum = re.sum // sorted channel order — oracle sums the same order
      import s.implicits._
      def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      channels.zip(re).map { case (c, e) => (c, r6(e), r6(e / reSum), r6(base)) }.toSeq
        .toDF("channel", "removal_effect", "attribution", "base_cvr")
    }),

    // Cohort lifetime-value curves: customers grouped by first-order
    // month, revenue accumulated by cohort age (months since first
    // order), LTV = cumulative revenue / cohort size — the
    // revenue-per-cohort triangle next to q_retention's activity
    // triangle. Ages capped at 12 for the report. Shapes: one
    // customer-keyed first-order aggregation, one custkey join to
    // orders, a (cohort, age) aggregate, and a ≤13-row-per-cohort
    // cumulative window (revenue sums round to 6 dp on both sides;
    // the cumulative sum runs over the already-rounded cell values so
    // the running order is engine-identical).
    "q_cohort_ltv" -> ((s, dir) => {
      val ord = Tables.orders(s, dir)
        .select(col("o_custkey"), to_date(col("o_orderdate")).as("od"), col("o_totalprice"))
      val first = ord.groupBy("o_custkey").agg(trunc(min(col("od")), "month").as("cohort"))
      val sizes = first.groupBy("cohort").agg(count(lit(1)).as("n_customers"))
      val aged = ord.join(first, "o_custkey")
        .withColumn("age", months_between(trunc(col("od"), "month"), col("cohort")).cast("int"))
        .where(col("age") <= 12)
        .groupBy("cohort", "age").agg(round(sum("o_totalprice"), 6).as("revenue"))
      val wCum = Window.partitionBy("cohort").orderBy("age")
        .rowsBetween(Window.unboundedPreceding, 0)
      aged.join(broadcast(sizes), "cohort")
        .withColumn("cum_revenue", round(sum("revenue").over(wCum), 6))
        .withColumn("ltv", round(col("cum_revenue") / col("n_customers"), 6))
        .select(col("cohort"), col("age"), col("n_customers"),
          col("revenue"), col("cum_revenue"), col("ltv"))
    }),

    // Bass diffusion model per region (Bass 1969) fit on the discrete
    // Bass regression S_t = a + b·N_{t−1} + c·N_{t−1}² over the monthly
    // first-order adoption series: market size m = (−b − √(b²−4ac))/2c,
    // innovation p = a/m, imitation q = −c·m, peak at ln(q/p)/(p+q) —
    // the adoption-curve forecaster next to q_prophet_logistic's
    // saturating trend. Shapes: one customer-keyed first-order
    // aggregation, two broadcast dim joins, a dense ≤#months grid per
    // region, one 3×4 GaussJordan solve off a 10-moment aggregate.
    // Coefficients snap to 6 dp before the (m, p, q) closed forms so
    // both engines derive identical parameters.
    "q_bass_diffusion" -> ((s, dir) => {
      val first = Tables.orders(s, dir).groupBy("o_custkey")
        .agg(to_date(min(col("o_orderdate"))).as("fd"))
      val cust = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
      val nat = Tables.nation(s, dir).select("n_nationkey", "n_regionkey")
      val reg = Tables.region(s, dir).select("r_regionkey", "r_name")
      val adopters = first
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .select(col("r_name").as("region"), trunc(col("fd"), "month").as("mo"))
      val monthly = adopters.groupBy("region", "mo").agg(count(lit(1)).as("s"))
      val span = adopters.agg(min("mo").as("lo"), max("mo").as("hi"))
      val grid = span
        .select(explode(expr("sequence(lo, hi, interval 1 month)")).as("mo"))
        .crossJoin(adopters.select("region").distinct())
      val dense = grid.join(monthly, Seq("region", "mo"), "left")
        .withColumn("s", coalesce(col("s"), lit(0L)))
      val wCum = Window.partitionBy("region").orderBy("mo")
        .rowsBetween(Window.unboundedPreceding, -1)
      val rows = dense
        .withColumn("nprev", coalesce(sum("s").over(wCum), lit(0L)).cast("double"))
        .withColumn("y", col("s").cast("double"))
      val bc: Seq[Column] = Seq(lit(1.0), col("nprev"), col("nprev") * col("nprev"))
      val sums: Seq[Column] = (0 until 3).flatMap { i =>
        (0 until 3).map { j =>
          val sm = sum(bc(i) * bc(j))
          (if (i == j) sm + lit(1e-8) else sm).as(s"m${i}_$j")
        } :+ sum(bc(i) * col("y")).as(s"r$i")
      } ++ Seq(count(lit(1)).as("n_months"), sum("y").as("n_adopt"))
      val mats = rows.groupBy("region").agg(sums.head, sums.tail: _*)
        .withColumn("m", array((for (i <- 0 until 3; j <- 0 to 3) yield
          if (j < 3) col(s"m${i}_$j") else col(s"r$i")): _*))
      graft.models.GaussJordan.eliminate(mats, "m", 3, 4)
        .select(col("region"), col("n_months"), col("n_adopt").cast("long").as("n_adopt"),
          round(col("m")(3), 6).as("a"), round(col("m")(7), 6).as("b"),
          round(col("m")(11), 6).as("c"))
        .withColumn("disc", col("b") * col("b") - lit(4.0) * col("a") * col("c"))
        .withColumn("m_hat", when(col("c") < 0 && col("disc") >= 0,
          (-col("b") - sqrt(col("disc"))) / (lit(2.0) * col("c"))))
        .withColumn("p_hat", when(col("m_hat") > 0, col("a") / col("m_hat")))
        .withColumn("q_hat", when(col("m_hat") > 0, -col("c") * col("m_hat")))
        .withColumn("peak_month", when(col("p_hat") > 0 && col("q_hat") > 0,
          log(col("q_hat") / col("p_hat")) / (col("p_hat") + col("q_hat"))))
        .select(col("region"), col("n_months"), col("n_adopt"),
          col("a"), col("b"), col("c"),
          round(col("m_hat"), 6).as("m_hat"), round(col("p_hat"), 6).as("p_hat"),
          round(col("q_hat"), 6).as("q_hat"), round(col("peak_month"), 6).as("peak_month"))
    }),

    "q_leadtime" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir).select("l_orderkey", "l_shipdate")
      val ord = Tables.orders(s, dir).select("o_orderkey", "o_orderdate", "o_orderpriority")
      val days = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority"),
          datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate"))).as("days"))
      val cnt = days.groupBy("o_orderpriority", "days").agg(count(lit(1)).as("c"))
      val wCum = Window.partitionBy("o_orderpriority")
        .orderBy("days").rowsBetween(Window.unboundedPreceding, 0)
      val wAll = Window.partitionBy("o_orderpriority")
      def pos(p: Int) = expr(s"(n - 1) * $p div 100 + 1")
      cnt
        .withColumn("cum", sum("c").over(wCum))
        .withColumn("n", sum("c").over(wAll))
        .withColumn("dsum", sum(col("days") * col("c")).over(wAll))
        .groupBy("o_orderpriority").agg(
          first("n").as("n_lines"),
          round(first("dsum").cast("double") / first("n"), 6).as("mean_days"),
          min(when(col("cum") >= pos(50), col("days"))).as("p50"),
          min(when(col("cum") >= pos(90), col("days"))).as("p90"),
          min(when(col("cum") >= pos(99), col("days"))).as("p99"))
    })
  )

  val sql: Map[String, String] = Map(

    "q_growth_accounting" ->
      """WITH act AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events),
        |fw AS (SELECT user_id, min(w) AS fw FROM act GROUP BY 1),
        |prev AS (SELECT user_id, w + INTERVAL 7 DAY AS w, 1 AS was_prev FROM act),
        |flows AS (SELECT a.w,
        |    count(*)::BIGINT AS active,
        |    sum(CASE WHEN f.fw = a.w THEN 1 ELSE 0 END)::BIGINT AS new_users,
        |    sum(CASE WHEN f.fw <> a.w AND p.was_prev = 1 THEN 1 ELSE 0 END)::BIGINT AS retained,
        |    sum(CASE WHEN f.fw <> a.w AND p.was_prev IS NULL THEN 1 ELSE 0 END)::BIGINT AS resurrected
        |  FROM act a JOIN fw f USING (user_id)
        |  LEFT JOIN prev p ON p.user_id = a.user_id AND p.w = a.w
        |  GROUP BY 1),
        |churn AS (SELECT n.w, count(*)::BIGINT AS churned
        |  FROM (SELECT user_id, w + INTERVAL 7 DAY AS w FROM act) n
        |  LEFT JOIN act a ON a.user_id = n.user_id AND a.w = n.w
        |  WHERE a.user_id IS NULL GROUP BY 1)
        |SELECT epoch_us(f.w) // 1000000 AS week_s, f.active, f.new_users,
        |  f.retained, f.resurrected, coalesce(c.churned, 0) AS churned,
        |  CASE WHEN coalesce(c.churned, 0) > 0
        |       THEN round((f.new_users + f.resurrected)::DOUBLE / c.churned::DOUBLE, 6)
        |  END AS quick_ratio
        |FROM flows f LEFT JOIN churn c ON c.w = f.w""".stripMargin,

    "q_retention_halflife" ->
      """WITH f AS (SELECT user_id, date_trunc('week', min(ts)) AS cw FROM events GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS aw FROM events),
        |tri AS (SELECT f.cw,
        |    ((epoch_us(a.aw) // 1000000 - epoch_us(f.cw) // 1000000) / 604800)::BIGINT AS off,
        |    count(*)::BIGINT AS n_users
        |  FROM a JOIN f USING (user_id) GROUP BY 1, 2),
        |w0 AS (SELECT *, max(CASE WHEN off = 0 THEN n_users END)
        |    OVER (PARTITION BY cw)::BIGINT AS n0 FROM tri),
        |pts AS (SELECT cw, n0, off::DOUBLE AS x,
        |    ln(n_users::DOUBLE / n0::DOUBLE) AS ly
        |  FROM w0 WHERE off >= 1 AND n_users > 0),
        |mom AS (SELECT cw, count(*)::BIGINT AS np, max(n0) AS cohort_size,
        |    round(sum(x), 6) AS sx, round(sum(ly), 6) AS sy,
        |    round(sum(x * x), 6) AS sxx, round(sum(x * ly), 6) AS sxy
        |  FROM pts GROUP BY 1),
        |fit AS (SELECT *, (np * sxy - sx * sy) / (np * sxx - sx * sx) AS lam
        |        FROM mom WHERE np >= 3)
        |SELECT epoch_us(cw) // 1000000 AS cohort_w_s, cohort_size,
        |  np AS n_points, round(lam, 6) AS decay_rate,
        |  CASE WHEN lam < 0 THEN round(ln(2.0E0) / (-lam), 6) END AS halflife_weeks
        |FROM fit""".stripMargin,

    "q_funnel_timing" ->
      """WITH firsts AS (SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS tv,
        |    min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS tc,
        |    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS tp
        |  FROM events WHERE event_type IN ('view', 'click', 'purchase') GROUP BY 1),
        |gaps AS (
        |  SELECT 'view->click' AS step_pair,
        |    CASE WHEN tc >= tv THEN (tc - tv) // 60000000 END AS gap_min FROM firsts
        |  UNION ALL
        |  SELECT 'click->purchase',
        |    CASE WHEN tp >= tc THEN (tp - tc) // 60000000 END FROM firsts),
        |g AS (SELECT * FROM gaps WHERE gap_min IS NOT NULL),
        |cnt AS (SELECT step_pair, gap_min, count(*)::BIGINT AS c FROM g GROUP BY 1, 2),
        |cum AS (SELECT *,
        |    sum(c) OVER (PARTITION BY step_pair ORDER BY gap_min
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum,
        |    sum(c) OVER (PARTITION BY step_pair)::BIGINT AS n,
        |    sum(c * gap_min) OVER (PARTITION BY step_pair)::BIGINT AS sg
        |  FROM cnt)
        |SELECT step_pair, max(n)::BIGINT AS n_users,
        |  round(max(sg)::DOUBLE / max(n)::DOUBLE, 6) AS mean_min,
        |  min(CASE WHEN cum * 100 >= n * 50 THEN gap_min END)::BIGINT AS p50_min,
        |  min(CASE WHEN cum * 100 >= n * 90 THEN gap_min END)::BIGINT AS p90_min
        |FROM cum GROUP BY 1""".stripMargin,

    "q_adtributor" ->
      """WITH bounds AS (SELECT min(epoch_us(ts)) AS t0, max(epoch_us(ts)) AS t1,
        |    min(epoch_us(ts)) + (max(epoch_us(ts)) - min(epoch_us(ts))) // 2 AS midus
        |  FROM events),
        |per AS (SELECT event_type,
        |    round(sum(CASE WHEN epoch_us(e.ts) < b.midus THEN value ELSE 0.0E0 END), 4) AS v1,
        |    round(sum(CASE WHEN epoch_us(e.ts) >= b.midus THEN value ELSE 0.0E0 END), 4) AS v2
        |  FROM events e, bounds b GROUP BY 1),
        |tot AS (SELECT round(sum(v1), 4) AS tv1, round(sum(v2), 4) AS tv2 FROM per),
        |st AS (SELECT per.*, tot.tv1, tot.tv2,
        |    v1 / tv1 AS p, v2 / tv2 AS q FROM per, tot)
        |SELECT event_type, round(v1, 4) AS v_before, round(v2, 4) AS v_after,
        |  round(p, 6) AS share_before, round(q, 6) AS share_after,
        |  round(0.5E0 * (CASE WHEN p > 0 THEN p * ln(2.0E0 * p / (p + q)) ELSE 0.0E0 END
        |    + CASE WHEN q > 0 THEN q * ln(2.0E0 * q / (p + q)) ELSE 0.0E0 END), 6) AS surprise,
        |  CASE WHEN tv2 <> tv1 THEN round((v2 - v1) / (tv2 - tv1), 6) END AS explanatory_power
        |FROM st""".stripMargin,

    "q_kaplan_meier" ->
      s"""WITH RECURSIVE c AS (
         |  SELECT (min(ts)::DATE + INTERVAL $ObsWindowDays DAY)::DATE AS cut FROM events),
         |ev AS (SELECT e.user_id, e.event_type, e.ts, c.cut FROM events e, c
         |       WHERE e.ts::DATE < c.cut),
         |u0 AS (SELECT user_id, min(ts)::DATE AS t0,
         |         min(CASE WHEN event_type = 'purchase' THEN ts END)::DATE AS tp,
         |         any_value(cut) AS cut
         |       FROM ev GROUP BY 1),
         |u AS (SELECT CASE WHEN tp IS NOT NULL THEN date_diff('day', t0, tp)
         |               ELSE date_diff('day', t0, cut) END AS life_days,
         |             tp IS NULL AS censored
         |      FROM u0),
         |d AS (SELECT life_days, count(*) AS n_all,
         |        sum(CASE WHEN NOT censored THEN 1 ELSE 0 END) AS n_churn
         |      FROM u GROUP BY 1),
         |o AS (SELECT *, (SELECT count(*) FROM u)
         |        - coalesce(sum(n_all) OVER (ORDER BY life_days
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS at_risk
         |      FROM d),
         |steps AS (SELECT row_number() OVER (ORDER BY life_days) AS i,
         |            life_days, at_risk, n_churn
         |          FROM o WHERE n_churn > 0),
         |rec AS (
         |  SELECT i, life_days, at_risk, n_churn,
         |         1.0 * (1 - n_churn::DOUBLE / at_risk) AS surv
         |  FROM steps WHERE i = 1
         |  UNION ALL
         |  SELECT s.i, s.life_days, s.at_risk, s.n_churn,
         |         r.surv * (1 - s.n_churn::DOUBLE / s.at_risk)
         |  FROM rec r JOIN steps s ON s.i = r.i + 1)
         |SELECT life_days::INT AS life_days, at_risk::BIGINT AS at_risk,
         |  n_churn::BIGINT AS churned, round(surv, 6) AS surv
         |FROM rec""".stripMargin,

    "q_elasticity" ->
      """WITH pts AS (
        |  SELECT p.p_brand, ln(l.l_quantity) AS ly,
        |         ln(l.l_extendedprice / l.l_quantity * (1.0 - l.l_discount)) AS lx
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE l.l_quantity > 0 AND l.l_extendedprice > 0),
        |m AS (SELECT p_brand, count(*) AS n_lines, sum(lx) AS sx, sum(ly) AS sy,
        |        sum(lx * lx) AS sxx, sum(lx * ly) AS sxy, sum(ly * ly) AS syy
        |      FROM pts GROUP BY 1)
        |SELECT p_brand, n_lines,
        |  round((n_lines * sxy - sx * sy) / (n_lines * sxx - sx * sx), 6) AS elasticity,
        |  round((sy - round((n_lines * sxy - sx * sy) / (n_lines * sxx - sx * sx), 6) * sx)
        |    / n_lines, 6) AS intercept,
        |  round(pow(n_lines * sxy - sx * sy, 2)
        |    / ((n_lines * sxx - sx * sx) * (n_lines * syy - sy * sy)), 6) AS r2
        |FROM m""".stripMargin,

    "q_attribution" ->
      """WITH p AS (SELECT user_id, ts AS pts, event_id AS pid FROM events
        |           WHERE event_type = 'purchase'),
        |t AS (SELECT user_id, ts AS tts, event_type AS touch_type, event_id AS tid
        |      FROM events WHERE event_type IN ('view', 'click')),
        |j AS (SELECT p.pid, t.touch_type, t.tts, t.tid
        |      FROM p JOIN t ON p.user_id = t.user_id
        |      WHERE t.tts <= p.pts AND t.tts > p.pts - INTERVAL 7 DAY),
        |r AS (SELECT *,
        |    row_number() OVER (PARTITION BY pid ORDER BY tts, tid) AS rn,
        |    count(*) OVER (PARTITION BY pid) AS m
        |  FROM j),
        |c AS (SELECT touch_type, pid,
        |    CASE WHEN m = 1 THEN 1.0E0 WHEN m = 2 THEN 0.5E0
        |         WHEN rn = 1 OR rn = m THEN 0.4E0
        |         ELSE 0.2E0 / (m - 2) END AS credit
        |  FROM r)
        |SELECT touch_type, count(*)::BIGINT AS n_touches,
        |  count(DISTINCT pid)::BIGINT AS purchases_touched,
        |  round(sum(credit), 6) AS credit
        |FROM c GROUP BY 1""".stripMargin,

    "q_rfm_migration" -> {
      def half(name: String, pred: String): String =
        s"""${name}o AS (SELECT o.* FROM orders o, cut WHERE o.o_orderdate::DATE $pred cut.cut),
           |${name}mx AS (SELECT max(o_orderdate) AS mx FROM ${name}o),
           |${name}c AS (SELECT o_custkey,
           |    date_diff('day', max(o_orderdate)::DATE, max(mx)::DATE)::INT AS recency_days,
           |    count(*) AS frequency
           |  FROM ${name}o, ${name}mx GROUP BY 1),
           |${name}s AS (SELECT o_custkey,
           |    ntile(5) OVER (ORDER BY recency_days DESC, o_custkey) AS r_score,
           |    ntile(5) OVER (ORDER BY frequency, o_custkey) AS f_score
           |  FROM ${name}c),
           |${name}g AS (SELECT o_custkey,
           |    CASE WHEN r_score >= 4 AND f_score >= 4 THEN 'champion'
           |         WHEN r_score >= 4 THEN 'recent'
           |         WHEN f_score >= 4 THEN 'loyal'
           |         WHEN r_score <= 2 AND f_score <= 2 THEN 'at_risk'
           |         ELSE 'regular' END AS segment
           |  FROM ${name}s)""".stripMargin
      s"""WITH cut AS (SELECT make_timestamp(
         |    (epoch_us(min(o_orderdate)::TIMESTAMP) + epoch_us(max(o_orderdate)::TIMESTAMP)) // 2
         |  )::DATE AS cut FROM orders),
         |${half("bef", "<")},
         |${half("aft", ">=")}
         |SELECT b.segment AS segment_then, a.segment AS segment_now,
         |  count(*)::BIGINT AS n_customers
         |FROM befg b JOIN aftg a USING (o_custkey) GROUP BY 1, 2""".stripMargin
    },

    "q_markov_attribution" ->
      """WITH RECURSIVE ev AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS jid
        |  FROM events),
        |st AS (SELECT event_type,
        |    coalesce(lag(event_type) OVER (PARTITION BY user_id, jid ORDER BY ts, event_id),
        |             'start') AS prev,
        |    CASE WHEN event_type = 'purchase' THEN 'conv' ELSE event_type END AS cur,
        |    row_number() OVER (PARTITION BY user_id, jid ORDER BY ts DESC, event_id DESC) AS rd
        |  FROM ev),
        |tr AS (SELECT prev, cur FROM st
        |       UNION ALL
        |       SELECT event_type AS prev, 'null' AS cur FROM st
        |       WHERE rd = 1 AND event_type <> 'purchase'),
        |pairs AS (SELECT prev, cur, count(*) AS c FROM tr GROUP BY 1, 2),
        |states AS (SELECT DISTINCT stt FROM
        |  (SELECT prev AS stt FROM pairs UNION ALL SELECT cur FROM pairs)),
        |idx AS (SELECT stt, row_number() OVER (ORDER BY stt) AS i, count(*) OVER () AS k
        |        FROM states),
        |tot AS (SELECT prev, sum(c) AS ca FROM pairs GROUP BY 1),
        |grid AS (SELECT a.i AS i, b.i AS j,
        |    coalesce(CAST(p.c AS DOUBLE) / CAST(t.ca AS DOUBLE), 0.0) AS pr
        |  FROM idx a CROSS JOIN idx b
        |    LEFT JOIN pairs p ON p.prev = a.stt AND p.cur = b.stt
        |    LEFT JOIN tot t ON t.prev = a.stt),
        |mat AS (SELECT max(i) AS k, list(pr ORDER BY i, j) AS pm FROM grid),
        |ic AS (SELECT max(CASE WHEN stt = 'conv' THEN i END) AS icv,
        |    max(CASE WHEN stt = 'null' THEN i END) AS inl,
        |    max(CASE WHEN stt = 'start' THEN i END) AS ist FROM idx),
        |scen AS (SELECT 0::BIGINT AS rem FROM mat
        |         UNION ALL
        |         SELECT i FROM idx WHERE stt NOT IN ('conv', 'null', 'start')),
        |rec AS (
        |  SELECT s.rem, 0 AS it,
        |    list_transform(range(1, m.k + 1),
        |      x -> CASE WHEN x = c.icv THEN 1.0E0 ELSE 0.0E0 END) AS v,
        |    m.k, m.pm, c.icv, c.inl, c.ist
        |  FROM scen s, mat m, ic c
        |  UNION ALL
        |  SELECT rem, it + 1,
        |    list_transform(range(1, k + 1), i ->
        |      CASE WHEN i = icv THEN 1.0E0
        |           WHEN i = inl OR i = rem THEN 0.0E0
        |           ELSE list_sum(list_transform(range(1, k + 1),
        |                  j -> pm[(i - 1) * k + j] * v[j]))
        |      END),
        |    k, pm, icv, inl, ist
        |  FROM rec WHERE it < 200),
        |fin AS (SELECT rem, v[ist] AS cvr FROM rec WHERE it = 200),
        |re AS (SELECT x.stt AS channel, 1.0 - f.cvr / b.cvr AS re, b.cvr AS base_cvr
        |  FROM fin f JOIN idx x ON x.i = f.rem
        |  CROSS JOIN (SELECT cvr FROM fin WHERE rem = 0) b
        |  WHERE f.rem <> 0),
        |rs AS (SELECT list_sum(list(re ORDER BY channel)) AS s FROM re)
        |SELECT r.channel, round(r.re, 6) AS removal_effect,
        |  round(r.re / t.s, 6) AS attribution, round(r.base_cvr, 6) AS base_cvr
        |FROM re r CROSS JOIN rs t""".stripMargin,

    "q_cohort_ltv" ->
      """WITH o AS (SELECT o_custkey, o_orderdate::DATE AS od, o_totalprice FROM orders),
        |fo AS (SELECT o_custkey, date_trunc('month', min(od))::DATE AS cohort FROM o GROUP BY 1),
        |sz AS (SELECT cohort, count(*) AS n_customers FROM fo GROUP BY 1),
        |aged AS (SELECT f.cohort,
        |    date_diff('month', f.cohort, date_trunc('month', o.od)::DATE) AS age,
        |    round(sum(o.o_totalprice), 6) AS revenue
        |  FROM o JOIN fo f ON o.o_custkey = f.o_custkey
        |  WHERE date_diff('month', f.cohort, date_trunc('month', o.od)::DATE) <= 12
        |  GROUP BY 1, 2)
        |SELECT a.cohort, a.age::INT AS age, s.n_customers::BIGINT AS n_customers, a.revenue,
        |  round(sum(a.revenue) OVER (PARTITION BY a.cohort ORDER BY a.age
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS cum_revenue,
        |  round(round(sum(a.revenue) OVER (PARTITION BY a.cohort ORDER BY a.age
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) / s.n_customers, 6) AS ltv
        |FROM aged a JOIN sz s ON a.cohort = s.cohort""".stripMargin,

    "q_bass_diffusion" ->
      s"""WITH RECURSIVE fo AS (SELECT o_custkey, min(o_orderdate)::DATE AS fd FROM orders GROUP BY 1),
         |ad AS (SELECT r.r_name AS region, date_trunc('month', f.fd)::DATE AS mo
         |       FROM fo f JOIN customer c ON f.o_custkey = c.c_custkey
         |       JOIN nation n ON c.c_nationkey = n.n_nationkey
         |       JOIN region r ON n.n_regionkey = r.r_regionkey),
         |monthly AS (SELECT region, mo, count(*) AS s FROM ad GROUP BY 1, 2),
         |span AS (SELECT min(mo) AS lo, max(mo) AS hi FROM ad),
         |grid AS (SELECT g.region, m.mo
         |         FROM (SELECT DISTINCT region FROM ad) g,
         |              (SELECT unnest(generate_series(lo, hi, INTERVAL 1 MONTH))::DATE AS mo FROM span) m),
         |dense AS (SELECT g.region, g.mo, coalesce(y.s, 0) AS s
         |          FROM grid g LEFT JOIN monthly y ON g.region = y.region AND g.mo = y.mo),
         |rows0 AS (SELECT region, mo, s::DOUBLE AS y,
         |    coalesce(sum(s) OVER (PARTITION BY region ORDER BY mo
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::DOUBLE AS nprev
         |  FROM dense),
         |mats AS (SELECT region AS event_type,
         |    [sum(1.0E0 * 1.0E0) + 1e-8, sum(1.0E0 * nprev), sum(1.0E0 * (nprev * nprev)), sum(1.0E0 * y),
         |     sum(nprev * 1.0E0), sum(nprev * nprev) + 1e-8, sum(nprev * (nprev * nprev)), sum(nprev * y),
         |     sum((nprev * nprev) * 1.0E0), sum((nprev * nprev) * nprev),
         |     sum((nprev * nprev) * (nprev * nprev)) + 1e-8, sum((nprev * nprev) * y)] AS m,
         |    count(*) AS n_months, sum(y) AS n_adopt
         |  FROM rows0 GROUP BY 1),
         |${ModelQueries.gaussJordanSql(3)},
         |bt AS (SELECT event_type, round(b[1], 6) AS ca, round(b[2], 6) AS cb, round(b[3], 6) AS cc
         |       FROM beta),
         |fin AS (SELECT bt.event_type, bt.ca, bt.cb, bt.cc, m2.n_months, m2.n_adopt,
         |          bt.cb * bt.cb - 4.0 * bt.ca * bt.cc AS disc
         |        FROM bt JOIN mats m2 USING (event_type)),
         |fm AS (SELECT *, CASE WHEN cc < 0 AND disc >= 0
         |                      THEN (-cb - sqrt(disc)) / (2.0 * cc) END AS mh FROM fin),
         |fp AS (SELECT *, CASE WHEN mh > 0 THEN ca / mh END AS ph,
         |          CASE WHEN mh > 0 THEN -cc * mh END AS qh FROM fm)
         |SELECT event_type AS region, n_months::BIGINT AS n_months, n_adopt::BIGINT AS n_adopt,
         |  ca AS a, cb AS b, cc AS c,
         |  round(mh, 6) AS m_hat, round(ph, 6) AS p_hat, round(qh, 6) AS q_hat,
         |  round(CASE WHEN ph > 0 AND qh > 0 THEN ln(qh / ph) / (ph + qh) END, 6) AS peak_month
         |FROM fp""".stripMargin,

    "q_leadtime" ->
      """WITH d AS (
        |  SELECT o.o_orderpriority,
        |         date_diff('day', o.o_orderdate::DATE, l.l_shipdate::DATE) AS days
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |cnt AS (SELECT o_orderpriority, days, count(*) AS c FROM d GROUP BY 1, 2),
        |w AS (SELECT *,
        |    sum(c) OVER (PARTITION BY o_orderpriority ORDER BY days
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(c) OVER (PARTITION BY o_orderpriority) AS n,
        |    sum(days * c) OVER (PARTITION BY o_orderpriority) AS dsum
        |  FROM cnt)
        |SELECT o_orderpriority, max(n)::BIGINT AS n_lines,
        |  round(max(dsum)::DOUBLE / max(n), 6) AS mean_days,
        |  min(CASE WHEN cum >= (n - 1) * 50 // 100 + 1 THEN days END)::INT AS p50,
        |  min(CASE WHEN cum >= (n - 1) * 90 // 100 + 1 THEN days END)::INT AS p90,
        |  min(CASE WHEN cum >= (n - 1) * 99 // 100 + 1 THEN days END)::INT AS p99
        |FROM w GROUP BY 1""".stripMargin
  )
}
