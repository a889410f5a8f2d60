package graft.queries

import graft._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Nonparametric / robust hypothesis tests over the event series (the
  * two classics the reference's t-test-centric detectors lack):
  *
  *  - Kruskal-Wallis across the event-type groups: "do the five series
  *    draw hourly volumes from the same distribution?" — ranks carried
  *    as 2×-scaled integers (average-tie ranks are halves), the H
  *    statistic assembled from exact integer rank sums with the 5-term
  *    group sum evaluated as an ORDERED window cumsum (deterministic
  *    accumulation order in both engines), the tie correction from
  *    exact Σ(t³−t), and the upper-tail p via detectors/ChiSq.sf with
  *    df = #groups − 1 derived from the data (closed Horner sum for
  *    even df, fixed-length incomplete-gamma series for odd df — both
  *    replayed step-for-step by the oracle);
  *  - Brown-Forsythe variance-change test per series (first vs second
  *    half): deviations from each half's exact median are snapped to
  *    1e3-scaled BIGINTs, so all moment sums are exact integers; the
  *    pooled-variance t statistic maps through the exact finite-form
  *    Student-t CDF (detectors/Esd.tCdf — any df), replayed by the
  *    oracle's coefficient recursion.
  */
object HypoQueries {
  private val S = TSSchema(keys = Seq("event_type"))
  private val H = Tables.hourlySql
  private val Hc = Tables.hourlyCappedSql // pair-query series budget

  /** Permutation-test resamples. */
  private val PermB = 200

  /** Cross-correlation lag horizon (hours). */
  private val XcLag = 24

  /** Ljung-Box lag count. */
  private val LbLags = 24

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── Friedman test across event types blocked by hour (the
    // repeated-measures companion to q_kruskal): within each balanced
    // block (hours where every series reports) values are ranked across
    // types (tie-safe min+max doubled ranks), Q = 12/(nk(k+1))·ΣR_j² −
    // 3n(k+1) ~ χ²(k−1). Rank sums are INTEGERS (2× avg ranks), the
    // ΣR² pass runs as the q_kruskal ordered cumulative so both engines
    // accumulate in event-type order. ──
    "q_friedman" -> ((s, dir) => {
      val hourly = Tables.hourlyEvents(s, dir).drop("n")
      val kAll = hourly.select(countDistinct("event_type")).collect()(0).getLong(0)
      val full = hourly.groupBy("ts").agg(count(lit(1)).as("kk"))
        .where(col("kk") === kAll).select("ts")
      val h = hourly.join(full, "ts")
      val wv = Window.partitionBy("ts").orderBy(col("value"), col("event_type"))
      val wTies = Window.partitionBy("ts", "value")
      val ranked = h.withColumn("rn", row_number().over(wv))
        .withColumn("r2", (min("rn").over(wTies) + max("rn").over(wTies)).cast("long"))
      val grp = ranked.groupBy("event_type")
        .agg(sum("r2").as("s2"), count(lit(1)).as("nb"))
      val one = substring(col("event_type"), 1, 0)
      val wg = Window.partitionBy(one).orderBy("event_type")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val chi = udf { (x: Double, k: Int) => graft.detectors.ChiSq.sf(x, k) }
      grp
        .withColumn("cum", sum(col("s2").cast("double") * col("s2") / 4.0).over(wg))
        .withColumn("kk", count(lit(1)).over(Window.partitionBy(one)))
        .withColumn("nb1", first("nb").over(Window.partitionBy(one)))
        .withColumn("rk", row_number().over(Window.partitionBy(one).orderBy(col("event_type").desc)))
        .where(col("rk") === 1)
        .withColumn("q", expr("12.0E0 / (nb1 * kk * (kk + 1)) * cum - 3.0E0 * nb1 * (kk + 1)"))
        .withColumn("p", chi(col("q"), (col("kk") - 1).cast("int")))
        .select(col("nb1").as("n_blocks"), col("kk").cast("int").as("k"),
          round(col("q"), 6).as("q_stat"), round(col("p"), 6).as("p_value"),
          when(col("p") < 0.05, 1).otherwise(0).as("significant"))
    }),

    // ── Kruskal-Wallis H across event types on the hourly values. ──
    "q_kruskal" -> ((s, dir) => {
      val base = Tables.hourlyEvents(s, dir).drop("n")
      // zero-length substring of a REAL column: non-foldable, so the
      // constant-partition windows keep a partition spec (a literal folds
      // to an empty spec → single-partition WindowExec warning)
      val one = substring(col("event_type"), 1, 0)
      val wv = Window.partitionBy(one).orderBy(col("value"), col("event_type"), col("ts"))
      val wTies = Window.partitionBy(one, col("value"))
      val ranked = base
        .withColumn("rn", row_number().over(wv))
        .withColumn("r2", (min("rn").over(wTies) + max("rn").over(wTies)).cast("long"))
      val grp = ranked.groupBy("event_type")
        .agg(count(lit(1)).as("ng"), sum("r2").as("s2g"))
      val wg = Window.partitionBy(one).orderBy("event_type")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = grp
        .withColumn("cum", sum(col("s2g") * col("s2g") / (lit(4.0) * col("ng"))).over(wg))
        .withColumn("kk", count(lit(1)).over(Window.partitionBy(one)))
        .withColumn("rk", row_number().over(Window.partitionBy(one).orderBy(col("event_type").desc)))
        .where(col("rk") === 1)
        .select(col("cum").as("ssum"), col("kk"))
      val ties = ranked.groupBy("value").agg(count(lit(1)).as("t"))
        .agg(sum(col("t") * col("t") * col("t") - col("t")).as("tsum"))
      val n = base.agg(count(lit(1)).as("n"))
      // df = #groups − 1, derived from the data (detectors/ChiSq.sf
      // handles any df — no hardwired group-count assumption)
      val chi = udf { (x: Double, k: Int) => graft.detectors.ChiSq.sf(x, k) }
      tot.crossJoin(broadcast(n)).crossJoin(broadcast(ties))
        .withColumn("h",
          lit(12.0) / (col("n") * (col("n") + 1)) * col("ssum") - lit(3.0) * (col("n") + 1))
        .withColumn("c",
          lit(1.0) - col("tsum") / (col("n").cast("double") * col("n") * col("n") - col("n")))
        .withColumn("h_adj", col("h") / col("c"))
        .withColumn("p", chi(col("h_adj"), (col("kk") - 1).cast("int")))
        .select(col("n"), round(col("h"), 6).as("h"), round(col("h_adj"), 6).as("h_adj"),
          round(col("p"), 6).as("p_value"),
          when(col("p") < 0.05, 1).otherwise(0).as("significant"))
    }),

    // ── Brown-Forsythe per series: t-test on |x − median(half)|. ──
    "q_variance_test" -> ((s, dir) => {
      val fn = udf { xs: Seq[Double] =>
        val n = xs.length
        val (a, b) = xs.splitAt(n / 2)
        def med(v: Seq[Double]): Double = {
          val s = v.sorted
          (s((s.length + 1) / 2 - 1) + s(s.length / 2)) / 2.0
        }
        def devs(v: Seq[Double]): Array[Long] = {
          val m = med(v)
          v.map(x => math.round(math.abs(x - m) * 1e3)).toArray
        }
        val (da, db) = (devs(a), devs(b))
        val (n1, n2) = (da.length, db.length)
        var s1 = 0L; da.foreach(s1 += _)
        var s2 = 0L; db.foreach(s2 += _)
        var q1 = 0L; da.foreach(d => q1 += d * d)
        var q2 = 0L; db.foreach(d => q2 += d * d)
        val m1 = s1 / (n1 * 1e3); val m2 = s2 / (n2 * 1e3)
        val ss1 = q1 / 1e6 - n1 * m1 * m1
        val ss2 = q2 / 1e6 - n2 * m2 * m2
        val nu = n1 + n2 - 2
        val sp2 = (ss1 + ss2) / nu
        val t = (m1 - m2) / math.sqrt(sp2 * (1.0 / n1 + 1.0 / n2))
        val p = 2.0 * (1.0 - graft.detectors.Esd.tCdf(math.abs(t), nu))
        (n1, n2, t, p)
      }
      SeriesOps.collect(Tables.hourlyEvents(s, dir).drop("n"), S)
        .withColumn("_r", fn(col("xs")))
        .select(col("event_type"), col("_r._1").as("n1"), col("_r._2").as("n2"),
          round(col("_r._3"), 6).as("t_stat"), round(col("_r._4"), 6).as("p_value"),
          when(col("_r._4") < 0.05, 1).otherwise(0).as("var_changed"))
    }),

    // ── Permutation test for the first-half vs second-half mean shift,
    // fully DISTRIBUTED: permutation b's group assignment is the rank of
    // md5(b‖series‖ts) (hash-as-randomness — reproducible on any engine,
    // no sequential shuffle), so the B=200 resamples are one explode +
    // one aggregation. The statistic compare is the exact integer cross
    // product |s1·n2 − s2·n1| on 1e6-scaled value sums — no float
    // boundary can flip a permutation's verdict. p = (1 + #{perm ≥
    // observed}) / (B + 1), the add-one permutation convention. ──
    "q_perm_test" -> ((s, dir) => {
      val base = Tables.hourlyEvents(s, dir).drop("n")
        .withColumn("iv", round(col("value") * 1e6).cast("long"))
        .withColumn("te", unix_timestamp(col("ts")))
      val wo = Window.partitionBy("event_type").orderBy("ts")
      val obs = base
        .withColumn("rn", row_number().over(wo))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
        .withColumn("grp", when(col("rn") <= col("n") / 2, 1).otherwise(2))
        .groupBy("event_type")
        .agg(sum(when(col("grp") === 1, col("iv"))).as("s1"),
          sum(when(col("grp") === 2, col("iv"))).as("s2"),
          sum(when(col("grp") === 1, 1L).otherwise(0L)).as("n1"),
          sum(when(col("grp") === 2, 1L).otherwise(0L)).as("n2"))
        .withColumn("obs_stat", abs(col("s1") * col("n2") - col("s2") * col("n1")))
      val perms = base.crossJoin(broadcast(
        s.range(1, PermB + 1).select(col("id").cast("int").as("b"))))
        .withColumn("hk", md5(concat_ws("|", col("b"), col("event_type"), col("te"))))
      val wp = Window.partitionBy("event_type", "b").orderBy("hk", "te")
      val permStats = perms
        .withColumn("rn", row_number().over(wp))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type", "b")))
        .withColumn("grp", when(col("rn") <= col("n") / 2, 1).otherwise(2))
        .groupBy("event_type", "b")
        .agg(sum(when(col("grp") === 1, col("iv"))).as("p1"),
          sum(when(col("grp") === 2, col("iv"))).as("p2"),
          sum(when(col("grp") === 1, 1L).otherwise(0L)).as("m1"),
          sum(when(col("grp") === 2, 1L).otherwise(0L)).as("m2"))
      permStats.join(obs, Seq("event_type"))
        .withColumn("ge", when(abs(col("p1") * col("m2") - col("p2") * col("m1")) >= col("obs_stat"), 1L)
          .otherwise(0L))
        .groupBy("event_type", "s1", "s2", "n1", "n2")
        .agg(sum("ge").as("n_ge"))
        .select(col("event_type"),
          round(col("s1") / (col("n1") * 1e6), 6).as("mean_1"),
          round(col("s2") / (col("n2") * 1e6), 6).as("mean_2"),
          col("n_ge"),
          round((col("n_ge") + 1).cast("double") / (PermB + 1), 6).as("p_value"),
          when((col("n_ge") + 1).cast("double") / (PermB + 1) < 0.05, 1).otherwise(0)
            .as("mean_shifted"))
    }),

    // ── Theil-Sen robust slope per series: the exact median of all
    // pairwise slopes (x_j − x_i)/(j − i) and the median-of-residuals
    // intercept — identical double ratio sets on both engines, medians as
    // exact order statistics. The O(n²) pair set is materialized once per
    // series after the one-row reduction (kernel) / as a rn self-join
    // (oracle); the scale axis stays series count. ──
    "q_theil_sen" -> ((s, dir) => {
      val fn = udf { xs: Seq[Double] =>
        val n = xs.length
        val slopes = scala.collection.mutable.ArrayBuffer.empty[Double]
        var i = 0
        while (i < n) {
          var j = i + 1
          while (j < n) { slopes += (xs(j) - xs(i)) / (j - i); j += 1 }
          i += 1
        }
        def med(v: Seq[Double]): Double = {
          val sr = v.sorted
          (sr((sr.length + 1) / 2 - 1) + sr(sr.length / 2)) / 2.0
        }
        val slope = med(slopes.toSeq)
        val icept = med(xs.zipWithIndex.map { case (x, t) => x - slope * t })
        (slope, icept, slopes.length)
      }
      SeriesOps.collect(Tables.hourlyEvents(s, dir).drop("n"), S)
        .withColumn("_r", fn(col("xs")))
        .select(col("event_type"), round(col("_r._1"), 6).as("slope"),
          round(col("_r._2"), 6).as("intercept"), col("_r._3").as("n_pairs"))
    }),

    // ── Lagged cross-correlation between series pairs (the lead-lag EDA
    // complement of q_granger's predictiveness test): for every ordered
    // type pair and lag −24..24 h, Pearson r of (x_a(t), x_b(t+l)) over
    // the dense grid, moments snapped to the 4-dp grid; each pair
    // reports lag 0 and the |r|-argmax lag (rounded-r compare, lag-asc
    // tiebreak). One lag-grid explode + a ts-equality join — 49·C(k,2)
    // aggregation groups, never a per-point cross product. ──
    "q_xcorr" -> ((s, dir) => {
      // spread the dense grid before the ×49 lag expansion: the explode +
      // pair join + partial aggregation fuse into the stage after
      // fillGaps' last (tiny-bytes) exchange, which AQE size-coalesces to
      // ~1 task — measured 25.8 s at 500 series without the r12 global
      // pin vs 5.5 s with it; the REPARTITION_BY_NUM spread restores the
      // pin's effect for exactly this stage (see SeriesOps.spread)
      val dense = SeriesOps.spread(
        TS.fillGaps(Tables.hourlyEventsCapped(s, dir).drop("n"), S, 3600L, Some(0.0)),
        Seq(col("event_type"), col("ts")))
        .withColumn("te", unix_timestamp(col("ts")))
      val lags = s.range(-XcLag, XcLag + 1).select(col("id").cast("int").as("lag"))
      val a = dense.select(col("event_type").as("ea"), col("te"), col("value").as("xa"))
        .crossJoin(broadcast(lags))
        .withColumn("tj", col("te") + col("lag") * 3600L)
      val b = dense.select(col("event_type").as("eb"), col("te").as("tj"), col("value").as("xb"))
      val mo = a.join(b, Seq("tj")).where(col("ea") < col("eb"))
        .groupBy("ea", "eb", "lag")
        .agg(count(lit(1)).as("n"),
          round(sum("xa"), 4).as("sx"), round(sum("xb"), 4).as("sy"),
          round(sum(col("xa") * col("xa")), 4).as("sxx"),
          round(sum(col("xb") * col("xb")), 4).as("syy"),
          round(sum(col("xa") * col("xb")), 4).as("sxy"))
      val r = mo.withColumn("r",
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
            (col("n") * col("syy") - col("sy") * col("sy"))), 6))
      val w = Window.partitionBy("ea", "eb").orderBy(abs(col("r")).desc, col("lag").asc)
      val peak = r.withColumn("rk", row_number().over(w)).where(col("rk") === 1)
        .select(col("ea"), col("eb"), col("lag").as("best_lag"), col("r").as("r_peak"))
      val zero = r.where(col("lag") === 0)
        .select(col("ea"), col("eb"), col("r").as("r_lag0"))
      peak.join(zero, Seq("ea", "eb"))
        .select("ea", "eb", "best_lag", "r_peak", "r_lag0")
    }),

    // ── GPD tail fit over threshold exceedances (peaks-over-threshold,
    // Hosking & Wallis 1987 probability-weighted moments — closed form,
    // no MLE iteration): u = the exact 95th-percentile order statistic,
    // excesses sorted ascending, b0/b1 from 1e6-scaled integer weighted
    // sums (exact), ξ = 2 − b0/(b0−2b1), σ = 2·b0·b1/(b0−2b1), and the
    // one-year return level u + σ/ξ·((λT)^ξ − 1). The tail-risk
    // statement ("what hourly volume do we see once a year") a capacity
    // planner actually asks for. ──
    "q_gpd_tail" -> ((s, dir) => {
      val fn = udf { xs: Seq[Double] =>
        val n = xs.length
        val sorted = xs.sorted
        val u = sorted(n * 19 / 20 - 1)
        val iy = sorted.filter(_ > u).map(y => math.round((y - u) * 1e6))
        val m = iy.length
        var s0 = 0L; iy.foreach(s0 += _)
        // a1 = (1/m)Σ ((m−j)/(m−1))·y_(j), the (1−F)-type PWM the GPD
        // estimators are derived for (Hosking & Wallis 1987 eq. 2.4) —
        // descending weights, NOT the ascending F-type b1
        var s1 = 0L
        var j = 0
        while (j < m) { s1 += (m - 1L - j) * iy(j); j += 1 }
        val b0 = s0 / (m * 1e6)
        val b1 = s1 / ((m - 1.0) * m * 1e6)
        val xi = 2.0 - b0 / (b0 - 2.0 * b1)
        val sg = 2.0 * b0 * b1 / (b0 - 2.0 * b1)
        val lam = m.toDouble / n
        val t = 8760.0
        val rl =
          if (math.abs(xi) < 1e-9) u + sg * math.log(lam * t)
          else u + sg / xi * (math.pow(lam * t, xi) - 1.0)
        (u, m, xi, sg, rl)
      }
      SeriesOps.collect(Tables.hourlyEvents(s, dir).drop("n"), S)
        .withColumn("_r", fn(col("xs")))
        .select(col("event_type"), round(col("_r._1"), 6).as("threshold"),
          col("_r._2").as("n_excess"), round(col("_r._3"), 6).as("xi"),
          round(col("_r._4"), 6).as("sigma"), round(col("_r._5"), 6).as("return_level_1y"))
    }),

    // ── Seasonal Mann-Kendall (Hirsch & Slack 1984): the MK S and
    // variance computed WITHIN each hour-of-day season (so the daily
    // cycle cannot masquerade as trend), summed across seasons, then the
    // usual continuity-corrected z. Exact integer S and tie sums; pair
    // join keyed by (series, season) — C(n_h,2) per season, never the
    // full series square. ──
    "q_mk_seasonal" -> ((s, dir) => {
      val h = Tables.hourlyEvents(s, dir).drop("n").withColumn("hod", hour(col("ts")))
      val a = h.select(col("event_type"), col("hod"), col("ts"), col("value").as("va"))
      val b = h.select(col("event_type"), col("hod"), col("ts").as("ts2"), col("value").as("vb"))
      val sg = a.join(b, Seq("event_type", "hod")).where(col("ts") < col("ts2"))
        .groupBy("event_type")
        .agg(sum(signum(col("vb") - col("va")).cast("long")).as("s"))
      val nv = h.groupBy("event_type", "hod").agg(count(lit(1)).as("nh"))
      val ties = h.groupBy("event_type", "hod", "value").agg(count(lit(1)).as("c"))
        .groupBy("event_type", "hod")
        .agg(sum(col("c") * (col("c") - 1) * (lit(2L) * col("c") + 5)).as("tie_h"))
      val vh = nv.join(ties, Seq("event_type", "hod"), "left")
        .groupBy("event_type")
        .agg(sum(col("nh") * (col("nh") - 1) * (lit(2L) * col("nh") + 5) -
          coalesce(col("tie_h"), lit(0L))).as("var18"),
          sum(col("nh") * (col("nh") - 1)).as("pairs2"))
      sg.join(vh, "event_type")
        .withColumn("var_s", col("var18") / 18.0)
        .withColumn("z",
          when(col("s") > 0, (col("s") - 1) / sqrt(col("var_s")))
            .when(col("s") < 0, (col("s") + 1) / sqrt(col("var_s")))
            .otherwise(lit(0.0)))
        .select(col("event_type"), col("s"),
          round(col("s") / (col("pairs2") / 2.0), 6).as("tau"),
          round(col("var_s"), 6).as("var_s"), round(col("z"), 6).as("z"),
          when(col("z") > 1.96, 1).when(col("z") < -1.96, -1).otherwise(0).as("trend"))
    }),

    // ── Q-Q drift table: the deciles of the series' first and second
    // halves side by side — exact ceiling-rank order statistics (pure
    // integer rank math, no interpolation), the distribution-shift view
    // that says WHERE the two halves differ (complement of the KS
    // sup-statistic and PSI's fixed bins). ──
    "q_qq_drift" -> ((s, dir) => {
      val fn = udf { xs: Array[Double] =>
        val n = xs.length
        val (a, b) = xs.splitAt(n / 2)
        val (sa, sb) = (a.sorted, b.sorted)
        (1 to 9).map { p =>
          val qa = sa((sa.length * p + 9) / 10 - 1)
          val qb = sb((sb.length * p + 9) / 10 - 1)
          (p * 10, qa, qb, qb - qa)
        }.toArray
      }
      SeriesOps.collect(Tables.hourlyEvents(s, dir).drop("n"), S)
        .withColumn("_q", explode(fn(col("xs"))))
        .select(col("event_type"), col("_q._1").as("pct"), col("_q._2").as("q_first"),
          col("_q._3").as("q_second"), round(col("_q._4"), 6).as("q_diff"))
    }),

    // ── Ljung-Box portmanteau test (lags 1..24): is the series white?
    // Q = n(n+2)·Σ ρ_k²/(n−k) from 4-dp-snapped autocovariance moments,
    // the χ²(24) upper tail via a 12-term Horner polynomial (even df —
    // both engines evaluate the identical nesting). The residual-
    // whiteness diagnostic every fitted model should be followed by. ──
    "q_ljung_box" -> ((s, dir) => {
      val fn = udf { xs: Seq[Double] =>
        val n = xs.length
        var sx = 0.0
        xs.foreach(sx += _)
        sx = math.signum(sx) * math.floor(math.abs(sx) * 1e4 + 0.5) / 1e4
        val mu = sx / n
        var den = 0.0
        xs.foreach(x => den += (x - mu) * (x - mu))
        den = math.signum(den) * math.floor(math.abs(den) * 1e4 + 0.5) / 1e4
        var q = 0.0
        var k = 1
        while (k <= LbLags) {
          var num = 0.0
          var t = 0
          while (t + k < n) { num += (xs(t) - mu) * (xs(t + k) - mu); t += 1 }
          num = math.signum(num) * math.floor(math.abs(num) * 1e4 + 0.5) / 1e4
          val rho = num / den
          q = q + rho * rho / (n - k)
          k += 1
        }
        q = n * (n + 2.0) * q
        // chi2(24) upper tail = e^{-h}·Σ_{i=0}^{11} h^i/i!, h = q/2, via
        // the fixed Horner nesting f(i) = 1 + h/(i+1)·f(i+1)
        val h = q / 2.0
        var f = 1.0
        var i = 11
        while (i >= 1) { f = 1.0 + h / i * f; i -= 1 }
        val p = math.exp(-h) * f
        (q, math.min(math.max(p, 0.0), 1.0))
      }
      SeriesOps.collect(Tables.hourlyEvents(s, dir).drop("n"), S)
        .withColumn("_r", fn(col("xs")))
        .select(col("event_type"), round(col("_r._1"), 6).as("q_stat"),
          round(col("_r._2"), 6).as("p_value"),
          when(col("_r._2") < 0.05, 1).otherwise(0).as("autocorrelated"))
    }),

    // ── Wald-Wolfowitz runs test: randomness of the above/below-median
    // sign sequence (ties at the median dropped). Runs, n1, n2 are exact
    // integers; z = (R − μ_R)/σ_R in closed form. ──
    "q_runs_test" -> ((s, dir) => {
      val fn = udf { xs: Seq[Double] =>
        val sr = xs.sorted
        val med = (sr((sr.length + 1) / 2 - 1) + sr(sr.length / 2)) / 2.0
        val signs = xs.filter(_ != med).map(_ > med)
        val n1 = signs.count(identity).toLong
        val n2 = signs.length - n1
        var runs = 1L
        var i = 1
        while (i < signs.length) { if (signs(i) != signs(i - 1)) runs += 1; i += 1 }
        val nn = (n1 + n2).toDouble
        val muR = 2.0 * n1 * n2 / nn + 1.0
        val varR = 2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2) / (nn * nn * (nn - 1.0))
        val z = (runs - muR) / math.sqrt(varR)
        (n1, n2, runs, z)
      }
      SeriesOps.collect(Tables.hourlyEvents(s, dir).drop("n"), S)
        .withColumn("_r", fn(col("xs")))
        .select(col("event_type"), col("_r._1").as("n_above"), col("_r._2").as("n_below"),
          col("_r._3").as("n_runs"), round(col("_r._4"), 6).as("z"),
          when(abs(col("_r._4")) > 1.96, 1).otherwise(0).as("nonrandom"))
    })
  )

  val sql: Map[String, String] = Map(

    "q_friedman" ->
      s"""WITH RECURSIVE hourly AS ($H),
         |full_ts AS (SELECT ts FROM hourly GROUP BY ts
         |  HAVING count(*) = (SELECT count(DISTINCT event_type) FROM hourly)),
         |h AS (SELECT e.* FROM hourly e JOIN full_ts USING (ts)),
         |ranked AS (SELECT event_type, ts, value,
         |    row_number() OVER (PARTITION BY ts ORDER BY value, event_type) AS rn
         |  FROM h),
         |r2t AS (SELECT event_type, value, ts,
         |    (min(rn) OVER (PARTITION BY ts, value) + max(rn) OVER (PARTITION BY ts, value))::BIGINT AS r2
         |  FROM ranked),
         |grp AS (SELECT event_type, sum(r2)::BIGINT AS s2, count(*)::BIGINT AS nb
         |        FROM r2t GROUP BY 1),
         |tot AS (SELECT cum, kk, nb1 FROM (
         |    SELECT sum(s2::DOUBLE * s2 / 4.0)
         |      OVER (ORDER BY event_type ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |      count(*) OVER ()::BIGINT AS kk,
         |      first(nb) OVER ()::BIGINT AS nb1,
         |      row_number() OVER (ORDER BY event_type DESC) AS rk
         |    FROM grp) WHERE rk = 1),
         |st AS (SELECT nb1, kk,
         |    12.0E0 / (nb1 * kk * (kk + 1)) * cum - 3.0E0 * nb1 * (kk + 1) AS q
         |  FROM tot),
         |chsrc AS (SELECT 1 AS gid, q AS x, kk - 1 AS k FROM st),
         |${graft.detectors.ChiSq.sqlReplay("chsrc", Seq("gid"))}
         |SELECT st.nb1 AS n_blocks, st.kk::INT AS k, round(st.q, 6) AS q_stat,
         |  round(f.p, 6) AS p_value,
         |  CASE WHEN f.p < 0.05 THEN 1 ELSE 0 END AS significant
         |FROM st CROSS JOIN (SELECT p FROM chisf) f""".stripMargin,

    "q_kruskal" ->
      s"""WITH RECURSIVE hourly AS ($H),
         |ranked AS (SELECT event_type, value,
         |  row_number() OVER (ORDER BY value, event_type, ts) AS rn
         |  FROM hourly),
         |r2t AS (SELECT event_type, value,
         |  (min(rn) OVER (PARTITION BY value) + max(rn) OVER (PARTITION BY value))::BIGINT AS r2
         |  FROM ranked),
         |grp AS (SELECT event_type, count(*)::BIGINT AS ng, sum(r2)::BIGINT AS s2g
         |        FROM r2t GROUP BY 1),
         |tot AS (SELECT cum AS ssum, kk FROM (
         |          SELECT sum(s2g * s2g / (4.0 * ng))
         |            OVER (ORDER BY event_type ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |            count(*) OVER ()::BIGINT AS kk,
         |            row_number() OVER (ORDER BY event_type DESC) AS rk
         |          FROM grp) WHERE rk = 1),
         |ties AS (SELECT sum(t * t * t - t)::BIGINT AS tsum
         |         FROM (SELECT count(*)::BIGINT AS t FROM hourly GROUP BY value)),
         |nn AS (SELECT count(*)::BIGINT AS n FROM hourly),
         |st AS (SELECT n, ssum, kk,
         |         12.0 / (n * (n + 1)) * ssum - 3.0 * (n + 1) AS h,
         |         1.0 - tsum / (n::DOUBLE * n * n - n) AS c
         |       FROM tot CROSS JOIN nn CROSS JOIN ties),
         |chsrc AS (SELECT 1 AS gid, h / c AS x, kk - 1 AS k FROM st),
         |${graft.detectors.ChiSq.sqlReplay("chsrc", Seq("gid"))}
         |SELECT st.n, round(st.h, 6) AS h, round(st.h / st.c, 6) AS h_adj,
         |  round(f.p, 6) AS p_value,
         |  CASE WHEN f.p < 0.05 THEN 1 ELSE 0 END AS significant
         |FROM st CROSS JOIN (SELECT p FROM chisf) f""".stripMargin,

    "q_variance_test" ->
      s"""WITH RECURSIVE hourly AS ($H),
         |ord AS (SELECT event_type, value,
         |          row_number() OVER (PARTITION BY event_type ORDER BY ts) AS rn,
         |          count(*) OVER (PARTITION BY event_type) AS n
         |        FROM hourly),
         |half AS (SELECT *, CASE WHEN rn <= n // 2 THEN 1 ELSE 2 END AS grp FROM ord),
         |med AS (SELECT event_type, grp,
         |          (srt[(len(srt) + 1) // 2] + srt[len(srt) // 2 + 1]) / 2.0 AS med
         |        FROM (SELECT event_type, grp, list_sort(list(value)) AS srt
         |              FROM half GROUP BY 1, 2)),
         |dv AS (SELECT h.event_type, h.grp,
         |         round(abs(h.value - m.med) * 1e3)::BIGINT AS id
         |       FROM half h JOIN med m ON h.event_type = m.event_type AND h.grp = m.grp),
         |mo AS (SELECT event_type,
         |         sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END)::BIGINT AS n1,
         |         sum(CASE WHEN grp = 2 THEN 1 ELSE 0 END)::BIGINT AS n2,
         |         sum(CASE WHEN grp = 1 THEN id ELSE 0 END)::BIGINT AS s1,
         |         sum(CASE WHEN grp = 2 THEN id ELSE 0 END)::BIGINT AS s2,
         |         sum(CASE WHEN grp = 1 THEN id * id ELSE 0 END)::BIGINT AS q1,
         |         sum(CASE WHEN grp = 2 THEN id * id ELSE 0 END)::BIGINT AS q2
         |       FROM dv GROUP BY 1),
         |tt AS (SELECT event_type, n1, n2, n1 + n2 - 2 AS nu,
         |         (s1 / (n1 * 1e3) - s2 / (n2 * 1e3))
         |           / sqrt((((q1 / 1e6 - n1 * (s1 / (n1 * 1e3)) * (s1 / (n1 * 1e3)))
         |                    + (q2 / 1e6 - n2 * (s2 / (n2 * 1e3)) * (s2 / (n2 * 1e3))))
         |                   / (n1 + n2 - 2)) * (1.0E0 / n1 + 1.0E0 / n2)) AS t
         |       FROM mo),
         |cand AS (SELECT event_type, n1, n2, nu, t, abs(t) AS ta,
         |           abs(t) / sqrt(nu + abs(t) * abs(t)) AS sn,
         |           sqrt(nu::DOUBLE) / sqrt(nu + abs(t) * abs(t)) AS cs
         |         FROM tt),
         |cdf AS (
         |  SELECT event_type, 1 AS j, 1.0::DOUBLE AS term, 1.0::DOUBLE AS acc,
         |         CASE WHEN nu % 2 = 0 THEN nu // 2 - 1 ELSE (nu - 3) // 2 END AS jmax
         |  FROM cand
         |  UNION ALL
         |  SELECT r.event_type, r.j + 1,
         |    CASE WHEN c.nu % 2 = 0 THEN r.term * (c.cs * c.cs) * (2.0 * r.j - 1) / (2.0 * r.j)
         |         ELSE r.term * (c.cs * c.cs) * (2.0 * r.j) / (2.0 * r.j + 1) END,
         |    r.acc + CASE WHEN c.nu % 2 = 0 THEN r.term * (c.cs * c.cs) * (2.0 * r.j - 1) / (2.0 * r.j)
         |         ELSE r.term * (c.cs * c.cs) * (2.0 * r.j) / (2.0 * r.j + 1) END,
         |    r.jmax
         |  FROM cdf r JOIN cand c ON r.event_type = c.event_type
         |  WHERE r.j <= r.jmax),
         |accs AS (SELECT event_type, max_by(acc, j) AS acc FROM cdf GROUP BY 1),
         |pv AS (SELECT c.event_type, c.n1, c.n2, c.t,
         |         2.0E0 * (1.0E0 - (
         |           CASE WHEN c.nu = 1 THEN 0.5 + atan(c.ta / sqrt(c.nu::DOUBLE)) / pi()
         |                WHEN c.nu % 2 = 0 THEN 0.5 + (c.sn / 2) * a.acc
         |                ELSE 0.5 + (atan(c.ta / sqrt(c.nu::DOUBLE)) + c.sn * c.cs * a.acc) / pi()
         |           END)) AS p
         |       FROM cand c LEFT JOIN accs a ON c.event_type = a.event_type)
         |SELECT event_type, n1::INT AS n1, n2::INT AS n2, round(t, 6) AS t_stat,
         |  round(p, 6) AS p_value, CASE WHEN p < 0.05 THEN 1 ELSE 0 END AS var_changed
         |FROM pv""".stripMargin,

    "q_perm_test" ->
      s"""WITH hourly AS ($H),
         |iv AS (SELECT event_type, ts, epoch(ts)::BIGINT AS te,
         |         round(value * 1e6)::BIGINT AS iv,
         |         row_number() OVER (PARTITION BY event_type ORDER BY ts) AS rn,
         |         count(*) OVER (PARTITION BY event_type) AS n
         |       FROM hourly),
         |obs AS (SELECT event_type,
         |          sum(CASE WHEN rn <= n // 2 THEN iv END)::BIGINT AS s1,
         |          sum(CASE WHEN rn > n // 2 THEN iv END)::BIGINT AS s2,
         |          sum(CASE WHEN rn <= n // 2 THEN 1 ELSE 0 END)::BIGINT AS n1,
         |          sum(CASE WHEN rn > n // 2 THEN 1 ELSE 0 END)::BIGINT AS n2
         |        FROM iv GROUP BY 1),
         |perms AS (SELECT i.event_type, i.iv, i.te, b.b,
         |            md5(b.b::VARCHAR || '|' || i.event_type || '|' || i.te::VARCHAR) AS hk
         |          FROM iv i CROSS JOIN (SELECT unnest(range(1, $PermB + 1))::INT AS b) b),
         |pr AS (SELECT event_type, b, iv,
         |         row_number() OVER (PARTITION BY event_type, b ORDER BY hk, te) AS rn,
         |         count(*) OVER (PARTITION BY event_type, b) AS n
         |       FROM perms),
         |ps AS (SELECT event_type, b,
         |         sum(CASE WHEN rn <= n // 2 THEN iv END)::BIGINT AS p1,
         |         sum(CASE WHEN rn > n // 2 THEN iv END)::BIGINT AS p2,
         |         sum(CASE WHEN rn <= n // 2 THEN 1 ELSE 0 END)::BIGINT AS m1,
         |         sum(CASE WHEN rn > n // 2 THEN 1 ELSE 0 END)::BIGINT AS m2
         |       FROM pr GROUP BY 1, 2),
         |agg AS (SELECT p.event_type, o.s1, o.s2, o.n1, o.n2,
         |          sum(CASE WHEN abs(p.p1 * p.m2 - p.p2 * p.m1)
         |                    >= abs(o.s1 * o.n2 - o.s2 * o.n1) THEN 1 ELSE 0 END)::BIGINT AS n_ge
         |        FROM ps p JOIN obs o ON p.event_type = o.event_type
         |        GROUP BY 1, 2, 3, 4, 5)
         |SELECT event_type,
         |  round(s1 / (n1 * 1e6), 6) AS mean_1,
         |  round(s2 / (n2 * 1e6), 6) AS mean_2,
         |  n_ge,
         |  round((n_ge + 1)::DOUBLE / ($PermB + 1), 6) AS p_value,
         |  CASE WHEN (n_ge + 1)::DOUBLE / ($PermB + 1) < 0.05 THEN 1 ELSE 0 END AS mean_shifted
         |FROM agg""".stripMargin,

    "q_theil_sen" ->
      s"""WITH hourly AS ($H),
         |ord AS (SELECT event_type, value,
         |          (row_number() OVER (PARTITION BY event_type ORDER BY ts) - 1)::BIGINT AS t
         |        FROM hourly),
         |sl AS (SELECT a.event_type, (b.value - a.value) / (b.t - a.t) AS slope
         |       FROM ord a JOIN ord b ON a.event_type = b.event_type AND a.t < b.t),
         |sm AS (SELECT event_type, list_sort(list(slope)) AS srt, count(*)::INT AS n_pairs
         |       FROM sl GROUP BY 1),
         |slope AS (SELECT event_type, n_pairs,
         |            (srt[(len(srt) + 1) // 2] + srt[len(srt) // 2 + 1]) / 2.0 AS slope
         |          FROM sm),
         |res AS (SELECT o.event_type, s.slope, s.n_pairs, o.value - s.slope * o.t AS r
         |        FROM ord o JOIN slope s ON o.event_type = s.event_type),
         |ic AS (SELECT event_type, list_sort(list(r)) AS srt, max(slope) AS slope,
         |         max(n_pairs) AS n_pairs
         |       FROM res GROUP BY 1)
         |SELECT event_type, round(slope, 6) AS slope,
         |  round((srt[(len(srt) + 1) // 2] + srt[len(srt) // 2 + 1]) / 2.0, 6) AS intercept,
         |  n_pairs
         |FROM ic""".stripMargin,

    "q_xcorr" ->
      s"""WITH hourly AS ($Hc),
         |${Tables.denseHourlySql},
         |dx AS (SELECT event_type, epoch(ts)::BIGINT AS te, value FROM dense),
         |la AS (SELECT d.event_type AS ea, d.te, d.value AS xa, l.lag,
         |         d.te + l.lag * 3600 AS tj
         |       FROM dx d CROSS JOIN (SELECT unnest(range(-$XcLag, $XcLag + 1))::INT AS lag) l),
         |mo AS (SELECT a.ea, b.event_type AS eb, a.lag,
         |         count(*)::BIGINT AS n,
         |         round(sum(a.xa), 4) AS sx, round(sum(b.value), 4) AS sy,
         |         round(sum(a.xa * a.xa), 4) AS sxx,
         |         round(sum(b.value * b.value), 4) AS syy,
         |         round(sum(a.xa * b.value), 4) AS sxy
         |       FROM la a JOIN dx b ON a.tj = b.te AND a.ea < b.event_type
         |       GROUP BY 1, 2, 3),
         |r AS (SELECT ea, eb, lag,
         |        round((n * sxy - sx * sy) /
         |          sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r
         |      FROM mo),
         |pk AS (SELECT ea, eb, lag AS best_lag, r AS r_peak FROM (
         |         SELECT *, row_number() OVER (PARTITION BY ea, eb ORDER BY abs(r) DESC, lag ASC) AS rk
         |         FROM r) WHERE rk = 1),
         |z AS (SELECT ea, eb, r AS r_lag0 FROM r WHERE lag = 0)
         |SELECT p.ea, p.eb, p.best_lag, p.r_peak, z.r_lag0
         |FROM pk p JOIN z ON p.ea = z.ea AND p.eb = z.eb""".stripMargin,

    "q_gpd_tail" ->
      s"""WITH hourly AS ($H),
         |ser AS (SELECT event_type, list_sort(list(value)) AS srt, count(*)::BIGINT AS n
         |        FROM hourly GROUP BY 1),
         |th AS (SELECT event_type, n, srt[(n * 19 // 20)::INT] AS u, srt FROM ser),
         |ex AS (SELECT event_type, n, u,
         |         list_transform(list_filter(srt, y -> y > u),
         |                        y -> round((y - u) * 1e6)::BIGINT) AS iy
         |       FROM th),
         |exr AS (SELECT event_type, n, u, len(iy)::BIGINT AS m,
         |          unnest(iy) AS y, generate_subscripts(iy, 1) AS j
         |        FROM ex),
         |mo AS (SELECT event_type, max(n) AS n, max(u) AS u, max(m) AS m,
         |         sum(y)::BIGINT AS s0, sum((m - j) * y)::BIGINT AS s1
         |       FROM exr GROUP BY 1),
         |pw AS (SELECT event_type, n, u, m,
         |         s0 / (m * 1e6) AS b0,
         |         s1 / ((m - 1.0E0) * m * 1e6) AS b1,
         |         m::DOUBLE / n AS lam
         |       FROM mo),
         |par AS (SELECT event_type, n, u, m, lam,
         |          2.0E0 - b0 / (b0 - 2.0E0 * b1) AS xi,
         |          2.0E0 * b0 * b1 / (b0 - 2.0E0 * b1) AS sg
         |        FROM pw)
         |SELECT event_type, round(u, 6) AS threshold, m::INT AS n_excess,
         |  round(xi, 6) AS xi, round(sg, 6) AS sigma,
         |  round(CASE WHEN abs(xi) < 1e-9 THEN u + sg * ln(lam * 8760.0E0)
         |             ELSE u + sg / xi * (pow(lam * 8760.0E0, xi) - 1.0E0) END, 6)
         |    AS return_level_1y
         |FROM par""".stripMargin,

    "q_mk_seasonal" ->
      s"""WITH hourly AS ($H),
         |hh AS (SELECT event_type, extract(hour FROM ts)::INT AS hod, ts, value FROM hourly),
         |p AS (SELECT a.event_type, sign(b.value - a.value)::BIGINT AS sg
         |      FROM hh a JOIN hh b ON a.event_type = b.event_type AND a.hod = b.hod AND a.ts < b.ts),
         |sgg AS (SELECT event_type, sum(sg)::BIGINT AS s FROM p GROUP BY 1),
         |nv AS (SELECT event_type, hod, count(*)::BIGINT AS nh FROM hh GROUP BY 1, 2),
         |ties AS (SELECT event_type, hod, sum(c * (c - 1) * (2 * c + 5))::BIGINT AS tie_h
         |         FROM (SELECT event_type, hod, value, count(*)::BIGINT AS c
         |               FROM hh GROUP BY 1, 2, 3) GROUP BY 1, 2),
         |vh AS (SELECT n.event_type,
         |         sum(n.nh * (n.nh - 1) * (2 * n.nh + 5) - coalesce(t.tie_h, 0))::BIGINT AS var18,
         |         sum(n.nh * (n.nh - 1))::BIGINT AS pairs2
         |       FROM nv n LEFT JOIN ties t ON n.event_type = t.event_type AND n.hod = t.hod
         |       GROUP BY 1),
         |st AS (SELECT g.event_type, g.s, v.var18 / 18.0 AS var_s, v.pairs2 FROM sgg g
         |       JOIN vh v ON g.event_type = v.event_type)
         |SELECT event_type, s,
         |  round(s / (pairs2 / 2.0), 6) AS tau,
         |  round(var_s, 6) AS var_s,
         |  round(CASE WHEN s > 0 THEN (s - 1) / sqrt(var_s)
         |             WHEN s < 0 THEN (s + 1) / sqrt(var_s) ELSE 0.0 END, 6) AS z,
         |  CASE WHEN (CASE WHEN s > 0 THEN (s - 1) / sqrt(var_s)
         |                  WHEN s < 0 THEN (s + 1) / sqrt(var_s) ELSE 0.0 END) > 1.96 THEN 1
         |       WHEN (CASE WHEN s > 0 THEN (s - 1) / sqrt(var_s)
         |                  WHEN s < 0 THEN (s + 1) / sqrt(var_s) ELSE 0.0 END) < -1.96 THEN -1
         |       ELSE 0 END AS trend
         |FROM st""".stripMargin,

    "q_qq_drift" ->
      s"""WITH hourly AS ($H),
         |ord AS (SELECT event_type, value,
         |          row_number() OVER (PARTITION BY event_type ORDER BY ts) AS rn,
         |          count(*) OVER (PARTITION BY event_type) AS n
         |        FROM hourly),
         |halves AS (SELECT event_type,
         |             list_sort(list(value) FILTER (WHERE rn <= n // 2)) AS sa,
         |             list_sort(list(value) FILTER (WHERE rn > n // 2)) AS sb
         |           FROM ord GROUP BY 1),
         |qq AS (SELECT event_type, p * 10 AS pct,
         |         sa[(len(sa) * p + 9) // 10] AS q_first,
         |         sb[(len(sb) * p + 9) // 10] AS q_second
         |       FROM halves CROSS JOIN (SELECT unnest(range(1, 10))::INT AS p))
         |SELECT event_type, pct, q_first, q_second,
         |  round(q_second - q_first, 6) AS q_diff
         |FROM qq""".stripMargin,

    "q_ljung_box" -> {
      // Σ_{i=0}^{11} h^i/i! via the kernel's exact Horner nesting
      val horner = (1 to 11).foldRight("1.0E0") { (i, acc) => s"1.0E0 + h / $i * ($acc)" }
      s"""WITH hourly AS ($H),
         |ord AS (SELECT event_type, value,
         |          row_number() OVER (PARTITION BY event_type ORDER BY ts) AS rn,
         |          count(*) OVER (PARTITION BY event_type) AS n
         |        FROM hourly),
         |mu AS (SELECT event_type, round(sum(value), 4) / max(n) AS mu, max(n) AS n
         |       FROM ord GROUP BY 1),
         |dn AS (SELECT o.event_type,
         |         round(sum((o.value - m.mu) * (o.value - m.mu)), 4) AS den
         |       FROM ord o JOIN mu m ON o.event_type = m.event_type GROUP BY 1),
         |nums AS (SELECT a.event_type, k.k,
         |           round(sum((a.value - m.mu) * (b.value - m.mu)), 4) AS num
         |         FROM ord a
         |         CROSS JOIN (SELECT unnest(range(1, $LbLags + 1))::INT AS k) k
         |         JOIN ord b ON b.event_type = a.event_type AND b.rn = a.rn + k.k
         |         JOIN mu m ON a.event_type = m.event_type
         |         GROUP BY 1, 2),
         |acc AS (SELECT n.event_type, n.k,
         |          sum((n.num / d.den) * (n.num / d.den) / (m.n - n.k))
         |            OVER (PARTITION BY n.event_type ORDER BY n.k
         |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |        FROM nums n JOIN dn d ON n.event_type = d.event_type
         |        JOIN mu m ON n.event_type = m.event_type),
         |qs AS (SELECT a.event_type, m.n * (m.n + 2.0E0) * a.cum AS q
         |       FROM acc a JOIN mu m ON a.event_type = m.event_type
         |       WHERE a.k = $LbLags),
         |pv AS (SELECT event_type, q,
         |         least(greatest(exp(-h) * ($horner), 0.0E0), 1.0E0) AS p
         |       FROM (SELECT event_type, q, q / 2.0E0 AS h FROM qs))
         |SELECT event_type, round(q, 6) AS q_stat, round(p, 6) AS p_value,
         |  CASE WHEN p < 0.05 THEN 1 ELSE 0 END AS autocorrelated
         |FROM pv""".stripMargin
    },

    "q_runs_test" ->
      s"""WITH hourly AS ($H),
         |med AS (SELECT event_type,
         |          (srt[(len(srt) + 1) // 2] + srt[len(srt) // 2 + 1]) / 2.0 AS med
         |        FROM (SELECT event_type, list_sort(list(value)) AS srt FROM hourly GROUP BY 1)),
         |sg AS (SELECT h.event_type, h.ts, CASE WHEN h.value > m.med THEN 1 ELSE 0 END AS s
         |       FROM hourly h JOIN med m ON h.event_type = m.event_type
         |       WHERE h.value <> m.med),
         |rr AS (SELECT event_type, s,
         |         lag(s) OVER (PARTITION BY event_type ORDER BY ts) AS ps
         |       FROM sg),
         |st AS (SELECT event_type,
         |         sum(s)::BIGINT AS n1,
         |         (count(*) - sum(s))::BIGINT AS n2,
         |         (1 + sum(CASE WHEN ps IS NOT NULL AND s <> ps THEN 1 ELSE 0 END))::BIGINT AS runs
         |       FROM rr GROUP BY 1),
         |zz AS (SELECT event_type, n1, n2, runs,
         |         (runs - (2.0E0 * n1 * n2 / (n1 + n2)::DOUBLE + 1.0E0))
         |           / sqrt(2.0E0 * n1 * n2 * (2.0E0 * n1 * n2 - n1 - n2)
         |                  / ((n1 + n2)::DOUBLE * (n1 + n2)::DOUBLE * ((n1 + n2)::DOUBLE - 1.0E0))) AS z
         |       FROM st)
         |SELECT event_type, n1 AS n_above, n2 AS n_below, runs AS n_runs,
         |  round(z, 6) AS z, CASE WHEN abs(z) > 1.96 THEN 1 ELSE 0 END AS nonrandom
         |FROM zz""".stripMargin
  )
}
