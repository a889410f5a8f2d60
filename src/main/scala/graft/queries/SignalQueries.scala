package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Cross-series signal analytics over the hourly event panel:
  *
  *  - `q_market_beta` — CAPM-style exposure: per series, OLS of its
  *    hourly changes on the EX-OWN market change (sum of the other
  *    series — excluding self kills the mechanical own-correlation);
  *    emits beta / alpha / r². One hour-keyed market aggregate joined
  *    back + one moment aggregate per series.
  *  - `q_mutual_info` — pairwise mutual information between the series'
  *    hourly up/down directions (2×2 contingency from integer counts —
  *    every probability is a ratio of integers, so both engines derive
  *    identical doubles); emits MI and the √(H_a·H_b)-normalized NMI.
  *    Pair count is #series², never row-scale.
  *  - `q_peak_detect` — local-maximum peak detection: strict max over a
  *    ±3-hour window AND above the per-series mean + 1.5σ moment
  *    threshold (snapped at 6 dp) — the alerting primitive next to
  *    q_anomaly_window. One series-keyed window pass.
  *  - `q_calendar_lift` — day-of-week seasonality lift per series:
  *    dow_mean / overall_mean with a Welch z for "is this weekday
  *    different" (the DOW complement of q_hourly_ratio). Two
  *    aggregates, #series×7 output rows.
  */
object SignalQueries {

  private val H = Tables.hourlySql
  private val Hc = Tables.hourlyCappedSql // pair-query series budget

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q_market_beta" -> ((s, dir) => {
      val hourly = Tables.hourlyEvents(s, dir).drop("n")
      val mkt = hourly.groupBy("ts").agg(round(sum("value"), 6).as("mtot"))
      val w = Window.partitionBy("event_type").orderBy("ts")
      val base = hourly.join(mkt, "ts")
        .withColumn("mx", round(col("mtot") - col("value"), 6))
        .withColumn("dy", col("value") - lag("value", 1).over(w))
        .withColumn("dx", col("mx") - lag("mx", 1).over(w))
        .where(col("dx").isNotNull)
      base.groupBy("event_type").agg(
        count(lit(1)).cast("double").as("n"),
        round(sum("dx"), 2).as("sx"), round(sum("dy"), 2).as("sy"),
        round(sum(col("dx") * col("dx")), 2).as("sxx"),
        round(sum(col("dy") * col("dy")), 2).as("syy"),
        round(sum(col("dx") * col("dy")), 2).as("sxy"))
        .withColumn("beta",
          round(expr("(n * sxy - sx * sy) / (n * sxx - sx * sx)"), 6))
        .withColumn("alpha", round(expr("(sy - beta * sx) / n"), 6))
        .withColumn("r2", round(expr(
          "((n * sxy - sx * sy) * (n * sxy - sx * sy)) / ((n * sxx - sx * sx) * (n * syy - sy * sy))"), 6))
        .select(col("event_type"), col("n").cast("long").as("n_obs"),
          col("beta"), col("alpha"), col("r2"))
    }),

    // Time-varying exposure: 7-day (168 h) rolling OLS beta of each
    // series' changes on the ex-own market change, sampled daily (every
    // 24th full window) — drifting beta is itself a regime signal. The
    // rolling moments are sliding ROWS frames; beta is a ratio of
    // centered moments so the engines' ulp-level sliding-sum differences
    // vanish at the 6-dp output grid.
    "q_rolling_beta" -> ((s, dir) => {
      val hourly = Tables.hourlyEvents(s, dir).drop("n")
      val mkt = hourly.groupBy("ts").agg(round(sum("value"), 6).as("mtot"))
      val w = Window.partitionBy("event_type").orderBy("ts")
      val base = hourly.join(mkt, "ts")
        .withColumn("mx", round(col("mtot") - col("value"), 6))
        .withColumn("dy", col("value") - lag("value", 1).over(w))
        .withColumn("dx", col("mx") - lag("mx", 1).over(w))
        .where(col("dx").isNotNull)
      val win = Window.partitionBy("event_type").orderBy("ts").rowsBetween(-167, 0)
      base
        .withColumn("rn", row_number().over(w))
        .withColumn("nw", count(lit(1)).over(win))
        .withColumn("sx", sum("dx").over(win))
        .withColumn("sy", sum("dy").over(win))
        .withColumn("sxx", sum(col("dx") * col("dx")).over(win))
        .withColumn("sxy", sum(col("dx") * col("dy")).over(win))
        .where(col("nw") === 168 && col("rn") % 24 === lit(0))
        .withColumn("beta", expr("(nw * sxy - sx * sy) / (nw * sxx - sx * sx)"))
        .select(col("event_type"), unix_timestamp(col("ts")).as("ts_s"),
          round(col("beta"), 6).as("beta"))
    }),

    "q_mutual_info" -> ((s, dir) => {
      val w = Window.partitionBy("event_type").orderBy("ts")
      val dirs = Tables.hourlyEventsCapped(s, dir).drop("n")
        .withColumn("d", (col("value") > lag("value", 1).over(w)).cast("int"))
        .where(col("d").isNotNull)
        .select(col("event_type"), col("ts"), col("d"))
      val a = dirs.select(col("event_type").as("ta"), col("ts"), col("d").as("da"))
      val b = dirs.select(col("event_type").as("tb"), col("ts"), col("d").as("db"))
      val cells = a.join(b, "ts").where(col("ta") < col("tb"))
        .groupBy("ta", "tb", "da", "db").agg(count(lit(1)).as("c"))
      // integer-count MI: every p is a ratio of BIGINTs — identical
      // doubles on both engines, no snapping needed
      val wp = Window.partitionBy("ta", "tb")
      val wa = Window.partitionBy("ta", "tb", "da")
      val wb = Window.partitionBy("ta", "tb", "db")
      cells
        .withColumn("nn", sum("c").over(wp))
        .withColumn("ca", sum("c").over(wa))
        .withColumn("cb", sum("c").over(wb))
        .withColumn("term", (col("c").cast("double") / col("nn")) *
          log((col("c").cast("double") * col("nn")) / (col("ca").cast("double") * col("cb"))))
        // entropies summed per CELL — Σ_cells (c/nn)·ln(nn/ca) telescopes to
        // Σ_da (ca/nn)·ln(nn/ca) = H(a) without a representative-cell pick
        // that would break if a contingency cell were empty
        .withColumn("ha_t", (col("c").cast("double") / col("nn")) *
          log(col("nn").cast("double") / col("ca")))
        .withColumn("hb_t", (col("c").cast("double") / col("nn")) *
          log(col("nn").cast("double") / col("cb")))
        .groupBy("ta", "tb").agg(
          first("nn").as("n"),
          sum("term").as("mi"),
          sum("ha_t").as("ha"), sum("hb_t").as("hb"))
        .select(col("ta"), col("tb"), col("n").as("n_obs"),
          round(col("mi"), 6).as("mi"),
          round(col("mi") / sqrt(col("ha") * col("hb")), 6).as("nmi"))
    }),

    "q_peak_detect" -> ((s, dir) => {
      val hourly = Tables.hourlyEvents(s, dir).drop("n")
      val w = Window.partitionBy("event_type").orderBy("ts")
      val wp = Window.partitionBy("event_type")
      val win = Window.partitionBy("event_type").orderBy("ts").rowsBetween(-3, 3)
      val thr = hourly
        .withColumn("mu", avg("value").over(wp))
        .withColumn("sd", stddev_samp("value").over(wp))
        .withColumn("thr", round(col("mu") + lit(1.5) * col("sd"), 6))
      thr
        .withColumn("wmax", max("value").over(win))
        .withColumn("nwin", count(lit(1)).over(win))
        .withColumn("prevv", lag("value", 1).over(w))
        .where(col("value") === col("wmax") && col("value") >= col("thr") &&
          col("nwin") === 7 &&
          (col("prevv").isNull || col("value") > col("prevv")))
        .select(col("event_type"), unix_timestamp(col("ts")).as("ts_s"),
          col("value"), col("thr").as("threshold"))
    }),

    // ── Welch-averaged cross-spectral coherence + phase lag per series
    // pair at the {6,12,24}h cycles: 72-hour segments (an exact multiple
    // of every candidate period, so per-segment phases are commensurate),
    // per-segment DFT coefficients from 4-dp-snapped trig sums, coherence
    // = |ΣXY*|²/(Σ|X|²·Σ|Y|²) ∈ [0,1] and the phase converted to a lag in
    // hours — WHO LEADS WHOM at the daily cycle, the frequency-domain
    // companion to q_xcorr's time-domain peak lag. Pair rows are the
    // common aligned hours (key-equality join on ts); segment count and
    // pair count are span/series bounded. ──
    "q_coherence" -> ((s, dir) => {
      import s.implicits._
      val SegLen = 72
      val hourly = graft.TS.fillGaps(Tables.hourlyEventsCapped(s, dir).drop("n"),
        graft.TSSchema(keys = Seq("event_type")), 3600L, Some(0.0))
      val mu = hourly.groupBy("event_type").agg(
        (round(sum("value"), 4) / count(lit(1))).as("mu"))
      val a = hourly.join(broadcast(mu), "event_type")
        .select(col("event_type").as("ta"), col("ts"), (col("value") - col("mu")).as("xa"))
      val b = hourly.join(broadcast(mu), "event_type")
        .select(col("event_type").as("tb"), col("ts"), (col("value") - col("mu")).as("xb"))
      val wP = Window.partitionBy("ta", "tb").orderBy("ts")
      val pr = a.join(b, "ts").where(col("ta") < col("tb"))
        .withColumn("rn", row_number().over(wP))
        .withColumn("g", expr(s"(rn - 1) DIV $SegLen"))
        .withColumn("trel", ((col("rn") - 1) % SegLen) + 1)
      val periods = Seq(6.0, 12.0, 24.0).toDF("p")
      val seg = pr.crossJoin(broadcast(periods))
        .withColumn("w", expr("2.0E0 * pi() / p"))
        .groupBy("ta", "tb", "g", "p").agg(
          count(lit(1)).as("cnt"),
          round(sum(expr("xa * cos(w * trel)")), 4).as("rex"),
          round(sum(expr("xa * sin(w * trel)")), 4).as("imx"),
          round(sum(expr("xb * cos(w * trel)")), 4).as("rey"),
          round(sum(expr("xb * sin(w * trel)")), 4).as("imy"))
        .where(col("cnt") === SegLen)
      seg.groupBy("ta", "tb", "p").agg(
        count(lit(1)).as("n_segments"),
        round(sum(expr("rex * rey + imx * imy")), 4).as("cre"),
        round(sum(expr("imx * rey - rex * imy")), 4).as("cim"),
        round(sum(expr("rex * rex + imx * imx")), 4).as("sxx"),
        round(sum(expr("rey * rey + imy * imy")), 4).as("syy"))
        .withColumn("coh", expr("(cre * cre + cim * cim) / (sxx * syy)"))
        .withColumn("phase", expr("atan2(cim, cre)"))
        .select(col("ta"), col("tb"), col("p").cast("int").as("period_h"),
          col("n_segments"), round(col("coh"), 6).as("coherence"),
          round(col("phase"), 6).as("phase_rad"),
          round(expr("phase / (2.0E0 * pi()) * p"), 6).as("lag_hours"))
    }),

    "q_calendar_lift" -> ((s, dir) => {
      val hourly = Tables.hourlyEvents(s, dir).drop("n")
        .withColumn("dow", (dayofweek(col("ts")) + 5) % 7)
      val wp = Window.partitionBy("event_type")
      // means from 4-dp-snapped sums: a raw avg() differs across engines
      // at ~1e-11, enough to flip a 6-dp rounding boundary
      val d = hourly.groupBy("event_type", "dow").agg(
        count(lit(1)).as("nd"),
        (round(sum("value"), 4) / count(lit(1))).as("md"), var_samp("value").as("vd"))
      val o = hourly.groupBy("event_type").agg(
        count(lit(1)).as("no"),
        (round(sum("value"), 4) / count(lit(1))).as("mo"), var_samp("value").as("vo"))
      d.join(broadcast(o), "event_type")
        .withColumn("lift", round(col("md") / col("mo"), 6))
        .withColumn("z", round((col("md") - col("mo")) /
          sqrt(col("vd") / col("nd") + col("vo") / col("no")), 6))
        .select(col("event_type"), col("dow").cast("int").as("dow"), col("nd").as("n_hours"),
          round(col("md"), 6).as("dow_mean"), col("lift"), col("z"))
    })
  )

  val sql: Map[String, String] = Map(

    "q_market_beta" ->
      s"""WITH hourly AS ($H),
         |mkt AS (SELECT ts, round(sum(value), 6) AS mtot FROM hourly GROUP BY 1),
         |j AS (SELECT h.event_type, h.ts, h.value,
         |        round(m.mtot - h.value, 6) AS mx
         |      FROM hourly h JOIN mkt m USING (ts)),
         |lg AS (SELECT event_type,
         |        value - lag(value, 1) OVER w AS dy,
         |        mx - lag(mx, 1) OVER w AS dx
         |      FROM j WINDOW w AS (PARTITION BY event_type ORDER BY ts)),
         |mom AS (SELECT event_type, count(*)::DOUBLE AS n,
         |    round(sum(dx), 2) AS sx, round(sum(dy), 2) AS sy,
         |    round(sum(dx * dx), 2) AS sxx, round(sum(dy * dy), 2) AS syy,
         |    round(sum(dx * dy), 2) AS sxy
         |  FROM lg WHERE dx IS NOT NULL GROUP BY 1),
         |bb AS (SELECT *, round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS beta FROM mom)
         |SELECT event_type, n::BIGINT AS n_obs, beta,
         |  round((sy - beta * sx) / n, 6) AS alpha,
         |  round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
         |    / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
         |FROM bb""".stripMargin,

    "q_rolling_beta" ->
      s"""WITH hourly AS ($H),
         |mkt AS (SELECT ts, round(sum(value), 6) AS mtot FROM hourly GROUP BY 1),
         |j AS (SELECT h.event_type, h.ts, h.value,
         |        round(m.mtot - h.value, 6) AS mx
         |      FROM hourly h JOIN mkt m USING (ts)),
         |lg AS (SELECT event_type, ts,
         |        value - lag(value, 1) OVER w AS dy,
         |        mx - lag(mx, 1) OVER w AS dx
         |      FROM j WINDOW w AS (PARTITION BY event_type ORDER BY ts)),
         |b AS (SELECT event_type, ts, dx, dy FROM lg WHERE dx IS NOT NULL),
         |wn AS (SELECT event_type, ts,
         |    row_number() OVER o AS rn,
         |    count(*) OVER win AS nw,
         |    sum(dx) OVER win AS sx, sum(dy) OVER win AS sy,
         |    sum(dx * dx) OVER win AS sxx, sum(dx * dy) OVER win AS sxy
         |  FROM b WINDOW o AS (PARTITION BY event_type ORDER BY ts),
         |    win AS (PARTITION BY event_type ORDER BY ts
         |      ROWS BETWEEN 167 PRECEDING AND CURRENT ROW))
         |SELECT event_type, epoch_us(ts) // 1000000 AS ts_s,
         |  round((nw * sxy - sx * sy) / (nw * sxx - sx * sx), 6) AS beta
         |FROM wn WHERE nw = 168 AND rn % 24 = 0""".stripMargin,

    "q_mutual_info" ->
      s"""WITH hourly AS ($Hc),
         |dirs AS (SELECT event_type, ts,
         |    CASE WHEN value > lag(value, 1) OVER (PARTITION BY event_type ORDER BY ts)
         |         THEN 1 ELSE 0 END AS d,
         |    lag(value, 1) OVER (PARTITION BY event_type ORDER BY ts) AS pv
         |  FROM hourly),
         |dd AS (SELECT event_type, ts, d FROM dirs WHERE pv IS NOT NULL),
         |cells AS (SELECT a.event_type AS ta, b.event_type AS tb, a.d AS da, b.d AS db,
         |    count(*) AS c
         |  FROM dd a JOIN dd b ON a.ts = b.ts AND a.event_type < b.event_type
         |  GROUP BY 1, 2, 3, 4),
         |mg AS (SELECT *,
         |    sum(c) OVER (PARTITION BY ta, tb) AS nn,
         |    sum(c) OVER (PARTITION BY ta, tb, da) AS ca,
         |    sum(c) OVER (PARTITION BY ta, tb, db) AS cb
         |  FROM cells),
         |tm AS (SELECT ta, tb, nn,
         |    (c::DOUBLE / nn) * ln((c::DOUBLE * nn) / (ca::DOUBLE * cb)) AS term,
         |    (c::DOUBLE / nn) * ln(nn::DOUBLE / ca) AS ha_t,
         |    (c::DOUBLE / nn) * ln(nn::DOUBLE / cb) AS hb_t
         |  FROM mg)
         |SELECT ta, tb, max(nn)::BIGINT AS n_obs,
         |  round(sum(term), 6) AS mi,
         |  round(sum(term) / sqrt(sum(ha_t) * sum(hb_t)), 6) AS nmi
         |FROM tm GROUP BY 1, 2""".stripMargin,

    "q_peak_detect" ->
      s"""WITH hourly AS ($H),
         |thr AS (SELECT event_type, ts, value,
         |    round(avg(value) OVER p + 1.5 * stddev_samp(value) OVER p, 6) AS thr
         |  FROM hourly WINDOW p AS (PARTITION BY event_type)),
         |wn AS (SELECT *,
         |    max(value) OVER w AS wmax, count(*) OVER w AS nwin,
         |    lag(value, 1) OVER (PARTITION BY event_type ORDER BY ts) AS prevv
         |  FROM thr WINDOW w AS (PARTITION BY event_type ORDER BY ts
         |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING))
         |SELECT event_type, epoch_us(ts) // 1000000 AS ts_s, value,
         |  thr AS threshold
         |FROM wn
         |WHERE value = wmax AND value >= thr AND nwin = 7
         |  AND (prevv IS NULL OR value > prevv)""".stripMargin,

    "q_coherence" ->
      s"""WITH hourly AS ($Hc),
         |${Tables.denseHourlySql},
         |mu AS (SELECT event_type, round(sum(value), 4) / count(*) AS mu
         |       FROM dense GROUP BY 1),
         |c AS (SELECT h.event_type, h.ts, h.value - m.mu AS x
         |      FROM dense h JOIN mu m USING (event_type)),
         |pr AS (SELECT a.event_type AS ta, b.event_type AS tb, a.ts,
         |         a.x AS xa, b.x AS xb,
         |         row_number() OVER (PARTITION BY a.event_type, b.event_type
         |           ORDER BY a.ts) AS rn
         |       FROM c a JOIN c b ON a.ts = b.ts AND a.event_type < b.event_type),
         |sg AS (SELECT ta, tb, xa, xb, (rn - 1) // 72 AS g,
         |         ((rn - 1) % 72) + 1 AS trel
         |       FROM pr),
         |pp AS (SELECT s.*, p.p, 2.0E0 * pi() / p.p AS w
         |       FROM sg s CROSS JOIN (SELECT unnest([6.0E0, 12.0E0, 24.0E0]) AS p) p),
         |seg AS (SELECT ta, tb, g, p, count(*) AS cnt,
         |    round(sum(xa * cos(w * trel)), 4) AS rex,
         |    round(sum(xa * sin(w * trel)), 4) AS imx,
         |    round(sum(xb * cos(w * trel)), 4) AS rey,
         |    round(sum(xb * sin(w * trel)), 4) AS imy
         |  FROM pp GROUP BY 1, 2, 3, 4),
         |agg AS (SELECT ta, tb, p, count(*)::BIGINT AS n_segments,
         |    round(sum(rex * rey + imx * imy), 4) AS cre,
         |    round(sum(imx * rey - rex * imy), 4) AS cim,
         |    round(sum(rex * rex + imx * imx), 4) AS sxx,
         |    round(sum(rey * rey + imy * imy), 4) AS syy
         |  FROM seg WHERE cnt = 72 GROUP BY 1, 2, 3),
         |st AS (SELECT *, (cre * cre + cim * cim) / (sxx * syy) AS coh,
         |    atan2(cim, cre) AS phase FROM agg)
         |SELECT ta, tb, p::INT AS period_h, n_segments,
         |  round(coh, 6) AS coherence, round(phase, 6) AS phase_rad,
         |  round(phase / (2.0E0 * pi()) * p, 6) AS lag_hours
         |FROM st""".stripMargin,

    "q_calendar_lift" ->
      s"""WITH hourly AS ($H),
         |hd AS (SELECT event_type, value, isodow(ts) - 1 AS dow FROM hourly),
         |d AS (SELECT event_type, dow, count(*)::BIGINT AS nd,
         |        round(sum(value), 4) / count(*) AS md, var_samp(value) AS vd
         |      FROM hd GROUP BY 1, 2),
         |o AS (SELECT event_type, count(*)::BIGINT AS no,
         |        round(sum(value), 4) / count(*) AS mo, var_samp(value) AS vo
         |      FROM hd GROUP BY 1)
         |SELECT d.event_type, d.dow::INT AS dow, d.nd AS n_hours,
         |  round(d.md, 6) AS dow_mean,
         |  round(d.md / o.mo, 6) AS lift,
         |  round((d.md - o.mo) / sqrt(d.vd / d.nd + o.vo / o.no), 6) AS z
         |FROM d JOIN o USING (event_type)""".stripMargin
  )
}
