package graft.queries

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Scratch, SeriesOps, Tables}

/** Rank-dependence + sequential-decision battery:
  *
  *  - `q_kendall` — pairwise Kendall tau-b between the hourly series
  *    (Kendall 1938), with the tie-corrected Mann-Kendall normal z.
  *    Everything upstream of the final ratios is an exact integer count
  *    (concordant/discordant/tie sums), so both engines derive identical
  *    doubles with no snapping. The O(n²) time-pair generator is a
  *    key-equality self-join on the (ta, tb) pair id — n is the hour
  *    grid (time-span-bounded), never corpus-scale.
  *  - `q_spearman` — pairwise Spearman rho on tie-averaged ranks. Ranks
  *    enter as the integer 2·avgrank = 2·rank + ties − 1, so all five
  *    correlation moments are exact BIGINTs; rho and its t-statistic are
  *    closed-form ratios of integers (identical doubles, no snapping).
  *    Ranks are per-series over the full grid; the correlation runs over
  *    the pair's common hours (declared semantics).
  *  - `q_bandit_ucb` — UCB1 replay (Auer, Cesa-Bianchi & Fischer 2002):
  *    arms = event types, reward at hour t = that arm's event count / the
  *    global max hourly count (an exact integer ratio). The replay is a
  *    T-step recursion over k-arm state (k counts + k integer reward
  *    sums) — one-row kernel state is k×T-bounded (time span × arm
  *    count, never corpus-scale); the oracle replays every pull's
  *    argmax as a recursive CTE over list state. Score ties resolve to
  *    the first (lexicographically smallest) arm in both engines.
  *  - `q_dtw_matrix` — pairwise DTW shape-distance matrix on globally
  *    aligned, z-normalized 12-hour PAA segments (Sakoe-Chiba band 6),
  *    running the shared DtwCpd.dtw kernel; the oracle replays every DP
  *    cell via the q_dtw_cpd cell-recursion.
  *  - `q_mmd_drift` — linear-time MMD² two-sample test (Gretton et al.
  *    2012, §6) between the first- and second-half embedding
  *    populations: h(i) = k(x₁,x₂)+k(y₁,y₂)−k(x₁,y₂)−k(x₂,y₁) over
  *    disjoint quadruples, RBF bandwidth 2σ² = mean within-pair squared
  *    distance (4-dp-snapped sum). Quadruples pair consecutive vec_ids
  *    by pure id arithmetic (ids are dense) — every join is
  *    key-equality on the quadruple index, no global sort, one scan;
  *    h values reduce as 1e6-scaled BIGINTs (order-free). This is the
  *    embedding-space drift monitor next to q_drift_psi's scalar form.
  */
object DependQueries {

  private val H = Tables.hourlySql
  private val Hc = Tables.hourlyCappedSql // pair-query series budget

  /** Σ (aᵢ−bᵢ)² in double precision (left-to-right, same fold order as
    * the DuckDB list_sum replay). */
  private def d2(u: Column, v: Column): Column =
    aggregate(
      zip_with(u, v, (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, t) => acc + t)

  private def d2Sql(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a::DOUBLE[], $b::DOUBLE[]), p -> (p[1] - p[2]) * (p[1] - p[2])))"

  /** UCB1 replay over the (hour, arm, count) observations of ONE group
    * row: returns per-arm (arm, n_plays, reward_sum, max_count, is_best).
    * State is k counts + k integer reward sums — bounded by arm count,
    * the reward table by the hour grid × k.
    */
  private val ucbReplay = udf { obs: Seq[Row] =>
    val rows = obs.map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2)))
    val arms = rows.map(_._2).distinct.sorted.toArray
    val kk = arms.length
    val idx = arms.zipWithIndex.toMap
    val hours = rows.map(_._1).distinct.sorted.toArray
    val m = rows.map(_._3).max
    val cm = rows.map(t => ((t._1, idx(t._2)), t._3)).toMap
    val n = new Array[Long](kk)
    val sc = new Array[Long](kk)
    var ti = 0
    while (ti < hours.length) {
      val t = ti + 1
      val choice =
        if (t <= kk) t - 1
        else {
          // first-index argmax of mean + sqrt(2 ln t / n): the identical
          // IEEE expression the oracle's list_position replay evaluates
          var bi = 0; var bs = Double.NegativeInfinity; var i = 0
          while (i < kk) {
            val sco = sc(i).toDouble / (n(i) * m).toDouble +
              math.sqrt(2.0 * math.log(t.toDouble) / n(i).toDouble)
            if (sco > bs) { bs = sco; bi = i }
            i += 1
          }
          bi
        }
      sc(choice) += cm.getOrElse((hours(ti), choice), 0L)
      n(choice) += 1
      ti += 1
    }
    val tot = new Array[Long](kk)
    rows.foreach(t => tot(idx(t._2)) += t._3)
    var bi = 0
    var i = 1
    while (i < kk) { if (tot(i) > tot(bi)) bi = i; i += 1 }
    arms.indices.map(i => (arms(i), n(i), sc(i), m, if (i == bi) 1 else 0))
  }

  /** Sakoe-Chiba band (segments) for q_dtw_matrix. */
  private val DtwBand = 6

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── Pairwise DTW distance matrix (Sakoe & Chiba 1978) between the
    // series — the clustering-grade SHAPE distance next to q_xcorr's
    // aligned-lag correlation and q_series_cluster's feature space.
    // Series reduce to 12-hour PAA segments on a GLOBAL segment grid
    // (every series gets the same length; absent segments are 0), get
    // z-normalized from snapped moments with 6-dp-snapped z values (so
    // both engines run the banded DP on bit-identical inputs — min/+/abs
    // then agree exactly), and the 10 pairs run the shared DtwCpd.dtw
    // kernel. The oracle replays every DP cell of every pair through
    // the q_dtw_cpd cell-recursion. O(S²·band) per pair with S the
    // segment grid (time-span-bounded), pair count #series². ──
    "q_dtw_matrix" -> ((s, dir) => {
      val hourly = Tables.hourlyEventsCapped(s, dir).drop("n")
      val seg = hourly
        .crossJoin(broadcast(hourly.agg(min(unix_timestamp(col("ts"))).as("gt0"))))
        .withColumn("seg", expr("(unix_timestamp(ts) - gt0) DIV 43200"))
        .groupBy("event_type", "seg")
        .agg((round(sum("value"), 4) / count(lit(1))).as("v"))
      val smax = seg.agg(max("seg").as("smax"))
      val grid = seg.select("event_type").distinct()
        .crossJoin(broadcast(smax))
        .select(col("event_type"), explode(expr("sequence(0, smax)")).as("seg"))
      val filled = grid.join(seg, Seq("event_type", "seg"), "left")
        .withColumn("v", coalesce(col("v"), lit(0.0)))
      val mom = filled.groupBy("event_type").agg(
        count(lit(1)).as("n"),
        round(sum("v"), 4).as("sv"),
        round(sum(col("v") * col("v")), 2).as("svv"))
        .withColumn("mu", expr("sv / n"))
        .withColumn("sd", expr("sqrt((svv - sv * sv / n) / (n - 1))"))
        .select("event_type", "mu", "sd")
      val z = filled.join(broadcast(mom), "event_type")
        .withColumn("z", round((col("v") - col("mu")) / col("sd"), 6))
      // spread: the DTW kernel runs fused after this aggregate's exchange;
      // see SeriesOps.spread (replaces r12's global minPartitionSize pin)
      val ser = SeriesOps.spread(z, Seq(col("event_type"))).groupBy("event_type")
        .agg(sort_array(collect_list(struct(col("seg"), col("z")))).as("_p"))
        .select(col("event_type"), col("_p.z").as("zs"))
      val dtwFn = udf { (a: Seq[Double], b: Seq[Double]) =>
        graft.detectors.DtwCpd.dtw(a.toArray, b.toArray, DtwBand)
      }
      ser.select(col("event_type").as("sa"), col("zs").as("za"))
        .join(broadcast(ser.select(col("event_type").as("sb"), col("zs").as("zb"))),
          col("sa") < col("sb"))
        .withColumn("d", dtwFn(col("za"), col("zb")))
        .select(col("sa"), col("sb"), size(col("za")).cast("long").as("n_segs"),
          round(col("d"), 6).as("dtw"),
          round(col("d") / (size(col("za")) * 2).cast("double"), 6).as("dtw_per_step"))
    }),

    "q_kendall" -> ((s, dir) => {
      val hourly = Tables.hourlyEventsCapped(s, dir).drop("n")
      val a = hourly.select(col("event_type").as("ta"), col("ts"), col("value").as("x"))
      val b = hourly.select(col("event_type").as("tb"), col("ts"), col("value").as("y"))
      // aligned pair rows now feed ONE consumer (the per-pair kernel) —
      // no scratch materialization needed
      val pr = a.join(b, "ts").where(col("ta") < col("tb")).select("ta", "tb", "ts", "x", "y")
      // Per-pair kernel over the collected aligned arrays (r12): the old
      // shape joined pr with itself on (ta,tb) — Θ(#pairs·L²) = 1.04 G
      // rows at the 64-series budget, and the series-axis measurement
      // caught its broadcast-probe degrading 13× between otherwise
      // identical datasets. The counts (concordant/discordant/tie sums)
      // are EXACT integers either way, so the kernel — one bounded UDF
      // row per pair, ≤ C(SeriesPairCap,2) rows total — changes nothing
      // the oracle sees; the float tau/z math below is untouched.
      val kendallCounts = udf { pts: Seq[Double] =>
        val n = pts.length / 2
        var conc = 0L; var disc = 0L
        var i = 0
        while (i < n) {
          var j = i + 1
          while (j < n) {
            val dx = java.lang.Double.compare(pts(2 * i), pts(2 * j))
            val dy = java.lang.Double.compare(pts(2 * i + 1), pts(2 * j + 1))
            val pp = dx * dy
            if (pp > 0) conc += 1L else if (pp < 0) disc += 1L
            j += 1
          }
          i += 1
        }
        def tieSums(off: Int): (Long, Long) = {
          val m = scala.collection.mutable.HashMap.empty[Double, Long]
          var i = 0
          while (i < n) { val v = pts(2 * i + off); m.update(v, m.getOrElse(v, 0L) + 1L); i += 1 }
          var s = 0L; var vv = 0L
          m.valuesIterator.foreach { t => s += t * (t - 1); vv += t * (t - 1) * (t * 2 + 5) }
          (s, vv)
        }
        val (s1, v1) = tieSums(0)
        val (s2, v2) = tieSums(1)
        Seq(n.toLong * (n - 1) / 2, conc, disc, s1, v1, s2, v2)
      }
      // spread before the kernel aggregate: pins full parallelism for the
      // CPU-dense per-pair kernel stage (AQE would coalesce it by bytes —
      // see SeriesOps.spread; replaces r12's global minPartitionSize pin)
      val base = SeriesOps.spread(pr, Seq(col("ta"), col("tb")))
        .groupBy("ta", "tb").agg(
          count(lit(1)).as("n"),
          flatten(collect_list(array(col("x"), col("y")))).as("pts"))
        .withColumn("k", kendallCounts(col("pts"))).drop("pts")
        .select(col("ta"), col("tb"), col("n"),
          col("k")(0).as("n0"), col("k")(1).as("conc"), col("k")(2).as("disc"),
          col("k")(3).as("s1"), col("k")(4).as("v1"), col("k")(5).as("s2"), col("k")(6).as("v2"))
      base
        .withColumn("ss", col("conc") - col("disc"))
        .withColumn("vnum",
          (col("n") * (col("n") - 1) * (col("n") * 2 + 5) - col("v1") - col("v2")).cast("double"))
        .select(col("ta"), col("tb"), col("n").as("n_obs"),
          col("conc").as("concordant"), col("disc").as("discordant"),
          round(lit(2.0) * col("ss") /
            sqrt((col("n0") * 2 - col("s1")).cast("double") * (col("n0") * 2 - col("s2")).cast("double")),
            6).as("tau_b"),
          round(
            when(col("ss") > 0, (col("ss") - 1) / sqrt(col("vnum") / lit(18.0)))
              .when(col("ss") < 0, (col("ss") + 1) / sqrt(col("vnum") / lit(18.0)))
              .otherwise(lit(0.0)), 6).as("z"))
    }),

    // ── Hoeffding's D independence test (Hoeffding 1948): sensitive to
    // NON-MONOTONE dependence that tau/rho/MI's binarization all miss.
    // Ties enter through the classic c(u) = (sign(u)+1)/2 convention,
    // carried as 2×/4×-scaled integers (R2 = 2·Σc(x_i−x_j), Q4 =
    // 4·Σc(x)c(y)), so D1/D2/D3 and the final D are exact integer
    // ratios. Same O(n²) pair-join shape as q_kendall. ──
    "q_hoeffding" -> ((s, dir) => {
      val hourly = Tables.hourlyEventsCapped(s, dir).drop("n")
      val a = hourly.select(col("event_type").as("ta"), col("ts"), col("value").as("x"))
      val b = hourly.select(col("event_type").as("tb"), col("ts"), col("value").as("y"))
      // Per-pair kernel (r12, the q_kendall treatment): the scaled-integer
      // c-counts R2/S2/Q4 per anchor point and the D-sums are exact
      // integers, computed in one bounded UDF row per pair instead of a
      // Θ(#pairs·L²) time-pair self-join. Oracle unchanged.
      val pr = a.join(b, "ts").where(col("ta") < col("tb")).select("ta", "tb", "ts", "x", "y")
      val hoeffdingSums = udf { pts: Seq[Double] =>
        val n = pts.length / 2
        var d1 = 0L; var d2 = 0L; var d3 = 0L
        var i = 0
        while (i < n) {
          var r2 = 0L; var s2 = 0L; var q4 = 0L
          var j = 0
          while (j < n) {
            if (j != i) {
              val cx = if (pts(2 * j) < pts(2 * i)) 2L else if (pts(2 * j) == pts(2 * i)) 1L else 0L
              val cy = if (pts(2 * j + 1) < pts(2 * i + 1)) 2L
                       else if (pts(2 * j + 1) == pts(2 * i + 1)) 1L else 0L
              r2 += cx; s2 += cy; q4 += cx * cy
            }
            j += 1
          }
          d1 += q4 * (q4 - 4)
          d2 += r2 * (r2 - 2) * s2 * (s2 - 2)
          d3 += (r2 - 2) * (s2 - 2) * q4
          i += 1
        }
        Seq(d1, d2, d3)
      }
      // spread before the kernel aggregate — see q_kendall / SeriesOps.spread
      SeriesOps.spread(pr, Seq(col("ta"), col("tb")))
        .groupBy("ta", "tb").agg(
          count(lit(1)).as("n"),
          flatten(collect_list(array(col("x"), col("y")))).as("pts"))
        .withColumn("d", hoeffdingSums(col("pts"))).drop("pts")
        .select(col("ta"), col("tb"), col("n"),
          col("d")(0).as("d1"), col("d")(1).as("d2"), col("d")(2).as("d3"))
        .withColumn("dnum",
          (col("n") - 2) * (col("n") - 3) * col("d1") + col("d2") -
            (col("n") - 2) * col("d3") * 2)
        .withColumn("dden",
          col("n") * (col("n") - 1) * (col("n") - 2) * (col("n") - 3) * (col("n") - 4))
        .select(col("ta"), col("tb"), col("n").as("n_obs"),
          round(lit(30.0) * col("dnum").cast("double") /
            (lit(16.0) * col("dden").cast("double")), 6).as("d_stat"))
    }),

    "q_spearman" -> ((s, dir) => {
      val hourly = Tables.hourlyEventsCapped(s, dir).drop("n")
      val wv = Window.partitionBy("event_type").orderBy("value")
      val wc = Window.partitionBy("event_type", "value")
      // integer doubled average rank: 2·avgrank = 2·minrank + ties − 1
      val r = hourly.withColumn("dr",
        rank().over(wv).cast("long") * 2 + count(lit(1)).over(wc) - 1)
      val a = r.select(col("event_type").as("ta"), col("ts"), col("dr").as("ra"))
      val b = r.select(col("event_type").as("tb"), col("ts"), col("dr").as("rb"))
      a.join(b, "ts").where(col("ta") < col("tb"))
        .groupBy("ta", "tb").agg(
          count(lit(1)).as("n"),
          sum("ra").as("sa"), sum("rb").as("sb"),
          sum(col("ra") * col("ra")).as("saa"),
          sum(col("rb") * col("rb")).as("sbb"),
          sum(col("ra") * col("rb")).as("sab"))
        .withColumn("rho",
          (col("n") * col("sab") - col("sa") * col("sb")).cast("double") /
            sqrt((col("n") * col("saa") - col("sa") * col("sa")).cast("double") *
              (col("n") * col("sbb") - col("sb") * col("sb")).cast("double")))
        .select(col("ta"), col("tb"), col("n").as("n_obs"),
          round(col("rho"), 6).as("rho"),
          round(col("rho") * sqrt((col("n") - 2).cast("double") /
            (lit(1.0) - col("rho") * col("rho"))), 6).as("t_stat"))
    }),

    "q_bandit_ucb" -> ((s, dir) => {
      val hourly = Tables.hourlyEvents(s, dir)
        .select(col("event_type"), col("ts"), col("n").cast("long").as("c"))
      // one-row kernel: T×k hourly counts (time-span × arm-count bounded);
      // zero-length substring of a REAL column keeps the key non-foldable
      hourly
        .groupBy(substring(col("event_type"), 1, 0).as("gk"))
        .agg(collect_list(struct(col("ts"), col("event_type"), col("c"))).as("obs"))
        .select(explode(ucbReplay(col("obs"))).as("r"))
        .select(col("r._1").as("arm"), col("r._2").as("n_plays"),
          col("r._3").as("reward_sum"),
          round(col("r._3").cast("double") / (col("r._2") * col("r._4")).cast("double"), 6)
            .as("mean_reward"),
          col("r._5").as("is_best"))
    }),

    // ── Empirical upper/lower tail dependence per series pair:
    // λ_U = P(X > q90_X | Y > q90_Y) (and the lower-tail mirror) —
    // co-movement exactly where correlation matters least and incidents
    // matter most (simultaneous spikes). Thresholds are exact integer-
    // rank order statistics per series; exceedance counts are integers;
    // independence would give 0.1 — emitted as the lift vs independent.
    // One rank pass per series + one key-equality pair join. ──
    "q_tail_dependence" -> ((s, dir) => {
      val hourly = Tables.hourlyEventsCapped(s, dir).drop("n")
      val wv = Window.partitionBy("event_type").orderBy(col("value"), col("ts"))
      val wp = Window.partitionBy("event_type")
      val rk = hourly
        .withColumn("rn", row_number().over(wv))
        .withColumn("nn", count(lit(1)).over(wp))
        .withColumn("hi", (col("rn") * 10 > col("nn") * 9).cast("int"))
        .withColumn("lo", (col("rn") * 10 <= col("nn")).cast("int"))
      val a = rk.select(col("event_type").as("ta"), col("ts"),
        col("hi").as("ha"), col("lo").as("la"))
      val b = rk.select(col("event_type").as("tb"), col("ts"),
        col("hi").as("hb"), col("lo").as("lb"))
      a.join(b, "ts").where(col("ta") < col("tb"))
        .groupBy("ta", "tb").agg(
          count(lit(1)).as("n"),
          sum(col("ha").cast("long")).as("nxh"),
          sum(col("hb").cast("long")).as("nyh"),
          sum(col("lb").cast("long")).as("nyl"),
          sum((col("ha") * col("hb")).cast("long")).as("joint_hi"),
          sum((col("la") * col("lb")).cast("long")).as("joint_lo"))
        .where(col("nyh") > 0 && col("nyl") > 0)
        .select(col("ta"), col("tb"), col("n").as("n_obs"),
          col("joint_hi"), col("joint_lo"),
          round(col("joint_hi").cast("double") / col("nyh").cast("double"), 6).as("lambda_u"),
          round(col("joint_lo").cast("double") / col("nyl").cast("double"), 6).as("lambda_l"),
          round(col("joint_hi").cast("double") * col("n").cast("double") /
            (col("nxh").cast("double") * col("nyh").cast("double")), 6).as("lift_u"))
    }),

    "q_mmd_drift" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir).select(col("vec_id").cast("long").as("id"), col("embedding"))
      val mx = e.agg(expr("max(id) DIV 2").as("mid"))
      val base = e.crossJoin(broadcast(mx))
      val xs = base.where(col("id") <= col("mid"))
        .select(expr("id DIV 2").as("i"), (col("id") % 2).as("pos"), col("embedding"))
      val ys = base.where(col("id") > col("mid"))
        .select(expr("(id - mid - 1) DIV 2").as("i"), ((col("id") - col("mid") - 1) % 2).as("pos"),
          col("embedding"))
      def side(df: DataFrame, p: Int, nm: String) =
        df.where(col("pos") === p).select(col("i"), col("embedding").as(nm))
      val quads = Scratch.materialize(
        side(xs, 0, "x1").join(side(xs, 1, "x2"), "i")
          .join(side(ys, 0, "y1"), "i").join(side(ys, 1, "y2"), "i")
          .select(col("i"), d2(col("x1"), col("x2")).as("dxx"), d2(col("y1"), col("y2")).as("dyy"),
            d2(col("x1"), col("y2")).as("dxy"), d2(col("x2"), col("y1")).as("dyx")),
        "mmd_quads")
      val mom = quads.agg(round(sum(col("dxx") + col("dyy")), 4).as("sd"), count(lit(1)).as("nq"))
      val hq = quads.crossJoin(broadcast(mom))
        .withColumn("s2", col("sd") / (col("nq") * 2).cast("double"))
        .withColumn("h6", round((
          exp(-col("dxx") / (col("s2") * 2)) + exp(-col("dyy") / (col("s2") * 2)) -
            exp(-col("dxy") / (col("s2") * 2)) - exp(-col("dyx") / (col("s2") * 2))) * 1e6)
          .cast("long"))
      hq.agg(
        count(lit(1)).as("n_quads"),
        max("s2").as("s2v"),
        sum("h6").as("sh"),
        sum(col("h6") * col("h6")).as("shh"))
        .withColumn("mmd_raw", col("sh").cast("double") / (col("n_quads").cast("double") * lit(1e6)))
        .withColumn("v",
          (col("shh").cast("double") / lit(1e12) -
            col("n_quads").cast("double") * col("mmd_raw") * col("mmd_raw")) /
            (col("n_quads") - 1).cast("double"))
        .withColumn("z_raw", col("mmd_raw") / sqrt(col("v") / col("n_quads")))
        .select(col("n_quads"), round(col("s2v"), 6).as("sigma2"),
          round(col("mmd_raw"), 6).as("mmd"), round(col("z_raw"), 6).as("z"),
          when(col("z_raw") > lit(1.96), 1).otherwise(0).as("drifted"))
    })
  )

  val sql: Map[String, String] = Map(

    "q_dtw_matrix" -> {
      val inf = Double.MaxValue / 4
      s"""WITH RECURSIVE hourly AS ($Hc),
         |g0 AS (SELECT min(epoch_us(ts) // 1000000) AS gt0 FROM hourly),
         |seg AS (SELECT event_type, (epoch_us(ts) // 1000000 - gt0) // 43200 AS seg,
         |          round(sum(value), 4) / count(*) AS v
         |        FROM hourly, g0 GROUP BY 1, 2),
         |smax AS (SELECT max(seg) AS sm FROM seg),
         |sers AS (SELECT DISTINCT event_type FROM seg),
         |grid AS (SELECT s.event_type, unnest(range(0, sm + 1)) AS seg FROM sers s, smax),
         |filled AS (SELECT g.event_type, g.seg, coalesce(p.v, 0.0E0) AS v
         |           FROM grid g LEFT JOIN seg p ON g.event_type = p.event_type AND g.seg = p.seg),
         |mom AS (SELECT event_type, count(*)::BIGINT AS n,
         |    round(sum(v), 4) AS sv, round(sum(v * v), 2) AS svv
         |  FROM filled GROUP BY 1),
         |ms AS (SELECT event_type, sv / n AS mu,
         |    sqrt((svv - sv * sv / n) / (n - 1)) AS sd FROM mom),
         |zz AS (SELECT f.event_type, f.seg, round((f.v - m.mu) / m.sd, 6) AS z
         |       FROM filled f JOIN ms m USING (event_type)),
         |ser AS (SELECT event_type, list(z ORDER BY seg) AS zs FROM zz GROUP BY 1),
         |pairs AS (SELECT a.event_type AS sa, b.event_type AS sb,
         |            a.zs AS wa, b.zs AS wb, len(b.zs) AS m
         |          FROM ser a JOIN ser b ON a.event_type < b.event_type),
         |rec AS (
         |  SELECT sa, sb, wa, wb, m, 0 AS k,
         |    list_concat([0.0::DOUBLE], list_transform(range(1, m + 1), x -> $inf)) AS prev,
         |    list_transform(range(0, m + 1), x -> $inf) AS cur
         |  FROM pairs
         |  UNION ALL
         |  SELECT sa, sb, wa, wb, m, kn,
         |    CASE WHEN j = m THEN cur2 ELSE prev END,
         |    CASE WHEN j = m THEN list_transform(range(0, m + 1), x -> $inf) ELSE cur2 END
         |  FROM (
         |    SELECT sa, sb, wa, wb, m, kn, j, prev,
         |      list_transform(cur, (v, li) -> CASE WHEN li = j + 1 THEN
         |        CASE WHEN j >= greatest(1, i - $DtwBand) AND j <= least(m, i + $DtwBand)
         |             THEN abs(wa[i] - wb[j]) + least(prev[j + 1], cur[j], prev[j])
         |             ELSE v END
         |        ELSE v END) AS cur2
         |    FROM (
         |      SELECT sa, sb, wa, wb, m, k + 1 AS kn, prev, cur,
         |        k // m + 1 AS i, k % m + 1 AS j
         |      FROM rec WHERE k < len(wa) * m))),
         |fin AS (SELECT sa, sb, m, prev[m + 1] AS d FROM rec WHERE k = len(wa) * m)
         |SELECT sa, sb, m::BIGINT AS n_segs, round(d, 6) AS dtw,
         |  round(d / (m * 2)::DOUBLE, 6) AS dtw_per_step
         |FROM fin""".stripMargin
    },

    "q_kendall" ->
      s"""WITH hourly AS ($Hc),
         |pr AS (SELECT a.event_type AS ta, b.event_type AS tb, a.ts, a.value AS x, b.value AS y
         |       FROM hourly a JOIN hourly b ON a.ts = b.ts AND a.event_type < b.event_type),
         |base AS (SELECT ta, tb, count(*)::BIGINT AS n0,
         |    sum(CASE WHEN pp > 0 THEN 1 ELSE 0 END)::BIGINT AS conc,
         |    sum(CASE WHEN pp < 0 THEN 1 ELSE 0 END)::BIGINT AS disc
         |  FROM (SELECT p.ta, p.tb, sign(p.x - q.x) * sign(p.y - q.y) AS pp
         |        FROM pr p JOIN pr q ON p.ta = q.ta AND p.tb = q.tb AND p.ts < q.ts)
         |  GROUP BY 1, 2),
         |nob AS (SELECT ta, tb, count(*)::BIGINT AS n FROM pr GROUP BY 1, 2),
         |tx AS (SELECT ta, tb, sum(t * (t - 1))::BIGINT AS s1,
         |         sum(t * (t - 1) * (t * 2 + 5))::BIGINT AS v1
         |       FROM (SELECT ta, tb, x, count(*)::BIGINT AS t FROM pr GROUP BY 1, 2, 3)
         |       GROUP BY 1, 2),
         |ty AS (SELECT ta, tb, sum(t * (t - 1))::BIGINT AS s2,
         |         sum(t * (t - 1) * (t * 2 + 5))::BIGINT AS v2
         |       FROM (SELECT ta, tb, y, count(*)::BIGINT AS t FROM pr GROUP BY 1, 2, 3)
         |       GROUP BY 1, 2),
         |j AS (SELECT base.ta, base.tb, n0, conc, disc, n, s1, v1, s2, v2,
         |        (conc - disc) AS ss,
         |        (n * (n - 1) * (n * 2 + 5) - v1 - v2)::DOUBLE AS vnum
         |      FROM base JOIN nob USING (ta, tb) JOIN tx USING (ta, tb) JOIN ty USING (ta, tb))
         |SELECT ta, tb, n AS n_obs, conc AS concordant, disc AS discordant,
         |  round(2.0E0 * ss / sqrt((n0 * 2 - s1)::DOUBLE * (n0 * 2 - s2)::DOUBLE), 6) AS tau_b,
         |  round(CASE WHEN ss > 0 THEN (ss - 1) / sqrt(vnum / 18.0E0)
         |             WHEN ss < 0 THEN (ss + 1) / sqrt(vnum / 18.0E0)
         |             ELSE 0.0E0 END, 6) AS z
         |FROM j""".stripMargin,

    "q_hoeffding" ->
      s"""WITH hourly AS ($Hc),
         |pr AS (SELECT a.event_type AS ta, b.event_type AS tb, a.ts, a.value AS x, b.value AS y
         |       FROM hourly a JOIN hourly b ON a.ts = b.ts AND a.event_type < b.event_type),
         |per AS (SELECT p.ta, p.tb, p.ts,
         |    sum(CASE WHEN q.x < p.x THEN 2 WHEN q.x = p.x THEN 1 ELSE 0 END)::BIGINT AS r2,
         |    sum(CASE WHEN q.y < p.y THEN 2 WHEN q.y = p.y THEN 1 ELSE 0 END)::BIGINT AS s2,
         |    sum((CASE WHEN q.x < p.x THEN 2 WHEN q.x = p.x THEN 1 ELSE 0 END)
         |      * (CASE WHEN q.y < p.y THEN 2 WHEN q.y = p.y THEN 1 ELSE 0 END))::BIGINT AS q4
         |  FROM pr p JOIN pr q ON p.ta = q.ta AND p.tb = q.tb AND p.ts <> q.ts
         |  GROUP BY 1, 2, 3),
         |agg AS (SELECT ta, tb, count(*)::BIGINT AS n,
         |    sum(q4 * (q4 - 4))::BIGINT AS d1,
         |    sum(r2 * (r2 - 2) * s2 * (s2 - 2))::BIGINT AS d2,
         |    sum((r2 - 2) * (s2 - 2) * q4)::BIGINT AS d3
         |  FROM per GROUP BY 1, 2),
         |st AS (SELECT ta, tb, n,
         |    (n - 2) * (n - 3) * d1 + d2 - (n - 2) * d3 * 2 AS dnum,
         |    n * (n - 1) * (n - 2) * (n - 3) * (n - 4) AS dden
         |  FROM agg)
         |SELECT ta, tb, n AS n_obs,
         |  round(30.0E0 * dnum::DOUBLE / (16.0E0 * dden::DOUBLE), 6) AS d_stat
         |FROM st""".stripMargin,

    "q_spearman" ->
      s"""WITH hourly AS ($Hc),
         |rk AS (SELECT event_type, ts,
         |    rank() OVER (PARTITION BY event_type ORDER BY value) * 2
         |      + count(*) OVER (PARTITION BY event_type, value) - 1 AS dr
         |  FROM hourly),
         |pr AS (SELECT a.event_type AS ta, b.event_type AS tb, a.dr AS ra, b.dr AS rb
         |       FROM rk a JOIN rk b ON a.ts = b.ts AND a.event_type < b.event_type),
         |mom AS (SELECT ta, tb, count(*)::BIGINT AS n,
         |    sum(ra)::BIGINT AS sa, sum(rb)::BIGINT AS sb,
         |    sum(ra * ra)::BIGINT AS saa, sum(rb * rb)::BIGINT AS sbb,
         |    sum(ra * rb)::BIGINT AS sab
         |  FROM pr GROUP BY 1, 2),
         |st AS (SELECT ta, tb, n,
         |    (n * sab - sa * sb)::DOUBLE
         |      / sqrt((n * saa - sa * sa)::DOUBLE * (n * sbb - sb * sb)::DOUBLE) AS rho
         |  FROM mom)
         |SELECT ta, tb, n AS n_obs, round(rho, 6) AS rho,
         |  round(rho * sqrt((n - 2)::DOUBLE / (1.0E0 - rho * rho)), 6) AS t_stat
         |FROM st""".stripMargin,

    "q_bandit_ucb" -> {
      // the UCB score list, spliced everywhere a step's choice is needed —
      // the IDENTICAL IEEE expression the Scala kernel evaluates
      val scores = "list_transform(range(1, kk.k + 1), i -> " +
        "s.ss[i]::DOUBLE / (s.ns[i] * mm.m)::DOUBLE + sqrt(2.0E0 * ln((s.t + 1)::DOUBLE) / s.ns[i]::DOUBLE))"
      val choice = s"(CASE WHEN s.t + 1 <= kk.k THEN s.t + 1 " +
        s"ELSE list_position($scores, list_aggregate($scores, 'max'))::BIGINT END)"
      s"""WITH RECURSIVE
         |hourly0 AS (SELECT event_type, date_trunc('hour', ts) AS ts, count(*)::BIGINT AS c
         |            FROM events GROUP BY 1, 2),
         |arms AS (SELECT event_type, row_number() OVER (ORDER BY event_type) AS ai
         |         FROM (SELECT DISTINCT event_type FROM hourly0)),
         |hrs AS (SELECT ts, row_number() OVER (ORDER BY ts) AS t
         |        FROM (SELECT DISTINCT ts FROM hourly0)),
         |kk AS (SELECT count(*)::BIGINT AS k FROM arms),
         |mm AS (SELECT max(c) AS m FROM hourly0),
         |tm AS (SELECT max(t) AS tmax FROM hrs),
         |rwl AS (SELECT h.t, list(coalesce(c.c, 0) ORDER BY a.ai) AS cl
         |        FROM hrs h CROSS JOIN arms a
         |        LEFT JOIN hourly0 c ON c.ts = h.ts AND c.event_type = a.event_type
         |        GROUP BY h.t),
         |sim AS (
         |  SELECT 0::BIGINT AS t,
         |    (SELECT list_transform(range(1, k + 1), x -> 0::BIGINT) FROM kk) AS ns,
         |    (SELECT list_transform(range(1, k + 1), x -> 0::BIGINT) FROM kk) AS ss
         |  UNION ALL
         |  SELECT s.t + 1,
         |    list_transform(range(1, kk.k + 1),
         |      i -> CASE WHEN i = $choice THEN s.ns[i] + 1 ELSE s.ns[i] END),
         |    list_transform(range(1, kk.k + 1),
         |      i -> CASE WHEN i = $choice THEN s.ss[i] + r.cl[$choice] ELSE s.ss[i] END)
         |  FROM sim s, kk, mm, tm, rwl r
         |  WHERE r.t = s.t + 1 AND s.t < tm.tmax),
         |fin AS (SELECT ns, ss FROM sim, tm WHERE t = tmax),
         |tot AS (SELECT a.event_type, sum(h.c)::BIGINT AS ctot
         |        FROM hourly0 h JOIN arms a USING (event_type) GROUP BY 1),
         |best AS (SELECT event_type FROM tot ORDER BY ctot DESC, event_type LIMIT 1)
         |SELECT a.event_type AS arm, f.ns[a.ai]::BIGINT AS n_plays,
         |  f.ss[a.ai]::BIGINT AS reward_sum,
         |  round(f.ss[a.ai]::DOUBLE / (f.ns[a.ai] * mm.m)::DOUBLE, 6) AS mean_reward,
         |  CASE WHEN a.event_type = (SELECT event_type FROM best) THEN 1 ELSE 0 END AS is_best
         |FROM arms a, fin f, mm""".stripMargin
    },

    "q_tail_dependence" ->
      s"""WITH hourly AS ($Hc),
         |rk AS (SELECT event_type, ts,
         |    row_number() OVER (PARTITION BY event_type ORDER BY value, ts) AS rn,
         |    count(*) OVER (PARTITION BY event_type) AS nn
         |  FROM hourly),
         |fl AS (SELECT event_type, ts,
         |    CASE WHEN rn * 10 > nn * 9 THEN 1 ELSE 0 END AS hi,
         |    CASE WHEN rn * 10 <= nn THEN 1 ELSE 0 END AS lo
         |  FROM rk),
         |pr AS (SELECT a.event_type AS ta, b.event_type AS tb,
         |    a.hi AS ha, a.lo AS la, b.hi AS hb, b.lo AS lb
         |  FROM fl a JOIN fl b ON a.ts = b.ts AND a.event_type < b.event_type),
         |agg AS (SELECT ta, tb, count(*)::BIGINT AS n,
         |    sum(ha)::BIGINT AS nxh, sum(hb)::BIGINT AS nyh, sum(lb)::BIGINT AS nyl,
         |    sum(ha * hb)::BIGINT AS joint_hi, sum(la * lb)::BIGINT AS joint_lo
         |  FROM pr GROUP BY 1, 2)
         |SELECT ta, tb, n AS n_obs, joint_hi, joint_lo,
         |  round(joint_hi::DOUBLE / nyh::DOUBLE, 6) AS lambda_u,
         |  round(joint_lo::DOUBLE / nyl::DOUBLE, 6) AS lambda_l,
         |  round(joint_hi::DOUBLE * n::DOUBLE / (nxh::DOUBLE * nyh::DOUBLE), 6) AS lift_u
         |FROM agg WHERE nyh > 0 AND nyl > 0""".stripMargin,

    "q_mmd_drift" ->
      s"""WITH e AS (SELECT vec_id AS id, embedding FROM embeddings),
         |mx AS (SELECT max(id) // 2 AS mid FROM e),
         |xs AS (SELECT id // 2 AS i, id % 2 AS pos, embedding FROM e, mx WHERE id <= mid),
         |ys AS (SELECT (id - mid - 1) // 2 AS i, (id - mid - 1) % 2 AS pos, embedding
         |       FROM e, mx WHERE id > mid),
         |quads AS (SELECT x1.i,
         |    ${d2Sql("x1.embedding", "x2.embedding")} AS dxx,
         |    ${d2Sql("y1.embedding", "y2.embedding")} AS dyy,
         |    ${d2Sql("x1.embedding", "y2.embedding")} AS dxy,
         |    ${d2Sql("x2.embedding", "y1.embedding")} AS dyx
         |  FROM (SELECT i, embedding FROM xs WHERE pos = 0) x1
         |  JOIN (SELECT i, embedding FROM xs WHERE pos = 1) x2 USING (i)
         |  JOIN (SELECT i, embedding FROM ys WHERE pos = 0) y1 USING (i)
         |  JOIN (SELECT i, embedding FROM ys WHERE pos = 1) y2 USING (i)),
         |mom AS (SELECT round(sum(dxx + dyy), 4) AS sd, count(*)::BIGINT AS nq FROM quads),
         |hq AS (SELECT round((exp(-dxx / (s2 * 2)) + exp(-dyy / (s2 * 2))
         |                     - exp(-dxy / (s2 * 2)) - exp(-dyx / (s2 * 2))) * 1e6)::BIGINT AS h6,
         |         s2
         |       FROM (SELECT q.*, m.sd / (m.nq * 2)::DOUBLE AS s2 FROM quads q, mom m)),
         |ag AS (SELECT count(*)::BIGINT AS n_quads, max(s2) AS s2v,
         |         sum(h6)::BIGINT AS sh, sum(h6 * h6)::BIGINT AS shh FROM hq),
         |st AS (SELECT n_quads, s2v,
         |    sh::DOUBLE / (n_quads::DOUBLE * 1e6) AS mmd_raw,
         |    (shh::DOUBLE / 1e12
         |      - n_quads::DOUBLE * (sh::DOUBLE / (n_quads::DOUBLE * 1e6)) * (sh::DOUBLE / (n_quads::DOUBLE * 1e6)))
         |      / (n_quads - 1)::DOUBLE AS v
         |  FROM ag)
         |SELECT n_quads, round(s2v, 6) AS sigma2, round(mmd_raw, 6) AS mmd,
         |  round(mmd_raw / sqrt(v / n_quads), 6) AS z,
         |  CASE WHEN mmd_raw / sqrt(v / n_quads) > 1.96E0 THEN 1 ELSE 0 END AS drifted
         |FROM st""".stripMargin
  )
}
