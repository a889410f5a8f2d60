package graft.features

import graft.TSSchema
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SQL-native portion of the TsFeatures battery
  * (kats/tsfeatures/tsfeatures.py). Every feature here is a pure
  * aggregate/window plan: one shuffle per series key, partial aggregation
  * map-side, whole-stage codegen. Moments are computed CENTERED
  * (avg((x-μ)^k)) — numerically stable, so results reproduce across
  * engines at 6 dp.
  *
  * Population (ddof=0) variance/std throughout, matching np.var/np.std.
  */
object TsFeatures {

  /** length/mean/var/std/cv/min/max/skewness/kurtosis (get_statistics). */
  def basic(df: DataFrame, s: TSSchema): DataFrame = {
    val wKey = Window.partitionBy(s.keyCols: _*)
    val x = col(s.value)
    val dev = x - avg(x).over(wKey)
    df.withColumn("_dev", dev)
      .groupBy(s.keyCols: _*)
      .agg(
        count(lit(1)).as("length"),
        round(avg(x), 6).as("mean"),
        round(avg(pow(col("_dev"), 2)), 6).as("var_pop"),
        round(sqrt(avg(pow(col("_dev"), 2))), 6).as("std_pop"),
        round(sqrt(avg(pow(col("_dev"), 2))) / avg(x), 6).as("cv"),
        min(x).as("min"), max(x).as("max"),
        round(avg(pow(col("_dev"), 3)) / pow(avg(pow(col("_dev"), 2)), 1.5), 6).as("skew"),
        round(avg(pow(col("_dev"), 4)) / pow(avg(pow(col("_dev"), 2)), 2) - 3.0, 6).as("kurt"))
  }

  /** Median crossings (get_crossing_points): x_i <= m < x_{i+1} or
    * x_i >= m > x_{i+1}.
    */
  def crossingPoints(df: DataFrame, s: TSSchema): DataFrame = {
    val wKey = Window.partitionBy(s.keyCols: _*)
    val x = col(s.value)
    df.withColumn("_m", expr(s"percentile(${s.value}, 0.5)").over(wKey))
      .withColumn("_nx", lead(x, 1).over(s.orderedWindow))
      .groupBy(s.keyCols: _*)
      .agg(count(when(
        (x <= col("_m") && col("_nx") > col("_m")) || (x >= col("_m") && col("_nx") < col("_m")),
        1)).as("crossing_points"))
  }

  /** Max same-value run length across n/10-sized segments (get_flat_spots). */
  def flatSpots(df: DataFrame, s: TSSchema, nbins: Int = 10): DataFrame = {
    val wKey = Window.partitionBy(s.keyCols: _*)
    val base = df
      .withColumn("_rn", row_number().over(s.orderedWindow))
      .withColumn("_n", count(lit(1)).over(wKey))
      .withColumn("_w", (col("_n") / nbins).cast("long"))
      .withColumn("_seg", ((col("_rn") - 1) / col("_w")).cast("long"))
    val wRun = Window.partitionBy((s.keyCols ++ Seq(col("_seg"), col(s.value))): _*).orderBy(col(s.ts))
    base
      .withColumn("_grp", col("_rn") - row_number().over(wRun))
      .groupBy((s.keyCols ++ Seq(col("_seg"), col(s.value), col("_grp"))): _*)
      .agg(count(lit(1)).as("_run"))
      .groupBy(s.keyCols: _*)
      .agg(max("_run").as("flat_spots"))
  }

  /** np.array_split chunk index for a 1-based row number: k chunks, the
    * first n%k of size n/k+1, the rest n/k — replicated exactly so
    * lumpiness/stability match the reference's chunking.
    */
  private def chunkIdx(rn: Column, n: Column, k: Column): Column = {
    val q = (n / k).cast("long")
    val r = n % k
    when(rn <= r * (q + 1), ((rn - 1) / (q + 1)).cast("long"))
      .otherwise(r + ((rn - 1 - r * (q + 1)) / q).cast("long"))
  }

  /** Variance of chunk-wise variances (get_lumpiness) / means (get_stability). */
  def lumpinessStability(df: DataFrame, s: TSSchema, windowSize: Int = 20): DataFrame = {
    val wKey = Window.partitionBy(s.keyCols: _*)
    val base = df
      .withColumn("_rn", row_number().over(s.orderedWindow).cast("long"))
      .withColumn("_n", count(lit(1)).over(wKey))
      .withColumn("_k", (col("_n") / windowSize).cast("long") + 1)
      .withColumn("_c", chunkIdx(col("_rn"), col("_n"), col("_k")))
    val x = col(s.value)
    base
      .groupBy((s.keyCols :+ col("_c")): _*)
      .agg((avg(x * x) - avg(x) * avg(x)).as("_cvar"), avg(x).as("_cmean"))
      .groupBy(s.keyCols: _*)
      .agg(
        // 4 dp: variance-of-variances reaches 1e7+, where 6 dp sits on
        // float rounding boundaries between engines
        round(avg(col("_cvar") * col("_cvar")) - avg("_cvar") * avg("_cvar"), 4).as("lumpiness"),
        round(avg(col("_cmean") * col("_cmean")) - avg("_cmean") * avg("_cmean"), 6).as("stability"))
  }

  /** Population std of np.gradient (central differences; get_std1st_der). */
  def std1stDer(df: DataFrame, s: TSSchema): DataFrame = {
    val wKey = Window.partitionBy(s.keyCols: _*)
    val x = col(s.value)
    val base = df
      .withColumn("_rn", row_number().over(s.orderedWindow))
      .withColumn("_n", count(lit(1)).over(wKey))
      .withColumn("_g",
        when(col("_rn") === 1, lead(x, 1).over(s.orderedWindow) - x)
          .when(col("_rn") === col("_n"), x - lag(x, 1).over(s.orderedWindow))
          .otherwise((lead(x, 1).over(s.orderedWindow) - lag(x, 1).over(s.orderedWindow)) / 2))
    base.groupBy(s.keyCols: _*)
      .agg(round(sqrt(avg(col("_g") * col("_g")) - avg("_g") * avg("_g")), 6).as("std1st_der"))
  }

  /** Share of points above the series mean (get_binarize_mean). */
  def binarizeMean(df: DataFrame, s: TSSchema): DataFrame = {
    val wKey = Window.partitionBy(s.keyCols: _*)
    df.withColumn("_mu", avg(s.value).over(wKey))
      .groupBy(s.keyCols: _*)
      .agg(round(avg((col(s.value) > col("_mu")).cast("double")), 6).as("binarize_mean"))
  }

  /** Left edge of the tallest 10-bin histogram bar (get_histogram_mode);
    * ties resolve to the lowest bin like np.argmax.
    */
  def histogramMode(df: DataFrame, s: TSSchema, nbins: Int = 10): DataFrame = {
    val wKey = Window.partitionBy(s.keyCols: _*)
    val x = col(s.value)
    val base = df
      .withColumn("_lo", min(x).over(wKey))
      .withColumn("_hi", max(x).over(wKey))
      .withColumn("_bin", least(floor((x - col("_lo")) / ((col("_hi") - col("_lo")) / nbins)), lit(nbins - 1)).cast("long"))
    val counts = base.groupBy((s.keyCols ++ Seq(col("_bin"), col("_lo"), col("_hi"))): _*)
      .agg(count(lit(1)).as("_cnt"))
    val wRank = Window.partitionBy(s.keyCols: _*).orderBy(col("_cnt").desc, col("_bin"))
    counts.withColumn("_rk", row_number().over(wRank)).where(col("_rk") === 1)
      .select((s.keyCols :+ round(col("_lo") + col("_bin") * ((col("_hi") - col("_lo")) / nbins), 6).as("histogram_mode")): _*)
  }

  /** R² of the linear fit on the time index (get_linearity). */
  def linearity(df: DataFrame, s: TSSchema): DataFrame =
    df.withColumn("_t", (row_number().over(s.orderedWindow) - 1).cast("double"))
      .groupBy(s.keyCols: _*)
      .agg(round(regr_r2(col(s.value), col("_t")), 6).as("linearity"))

  /** Max |mean(window_{i+1}) - mean(window_i)| over consecutive sliding
    * 20-windows (get_level_shift_features). The consecutive-window mean
    * difference telescopes to |x_{i+w} - x_i| / w, so the O(n·w) reference
    * computation collapses to a single lead() — same result, one window op.
    */
  def levelShiftFeatures(df: DataFrame, s: TSSchema, windowSize: Int = 20): DataFrame = {
    val x = col(s.value)
    val base = df
      .withColumn("_rn", row_number().over(s.orderedWindow))
      .withColumn("_d", round(abs(lead(x, windowSize).over(s.orderedWindow) - x) / windowSize, 6))
      .where(col("_d").isNotNull)
    val wRank = Window.partitionBy(s.keyCols: _*).orderBy(col("_d").desc, col("_rn"))
    base.withColumn("_rk", row_number().over(wRank)).where(col("_rk") === 1)
      .select((s.keyCols ++ Seq((col("_rn") - 1).cast("long").as("level_shift_idx"), col("_d").as("level_shift_size"))): _*)
  }

  /** Biased-estimator ACF at the given lags for a per-series frame:
    * ρ_k = Σ_{t>k} dev_t·dev_{t-k} / Σ dev_t² (statsmodels acf default).
    * Returns one row per series with columns `<prefix>acf_<k>`.
    */
  def acfAtLags(df: DataFrame, s: TSSchema, lags: Seq[Int], prefix: String = ""): DataFrame = {
    val wKey = Window.partitionBy(s.keyCols: _*)
    var base = df.withColumn("_dev", col(s.value) - avg(s.value).over(wKey))
    for (k <- lags) base = base.withColumn(s"_devk$k", lag("_dev", k).over(s.orderedWindow))
    val aggs = lags.map(k =>
      (sum(col("_dev") * col(s"_devk$k")) / sum(col("_dev") * col("_dev"))).as(s"${prefix}acf_$k"))
    base.groupBy(s.keyCols: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Differenced series (order d) of a per-series frame, keeping ts. */
  def diffSeries(df: DataFrame, s: TSSchema, d: Int): DataFrame = {
    var out = df
    for (_ <- 1 to d)
      out = out.withColumn(s.value, col(s.value) - lag(s.value, 1).over(s.orderedWindow))
        .where(col(s.value).isNotNull)
    out
  }

  /** Trend/seasonal strength from an additive decomposition frame with
    * trend/seasonal/resid columns (get_stl_features):
    * strength = max(0, 1 - Var(R)/Var(component + R)), population var.
    */
  def stlStrength(decomposed: DataFrame, s: TSSchema): DataFrame = {
    def varPop(c: Column) = avg(c * c) - avg(c) * avg(c)
    // spikiness (tsfeatures get_stl_features): popvar of the leave-one-out
    // popvars of the residual. v_i = α + β·r_i + γ·r_i² in closed form
    // (α = ((n-1)S2 - S1²)/(n-1)², β = 2S1/(n-1)², γ = -n/(n-1)²), so the
    // whole feature is plain moment sums S1..S4 — one aggregate, no loop.
    val r = col("resid")
    val n = count(lit(1)).cast("double")
    val s1 = sum(r); val s2 = sum(r * r); val s3 = sum(r * r * r); val s4 = sum(r * r * r * r)
    val d = (n - 1) * (n - 1)
    val alpha = ((n - 1) * s2 - s1 * s1) / d
    val beta = lit(2.0) * s1 / d
    val gamma = -n / d
    val sv = n * alpha + beta * s1 + gamma * s2
    val sv2 = n * alpha * alpha + beta * beta * s2 + gamma * gamma * s4 +
      lit(2.0) * alpha * beta * s1 + lit(2.0) * alpha * gamma * s2 + lit(2.0) * beta * gamma * s3
    decomposed.groupBy(s.keyCols: _*)
      .agg(
        round(greatest(lit(0.0), lit(1.0) - varPop(col("resid")) / varPop(col("trend") + col("resid"))), 6).as("trend_strength"),
        round(greatest(lit(0.0), lit(1.0) - varPop(col("resid")) / varPop(col("seasonal") + col("resid"))), 6).as("seasonal_strength"),
        // 2 dp: the 4th-moment sums behind the closed form carry ~1e-6
        // absolute float noise at this scale — 6 dp would sit on rounding
        // boundaries between engines
        round(sv2 / n - (sv / n) * (sv / n), 2).as("spikiness"))
  }
}
