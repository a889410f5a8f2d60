package graft.detectors

import graft.TSSchema
import graft.operators.Decompose
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SQL-native detectors (kats.detectors): each is a single-shuffle
  * window/aggregate plan over the tidy series relation — the per-series
  * partitioning is the parallelism axis at scale.
  */
object Detectors {

  /** kats/detectors/outlier.py:OutlierDetector — decompose, then flag rows
    * whose residual lies outside [Q1 - m*IQR, Q3 + m*IQR] (default m=3).
    */
  def outlierIqr(df: DataFrame, s: TSSchema, iqrMult: Double = 3.0): DataFrame = {
    val d = Decompose.additive(df, s)
    val q = d.groupBy(s.keyCols: _*)
      .agg(expr("percentile(resid, 0.25)").as("q1"), expr("percentile(resid, 0.75)").as("q3"))
      .withColumn("lo", col("q1") - (col("q3") - col("q1")) * iqrMult)
      .withColumn("hi", col("q3") + (col("q3") - col("q1")) * iqrMult)
    d.join(broadcast(q), s.keys)
      .where(col("resid") < col("lo") || col("resid") > col("hi"))
      .select((s.keyCols :+ col(s.ts) :+ col(s.value) :+ col("resid")): _*)
  }

  /** Global z-score outliers (rolling_stats_model.py flavor). */
  def outlierZscore(df: DataFrame, s: TSSchema, z: Double = 3.0): DataFrame = {
    val w = Window.partitionBy(s.keyCols: _*)
    df.withColumn("z", round((col(s.value) - avg(s.value).over(w)) / stddev_samp(col(s.value)).over(w), 6))
      .where(abs(col("z")) > z)
  }

  /** Two-window Welch t-test (stat_sig_detector.py): is the test window's
    * mean significantly different from control's?
    */
  def statSig(df: DataFrame, s: TSSchema, cutoff: String): DataFrame = {
    val inTest = col(s.ts) >= lit(cutoff).cast("timestamp")
    df.groupBy(s.keyCols: _*)
      .agg(
        count(when(!inTest, 1)).as("n1"),
        avg(when(!inTest, col(s.value))).as("m1"),
        var_samp(when(!inTest, col(s.value))).as("v1"),
        count(when(inTest, 1)).as("n2"),
        avg(when(inTest, col(s.value))).as("m2"),
        var_samp(when(inTest, col(s.value))).as("v2"))
      .withColumn("t", round((col("m2") - col("m1")) / sqrt(col("v1") / col("n1") + col("v2") / col("n2")), 6))
      .withColumn("significant", (abs(col("t")) > 1.96).cast("int"))
      .select((s.keyCols ++ Seq(col("n1"), col("n2"), round(col("m1"), 6).as("m1"),
        round(col("m2"), 6).as("m2"), col("t"), col("significant"))): _*)
  }

  /** One-pass CUSUM changepoint (cusum_detection.py core statistic):
    * cp = argmax_t |Σ_{i≤t}(x_i - x̄)|. Cumulative sums are computed in ts
    * order so the float result is deterministic across engines.
    */
  def cusum(df: DataFrame, s: TSSchema): DataFrame = {
    val wKey = Window.partitionBy(s.keyCols: _*)
    val wCum = s.orderedWindow.rowsBetween(Window.unboundedPreceding, 0)
    val withCum = df
      .withColumn("_mu", avg(s.value).over(wKey))
      .withColumn("_cum", sum(col(s.value) - col("_mu")).over(wCum))
    val wRank = Window.partitionBy(s.keyCols: _*).orderBy(abs(col("_cum")).desc, col(s.ts))
    withCum
      .withColumn("_rn", row_number().over(wRank))
      .where(col("_rn") === 1)
      .select((s.keyCols ++ Seq(col(s.ts).as("cp_ts"), round(col("_cum"), 6).as("cusum"),
        when(col("_cum") > 0, "up").otherwise("down").as("direction"))): _*)
  }

  /** Z-score on smoothed lag-k differences (robust_stat_detection.py). */
  def robustStat(df: DataFrame, s: TSSchema, smoothWindow: Int = 5, lagK: Int = 12, z: Double = 3.0): DataFrame = {
    val wSmooth = s.orderedWindow.rowsBetween(-(smoothWindow - 1), 0)
    val wKey = Window.partitionBy(s.keyCols: _*)
    df.withColumn("_sm", round(avg(s.value).over(wSmooth), 6))
      .withColumn("_d", col("_sm") - lag("_sm", lagK).over(s.orderedWindow))
      .withColumn("zscore", round((col("_d") - avg("_d").over(wKey)) / stddev_samp(col("_d")).over(wKey), 6))
      .where(abs(col("zscore")) > z)
      .select((s.keyCols ++ Seq(col(s.ts), col(s.value), col("zscore"))): _*)
  }

  /** Max window-mean level shift (tsfeatures get_level_shift +
    * detectors/threshold flavor): at each t compare the trailing and
    * leading w-row means; report the argmax shift per series.
    */
  def levelShift(df: DataFrame, s: TSSchema, w: Int = 24): DataFrame = {
    val wl = s.orderedWindow.rowsBetween(-(w - 1), 0)
    val wr = s.orderedWindow.rowsBetween(1, w)
    val wKey = Window.partitionBy(s.keyCols: _*)
    val base = df
      .withColumn("_lm", avg(s.value).over(wl))
      .withColumn("_rm", avg(s.value).over(wr))
      .withColumn("_nl", count(lit(1)).over(wl))
      .withColumn("_nr", count(lit(1)).over(wr))
      .where(col("_nl") === w && col("_nr") === w)
      .withColumn("shift", round(abs(col("_rm") - col("_lm")), 6))
    val wRank = Window.partitionBy(s.keyCols: _*).orderBy(col("shift").desc, col(s.ts))
    base.withColumn("_rn", row_number().over(wRank)).where(col("_rn") === 1)
      .select((s.keyCols ++ Seq(col(s.ts).as("shift_ts"), col("shift"))): _*)
  }

  /** Static threshold detection at a per-series quantile (threshold_detector.py).
    * The quantile is a groupBy aggregate + broadcast join back — a window
    * percentile would re-sort the frame per row.
    */
  def thresholdDetect(df: DataFrame, s: TSSchema, q: Double = 0.95): DataFrame = {
    val thr = df.groupBy(s.keyCols: _*).agg(expr(s"percentile(${s.value}, $q)").as("_thr"))
    df.join(broadcast(thr), s.keys)
      .where(col(s.value) > col("_thr"))
      .select((s.keyCols ++ Seq(col(s.ts), col(s.value), round(col("_thr"), 6).as("threshold"))): _*)
  }

  /** Hour-of-day volume profile (hourly_ratio_detection.py): each series'
    * share of value by hour; flags the peak hour.
    */
  def hourlyRatio(df: DataFrame, s: TSSchema): DataFrame = {
    val wKey = Window.partitionBy(s.keyCols: _*)
    val prof = df
      .groupBy((s.keyCols :+ hour(col(s.ts)).as("hod")): _*)
      .agg(sum(s.value).as("_v"))
      .withColumn("share", round(col("_v") / sum("_v").over(wKey), 6))
    val wRank = Window.partitionBy(s.keyCols: _*).orderBy(col("share").desc, col("hod"))
    prof.withColumn("is_peak", (row_number().over(wRank) === 1).cast("int"))
      .select((s.keyCols ++ Seq(col("hod"), col("share"), col("is_peak"))): _*)
  }

  /** ACF-based seasonality detection (seasonality.py:ACFDetector): biased
    * ACF at candidate lags; seasonal when acf > 2/√n. Expects a gap-free
    * grid (lag counts rows).
    */
  def seasonalityAcf(df: DataFrame, s: TSSchema, lags: Seq[Int] = Seq(24, 168)): DataFrame = {
    val wKey = Window.partitionBy(s.keyCols: _*)
    val base = df
      .withColumn("_mu", avg(s.value).over(wKey))
      .withColumn("_n", count(lit(1)).over(wKey))
      .withColumn("_dev", col(s.value) - col("_mu"))
    lags.map { k =>
      base
        .withColumn("_devk", lag("_dev", k).over(s.orderedWindow))
        .groupBy(s.keyCols: _*)
        .agg(
          (sum(when(col("_devk").isNotNull, col("_dev") * col("_devk"))) / sum(col("_dev") * col("_dev"))).as("_acf"),
          max("_n").as("_nn"))
        .select((s.keyCols ++ Seq(lit(k).as("lag"), round(col("_acf"), 6).as("acf"),
          // coalesce: a constant series has acf = 0/0 = NULL, and the
          // oracle's CASE WHEN ... THEN 1 ELSE 0 lands in ELSE — mirror
          // that 0 instead of letting the NULL comparison leak through
          coalesce((col("_acf") > lit(2.0) / sqrt(col("_nn"))).cast("int"), lit(0))
            .as("seasonal"))): _*)
    }.reduce(_ unionByName _)
  }

  /** Merge consecutive anomalous points into windows
    * (detector_consts.py:AnomalyResponse) — gaps-and-islands.
    */
  def anomalyWindows(df: DataFrame, s: TSSchema, z: Double = 2.0): DataFrame = {
    val wKey = Window.partitionBy(s.keyCols: _*)
    val flagged = df
      .withColumn("z", (col(s.value) - avg(s.value).over(wKey)) / stddev_samp(col(s.value)).over(wKey))
      .withColumn("_rn", row_number().over(s.orderedWindow))
      .where(abs(col("z")) > z)
    val wIsl = Window.partitionBy(s.keyCols: _*).orderBy(col(s.ts))
    flagged
      .withColumn("_grp", col("_rn") - row_number().over(wIsl))
      .groupBy((s.keyCols :+ col("_grp")): _*)
      .agg(min(s.ts).as("win_start"), max(s.ts).as("win_end"),
        count(lit(1)).as("npoints"), round(max(abs(col("z"))), 6).as("peak_z"))
      .drop("_grp")
  }
}
