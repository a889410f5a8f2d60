package graft.detectors

import graft.{SeriesOps, TSSchema}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bayesian Online Changepoint Detection, Normal unknown-mean model
  * (kats/detectors/bocpd.py:_BayesOnlineChangePoint._find_posterior;
  * Adams & MacKay 2007). Linear scan per collected series, parallel
  * across series.
  *
  * Reported change probability follows the reference's lagged convention
  * (bocpd.py:_construct_output): change_prob[t] = P(r_{t+lag} = lag),
  * i.e. a changepoint at t is confirmed once it has survived `lag`
  * observations; the final `lag` points and the first point report 0.
  */
object Bocpd {

  def changeProb(xs: Array[Double], hazard: Double = 0.01, lagN: Int = 10): Array[Double] = {
    val n = xs.length
    val out = new Array[Double](n)
    if (n < 2) return out
    val mean = xs.sum / n
    val variance = {
      var acc = 0.0; var i = 0
      while (i < n) { val d = xs(i) - mean; acc += d * d; i += 1 }
      math.max(acc / math.max(n - 1, 1), 1e-12)
    }
    // Observation noise from first differences: Var(x_t - x_{t-1}) = 2σ²
    // for iid noise, and the estimate is insensitive to level shifts —
    // unlike the overall variance, which a changepoint inflates.
    val sigma2 = {
      var acc = 0.0; var sumD = 0.0; var i = 1
      while (i < n) { sumD += xs(i) - xs(i - 1); i += 1 }
      val md = sumD / (n - 1)
      i = 1
      while (i < n) { val d = xs(i) - xs(i - 1) - md; acc += d * d; i += 1 }
      math.max(acc / (2.0 * math.max(n - 2, 1)), 1e-12)
    }
    val mu0 = mean; val v0 = variance // prior over segment mean
    // run-length posterior: index = run length in points seen since cp
    var rProb = Array(1.0)
    var rMu = Array(mu0 + (xs(0) - mu0) * (v0 / (v0 + sigma2)))
    var rV = Array(1.0 / (1.0 / v0 + 1.0 / sigma2))
    var t = 1
    while (t < n) {
      val x = xs(t)
      val k = rProb.length
      val growth = new Array[Double](k)
      var cp = 0.0
      var i = 0
      while (i < k) {
        val pv = rV(i) + sigma2
        val d = x - rMu(i)
        val pred = math.exp(-0.5 * d * d / pv) / math.sqrt(2 * math.Pi * pv)
        val joint = rProb(i) * pred
        growth(i) = joint * (1 - hazard)
        cp += joint * hazard
        i += 1
      }
      var total = cp
      i = 0; while (i < k) { total += growth(i); i += 1 }
      if (total <= 0 || total.isNaN) total = 1e-300
      val nProb = new Array[Double](k + 1)
      val nMu = new Array[Double](k + 1)
      val nV = new Array[Double](k + 1)
      // r=0: segment restarted at t, observe x under the prior
      val g0 = 1.0 / (1.0 / v0 + 1.0 / sigma2)
      nProb(0) = cp / total
      nV(0) = g0
      nMu(0) = g0 * (mu0 / v0 + x / sigma2)
      i = 0
      while (i < k) {
        nProb(i + 1) = growth(i) / total
        val g = 1.0 / (1.0 / rV(i) + 1.0 / sigma2)
        nV(i + 1) = g
        nMu(i + 1) = g * (rMu(i) / rV(i) + x / sigma2)
        i += 1
      }
      if (t >= lagN && lagN < nProb.length) out(t - lagN) = nProb(lagN)
      rProb = nProb; rMu = nMu; rV = nV
      t += 1
    }
    out(0) = 0.0 // the first point is never a changepoint (reference convention)
    out
  }

  /** Per-point change probability column `cp_prob`; returns the `topK`
    * most probable changepoints per series (threshold-free so quiet
    * series still report their ranking).
    */
  def detect(df: DataFrame, s: TSSchema, hazard: Double = 0.01, topK: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = SeriesOps.mapSeries(df, s, "cp_prob")(changeProb(_, hazard))
    val w = Window.partitionBy(s.keyCols: _*).orderBy(col("cp_prob").desc, col(s.ts))
    scored.withColumn("_rk", row_number().over(w)).where(col("_rk") <= topK).drop("_rk")
  }
}
