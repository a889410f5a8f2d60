package graft.models

/** GARCH(1,1) conditional volatility with variance targeting — the
  * volatility-clustering reading of a series the reference's ARCH-LM
  * feature (get_het_arch) only *tests* for. Full GARCH MLE needs a
  * nonlinear optimizer; the deterministic production shortcut is
  * variance targeting (Engle & Mezrich 1996): pin the long-run variance
  * at the sample variance of returns, fix the standard sticky pair
  * (α=0.1, β=0.85), and ω = σ̂²(1−α−β) follows. The recursion
  *
  *   σ²_t = ω + α·r²_{t−1} + β·σ²_{t−1},  σ²_1 = σ̂²
  *
  * is replayed by the oracle as a recursive CTE; the snapped σ̂² and the
  * Scala-printed ω literal make both engines run identical floats.
  */
object Garch {

  val Alpha = 0.1
  val Beta = 0.85

  private def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** xs = ordered series values; the model runs on first differences.
    * Returns Array(nReturns, omega, sigmaLast, sigmaMean, volRatio,
    * clustered) — volRatio = σ_last/σ̂, clustered = volRatio > 1.5 or
    * < 1/1.5 (current regime far from the long-run level).
    */
  def fit(xs: Array[Double]): Array[Double] = {
    val n = xs.length
    require(n >= 3, s"need at least 3 points, got $n")
    val r = new Array[Double](n - 1)
    var i = 1
    while (i < n) { r(i - 1) = xs(i) - xs(i - 1); i += 1 }
    val m = r.length
    var sx = 0.0; var ss = 0.0
    i = 0
    while (i < m) { sx += r(i); ss += r(i) * r(i); i += 1 }
    val vT = r6(math.max((ss - sx * sx / m) / m, 1e-12))
    val omega = vT * (1.0 - Alpha - Beta)
    var s2 = vT
    var sumSigma = 0.0 + math.sqrt(s2)
    var t = 1
    while (t < m) {
      s2 = omega + Alpha * (r(t - 1) * r(t - 1)) + Beta * s2
      sumSigma = sumSigma + math.sqrt(s2)
      t += 1
    }
    val sigmaLast = math.sqrt(s2)
    val sigmaMean = sumSigma / m
    val ratio = sigmaLast / math.sqrt(vT)
    Array(m.toDouble, omega, sigmaLast, sigmaMean, ratio,
      if (ratio > 1.5 || ratio < 1.0 / 1.5) 1.0 else 0.0)
  }
}
