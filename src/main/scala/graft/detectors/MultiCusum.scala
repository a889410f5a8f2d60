package graft.detectors

/** Multivariate CUSUM changepoint in the mean of a d=2 Gaussian series
  * (kats/detectors/cusum_detection.py:740 MultiCUSUMDetector, re-derived
  * for the bivariate (value, count) hourly pair — the same metric pair
  * q_mk_multivariate uses).
  *
  * Reference semantics reproduced exactly:
  * - start point = n//2 (the reference's default, NOT the univariate
  *   argmin init), then up to 10 refinement steps: segment means before/
  *   after the current point, si_i = Q(x_i−μ0) − Q(x_i−μ1) under the
  *   FULL-series pooled covariance (σ0 = σ1 = cov(ts), so the log-det
  *   terms cancel), next point = clamp(argmin cumsum(si), 1, n−2).
  *   Convergence-break equals always-running the loop (a converged point
  *   is a fixed point of the update — the CusumV2 convention).
  * - llr = −2(A − B) with A = Σ_{i≤cp}[Q(x_i−μ̃) − Q(x_i−μ0)],
  *   B = Σ_{i>cp}[Q(x_i−μ̃) − Q(x_i−μ1)] (cusum_detection.py:815 _get_llr
  *   with sigma_pooled = sigma0 = sigma1 = cov(ts)); detection gate
  *   llr > χ²(0.99, d+1=3), and p_value = 1 − chi2.cdf(llr, 3) exactly
  *   as the reference reports it — the odd-df χ² tail via ChiSq.sf's
  *   fixed-length incomplete-gamma series (SQL-replayable; this closed
  *   the round-8 "no SQL form for erf" deviation). p is evaluated on the
  *   6-dp-snapped llr so both engines feed the series identical input.
  *
  * The 2×2 inverse is closed-form (Cramer), so
  * Q(dx,dy) = (c·dx² − 2b·dx·dy + a·dy²)/det for Σ=[[a,b],[b,c]].
  * Means and covariance entries snap to the 6-dp grid so the DuckDB
  * oracle (which replays all 10 iterations as unrolled CTE layers) runs
  * the identical float sequence.
  */
object MultiCusum {

  val MaxIter = 10
  val Chi2Crit3 = 11.344866730144357 // chi2.ppf(0.99, df=3), erf-bisected

  private def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** xs, ys ordered by time. Returns Array(cpIdx, m0x, m0y, m1x, m1y,
    * deltaX, deltaY, llr, stable, detected, pValue).
    */
  def detect(xs: Array[Double], ys: Array[Double]): Array[Double] = {
    val n = xs.length
    require(n >= 4 && ys.length == n, s"need at least 4 aligned points, got $n/${ys.length}")

    def meanR(a: Array[Double], lo: Int, hiExcl: Int): Double = {
      var s = 0.0; var i = lo
      while (i < hiExcl) { s += a(i); i += 1 }
      s / (hiExcl - lo)
    }

    // full-series pooled covariance around the snapped mean (the snap is a
    // ~1e-13 perturbation of np.cov; it buys bit-identical oracle replay)
    val mtx = r6(meanR(xs, 0, n)); val mty = r6(meanR(ys, 0, n))
    var sxx = 0.0; var sxy = 0.0; var syy = 0.0
    var i = 0
    while (i < n) {
      val dx = xs(i) - mtx; val dy = ys(i) - mty
      sxx += dx * dx; sxy += dx * dy; syy += dy * dy
      i += 1
    }
    val a = r6(sxx / (n - 1)); val b = r6(sxy / (n - 1)); val c = r6(syy / (n - 1))
    val det = math.max(r6(a * c - b * b), 1e-12)
    def q(dx: Double, dy: Double): Double = (c * dx * dx - 2.0 * b * dx * dy + a * dy * dy) / det

    var cp = n / 2
    var prev = -1
    var it = 0
    while (it < MaxIter) {
      val m0x = r6(meanR(xs, 0, cp + 1)); val m0y = r6(meanR(ys, 0, cp + 1))
      val m1x = r6(meanR(xs, cp + 1, n)); val m1y = r6(meanR(ys, cp + 1, n))
      prev = cp
      var acc = 0.0; var best = 0; var bestV = Double.MaxValue
      var k = 0
      while (k < n) {
        acc += q(xs(k) - m0x, ys(k) - m0y) - q(xs(k) - m1x, ys(k) - m1y)
        if (acc < bestV) { bestV = acc; best = k } // np.argmin keeps the FIRST min
        k += 1
      }
      cp = math.max(1, math.min(best, n - 2))
      it += 1
    }
    val stable = if (cp == prev) 1.0 else 0.0

    val m0x = r6(meanR(xs, 0, cp + 1)); val m0y = r6(meanR(ys, 0, cp + 1))
    val m1x = r6(meanR(xs, cp + 1, n)); val m1y = r6(meanR(ys, cp + 1, n))
    var sumA = 0.0; var sumB = 0.0
    var k = 0
    while (k < n) {
      val qt = q(xs(k) - mtx, ys(k) - mty)
      if (k <= cp) sumA += qt - q(xs(k) - m0x, ys(k) - m0y)
      else sumB += qt - q(xs(k) - m1x, ys(k) - m1y)
      k += 1
    }
    val llr = -2.0 * (sumA - sumB)
    Array(cp.toDouble, m0x, m0y, m1x, m1y, m1x - m0x, m1y - m0y, llr, stable,
      if (llr > Chi2Crit3) 1.0 else 0.0, ChiSq.sf(r6(llr), 3))
  }
}
