package graft.detectors

/** Iterative CUSUM changepoint with the Gaussian log-likelihood-ratio
  * significance gate (kats/detectors/cusum_detection.py:_get_change_point
  * and :_get_llr, re-derived).
  *
  * Semantics: starting from the argmin/argmax of cumsum(x - mean), run
  * exactly `maxIter` refinement steps — each re-estimates the segment
  * means, recomputes cusum against their midpoint and re-picks the
  * clamped arg extreme. A converged changepoint is a fixed point of the
  * update, so always-running the loop equals the reference's
  * break-on-convergence (they differ only when the update oscillates,
  * where the reference also reports an unstable point). `stable` = the
  * last two iterates agreed.
  *
  * The LLR tests H0 (one Gaussian: μ̃, σ̃ population) against H1 (two
  * means with pooled scale); p = 1 − χ²cdf(llr, 2) = exp(−llr/2), and the
  * detection gate is p < 0.01 (llr > 9.21034). Every quantity is a plain
  * aggregate over the two segments, so the DuckDB oracle replays the
  * whole computation including the 10 unrolled refinement iterations.
  */
object CusumV2 {

  val MaxIter = 10
  val LlrThreshold = 9.21034037197618 // chi2.ppf(0.99, df=2)

  /** Returns Array(cpIdx, mu0, mu1, delta, llr, pValue, stable, detected).
    * `increase` picks the argmin branch (detects an upward shift).
    */
  def detect(xs: Array[Double], increase: Boolean, maxIter: Int = MaxIter): Array[Double] = {
    val n = xs.length
    require(n >= 4, s"need at least 4 points, got $n")

    def argPick(cs: Array[Double]): Int = {
      var best = 0
      var i = 1
      while (i < n) {
        val better = if (increase) cs(i) < cs(best) else cs(i) > cs(best)
        if (better) best = i
        i += 1
      }
      best
    }
    def cumsumMinus(m: Double): Array[Double] = {
      val out = new Array[Double](n)
      var acc = 0.0
      var i = 0
      while (i < n) { acc += xs(i) - m; out(i) = acc; i += 1 }
      out
    }
    def meanRange(lo: Int, hiExcl: Int): Double = {
      var s = 0.0
      var i = lo
      while (i < hiExcl) { s += xs(i); i += 1 }
      s / (hiExcl - lo)
    }

    val mu = meanRange(0, n)
    var cp = math.min(argPick(cumsumMinus(mu)), n - 2)
    var prev = -1
    var it = 0
    while (it < maxIter) {
      val m0 = meanRange(0, cp + 1)
      val m1 = meanRange(cp + 1, n)
      prev = cp
      cp = math.max(1, math.min(argPick(cumsumMinus((m0 + m1) / 2)), n - 2))
      it += 1
    }
    val stable = cp == prev

    val mu0 = meanRange(0, cp + 1)
    val mu1 = meanRange(cp + 1, n)
    var ss0 = 0.0; var ss1 = 0.0; var ssT = 0.0
    var i = 0
    while (i < n) {
      val d = xs(i) - mu
      ssT += d * d
      if (i <= cp) { val e = xs(i) - mu0; ss0 += e * e }
      else { val e = xs(i) - mu1; ss1 += e * e }
      i += 1
    }
    val sigmaTilde = math.sqrt(ssT / n)
    var scale = math.sqrt((ss0 + ss1) / (n - 2))
    if (scale == 0) scale = sigmaTilde * 0.01
    // llr = -2 Σ [ln(scale/σ̃) + ½(((x-μseg)/scale)² − ((x-μ̃)/σ̃)²)]
    val llr = -2.0 * (n * math.log(scale / sigmaTilde)
      + 0.5 * ((ss0 + ss1) / (scale * scale) - ssT / (sigmaTilde * sigmaTilde)))
    val p = math.min(math.exp(-llr / 2), 1.0)
    Array(cp.toDouble, mu0, mu1, mu1 - mu0, llr, p,
      if (stable) 1.0 else 0.0, if (llr > LlrThreshold) 1.0 else 0.0)
  }
}
