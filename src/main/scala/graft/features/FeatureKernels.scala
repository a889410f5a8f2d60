package graft.features

/** Pure per-series kernels for features whose algorithms aren't
  * ANSI-SQL-expressible (kats/tsfeatures/tsfeatures.py). Each runs on one
  * collected series (SeriesOps) — O(n)–O(n²) on bounded arrays, parallel
  * across series. No external deps beyond breeze (ships with Spark MLlib).
  */
object FeatureKernels {

  /** Biased ACF ρ_1..ρ_maxLag (statsmodels acf default estimator). */
  def acf(xs: Array[Double], maxLag: Int): Array[Double] = {
    val n = xs.length
    val mu = xs.sum / n
    var denom = 0.0
    var i = 0
    while (i < n) { val d = xs(i) - mu; denom += d * d; i += 1 }
    val out = new Array[Double](maxLag)
    var k = 1
    while (k <= maxLag && k < n) {
      var num = 0.0
      var t = k
      while (t < n) { num += (xs(t) - mu) * (xs(t - k) - mu); t += 1 }
      out(k - 1) = if (denom > 0) num / denom else 0.0
      k += 1
    }
    out
  }

  /** PACF via Durbin-Levinson on the biased ACF (get_pacf_features). */
  def pacf(xs: Array[Double], maxLag: Int): Array[Double] = {
    val rho = acf(xs, maxLag)
    val phi = Array.ofDim[Double](maxLag + 1, maxLag + 1)
    val out = new Array[Double](maxLag)
    if (maxLag >= 1) { phi(1)(1) = rho(0); out(0) = rho(0) }
    var k = 2
    while (k <= maxLag) {
      var num = rho(k - 1)
      var den = 1.0
      var j = 1
      while (j < k) { num -= phi(k - 1)(j) * rho(k - 1 - j); den -= phi(k - 1)(j) * rho(j - 1); j += 1 }
      val pk = if (math.abs(den) > 1e-12) num / den else 0.0
      phi(k)(k) = pk
      j = 1
      while (j < k) { phi(k)(j) = phi(k - 1)(j) - pk * phi(k - 1)(k - j); j += 1 }
      out(k - 1) = pk
      k += 1
    }
    out
  }

  /** Normalized Shannon entropy of the one-sided periodogram PSD
    * (get_spectral_entropy; scipy.signal.periodogram semantics: constant
    * detrend, boxcar window, fs=1, density scaling, one-sided doubling).
    */
  def spectralEntropy(xs: Array[Double]): Double = {
    val n = xs.length
    if (n < 4) return 0.0
    val mu = xs.sum / n
    val m = n / 2 + 1
    val psd = new Array[Double](m)
    var k = 0
    while (k < m) {
      var re = 0.0; var im = 0.0
      val w = 2.0 * math.Pi * k / n
      var t = 0
      while (t < n) { val v = xs(t) - mu; re += v * math.cos(w * t); im -= v * math.sin(w * t); t += 1 }
      psd(k) = (re * re + im * im) / n
      if (k != 0 && !(n % 2 == 0 && k == m - 1)) psd(k) *= 2
      k += 1
    }
    val total = psd.sum
    if (total <= 0) return 0.0
    var h = 0.0
    var i = 0
    while (i < m) {
      val p = psd(i) / total
      if (p > 0) h += p * math.log(p) / math.log(2)
      i += 1
    }
    -(h / (math.log(m) / math.log(2)))
  }

  /** Hurst exponent (get_hurst): slope of log(popstd(x_{t+τ}-x_t)) on
    * log(τ) over τ = 2..min(lagSize, n-1)-1.
    */
  def hurst(xs: Array[Double], lagSize: Int = 30): Double = {
    val n = xs.length
    val lags = 2 until math.min(lagSize, n - 1)
    if (lags.isEmpty) return 0.0
    val pts = lags.map { lag =>
      val m = n - lag
      var s = 0.0; var s2 = 0.0
      var t = 0
      while (t < m) { val d = xs(t + lag) - xs(t); s += d; s2 += d * d; t += 1 }
      val v = s2 / m - (s / m) * (s / m)
      (math.log(lag.toDouble), math.log(math.sqrt(math.max(v, 1e-300))))
    }
    val k = pts.length
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum; val sxy = pts.map(p => p._1 * p._2).sum
    val slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    if (slope.isNaN) 0.0 else slope
  }

  /** Engle's ARCH LM statistic (get_het_arch; statsmodels het_arch):
    * nobs·R² from regressing x² on its first `nlags` lags.
    */
  def archLm(xs: Array[Double], nlagsOpt: Option[Int] = None): Double = {
    val n = xs.length
    val p = nlagsOpt.getOrElse(math.min(10, n / 5))
    if (p < 1 || n <= p + 1) return 0.0
    val y2 = xs.map(v => v * v)
    val rows = n - p
    val X = breeze.linalg.DenseMatrix.zeros[Double](rows, p + 1)
    val y = breeze.linalg.DenseVector.zeros[Double](rows)
    var i = 0
    while (i < rows) {
      X(i, 0) = 1.0
      var j = 1
      while (j <= p) { X(i, j) = y2(p + i - j); j += 1 }
      y(i) = y2(p + i)
      i += 1
    }
    val beta = X \ y
    val fitted = X * beta
    val muY = breeze.linalg.sum(y) / rows
    var sse = 0.0; var sst = 0.0
    i = 0
    while (i < rows) { val e = y(i) - fitted(i); sse += e * e; val d = y(i) - muY; sst += d * d; i += 1 }
    if (sst <= 0) 0.0 else rows * (1.0 - sse / sst)
  }

  /** firstmin_ac / firstzero_ac (get_special_ac, replicated exactly). */
  def specialAc(xs: Array[Double]): (Int, Int) = {
    val ac = acf(xs, xs.length - 1)
    var i = 0
    while (i < ac.length - 1 && ac(i) > ac(i + 1)) i += 1
    val firstMin = i + 1
    var j = 0
    while (j < ac.length - 1 && !(ac(j) > 0 && ac(j + 1) < 0)) j += 1
    val firstZero = j + 2
    (firstMin, firstZero)
  }

  /** KPSS statistic, trend-stationary variant with nlags=1
    * (get_unitroot_kpss; kpss(x, regression="ct", nlags=1)): detrend on
    * [1, t], η = Σ S_t²/n², long-run variance γ0 + 2·(1/2)·γ1.
    */
  def kpss(xs: Array[Double]): Double = {
    val n = xs.length
    if (n < 4) return 0.0
    // OLS residuals of x on [1, t]
    var st = 0.0; var sx = 0.0; var stt = 0.0; var stx = 0.0
    var t = 0
    while (t < n) { val tt = (t + 1).toDouble; st += tt; sx += xs(t); stt += tt * tt; stx += tt * xs(t); t += 1 }
    val slope = (n * stx - st * sx) / (n * stt - st * st)
    val icept = (sx - slope * st) / n
    val e = new Array[Double](n)
    t = 0
    while (t < n) { e(t) = xs(t) - icept - slope * (t + 1); t += 1 }
    var cum = 0.0; var eta = 0.0
    t = 0
    while (t < n) { cum += e(t); eta += cum * cum; t += 1 }
    eta /= (n.toDouble * n)
    var g0 = 0.0; var g1 = 0.0
    t = 0
    while (t < n) { g0 += e(t) * e(t); if (t > 0) g1 += e(t) * e(t - 1); t += 1 }
    val lrv = g0 / n + 2.0 * 0.5 * (g1 / n)
    if (lrv <= 0) 0.0 else eta / lrv
  }
}
