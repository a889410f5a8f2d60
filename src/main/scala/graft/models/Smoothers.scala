package graft.models

/** Exponential-smoothing family forecasters (kats/models/holtwinters.py,
  * theta.py re-derived). Both fixed-parameter runs and deterministic
  * SSE-grid parameter fits (the reference's MLE search re-derived as a
  * grid so results are engine-reproducible). Pure per-series kernels:
  * O(n) scans applied to collected series, parallel across series.
  */
object Smoothers {

  /** Simple exponential smoothing; returns the flat h-step forecast level. */
  def ses(xs: Array[Double], alpha: Double): Double = {
    var l = xs(0)
    var i = 1
    while (i < xs.length) { l = alpha * xs(i) + (1 - alpha) * l; i += 1 }
    l
  }

  /** Holt's linear method; returns (level, trend). Forecast_h = l + h·b. */
  def holt(xs: Array[Double], alpha: Double, beta: Double): (Double, Double) = {
    if (xs.length < 2) return (xs.headOption.getOrElse(0.0), 0.0)
    var l = xs(0)
    var b = xs(1) - xs(0)
    var i = 1
    while (i < xs.length) {
      val lPrev = l
      l = alpha * xs(i) + (1 - alpha) * (l + b)
      b = beta * (l - lPrev) + (1 - beta) * b
      i += 1
    }
    (l, b)
  }

  /** Damped-trend Holt (the `damped=True` branch of holtwinters.py:42,
    * statsmodels semantics re-derived): the trend contribution is
    * discounted by φ each step, so long-horizon forecasts flatten toward
    * l + φ/(1−φ)·b instead of extrapolating linearly.
    * forecast_h = l + (Σ_{j=1..h} φ^j)·b.
    */
  def holtDamped(xs: Array[Double], alpha: Double, beta: Double, phi: Double): (Double, Double) = {
    if (xs.length < 2) return (xs.headOption.getOrElse(0.0), 0.0)
    var l = xs(0)
    var b = xs(1) - xs(0)
    var i = 1
    while (i < xs.length) {
      val lPrev = l
      l = alpha * xs(i) + (1 - alpha) * (l + phi * b)
      b = beta * (l - lPrev) + (1 - beta) * (phi * b)
      i += 1
    }
    (l, b)
  }

  /** Multiplicative-seasonal Holt-Winters (the `seasonal='mul'` branch of
    * holtwinters.py:43): seasonal components are RATIOS, so the seasonal
    * swing scales with the level. Initialization mirrors the additive
    * form with trend-adjusted ratios; levels and seasonals clamp at 1e-6
    * (identically in the oracle) so zero buckets can't divide by zero.
    * forecast_h = (l + h·b) · s[(n+h−1) mod m].
    */
  def holtWintersMul(xs: Array[Double], m: Int, alpha: Double, beta: Double, gamma: Double)
      : (Double, Double, Array[Double]) = {
    val n = xs.length
    require(n >= 2 * m, s"need two full seasons, got $n < ${2 * m}")
    val mean1 = xs.take(m).sum / m
    val mean2 = xs.slice(m, 2 * m).sum / m
    var l = mean1
    var b = (mean2 - mean1) / m
    val s = Array.tabulate(m) { i =>
      math.max(xs(i) / math.max(mean1 + (i - (m - 1) / 2.0) * b, 1e-6), 1e-6)
    }
    var t = m
    while (t < n) {
      val si = t % m
      val lPrev = l
      l = math.max(alpha * (xs(t) / s(si)) + (1 - alpha) * (l + b), 1e-6)
      b = beta * (l - lPrev) + (1 - beta) * b
      s(si) = math.max(gamma * (xs(t) / l) + (1 - gamma) * s(si), 1e-6)
      t += 1
    }
    (l, b, s)
  }

  /** Additive Holt-Winters with period m; classical initialization
    * (first-season mean level, cross-season trend, first-season seasonal
    * offsets). Returns (level, trend, seasonals) after the full scan;
    * forecast_h = l + h·b + s[(n + h - 1) mod m].
    */
  def holtWinters(xs: Array[Double], m: Int, alpha: Double, beta: Double, gamma: Double)
      : (Double, Double, Array[Double]) = {
    val n = xs.length
    require(n >= 2 * m, s"need two full seasons, got $n < ${2 * m}")
    val mean1 = xs.take(m).sum / m
    val mean2 = xs.slice(m, 2 * m).sum / m
    var l = mean1
    var b = (mean2 - mean1) / m
    // trend-adjusted initial seasonals: remove the in-season trend ramp so
    // a strong trend doesn't leak into the seasonal components
    val s = Array.tabulate(m)(i => xs(i) - (mean1 + (i - (m - 1) / 2.0) * b))
    var t = m
    while (t < n) {
      val si = t % m
      val lPrev = l
      l = alpha * (xs(t) - s(si)) + (1 - alpha) * (l + b)
      b = beta * (l - lPrev) + (1 - beta) * b
      s(si) = gamma * (xs(t) - l) + (1 - gamma) * s(si)
      t += 1
    }
    (l, b, s)
  }

  /** One-step-ahead SSE of an SES run at the given α. */
  def sesSse(xs: Array[Double], alpha: Double): Double = {
    var l = xs(0)
    var sse = 0.0
    var i = 1
    while (i < xs.length) {
      val err = xs(i) - l
      sse += err * err
      l = alpha * xs(i) + (1 - alpha) * l
      i += 1
    }
    sse
  }

  /** Fitted-α SES (kats/models/holtwinters.py optimizes params via MLE;
    * here a deterministic grid over α ∈ {0.05..0.95 step 0.05} minimizing
    * one-step-ahead SSE — engine-reproducible). Returns (α*, level, sse).
    */
  def sesOpt(xs: Array[Double]): (Double, Double, Double) = {
    var bestA = 0.05; var bestSse = Double.MaxValue
    var k = 1
    while (k <= 19) {
      val a = k * 5 / 100.0
      val sse = sesSse(xs, a)
      if (sse < bestSse) { bestSse = sse; bestA = a }
      k += 1
    }
    (bestA, ses(xs, bestA), bestSse)
  }

  private def holtSse(xs: Array[Double], alpha: Double, beta: Double): Double = {
    var l = xs(0)
    var b = xs(1) - xs(0)
    var sse = 0.0
    var i = 1
    while (i < xs.length) {
      val err = xs(i) - (l + b)
      sse += err * err
      val lPrev = l
      l = alpha * xs(i) + (1 - alpha) * (l + b)
      b = beta * (l - lPrev) + (1 - beta) * b
      i += 1
    }
    sse
  }

  /** Fitted-(α, β) Holt via the same deterministic grid (step 0.05).
    * Returns (α*, β*, level, trend, sse).
    */
  def holtOpt(xs: Array[Double]): (Double, Double, Double, Double, Double) = {
    var bestA = 0.05; var bestB = 0.05; var bestSse = Double.MaxValue
    var i = 1
    while (i <= 19) {
      var j = 1
      while (j <= 19) {
        val sse = holtSse(xs, i * 5 / 100.0, j * 5 / 100.0)
        if (sse < bestSse) { bestSse = sse; bestA = i * 5 / 100.0; bestB = j * 5 / 100.0 }
        j += 1
      }
      i += 1
    }
    val (l, b) = holt(xs, bestA, bestB)
    (bestA, bestB, l, b, bestSse)
  }

  /** One-step-ahead SSE of a Holt-Winters run at the given params. */
  def hwSse(xs: Array[Double], m: Int, alpha: Double, beta: Double, gamma: Double): Double = {
    val n = xs.length
    val mean1 = xs.take(m).sum / m
    val mean2 = xs.slice(m, 2 * m).sum / m
    var l = mean1
    var b = (mean2 - mean1) / m
    val s = Array.tabulate(m)(i => xs(i) - (mean1 + (i - (m - 1) / 2.0) * b))
    var sse = 0.0
    var t = m
    while (t < n) {
      val si = t % m
      val err = xs(t) - (l + b + s(si))
      sse += err * err
      val lPrev = l
      l = alpha * (xs(t) - s(si)) + (1 - alpha) * (l + b)
      b = beta * (l - lPrev) + (1 - beta) * b
      s(si) = gamma * (xs(t) - l) + (1 - gamma) * s(si)
      t += 1
    }
    sse
  }

  /** Fitted-(α, β, γ) additive Holt-Winters via a coarse deterministic
    * grid (step 0.1 each — 729 O(n) scans per series). Returns
    * (α*, β*, γ*, level, trend, seasonals, sse).
    */
  def holtWintersOpt(xs: Array[Double], m: Int)
      : (Double, Double, Double, Double, Double, Array[Double], Double) = {
    var bestA = 0.1; var bestB = 0.1; var bestG = 0.1; var bestSse = Double.MaxValue
    var i = 1
    while (i <= 9) {
      var j = 1
      while (j <= 9) {
        var k = 1
        while (k <= 9) {
          val sse = hwSse(xs, m, i / 10.0, j / 10.0, k / 10.0)
          if (sse < bestSse) { bestSse = sse; bestA = i / 10.0; bestB = j / 10.0; bestG = k / 10.0 }
          k += 1
        }
        j += 1
      }
      i += 1
    }
    val (l, b, s) = holtWinters(xs, m, bestA, bestB, bestG)
    (bestA, bestB, bestG, l, b, s, bestSse)
  }

  /** Theta method (θ=2; kats/models/theta.py re-derived): decompose into
    * the linear-trend theta-0 line and the double-curvature theta-2 line
    * Z_t = 2x_t - (a + b·t); combine SES(Z) with the extrapolated trend.
    * Returns forecast for horizon h (1-based).
    */
  def theta(xs: Array[Double], h: Int, alpha: Double = 0.2): Double = {
    val n = xs.length
    // OLS of x on t = 0..n-1
    var st = 0.0; var sx = 0.0; var stt = 0.0; var stx = 0.0
    var t = 0
    while (t < n) { st += t; sx += xs(t); stt += t.toDouble * t; stx += t * xs(t); t += 1 }
    val b = (n * stx - st * sx) / (n * stt - st * st)
    val a = (sx - b * st) / n
    val z = Array.tabulate(n)(i => 2 * xs(i) - (a + b * i))
    val zf = ses(z, alpha)
    0.5 * (zf + a + b * (n - 1 + h))
  }
}
