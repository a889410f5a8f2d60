package graft.models

import breeze.linalg.{DenseMatrix, DenseVector}

/** Least-squares forecasters that need a design matrix
  * (kats/models/harmonic_regression.py, prophet.py re-derived,
  * bayesian_var.py/var.py). Solved per collected series with breeze
  * (ships inside Spark MLlib) — the fit is on a reduced one-row-per-series
  * representation, so the cluster-scale axis stays the series count.
  */
object Regressors {

  /** OLS fit of y on X (ridge-regularized for rank safety). */
  def solve(x: DenseMatrix[Double], y: DenseVector[Double], ridge: Double = 1e-8): DenseVector[Double] = {
    val xtx = x.t * x
    var i = 0
    while (i < xtx.rows) { xtx(i, i) += ridge; i += 1 }
    xtx \ (x.t * y)
  }

  /** Harmonic regression (harmonic_regression.py): y ~ 1 + Σ_k [sin, cos]
    * (2πkt/period). Returns forecasts for horizons 1..h plus in-sample R².
    */
  def harmonic(xs: Array[Double], period: Int, orders: Int, h: Int): (Array[Double], Double) = {
    val n = xs.length
    val p = 1 + 2 * orders
    val X = DenseMatrix.zeros[Double](n, p)
    var t = 0
    while (t < n) {
      X(t, 0) = 1.0
      var k = 1
      while (k <= orders) {
        val w = 2 * math.Pi * k * t / period
        X(t, 2 * k - 1) = math.sin(w)
        X(t, 2 * k) = math.cos(w)
        k += 1
      }
      t += 1
    }
    val y = DenseVector(xs)
    val beta = solve(X, y)
    val fitted = X * beta
    val mu = xs.sum / n
    var sse = 0.0; var sst = 0.0
    t = 0
    while (t < n) { val e = y(t) - fitted(t); sse += e * e; val d = y(t) - mu; sst += d * d; t += 1 }
    val r2 = if (sst > 0) 1 - sse / sst else 0.0
    val out = Array.tabulate(h) { i =>
      val tt = n + i
      var v = beta(0)
      var k = 1
      while (k <= orders) {
        val w = 2 * math.Pi * k * tt / period
        v += beta(2 * k - 1) * math.sin(w) + beta(2 * k) * math.cos(w)
        k += 1
      }
      v
    }
    (out, r2)
  }

  /** Prophet-style additive model (prophet.py re-derived, not a port):
    * piecewise-linear trend with `nChangepoints` evenly spaced hinge
    * knots + daily Fourier seasonality, RIDGE-fit. Scope: this is the
    * residual BASELINE model for q_causal_impact's counterfactual and
    * q_prophet_detector's z-scores — deliberately the Gaussian-prior
    * analog, cheap and dense. The prophet queries proper
    * (q_prophet_lite/_logistic/_trend) use the exact Laplace-MAP
    * [[prophetMap]]/[[prophetMapFit]] instead. Returns forecasts for
    * horizons 1..h.
    */
  def prophetLite(xs: Array[Double], period: Int, orders: Int, nChangepoints: Int, h: Int): Array[Double] = {
    val n = xs.length
    val cps = Array.tabulate(nChangepoints)(i => (i + 1).toDouble * n / (nChangepoints + 1))
    val p = 2 + nChangepoints + 2 * orders
    def row(t: Double): Array[Double] = {
      val r = new Array[Double](p)
      r(0) = 1.0
      r(1) = t / n
      var j = 0
      while (j < nChangepoints) { r(2 + j) = math.max(0.0, (t - cps(j)) / n); j += 1 }
      var k = 1
      while (k <= orders) {
        val w = 2 * math.Pi * k * t / period
        r(2 + nChangepoints + 2 * (k - 1)) = math.sin(w)
        r(2 + nChangepoints + 2 * (k - 1) + 1) = math.cos(w)
        k += 1
      }
      r
    }
    val X = DenseMatrix.tabulate[Double](n, p)((i, j) => row(i.toDouble)(j))
    val beta = solve(X, DenseVector(xs), ridge = 1e-4)
    Array.tabulate(h) { i =>
      val r = row((n + i).toDouble)
      var v = 0.0
      var j = 0
      while (j < p) { v += r(j) * beta(j); j += 1 }
      v
    }
  }

  // ── Prophet Laplace-prior MAP — the fit behind q_prophet_lite,
  // q_prophet_logistic and q_prophet_trend ([[prophetLite]]'s ridge
  // remains only as the residual baseline for q_causal_impact /
  // q_prophet_detector). The reference (kats/models/prophet.py:32 → fbprophet →
  // Stan) fits the posterior mode of
  //   y ~ N(trend(k, m, δ) + Xβ, σ),  δⱼ ~ Laplace(0, τ),
  //   β ~ N(0, σ_β²), k, m ~ N(0, 5²),  τ = 0.05, σ_β = 10
  // by L-BFGS. With the piecewise-linear basis the MAP objective given a
  // plug-in σ̂ is an L1+L2-penalized least squares whose EXACT minimizer
  // is found finitely: the solution's changepoint signs partition the
  // space into 3^nCp orthants, each orthant's stationary point solves
  // CLOSED-FORM normal equations (G + Λ₂)θ = X'y − λ₁s with inactive
  // deltas pinned by identity rows; the MAP is the sign-FEASIBLE
  // stationary point of least objective. No iterative optimizer, no
  // convergence tolerance — and the DuckDB oracle replays the identical
  // enumeration because every input is a 6-dp-snapped shared moment and
  // the Gauss-Jordan arithmetic sequence is bit-identical on both
  // engines (the q_bayes_var shared-moment precedent).

  /** Round half away from zero at 6 / 9 dp — matches DuckDB round(). */
  private def snap(x: Double, scale: Double): Double = {
    val s = x * scale
    (if (s >= 0) math.floor(s + 0.5) else math.ceil(s - 0.5)) / scale
  }

  /** Sign patterns for the changepoint orthants, ordered by (active
    * count, lexicographic) so boundary ties resolve to the SPARSER
    * pattern on both engines. SHARED LITERAL: the oracle's VALUES table
    * is generated from this same sequence. */
  def prophetPatterns(nCp: Int): Seq[Seq[Int]] = {
    val all = (0 until math.pow(3, nCp).toInt).map { z =>
      var v = z
      Seq.fill(nCp) { val d = v % 3; v /= 3; d - 1 }
    }
    all.zipWithIndex.sortBy { case (s, i) => (s.count(_ != 0), i) }.map(_._1)
  }

  /** Exact Laplace-prior MAP fit of the prophet basis. Returns
    * (nActiveChangepoints, forecasts 1..h). Deterministic and
    * oracle-replayable: snapped moments → shared-arithmetic GJ per
    * orthant → feasibility filter → argmin objective (6-dp snapped,
    * pattern-id tiebreak). */
  def prophetMap(xs: Array[Double], period: Int, orders: Int, nChangepoints: Int,
                 h: Int): (Int, Array[Double]) = {
    val (b, na, yscale) = prophetMapFit(xs, period, orders, nChangepoints)
    val n = xs.length
    val nc = nChangepoints
    val p = 2 + nc + 2 * orders
    val cps = Array.tabulate(nc)(i => (i + 1).toDouble * n / (nc + 1))
    val fc = Array.tabulate(h) { i =>
      val t = (n + i).toDouble
      var v = b(0) + b(1) * (t / n)
      var j = 0
      while (j < nc) { v += b(2 + j) * math.max(0.0, (t - cps(j)) / n); j += 1 }
      var k = 1
      while (k <= orders) {
        val w = 2 * math.Pi * k * t / period
        v += b(2 + nc + 2 * (k - 1)) * math.sin(w) + b(2 + nc + 2 * (k - 1) + 1) * math.cos(w)
        k += 1
      }
      v * yscale
    }
    (na, fc)
  }

  /** The MAP fit itself: (coefficients on the SCALED series, active
    * changepoint count, yscale). Coefficient order matches the basis:
    * [m, k, δ₁..δ_nc, sin/cos pairs]. */
  def prophetMapFit(xs: Array[Double], period: Int, orders: Int,
                    nChangepoints: Int): (Array[Double], Int, Double) = {
    val n = xs.length
    val nc = nChangepoints
    val p = 2 + nc + 2 * orders
    val cols = p + 1
    val cps = Array.tabulate(nc)(i => (i + 1).toDouble * n / (nc + 1))
    def row(t: Double): Array[Double] = {
      val r = new Array[Double](p)
      r(0) = 1.0
      r(1) = t / n
      var j = 0
      while (j < nc) { r(2 + j) = math.max(0.0, (t - cps(j)) / n); j += 1 }
      var k = 1
      while (k <= orders) {
        val w = 2 * math.Pi * k * t / period
        r(2 + nc + 2 * (k - 1)) = math.sin(w)
        r(2 + nc + 2 * (k - 1) + 1) = math.cos(w)
        k += 1
      }
      r
    }
    // prophet's absmax y-scaling, then 6-dp-snapped moments: the snap
    // grid swamps cross-engine summation-order noise (~1e-13), so both
    // engines run ALL downstream algebra on identical doubles
    val yscale = math.max(xs.map(math.abs).max, 1e-9)
    val ys = xs.map(_ / yscale)
    val g = new Array[Double](p * p)
    val xy = new Array[Double](p)
    var syy = 0.0
    var t = 0
    while (t < n) {
      val r = row(t.toDouble)
      var i = 0
      while (i < p) {
        var j = 0
        while (j < p) { g(i * p + j) += r(i) * r(j); j += 1 }
        xy(i) += r(i) * ys(t)
        i += 1
      }
      syy += ys(t) * ys(t)
      t += 1
    }
    var q = 0
    while (q < p * p) { g(q) = snap(g(q), 1e6); q += 1 }
    q = 0
    while (q < p) { xy(q) = snap(xy(q), 1e6); q += 1 }
    syy = snap(syy, 1e6)
    // Gauss-Jordan with the ORACLE's exact per-step arithmetic (reads
    // from the pre-step matrix; division placed inside the product)
    def gj(m0: Array[Double]): Array[Double] = {
      var m = m0
      var step = 1
      while (step <= p) {
        val out = new Array[Double](m.length)
        var li = 0
        while (li < m.length) {
          val r = li / cols
          val c = li % cols
          val piv = m((step - 1) * cols + (step - 1))
          out(li) =
            if (r == step - 1) m(li) / piv
            else m(li) - m(r * cols + (step - 1)) * (m((step - 1) * cols + c) / piv)
          li += 1
        }
        m = out
        step += 1
      }
      Array.tabulate(p)(i => m(i * cols + p))
    }
    // rss from the shared moments: ‖y−Xθ‖² = syy − 2θ'X'y + θ'Gθ
    def rssOf(b: Array[Double]): Double = {
      var acc = syy
      var i = 0
      while (i < p) { acc -= 2.0 * b(i) * xy(i); i += 1 }
      var qq = 0
      while (qq < p * p) { acc += b(qq / p) * b(qq % p) * g(qq); qq += 1 }
      acc
    }
    // ridge pre-pass → plug-in σ̂² (9-dp snapped), then the Stan prior
    // weights: λ₁ = σ̂²/τ, λ_β = σ̂²/σ_β², λ_km = σ̂²/5²
    val m0 = Array.tabulate(p * cols) { li =>
      val i = li / cols; val c = li % cols
      if (c == p) xy(i) else if (c == i) g(i * p + c) + 1e-4 else g(i * p + c)
    }
    val s2 = snap(math.max(rssOf(gj(m0)), 0.0) / n, 1e9)
    val l1 = 20.0 * s2
    val lb = s2 / 100.0
    val lkm = s2 / 25.0
    var bestPid = -1
    var bestL6 = 0.0
    var bestB: Array[Double] = null
    var bestActive = 0
    for ((s, pid) <- prophetPatterns(nc).zipWithIndex) {
      val m = Array.tabulate(p * cols) { li =>
        val i = li / cols; val c = li % cols
        if (i >= 2 && i < 2 + nc) {
          val dj = i - 2
          if (s(dj) == 0) { if (c == i) 1.0 else 0.0 } // pinned: θ_δ = 0 exactly
          else if (c == p) xy(i) - l1 * s(dj)
          else if (c == i) g(i * p + c) + 1e-8
          else g(i * p + c)
        } else if (c == p) xy(i)
        else if (c == i) g(i * p + c) + (if (i < 2) lkm else lb)
        else g(i * p + c)
      }
      val b = gj(m)
      val feasible = (0 until nc).forall(j => s(j) == 0 || b(2 + j) * s(j) > 0)
      if (feasible) {
        var pen = 0.0
        var j = 0
        while (j < nc) { pen += l1 * math.abs(b(2 + j)); j += 1 }
        pen += 0.5 * lkm * (b(0) * b(0) + b(1) * b(1))
        var f = 2 + nc
        while (f < p) { pen += 0.5 * lb * b(f) * b(f); f += 1 }
        val l6 = snap(0.5 * rssOf(b) + pen, 1e6)
        if (bestPid < 0 || l6 < bestL6) {
          bestL6 = l6; bestPid = pid; bestB = b; bestActive = s.count(_ != 0)
        }
      }
    }
    (bestB, bestActive, yscale)
  }

  /** Logistic-growth prophet (kats/models/prophet.py:42/:86 —
    * growth='logistic' with a capacity) on the EXACT Laplace-MAP fit:
    * the series is mapped through the logit of its capacity share
    * (z = ln(r/(1−r)), r = clamp(y/cap, 1e-6, 1−1e-6)), [[prophetMap]]
    * fits z, and forecasts come back through cap·σ(ẑ) — so every
    * forecast respects 0 < ŷ < cap by construction, prophet's defining
    * logistic property. cap defaults to 1.1·max(y) when the caller
    * provides none (prophet requires an explicit cap; the data-driven
    * default is declared). Returns (cap, nActiveChangepoints,
    * forecasts 1..h). */
  def prophetLogisticMap(xs: Array[Double], period: Int, orders: Int, nChangepoints: Int,
                         h: Int): (Double, Int, Array[Double]) = {
    val cap = 1.1 * xs.max
    val z = xs.map { x =>
      val r = math.min(math.max(x / cap, 1e-6), 1.0 - 1e-6)
      math.log(r / (1 - r))
    }
    val (na, fz) = prophetMap(z, period, orders, nChangepoints, h)
    (cap, na, fz.map(v => cap / (1.0 + math.exp(-v))))
  }

  /** In-sample fitted values of the prophetLite fit (for the
    * prophet-residual anomaly detector, kats/detectors/prophet_detector.py
    * re-derived: residual z-scores against the additive model).
    */
  def prophetLiteFitted(xs: Array[Double], period: Int, orders: Int, nChangepoints: Int): Array[Double] = {
    val n = xs.length
    val cps = Array.tabulate(nChangepoints)(i => (i + 1).toDouble * n / (nChangepoints + 1))
    val p = 2 + nChangepoints + 2 * orders
    def row(t: Double): Array[Double] = {
      val r = new Array[Double](p)
      r(0) = 1.0
      r(1) = t / n
      var j = 0
      while (j < nChangepoints) { r(2 + j) = math.max(0.0, (t - cps(j)) / n); j += 1 }
      var k = 1
      while (k <= orders) {
        val w = 2 * math.Pi * k * t / period
        r(2 + nChangepoints + 2 * (k - 1)) = math.sin(w)
        r(2 + nChangepoints + 2 * (k - 1) + 1) = math.cos(w)
        k += 1
      }
      r
    }
    val X = DenseMatrix.tabulate[Double](n, p)((i, j) => row(i.toDouble)(j))
    val beta = solve(X, DenseVector(xs), ridge = 1e-4)
    Array.tabulate(n) { t =>
      val r = row(t.toDouble)
      var v = 0.0
      var j = 0
      while (j < p) { v += r(j) * beta(j); j += 1 }
      v
    }
  }

  /** SARIMA-lite (p,1,0)(1,1,0)_m, additive AR form (kats/models/sarima.py
    * re-derived without statsmodels): after one regular and one seasonal
    * difference, w_t = c + Σφᵢ·w_{t-i} + Φ·w_{t-m} by OLS. Returns
    * (beta = [c, φ1..φp, Φ], sigma2).
    */
  def sarimaFitP(xs: Array[Double], m: Int, p: Int): (Array[Double], Double) = {
    val d = Array.tabulate(xs.length - 1)(i => xs(i + 1) - xs(i))
    val w = Array.tabulate(d.length - m)(i => d(i + m) - d(i))
    val L = w.length
    require(L > m + p + 4, s"series too short for SARIMA seasonal lag $m, AR($p): $L")
    val rows = L - m
    val X = DenseMatrix.zeros[Double](rows, p + 2)
    val y = DenseVector.zeros[Double](rows)
    var i = 0
    while (i < rows) {
      val t = m + i
      X(i, 0) = 1.0
      var j = 1
      while (j <= p) { X(i, j) = w(t - j); j += 1 }
      X(i, p + 1) = w(t - m)
      y(i) = w(t)
      i += 1
    }
    // ridged normal equations (XᵀX + 1e-8·I)β = Xᵀy — term-for-term the
    // system the DuckDB oracle eliminates, so the engines solve the SAME
    // matrix and differ only in elimination ulps
    val g = X.t * X
    var ri = 0
    while (ri < p + 2) { g(ri, ri) += 1e-8; ri += 1 }
    val beta = solve(g, X.t * y)
    var sse = 0.0
    i = 0
    while (i < rows) {
      var f = beta(0)
      var j = 1
      while (j <= p + 1) { f += beta(j) * X(i, j); j += 1 }
      val e = y(i) - f
      sse += e * e
      i += 1
    }
    (beta.toArray, sse / rows)
  }

  /** h-step (h ≤ m) forecast for the (p,1,0)(1,1,0)_m fit: the seasonal
    * lags of both integration stages stay observed inside one season, so
    * the recursion carries only the last p ŵ values and the level. */
  def sarimaForecastP(xs: Array[Double], m: Int, p: Int, h: Int): Array[Double] = {
    require(h <= m, s"forecast horizon $h beyond one season $m")
    val (beta, _) = sarimaFitP(xs, m, p)
    val d = Array.tabulate(xs.length - 1)(i => xs(i + 1) - xs(i))
    val w = Array.tabulate(d.length - m)(i => d(i + m) - d(i))
    val L = w.length
    val out = new Array[Double](h)
    // ŵ ring: index 0 = most recent (observed tail to start)
    val wHist = Array.tabulate(p)(j => w(L - 1 - j))
    var x = xs.last
    var k = 1
    while (k <= h) {
      var wHat = beta(0) + beta(p + 1) * w(L + k - 1 - m)
      var j = 0
      while (j < p) { wHat += beta(j + 1) * wHist(j); j += 1 }
      val dHat = wHat + d(d.length + k - 1 - m)
      x += dHat
      out(k - 1) = x
      var jj = p - 1
      while (jj > 0) { wHist(jj) = wHist(jj - 1); jj -= 1 }
      if (p > 0) wHist(0) = wHat
      k += 1
    }
    out
  }

  /** SARIMA-lite (1,1,0)(1,1,0)_m, additive AR form (kats/models/sarima.py
    * re-derived without statsmodels): after one regular and one seasonal
    * difference, w_t = c + φ·w_{t-1} + Φ·w_{t-m} by ridge OLS. Returns
    * (c, phi, sphi, sigma2).
    */
  def sarimaFit(xs: Array[Double], m: Int): (Double, Double, Double, Double) = {
    val d = Array.tabulate(xs.length - 1)(i => xs(i + 1) - xs(i))
    val w = Array.tabulate(d.length - m)(i => d(i + m) - d(i))
    val L = w.length
    require(L > m + 4, s"series too short for SARIMA seasonal lag $m: $L")
    val rows = L - m
    val X = DenseMatrix.zeros[Double](rows, 3)
    val y = DenseVector.zeros[Double](rows)
    var i = 0
    while (i < rows) {
      val t = m + i
      X(i, 0) = 1.0; X(i, 1) = w(t - 1); X(i, 2) = w(t - m)
      y(i) = w(t)
      i += 1
    }
    val beta = solve(X, y)
    var sse = 0.0
    i = 0
    while (i < rows) {
      val f = beta(0) + beta(1) * X(i, 1) + beta(2) * X(i, 2)
      val e = y(i) - f
      sse += e * e
      i += 1
    }
    (beta(0), beta(1), beta(2), sse / rows)
  }

  /** SARIMA-lite h-step forecasts of the original series (h ≤ m): the
    * seasonal lags of both integration stages are still observed inside
    * one season, so the recursion only carries ŵ_{t-1} and the cumulative
    * level.
    */
  def sarimaForecast(xs: Array[Double], m: Int, h: Int): Array[Double] = {
    require(h <= m, s"forecast horizon $h beyond one season $m")
    val (c, phi, sphi, _) = sarimaFit(xs, m)
    val d = Array.tabulate(xs.length - 1)(i => xs(i + 1) - xs(i))
    val w = Array.tabulate(d.length - m)(i => d(i + m) - d(i))
    val L = w.length
    val out = new Array[Double](h)
    var wPrev = w(L - 1)
    var x = xs.last
    var k = 1
    while (k <= h) {
      val wHat = c + phi * wPrev + sphi * w(L + k - 1 - m)
      val dHat = wHat + d(d.length + k - 1 - m)
      x += dHat
      out(k - 1) = x
      wPrev = wHat
      k += 1
    }
    out
  }

  /** VAR(1) (var.py re-derived): fit X_t = c + A·X_{t-1} per equation by
    * OLS on a k-variate series given as rows of observations (time-major).
    * Returns (c, A) and one-step forecast from the last observation.
    */
  def var1(obs: Array[Array[Double]]): (Array[Double], Array[Array[Double]], Array[Double]) = {
    val T = obs.length
    val k = obs(0).length
    val X = DenseMatrix.zeros[Double](T - 1, k + 1)
    var t = 0
    while (t < T - 1) {
      X(t, 0) = 1.0
      var j = 0
      while (j < k) { X(t, j + 1) = obs(t)(j); j += 1 }
      t += 1
    }
    val c = new Array[Double](k)
    val a = Array.ofDim[Double](k, k)
    var eq = 0
    while (eq < k) {
      val y = DenseVector.tabulate(T - 1)(t => obs(t + 1)(eq))
      val beta = solve(X, y)
      c(eq) = beta(0)
      var j = 0
      while (j < k) { a(eq)(j) = beta(j + 1); j += 1 }
      eq += 1
    }
    val last = obs(T - 1)
    val fc = Array.tabulate(k) { eq =>
      var v = c(eq)
      var j = 0
      while (j < k) { v += a(eq)(j) * last(j); j += 1 }
      v
    }
    (c, a, fc)
  }
}
