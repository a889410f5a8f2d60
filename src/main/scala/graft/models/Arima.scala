package graft.models

import breeze.linalg.{DenseMatrix, DenseVector}

/** ARIMA(p, d, q) with an actual fit (kats/models/arima.py semantics,
  * re-derived): the statsmodels MLE is replaced by the classical
  * Hannan–Rissanen two-stage estimator — deterministic, closed over
  * ordinary least squares, and O(n·(p+q+m)) per series:
  *
  *   1. difference the series d times;
  *   2. fit a long AR(m) by OLS and take its residuals ê_t as innovation
  *      estimates;
  *   3. regress y_t on [1, y_{t-1..t-p}, ê_{t-1..t-q}] to get (c, φ, θ).
  *
  * Forecasts iterate the ARMA recursion with future innovations at their
  * conditional mean 0, then integrate the d differences back. Runs on
  * collected per-series arrays (SeriesOps), parallel across series.
  */
object Arima {

  final case class Fit(c: Double, phi: Array[Double], theta: Array[Double], sigma2: Double)

  private def diff(xs: Array[Double]): Array[Double] =
    Array.tabulate(xs.length - 1)(i => xs(i + 1) - xs(i))

  /** Long-AR residuals (stage 1 of Hannan-Rissanen). */
  private def longArResiduals(y: Array[Double], m: Int): Array[Double] = {
    val n = y.length
    val rows = n - m
    val X = DenseMatrix.zeros[Double](rows, m + 1)
    val t = DenseVector.zeros[Double](rows)
    var i = 0
    while (i < rows) {
      X(i, 0) = 1.0
      var j = 1
      while (j <= m) { X(i, j) = y(m + i - j); j += 1 }
      t(i) = y(m + i)
      i += 1
    }
    val beta = Regressors.solve(X, t)
    val e = new Array[Double](n) // residuals; first m entries stay 0
    i = 0
    while (i < rows) {
      var f = beta(0)
      var j = 1
      while (j <= m) { f += beta(j) * y(m + i - j); j += 1 }
      e(m + i) = t(i) - f
      i += 1
    }
    e
  }

  /** Hannan-Rissanen ARMA(p, q) on the d-differenced series. */
  def fit(xs: Array[Double], p: Int, d: Int, q: Int): Fit = {
    var y = xs
    var k = 0
    while (k < d) { y = diff(y); k += 1 }
    val n = y.length
    val m = math.min(math.max(p + q + 3, 8), n / 4)
    require(n > m + p + q + 2, s"series too short for ARIMA($p,$d,$q): n=$n after differencing")
    val e = longArResiduals(y, m)
    val start = math.max(m, math.max(p, q)) // rows where all regressors exist
    val rows = n - start
    val cols = 1 + p + q
    val X = DenseMatrix.zeros[Double](rows, cols)
    val t = DenseVector.zeros[Double](rows)
    var i = 0
    while (i < rows) {
      val tt = start + i
      X(i, 0) = 1.0
      var j = 0
      while (j < p) { X(i, 1 + j) = y(tt - 1 - j); j += 1 }
      j = 0
      while (j < q) { X(i, 1 + p + j) = e(tt - 1 - j); j += 1 }
      t(i) = y(tt)
      i += 1
    }
    val beta = Regressors.solve(X, t)
    var sse = 0.0
    i = 0
    while (i < rows) {
      var f = beta(0)
      var j = 0
      while (j < cols - 1) { f += beta(1 + j) * X(i, 1 + j); j += 1 }
      val r = t(i) - f
      sse += r * r
      i += 1
    }
    Fit(beta(0), Array.tabulate(p)(j => beta(1 + j)), Array.tabulate(q)(j => beta(1 + p + j)),
      sse / rows)
  }

  /** h-step forecasts of the ORIGINAL series (inverse-differenced). */
  def forecast(xs: Array[Double], p: Int, d: Int, q: Int, h: Int): Array[Double] = {
    val f = fit(xs, p, d, q)
    var y = xs
    var k = 0
    while (k < d) { y = diff(y); k += 1 }
    val n = y.length
    val m = math.min(math.max(p + q + 3, 8), n / 4)
    val e = longArResiduals(y, m)
    // iterate the ARMA recursion; future innovations = 0
    val yExt = y ++ new Array[Double](h)
    val eExt = e ++ new Array[Double](h)
    var tt = n
    while (tt < n + h) {
      var v = f.c
      var j = 0
      while (j < p) { v += f.phi(j) * yExt(tt - 1 - j); j += 1 }
      j = 0
      while (j < q) { v += f.theta(j) * eExt(tt - 1 - j); j += 1 }
      yExt(tt) = v
      tt += 1
    }
    // integrate back: repeat cumulative summation d times from the last
    // observed level of each integration stage
    var fc = yExt.slice(n, n + h)
    var depth = d
    var lasts = List.empty[Double]
    var cur = xs
    k = 0
    while (k < d) { lasts = cur.last :: lasts; cur = diff(cur); k += 1 }
    while (depth > 0) {
      val base = lasts.head
      lasts = lasts.tail
      var acc = base
      fc = fc.map { v => acc += v; acc }
      depth -= 1
    }
    fc
  }
}
