package graft

import graft.models.{Arima, Smoothers}
import graft.operators.Simulator
import org.scalatest.funsuite.AnyFunSuite

/** Evidence for the "deterministic grid / Hannan-Rissanen ≈ statsmodels
  * MLE" claim (kats/models/holtwinters.py and kats/models/arima.py fit by
  * MLE; graft substitutes engine-reproducible estimators — declared in
  * SURVEY §2.4). Each test simulates a series with KNOWN parameters
  * through the Simulator's seeded LCG and asserts the estimator recovers
  * the truth within a documented tolerance, and that held-out forecast
  * error is within a small factor of the theoretical optimum (which is
  * what the MLE attains asymptotically). Tolerances are ~3× the observed
  * error on these fixtures, far tighter than any wrong-estimator failure
  * mode (see inline notes for observed values).
  */
class MleFidelitySpec extends AnyFunSuite {

  /** Deterministic LCG noise in [-0.5, 0.5) (the AnnSpec pattern). */
  private def lcgNoise(seed: Long, n: Int): Array[Double] =
    Iterator.iterate(seed)(s => (s * 48271) % 2147483647L).drop(1)
      .map(_.toDouble / 2147483647L - 0.5).take(n).toArray

  test("prophet MAP recovers a planted changepoint SPARSELY — inactive deltas are exact zeros") {
    // truth lives IN the basis: slope 5 on t/n, one delta of 8 at knot 2
    // (2n/5 — exactly cps(1)), first-order daily seasonality, sd≈0.17 noise
    val n = 480
    val noise = lcgNoise(97L, n)
    val xs = Array.tabulate(n) { t =>
      val hinge2 = math.max(0.0, (t - 2.0 * n / 5) / n)
      10.0 + 5.0 * t / n + 8.0 * hinge2 + 2.0 * math.sin(2 * math.Pi * t / 24) + 0.6 * noise(t)
    }
    val (b, nActive, yscale) = graft.models.Regressors.prophetMapFit(xs, 24, 3, 4)
    // the Laplace prior's defining behavior, which the old ridge stand-in
    // could not produce: changepoints the data doesn't demand are EXACT 0
    // (λ₁ = σ̂²/τ is mild at this noise — observed: one exact zero, the
    // planted delta dominant at 7.77, spurious mass ≤ 0.31)
    val deltas = (0 until 4).map(j => b(2 + j) * yscale)
    assert(deltas.count(_ == 0.0) >= 1, s"at least one exact-zero delta expected: $deltas")
    // the planted break is found: total trend change across knots ≈ 8
    // (correlated hinges can split mass between adjacent knots)
    assert(math.abs(deltas.sum - 8.0) < 1.5, s"recovered delta mass ${deltas.sum} (truth 8)")
    assert(deltas(1) == deltas.max && deltas(1) > 7.0,
      s"dominant delta must sit at the planted knot: $deltas")
    assert(deltas.patch(1, Nil, 1).forall(d => math.abs(d) < 0.5),
      s"spurious deltas must stay small: $deltas")
    // q_prophet_trend's ranking convention (first argmax of the 6-dp
    // rounded |delta|) must rank the PLANTED changepoint top
    val topCp = deltas.map(d => math.abs(math.round(d * 1e6) / 1e6)).zipWithIndex.maxBy(_._1)._2
    assert(topCp == 1, s"top-ranked changepoint must be the planted knot 2 (index 1): $deltas")
    // sparsity STRENGTHENS with noise exactly as the prior weight
    // λ₁ = σ̂²/τ dictates: at 10× the noise the MAP zeroes two knots and
    // still keeps the planted one
    val noisy = Array.tabulate(n) { t =>
      val hinge2 = math.max(0.0, (t - 2.0 * n / 5) / n)
      10.0 + 5.0 * t / n + 8.0 * hinge2 + 2.0 * math.sin(2 * math.Pi * t / 24) + 6.0 * noise(t)
    }
    val (bN, naN, ysN) = graft.models.Regressors.prophetMapFit(noisy, 24, 3, 4)
    val deltasN = (0 until 4).map(j => bN(2 + j) * ysN)
    assert(naN <= 2 && deltasN.count(_ == 0.0) >= 2,
      s"heavy noise must zero the spurious knots: $deltasN (nActive=$naN)")
    assert(deltasN(1) == deltasN.max && deltasN(1) > 4.0,
      s"the planted knot must survive heavy noise: $deltasN")
    // forecast tracks the true continuation
    val (_, fc) = graft.models.Regressors.prophetMap(xs, 24, 3, 4, h = 24)
    (0 until 24).foreach { i =>
      val t = n + i
      val truth = 10.0 + 5.0 * t / n + 8.0 * math.max(0.0, (t - 2.0 * n / 5) / n) / 1.0 +
        2.0 * math.sin(2 * math.Pi * t / 24)
      assert(math.abs(fc(i) - truth) < 1.0, s"h=${i + 1}: fc=${fc(i)} truth=$truth")
    }
  }

  test("prophet MAP on a changepoint-free series keeps only negligible deltas") {
    val n = 480
    for (seed <- Seq(97L, 13L, 55L)) {
      val noise = lcgNoise(seed, n)
      val xs = Array.tabulate(n)(t =>
        20.0 + 3.0 * t / n + 1.5 * math.cos(2 * math.Pi * t / 24) + 2.0 * noise(t))
      val (b, nActive, yscale) = graft.models.Regressors.prophetMapFit(xs, 24, 3, 4)
      val deltas = (0 until 4).map(j => b(2 + j) * yscale)
      assert(nActive <= 2 && deltas.count(_ == 0.0) >= 2,
        s"seed $seed: no-break series must zero most deltas: $deltas")
      assert(deltas.forall(d => math.abs(d) < 1.0), s"seed $seed: deltas must stay small: $deltas")
      // and the trend/seasonal structure is still recovered through the prior
      assert(math.abs(b(1) * yscale - 3.0) < 0.6, s"seed $seed: slope ${b(1) * yscale} (truth 3)")
    }
  }

  test("Hannan-Rissanen recovers ARMA(2,1) parameters on a known-truth simulation") {
    // x_t = 0.7 x_{t-1} - 0.2 x_{t-2} + e_t + 0.4 e_{t-1}, σ=1
    val xs = Simulator.arma(Array(0.7, -0.2), Array(0.4), n = 3000, seed = 7L)
    val f = Arima.fit(xs, p = 2, d = 0, q = 1)
    // asymptotic SEs are O(1/√n) ≈ 0.02; HR adds a small finite-sample
    // bias — allow 0.1 (observed: φ=(0.736,-0.222), θ=0.360, c=-0.006)
    assert(math.abs(f.phi(0) - 0.7) < 0.1, s"phi1=${f.phi(0)}")
    assert(math.abs(f.phi(1) + 0.2) < 0.1, s"phi2=${f.phi(1)}")
    assert(math.abs(f.theta(0) - 0.4) < 0.1, s"theta1=${f.theta(0)}")
    assert(math.abs(f.c) < 0.1, s"c=${f.c}")
    assert(math.abs(f.sigma2 - 1.0) < 0.15, s"sigma2=${f.sigma2}")
  }

  test("ARIMA one-step holdout RMSE is within 10% of the optimal predictor's σ") {
    // 1-step-ahead optimal RMSE = σ = 1 (what the exact-MLE predictor
    // attains); the unconditional-mean naive predictor pays the process
    // sd ≈ 1.6 on this ARMA — the bound separates the two decisively.
    val xs = Simulator.arma(Array(0.7, -0.2), Array(0.4), n = 2600, seed = 11L)
    val origins = 0 until 50
    var sse = 0.0
    origins.foreach { i =>
      val cut = 2000 + i * 10
      val fc = Arima.forecast(xs.take(cut), p = 2, d = 0, q = 1, h = 1)
      val err = fc(0) - xs(cut)
      sse += err * err
    }
    val rmse = math.sqrt(sse / origins.size)
    assert(rmse < 1.1, s"1-step holdout rmse=$rmse (optimal 1.0)")
  }

  test("ARIMA(1,1,1): differencing + recovery on an integrated series") {
    val dx = Simulator.arma(Array(0.5), Array(0.3), n = 3000, seed = 13L)
    val xs = dx.scanLeft(0.0)(_ + _).tail // integrate once
    val f = Arima.fit(xs, p = 1, d = 1, q = 1)
    assert(math.abs(f.phi(0) - 0.5) < 0.1, s"phi1=${f.phi(0)}")
    assert(math.abs(f.theta(0) - 0.3) < 0.1, s"theta1=${f.theta(0)}")
  }

  test("Holt-Winters SSE grid recovers (α, β, γ) from a known-truth HW process") {
    // generate from the additive-HW one-step-ahead form at the TRUE
    // params — the same error definition hwSse scores, so the SSE
    // surface has its minimum at the truth among grid points
    val (aT, bT, gT, m, n) = (0.3, 0.1, 0.2, 24, 1440)
    val noise = Simulator.arma(Array.empty, Array.empty, n, seed = 17L)
    var l = 100.0; var b = 0.5
    val s = Array.tabulate(m)(i => 10.0 * math.sin(2 * math.Pi * i / m))
    val xs = new Array[Double](n)
    var t = 0
    while (t < n) {
      val si = t % m
      xs(t) = l + b + s(si) + noise(t)
      val lPrev = l
      l = aT * (xs(t) - s(si)) + (1 - aT) * (l + b)
      b = bT * (l - lPrev) + (1 - bT) * b
      s(si) = gT * (xs(t) - l) + (1 - gT) * s(si)
      t += 1
    }
    val (a, be, g, lF, bF, sF, _) = Smoothers.holtWintersOpt(xs, m)
    // α and γ sit ON the 0.1-step grid; β is the weakest-identified
    // smoothing parameter — allow one grid step (observed: exact 0.3/0.1/0.2)
    assert(math.abs(a - aT) < 0.051, s"alpha=$a")
    assert(math.abs(be - bT) < 0.151, s"beta=$be")
    assert(math.abs(g - gT) < 0.151, s"gamma=$g")
    // h-step forecasts from the fitted state vs continuing the true
    // recursion noise-free: within 2σ on average over a full season
    var trueL = l; val trueB = b
    val errs = (1 to m).map { h =>
      val fitF = lF + h * bF + sF((n + h - 1) % m)
      val truF = trueL + h * trueB + s((n + h - 1) % m)
      math.abs(fitF - truF)
    }
    val mae = errs.sum / errs.size
    assert(mae < 2.0, s"seasonal-horizon forecast MAE vs truth = $mae (σ=1)")
  }

  test("Holt SSE grid recovers (α, β) and SES grid recovers α") {
    val n = 2000
    val noise = Simulator.arma(Array.empty, Array.empty, n, seed = 19L)
    // Holt process at (0.4, 0.2)
    var l = 50.0; var b = 0.1
    val xs = new Array[Double](n)
    var t = 0
    while (t < n) {
      xs(t) = l + b + noise(t)
      val lPrev = l
      l = 0.4 * xs(t) + 0.6 * (l + b)
      b = 0.2 * (l - lPrev) + 0.8 * b
      t += 1
    }
    val (a, be, _, _, _) = Smoothers.holtOpt(xs)
    assert(math.abs(a - 0.4) < 0.051, s"alpha=$a")
    assert(math.abs(be - 0.2) < 0.101, s"beta=$be")
    // SES process at α=0.35 (level random walk driven by smoothing its own obs)
    var l2 = 10.0
    val ys = new Array[Double](n)
    t = 0
    while (t < n) {
      ys(t) = l2 + noise(n - 1 - t)
      l2 = 0.35 * ys(t) + 0.65 * l2
      t += 1
    }
    val (a2, _, _) = Smoothers.sesOpt(ys)
    assert(math.abs(a2 - 0.35) < 0.051, s"ses alpha=$a2")
  }
}
