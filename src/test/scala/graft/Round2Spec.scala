package graft

import graft.detectors.CusumV2
import graft.models.{Arima, Smoothers}
import graft.operators.Simulator
import org.scalatest.funsuite.AnyFunSuite

/** Pure-kernel specs for the round-2 operators (no SparkSession needed). */
class Round2Spec extends AnyFunSuite {

  test("ARIMA(2,0,0) Hannan-Rissanen recovers AR(2) coefficients") {
    val xs = Simulator.arma(Array(0.6, -0.3), Array.empty, 4000, seed = 7)
    val f = Arima.fit(xs, p = 2, d = 0, q = 0)
    assert(math.abs(f.phi(0) - 0.6) < 0.06, s"phi1=${f.phi(0)}")
    assert(math.abs(f.phi(1) + 0.3) < 0.06, s"phi2=${f.phi(1)}")
    assert(f.sigma2 > 0.8 && f.sigma2 < 1.2, s"sigma2=${f.sigma2}")
  }

  test("ARIMA(1,1,0) fits the differenced series") {
    val d = Simulator.arma(Array(0.5), Array.empty, 4000, seed = 11)
    val xs = d.scanLeft(0.0)(_ + _).tail // integrate once
    val f = Arima.fit(xs, p = 1, d = 1, q = 0)
    assert(math.abs(f.phi(0) - 0.5) < 0.06, s"phi=${f.phi(0)}")
  }

  test("ARIMA(0,1,1) picks up the MA signal") {
    val n = 4000
    val e = {
      val rngSeries = Simulator.arma(Array.empty, Array.empty, n, seed = 13)
      rngSeries // white noise
    }
    val y = Array.tabulate(n)(t => e(t) + (if (t > 0) 0.6 * e(t - 1) else 0.0))
    val xs = y.scanLeft(0.0)(_ + _).tail
    val f = Arima.fit(xs, p = 0, d = 1, q = 1)
    assert(math.abs(f.theta(0) - 0.6) < 0.1, s"theta=${f.theta(0)}")
  }

  test("ARIMA forecast integrates a trend back") {
    // deterministic ramp: x_t = 2t → diff is constant 2 → forecasts continue the ramp
    val xs = Array.tabulate(200)(t => 2.0 * t)
    val fc = Arima.forecast(xs, p = 1, d = 1, q = 0, h = 5)
    fc.zipWithIndex.foreach { case (v, i) =>
      assert(math.abs(v - 2.0 * (200 + i)) < 1e-6, s"fc($i)=$v")
    }
  }

  test("ARIMA d=2 double integration continues a quadratic ramp") {
    val xs = Array.tabulate(300)(t => 0.5 * t * t)
    val fc = Arima.forecast(xs, p = 1, d = 2, q = 0, h = 4)
    fc.zipWithIndex.foreach { case (v, i) =>
      val t = 300 + i
      assert(math.abs(v - 0.5 * t * t) < 1e-4, s"fc($i)=$v expected ${0.5 * t * t}")
    }
  }

  test("SARIMA-lite recovers a seasonal trend pattern") {
    val m = 24
    val xs = Array.tabulate(24 * 30)(t => 0.2 * t + 10 * math.sin(2 * math.Pi * (t % m) / m))
    val fc = graft.models.Regressors.sarimaForecast(xs, m, 24)
    // deterministic series: one-season-ahead forecasts continue the pattern
    fc.zipWithIndex.foreach { case (v, i) =>
      val t = 24 * 30 + i
      val expected = 0.2 * t + 10 * math.sin(2 * math.Pi * (t % m) / m)
      assert(math.abs(v - expected) < 1.0, s"fc($i)=$v expected $expected")
    }
  }

  test("CusumV2 finds a level shift with a significant llr") {
    val xs = Simulator.levelShift(n = 400, cpAt = 200, shift = 8.0, noise = 1.0, seed = 3)
    val r = CusumV2.detect(xs, increase = true)
    val cp = r(0).toInt
    assert(math.abs(cp - 199) <= 3, s"cp=$cp")
    assert(r(4) > CusumV2.LlrThreshold, s"llr=${r(4)}")
    assert(r(7) == 1.0, "should be detected")
    assert(r(6) == 1.0, "should be stable")
    assert(math.abs(r(3) - 8.0) < 0.5, s"delta=${r(3)}")
  }

  test("CusumV2 does not fire on pure noise") {
    val xs = Simulator.arma(Array.empty, Array.empty, 400, seed = 21)
    val rInc = CusumV2.detect(xs, increase = true)
    val rDec = CusumV2.detect(xs, increase = false)
    assert(rInc(7) == 0.0 || rDec(7) == 0.0, "noise should not fire both directions")
    assert(math.max(rInc(4), rDec(4)) < 30.0, s"llr should be modest on noise: ${rInc(4)}, ${rDec(4)}")
  }

  test("sesOpt beats a fixed alpha on its own objective") {
    val xs = Simulator.arma(Array(0.8), Array.empty, 500, seed = 5).map(_ + 10.0)
    val (alpha, _, sse) = Smoothers.sesOpt(xs)
    assert(alpha >= 0.05 && alpha <= 0.95)
    assert(sse <= Smoothers.sesSse(xs, 0.3) + 1e-9)
  }

  test("holtWintersOpt fits a seasonal series better than fixed params") {
    val m = 24
    val xs = Array.tabulate(24 * 20) { t =>
      0.05 * t + 5 * math.sin(2 * math.Pi * (t % m) / m) +
        0.3 * math.cos(t * 0.7) // deterministic wiggle
    }
    val (a, b, g, _, _, _, sseOpt) = Smoothers.holtWintersOpt(xs, m)
    assert(a >= 0.1 && a <= 0.9 && b >= 0.1 && b <= 0.9 && g >= 0.1 && g <= 0.9)
    // the grid optimum can't be worse than the fixed reference params
    // (γ=0.1 IS on the grid, so compare against an on-grid point too)
    assert(sseOpt <= Smoothers.hwSse(xs, m, 0.3, 0.1, 0.1) + 1e-9)
  }

  test("BOCPD trend model spikes at a slope change") {
    val xs = Simulator.trendShift(n = 300, cpAt = 150, slope1 = 0.0, slope2 = 1.5, noise = 0.5, seed = 17)
    val probs = graft.detectors.Bocpd.changeProbTrend(xs, hazard = 0.01)
    val best = probs.indices.maxBy(probs)
    assert(math.abs(best - 150) <= 15, s"argmax at $best, expected near 150")
    assert(probs(best) > 0.5, s"peak prob ${probs(best)}")
  }

  test("BOCPD Poisson model spikes at a rate change") {
    val counts = Array.tabulate(300)(t => if (t < 150) 5.0 + (t % 3) else 22.0 + (t % 4))
    val probs = graft.detectors.Bocpd.changeProbPoisson(counts, hazard = 0.01)
    val best = probs.indices.maxBy(probs)
    assert(math.abs(best - 150) <= 10, s"argmax at $best, expected near 150")
    assert(probs(best) > 0.5, s"peak prob ${probs(best)}")
  }

  test("PACF of white noise vanishes beyond lag zero-ish") {
    val xs = Simulator.arma(Array.empty, Array.empty, 5000, seed = 31)
    val p = graft.features.FeatureKernels.pacf(xs, 10)
    p.foreach(v => assert(math.abs(v) < 0.05, s"pacf=$v"))
  }

  test("PACF of an AR(1) process is phi at lag 1 and ~0 after") {
    val xs = Simulator.arma(Array(0.7), Array.empty, 8000, seed = 33)
    val p = graft.features.FeatureKernels.pacf(xs, 5)
    assert(math.abs(p(0) - 0.7) < 0.05, s"pacf1=${p(0)}")
    p.drop(1).foreach(v => assert(math.abs(v) < 0.05, s"tail pacf=$v"))
  }

  test("KPSS is small for a trend-stationary series and large for a random walk") {
    val trendy = Array.tabulate(600)(t => 0.5 * t + math.sin(t * 0.7))
    val rw = Simulator.arma(Array.empty, Array.empty, 600, seed = 41).scanLeft(0.0)(_ + _).tail
    val a = graft.features.FeatureKernels.kpss(trendy)
    val b = graft.features.FeatureKernels.kpss(rw)
    assert(a < 0.2, s"trend-stationary kpss=$a")
    assert(b > a * 5, s"random-walk kpss=$b should dwarf $a")
  }

  test("Hurst exponent orders persistent vs anti-persistent series") {
    val rw = Simulator.arma(Array.empty, Array.empty, 3000, seed = 51).scanLeft(0.0)(_ + _).tail
    val noise = Simulator.arma(Array.empty, Array.empty, 3000, seed = 53)
    val hRw = graft.features.FeatureKernels.hurst(rw)
    val hNoise = graft.features.FeatureKernels.hurst(noise)
    assert(hRw > 0.4, s"random walk hurst=$hRw (≈0.5 expected)")
    assert(hNoise < 0.15, s"white noise hurst=$hNoise (≈0 for iid levels)")
  }

  test("spikiness closed form equals brute-force leave-one-out variance") {
    val r = Array(1.0, -2.0, 0.5, 3.0, -1.5, 0.7, 2.2, -0.3)
    val n = r.length
    // brute force: popvar of popvars of each deleted array
    val loo = r.indices.map { i =>
      val rest = r.indices.filter(_ != i).map(r)
      val mu = rest.sum / rest.length
      rest.map(v => (v - mu) * (v - mu)).sum / rest.length
    }
    val lm = loo.sum / n
    val brute = loo.map(v => (v - lm) * (v - lm)).sum / n
    // closed form via moments (the formula used by TsFeatures.stlStrength)
    val s1 = r.sum; val s2 = r.map(v => v * v).sum
    val s3 = r.map(v => v * v * v).sum; val s4 = r.map(v => v * v * v * v).sum
    val d = (n - 1.0) * (n - 1.0)
    val alpha = ((n - 1) * s2 - s1 * s1) / d
    val beta = 2.0 * s1 / d
    val gamma = -n / d
    val sv = n * alpha + beta * s1 + gamma * s2
    val sv2 = n * alpha * alpha + beta * beta * s2 + gamma * gamma * s4 +
      2 * alpha * beta * s1 + 2 * alpha * gamma * s2 + 2 * beta * gamma * s3
    val closed = sv2 / n - (sv / n) * (sv / n)
    assert(math.abs(closed - brute) < 1e-9, s"closed=$closed brute=$brute")
  }

  test("holtOpt returns parameters on the grid") {
    val xs = Array.tabulate(300)(t => 3.0 + 0.1 * t + math.sin(t * 0.3))
    val (a, b, l, tr, sse) = Smoothers.holtOpt(xs)
    assert(a >= 0.05 && a <= 0.95 && b >= 0.05 && b <= 0.95)
    assert(tr > 0.0, s"trend=$tr should be positive on an upward ramp")
    assert(sse >= 0.0 && l.isFinite)
  }
}
