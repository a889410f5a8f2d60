package graft

import graft.detectors.{Bocpd, FftSeasonality, MannKendall}
import org.scalatest.funsuite.AnyFunSuite

class AlgoSpec extends AnyFunSuite {

  test("MannKendall matches the O(n^2) definition on random data") {
    val rnd = new scala.util.Random(7)
    val xs = Array.fill(200)(math.floor(rnd.nextGaussian() * 50) / 10.0) // induce ties
    var sNaive = 0L
    for (i <- xs.indices; j <- (i + 1) until xs.length)
      sNaive += math.signum(xs(j) - xs(i)).toLong
    val (s, _, _, _) = MannKendall.mkStats(xs)
    assert(s === sNaive)
  }

  test("MannKendall detects a monotone trend") {
    val xs = Array.tabulate(100)(i => i + math.sin(i) * 0.1)
    val (s, tau, z, trend) = MannKendall.mkStats(xs)
    assert(trend === 1)
    assert(tau > 0.9)
    assert(z > 10)
    assert(s === 100L * 99 / 2) // strictly increasing: every pair concordant
  }

  test("BOCPD flags an obvious level shift near the true changepoint") {
    val rnd = new scala.util.Random(3)
    val xs = Array.tabulate(200)(i => (if (i < 100) 0.0 else 8.0) + rnd.nextGaussian())
    val probs = Bocpd.changeProb(xs, hazard = 0.01, lagN = 10)
    val peak = probs.zipWithIndex.maxBy(_._1)
    assert(math.abs(peak._2 - 100) <= 2, s"peak at ${peak._2}")
    assert(peak._1 > 0.5, s"peak prob ${peak._1}")
    // quiet region stays quiet
    assert(probs.slice(20, 80).max < 0.2)
  }

  test("FFT seasonality finds the true period of a sine") {
    val xs = Array.tabulate(240)(i => math.sin(2 * math.Pi * i / 24.0) + 0.1)
    val (period, share) = FftSeasonality.dominantPeriod(xs)
    assert(math.abs(period - 24.0) < 1e-9)
    assert(share > 0.95)
  }

  test("generalized SARIMA AR(p) kernel reduces to the fixed (1,1,0) kernel at p=1") {
    import graft.models.Regressors
    val rnd = new scala.util.Random(3)
    val xs = Array.tabulate(200)(i =>
      10.0 + 0.05 * i + 3 * math.sin(2 * math.Pi * i / 24.0) + rnd.nextGaussian())
    val (c, phi, sphi, s2) = Regressors.sarimaFit(xs, 24)
    val (b, s2p) = Regressors.sarimaFitP(xs, 24, 1)
    // the fixed kernel solves by QR, the generalized one by the ridged
    // normal equations the oracle uses — they agree to the ridge scale
    assert(math.abs(b(0) - c) < 1e-6 && math.abs(b(1) - phi) < 1e-6 && math.abs(b(2) - sphi) < 1e-6)
    assert(math.abs(s2p - s2) < 1e-6)
    val f1 = Regressors.sarimaForecast(xs, 24, 12)
    val fp = Regressors.sarimaForecastP(xs, 24, 1, 12)
    f1.zip(fp).foreach { case (a, bb) => assert(math.abs(a - bb) < 1e-5) }
  }

  test("SARIMA AR(2) fit tracks a genuinely AR(2) differenced process better than AR(1)") {
    import graft.models.Regressors
    val rnd = new scala.util.Random(9)
    // build w as AR(2), then integrate twice (regular + seasonal) so the
    // (p,1,0)(1,1,0)_24 pipeline recovers it
    val L = 400
    val w = new Array[Double](L)
    for (t <- 2 until L) w(t) = 0.6 * w(t - 1) - 0.3 * w(t - 2) + rnd.nextGaussian()
    val d = new Array[Double](L + 24)
    for (t <- 24 until L + 24) d(t) = d(t - 24) + w(t - 24)
    val xs = new Array[Double](L + 25)
    for (t <- 1 until L + 25) xs(t) = xs(t - 1) + d(t - 1)
    val (b2, s22) = Regressors.sarimaFitP(xs, 24, 2)
    val (_, s21) = Regressors.sarimaFitP(xs, 24, 1)
    assert(math.abs(b2(1) - 0.6) < 0.15 && math.abs(b2(2) - (-0.3)) < 0.15,
      s"AR(2) coefficients off: ${b2.toSeq}")
    assert(s22 < s21, "AR(2) must fit an AR(2) process better than AR(1)")
  }
}
