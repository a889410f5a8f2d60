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
}
