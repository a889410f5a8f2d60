package graft

import graft.detectors.DtwCpd
import graft.operators.Simulator
import org.scalatest.funsuite.AnyFunSuite

class DtwSimSpec extends AnyFunSuite {

  test("DTW distance: identical windows are 0, shifted ones are not") {
    val a = Array.tabulate(24)(i => math.sin(i / 3.0))
    assert(DtwCpd.dtw(a, a, 4) === 0.0)
    assert(DtwCpd.dtw(a, a.map(_ + 5.0), 4) > 50.0)
  }

  test("DTW changepoint lands at a simulated level shift") {
    val xs = Simulator.levelShift(n = 480, cpAt = 240, shift = 20.0, noise = 1.0)
    val scores = DtwCpd.boundaryScores(xs, w = 24, band = 4)
    val best = scores.maxBy(_._2)
    assert(best._1 === 240, s"cp at ${best._1}")
  }

  test("simulated AR(1) has acf1 ~ phi") {
    for (phi <- Seq(0.4, 0.8)) {
      val xs = Simulator.arma(Array(phi), Array.empty, 20000, seed = 9)
      val n = xs.length
      val mu = xs.sum / n
      val v = xs.map(x => (x - mu) * (x - mu)).sum / n
      val acf1 = (1 until n).map(i => (xs(i) - mu) * (xs(i - 1) - mu)).sum / (v * n)
      assert(math.abs(acf1 - phi) < 0.03, s"phi=$phi acf1=$acf1")
    }
  }

  test("trend-shift simulator changes slope at the changepoint") {
    val xs = Simulator.trendShift(n = 200, cpAt = 100, slope1 = 0.0, slope2 = 2.0, noise = 0.1)
    val firstHalfRange = xs.slice(0, 100).max - xs.slice(0, 100).min
    assert(firstHalfRange < 2.0)
    assert(xs.last > 190.0)
  }
}
