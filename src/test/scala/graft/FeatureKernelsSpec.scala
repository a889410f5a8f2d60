package graft

import graft.features.FeatureKernels._
import org.scalatest.funsuite.AnyFunSuite

class FeatureKernelsSpec extends AnyFunSuite {
  private val rnd = new scala.util.Random(42)

  test("pacf of an AR(1) process: pacf(1) ~ phi, pacf(2..) ~ 0") {
    val phi = 0.7
    val xs = new Array[Double](4000)
    for (i <- 1 until xs.length) xs(i) = phi * xs(i - 1) + rnd.nextGaussian()
    val p = pacf(xs, 5)
    assert(math.abs(p(0) - phi) < 0.05, s"pacf1=${p(0)}")
    assert(p.drop(1).forall(v => math.abs(v) < 0.06), p.mkString(","))
  }

  test("spectral entropy: sine is low, white noise is high") {
    val sine = Array.tabulate(512)(i => math.sin(2 * math.Pi * i / 16.0))
    val noise = Array.fill(512)(rnd.nextGaussian())
    assert(spectralEntropy(sine) < 0.2)
    assert(spectralEntropy(noise) > 0.85)
  }

  test("hurst: random walk ~ 0.5, white noise ~ 0") {
    val walk = new Array[Double](5000)
    for (i <- 1 until walk.length) walk(i) = walk(i - 1) + rnd.nextGaussian()
    val noise = Array.fill(5000)(rnd.nextGaussian())
    assert(math.abs(hurst(walk) - 0.5) < 0.12, s"walk hurst=${hurst(walk)}")
    assert(hurst(noise) < 0.15, s"noise hurst=${hurst(noise)}")
  }

  test("ARCH LM: larger for volatility-clustered series than for iid") {
    val iid = Array.fill(2000)(rnd.nextGaussian())
    // GARCH-ish: volatility regime switches every 100 points
    val vol = Array.tabulate(2000)(i => rnd.nextGaussian() * (if ((i / 100) % 2 == 0) 0.5 else 3.0))
    assert(archLm(vol) > archLm(iid) * 3, s"vol=${archLm(vol)} iid=${archLm(iid)}")
  }

  test("KPSS: small for stationary noise, large for a trending series") {
    val noise = Array.fill(1000)(rnd.nextGaussian())
    val curved = Array.tabulate(1000)(i => math.sqrt(i.toDouble) * 3 + rnd.nextGaussian())
    assert(kpss(noise) < 0.2, s"noise kpss=${kpss(noise)}")
    assert(kpss(curved) > 1.0, s"curved kpss=${kpss(curved)}")
  }

  test("specialAc on a 24-periodic series finds min near half-period") {
    val xs = Array.tabulate(480)(i => math.cos(2 * math.Pi * i / 24.0))
    val (firstMin, firstZero) = specialAc(xs)
    assert(math.abs(firstMin - 12) <= 1, s"firstmin=$firstMin")
    assert(firstZero >= 6 && firstZero <= 8, s"firstzero=$firstZero")
  }

  test("Seasonalities.fftPeriod detects a clean 24-cycle and falls back to 7 on noise") {
    import graft.features.Seasonalities
    val xs = Array.tabulate(241)(i => 10 * math.sin(2 * math.Pi * i / 24.0) + 0.05 * i + 0.3 * rnd.nextGaussian())
    val d = Array.tabulate(240)(i => xs(i + 1) - xs(i))
    assert(Seasonalities.fftPeriod(d) === 24)
    val noise = Array.fill(240)(rnd.nextGaussian())
    assert(Seasonalities.fftPeriod(noise) === 7)
  }

  test("Seasonalities harmonic filter keeps the base cycle, not its harmonic") {
    import graft.features.Seasonalities
    // strong 24-cycle plus its 12-cycle harmonic: the k=2k0 peak must be
    // removed, so the reported period is 24 rather than 12
    val d = Array.tabulate(240)(i =>
      10 * math.sin(2 * math.Pi * i / 24.0) + 5 * math.sin(2 * math.Pi * i / 12.0) + 0.1 * rnd.nextGaussian())
    assert(Seasonalities.fftPeriod(d) === 24)
  }

  test("Seasonalities.features on a seasonal trending series") {
    import graft.features.Seasonalities
    val xs = Array.tabulate(241)(i => 20 * math.sin(2 * math.Pi * i / 24.0) + 0.5 * i + 0.2 * rnd.nextGaussian())
    val Array(period, trendMag, seasMag, residStd) = Seasonalities.features(xs)
    assert(period === 24.0)
    assert(math.abs(trendMag - 0.5) < 0.05, s"trendMag=$trendMag")
    assert(seasMag > 25 && seasMag < 45, s"seasMag=$seasMag") // ~2*q95 of a 20-amp sine
    assert(residStd < 5.0, s"residStd=$residStd")
  }
}
