package graft.operators

/** Deterministic time-series simulators (kats/utils/simulator.py):
  * ARMA processes, trend-shift and level-shift series for detector
  * calibration. Innovations come from a seeded Park–Miller LCG
  * (s' = s·48271 mod 2³¹−1 — every intermediate fits in 63 bits, so an
  * external SQL engine reproduces the stream bit-exactly with plain
  * BIGINT arithmetic) pushed through a Box–Muller transform; simulated
  * fixtures are therefore reproducible anywhere, including the DuckDB
  * oracle via a recursive CTE.
  */
object Simulator {

  val LcgMod = 2147483647L // 2^31 - 1 (Mersenne prime)
  val LcgMul = 48271L

  private final class Rng(seed0: Long) {
    // scramble the seed so adjacent seeds don't yield shifted streams
    private var s = ((math.abs(seed0) * 2027L + 1234567L) % LcgMod) max 1L
    def nextLong(): Long = { s = (s * LcgMul) % LcgMod; s }
    def nextUniform(): Double = nextLong().toDouble / LcgMod.toDouble
    def nextGaussian(): Double = {
      val u1 = math.max(nextUniform(), 1e-300)
      val u2 = nextUniform()
      math.sqrt(-2 * math.log(u1)) * math.cos(2 * math.Pi * u2)
    }
  }

  /** ARMA(p, q) with given AR/MA coefficients, zero mean, unit noise. */
  def arma(ar: Array[Double], ma: Array[Double], n: Int, seed: Long = 42L, sigma: Double = 1.0): Array[Double] = {
    val rng = new Rng(seed)
    val p = ar.length; val q = ma.length
    val x = new Array[Double](n)
    val e = new Array[Double](n)
    var t = 0
    while (t < n) {
      e(t) = rng.nextGaussian() * sigma
      var v = e(t)
      var i = 0
      while (i < p) { if (t - 1 - i >= 0) v += ar(i) * x(t - 1 - i); i += 1 }
      var j = 0
      while (j < q) { if (t - 1 - j >= 0) v += ma(j) * e(t - 1 - j); j += 1 }
      x(t) = v
      t += 1
    }
    x
  }

  /** Level-shift series: baseline + shift after the changepoint. */
  def levelShift(n: Int, cpAt: Int, shift: Double, noise: Double = 1.0, seed: Long = 42L): Array[Double] = {
    val rng = new Rng(seed)
    Array.tabulate(n)(i => (if (i < cpAt) 0.0 else shift) + rng.nextGaussian() * noise)
  }

  /** Trend-shift series: slope changes at the changepoint. */
  def trendShift(n: Int, cpAt: Int, slope1: Double, slope2: Double, noise: Double = 1.0, seed: Long = 42L): Array[Double] = {
    val rng = new Rng(seed)
    Array.tabulate(n) { i =>
      val trend = if (i < cpAt) slope1 * i else slope1 * cpAt + slope2 * (i - cpAt)
      trend + rng.nextGaussian() * noise
    }
  }
}
