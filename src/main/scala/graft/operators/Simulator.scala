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

  /** The raw seeded gaussian stream (one draw per index, in index order) —
    * the shared innovation source for every simulator below, exposed so a
    * distributed query can posexplode it and rebuild a series in closed
    * column form.
    */
  def gaussians(n: Int, seed: Long): Array[Double] = {
    val rng = new Rng(seed)
    Array.fill(n)(rng.nextGaussian())
  }

  /** STL-style composed series (kats/utils/simulator.py:300 `stl_sim` with
    * `add_trend`/`add_seasonality`/`add_noise`, :185/:240/:213): linear
    * trend over normalized time, sinusoidal seasonality with period in
    * points, iid gaussian noise.
    */
  def stlSim(n: Int, trendMag: Double, seasMag: Double, seasPeriod: Double,
             noiseMag: Double, seed: Long): Array[Double] = {
    val g = gaussians(n, seed)
    Array.tabulate(n) { i =>
      trendMag * (i.toDouble / (n - 1)) +
        seasMag * math.sin(2 * math.Pi * i / seasPeriod) +
        noiseMag * g(i)
    }
  }

  /** kats' segment lookup for anomaly injection (simulator.py:395):
    * counts changepoints strictly below the index over the padded
    * boundary list [0, cps..., n] — reproduced quirk included (an anomaly
    * exactly on a changepoint reads the previous segment's level).
    */
  private def katsSegIdx(i: Int, cpArr: Array[Int], n: Int): Int = {
    val padded = 0 +: cpArr :+ n
    math.max(padded.count(c => i > c) - 1, 0)
  }

  /** Level-shift series with seasonality + point anomalies
    * (simulator.py:416 `level_shift_sim` / :334 `_get_level_shift_y_val`):
    * per-segment gaussian levels, anomaly overrides at z-score offsets,
    * then additive sin(π/period · t) seasonality.
    */
  def levelShiftSim(n: Int, cpArr: Array[Int], levelArr: Array[Double], noise: Double,
                    seasonalPeriod: Int, seasonalMagnitude: Double,
                    anomalyArr: Array[Int] = Array.empty, zScoreArr: Array[Double] = Array.empty,
                    seed: Long = 100L): Array[Double] = {
    require(levelArr.length == cpArr.length + 1, "level_arr must be one longer than cp_arr")
    require(anomalyArr.length == zScoreArr.length, "anomaly_arr and z_score_arr must align")
    val cps = cpArr.sorted
    def segOf(i: Int): Int = { var s = 0; while (s < cps.length && i >= cps(s)) s += 1; s }
    val rng = new Rng(seed)
    val y = Array.tabulate(n)(i => levelArr(segOf(i)) + rng.nextGaussian() * noise)
    var k = 0
    while (k < anomalyArr.length) {
      val i = anomalyArr(k)
      y(i) = levelArr(katsSegIdx(i, cps, n)) + zScoreArr(k) * noise
      k += 1
    }
    var i = 0
    while (i < n) { y(i) += seasonalMagnitude * math.sin(math.Pi / seasonalPeriod * i); i += 1 }
    y
  }

  /** Trend-shift series (simulator.py:562 `trend_shift_sim`): per-segment
    * slopes over the global index with continuity adjustment at each
    * changepoint, sinusoidal seasonality, gaussian noise, and anomaly
    * overrides replacing the noise term at z·noise.
    */
  def trendShiftSim(n: Int, cpArr: Array[Int], trendArr: Array[Double], intercept: Double,
                    noise: Double, seasonalPeriod: Int, seasonalMagnitude: Double,
                    anomalyArr: Array[Int] = Array.empty, zScoreArr: Array[Double] = Array.empty,
                    seed: Long = 15L): Array[Double] = {
    require(trendArr.length == cpArr.length + 1, "trend_arr must be one longer than cp_arr")
    require(anomalyArr.length == zScoreArr.length, "anomaly_arr and z_score_arr must align")
    val bounds = 0 +: cpArr.sorted :+ n
    val y = Array.fill(n)(intercept)
    var i = 0
    while (i < bounds.length - 1) {
      val b = bounds(i); val e = bounds(i + 1)
      var t = b
      while (t < e) { y(t) += trendArr(i) * t; t += 1 }
      if (i > 0) {
        val delta = y(b) - y(b - 1)
        t = b
        while (t < e) { y(t) -= delta; t += 1 }
      }
      i += 1
    }
    val rng = new Rng(seed)
    val noiseArr = Array.fill(n)(rng.nextGaussian() * noise)
    var k = 0
    while (k < anomalyArr.length) { noiseArr(anomalyArr(k)) = zScoreArr(k) * noise; k += 1 }
    i = 0
    while (i < n) {
      y(i) += seasonalMagnitude * math.sin(math.Pi / seasonalPeriod * i) + noiseArr(i)
      i += 1
    }
    y
  }

  /** Per-changepoint continuity offsets of `trendShiftSim`'s deterministic
    * part, in closed form: segment i contributes trend_i·t minus the
    * cumulative delta, where delta at boundary b is
    * trend_i·b − trend_{i−1}·(b−1). Lets a distributed query rebuild the
    * trend component as pure column math (no sequential scan).
    */
  def trendShiftOffsets(cpArr: Array[Int], trendArr: Array[Double]): Array[Double] = {
    val cps = cpArr.sorted
    val out = new Array[Double](trendArr.length)
    var cum = 0.0
    var i = 1
    while (i < trendArr.length) {
      val b = cps(i - 1)
      cum += trendArr(i) * b - trendArr(i - 1) * (b - 1)
      out(i) = cum
      i += 1
    }
    out
  }

  /** Spike injection (simulator.py:796 `inject_spikes`): estimate the
    * series' local noise scale as the population std of x[t] minus the
    * trailing 3-point moving average, then add z·(std+eps) at each
    * anomaly index.
    */
  def injectSpikes(xs: Array[Double], anomalyArr: Array[Int], zScoreArr: Array[Double],
                   epsilonStdDev: Double = 0.0): Array[Double] = {
    require(anomalyArr.length == zScoreArr.length, "anomaly_arr and z_score_arr must align")
    val y = xs.clone()
    val sd = spikeScale(xs)
    var k = 0
    while (k < anomalyArr.length) { y(anomalyArr(k)) += zScoreArr(k) * (sd + epsilonStdDev); k += 1 }
    y
  }

  /** The noise-scale estimate `inject_spikes` uses: population std of
    * x[j+2] − mean(x[j..j+2]) over all full 3-windows. */
  def spikeScale(xs: Array[Double]): Double = {
    val n = xs.length
    val d = Array.tabulate(n - 2)(j => xs(j + 2) - (xs(j) + xs(j + 1) + xs(j + 2)) / 3.0)
    val mu = d.sum / d.length
    math.sqrt(d.map(v => (v - mu) * (v - mu)).sum / d.length)
  }

  /** Level-shift injection (simulator.py:728 `inject_level_shift`):
    * cp_arr lists segment boundaries (one longer than level_arr); each
    * [cp_i, cp_{i+1}) range gets level_arr[i] added.
    */
  def injectLevelShift(xs: Array[Double], cpArr: Array[Int], levelArr: Array[Double]): Array[Double] = {
    require(cpArr.length == levelArr.length + 1, "cp_arr must be one longer than level_arr")
    val y = xs.clone()
    var i = 0
    while (i < levelArr.length) {
      var t = cpArr(i)
      while (t < cpArr(i + 1)) { y(t) += levelArr(i); t += 1 }
      i += 1
    }
    y
  }

  /** Trend-shift injection (simulator.py:760 `inject_trend_shift`): each
    * [cp_i, cp_{i+1}) range gets trend_i·arange added, and everything after
    * the range keeps the final offset (the shift persists).
    */
  def injectTrendShift(xs: Array[Double], cpArr: Array[Int], trendArr: Array[Double]): Array[Double] = {
    require(cpArr.length == trendArr.length + 1, "cp_arr must be one longer than trend_arr")
    val y = xs.clone()
    var i = 0
    while (i < trendArr.length) {
      val b = cpArr(i); val e = cpArr(i + 1)
      var t = b
      while (t < e) { y(t) += trendArr(i) * (t - b); t += 1 }
      val tail = trendArr(i) * (e - b - 1)
      t = e
      while (t < y.length) { y(t) += tail; t += 1 }
      i += 1
    }
    y
  }
}
