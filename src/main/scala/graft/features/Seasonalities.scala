package graft.features

/** kats `TsFeatures.get_seasonalities` (kats/tsfeatures/tsfeatures.py:1912)
  * + the FFT peak detector it drives (kats/detectors/seasonality.py:185
  * FFTDetector.get_fft / get_fft_peaks):
  *
  *  1. first-difference the series (detrending for period estimation);
  *  2. detect the seasonal period on the diff: explicit DFT at positive
  *     Fourier frequencies, amplitudes in dB; peaks = strict local maxima
  *     rising >= 0.1 dB above both neighbors; keep peaks above
  *     median + 6·MAD of the positive amplitudes; drop harmonics (a peak
  *     whose frequency ratio to ANY earlier selected peak is within 0.01
  *     of an integer — the reference's loop consults removed peaks too,
  *     which makes the filter order-free); period = ⌊min 1/freq⌋, or 7
  *     when nothing survives;
  *  3. decompose at that period — two-pass centered-MA decomposition
  *     (graft's stlLite semantics, period-parametric: seasonal index
  *     t mod period, MA half-width period/2) in place of statsmodels'
  *     loess STL;
  *  4. features: the period itself; trend magnitude = no-intercept OLS
  *     slope of (trend - trend₀) on 0..n-1; seasonality magnitude =
  *     round(q95 - q05) of the seasonal component; residual std
  *     (population).
  *
  * Pure per-series array kernel — one row per series after the keyed
  * collect, the shape every other battery feature uses; the DuckDB oracle
  * replays every step (DFT sums, dB thresholds, harmonic anti-join,
  * banded-join MA, quantile_cont) in SQL.
  */
object Seasonalities {

  /** np.quantile linear interpolation on an ascending-sorted array. */
  private def quantileSorted(sorted: Array[Double], q: Double): Double = {
    val pos = q * (sorted.length - 1)
    val lo = math.floor(pos).toInt
    val hi = math.ceil(pos).toInt
    sorted(lo) + (pos - lo) * (sorted(hi) - sorted(lo))
  }

  /** FFT-peak period of the (already differenced) series; 7 if none. */
  def fftPeriod(d: Array[Double]): Int = {
    val m = d.length
    if (m < 4) return 7
    val kMax = (m + 1) / 2 - 1 // positive Fourier freqs: k = 1..kMax
    if (kMax < 1) return 7
    val ampl = new Array[Double](kMax + 1) // 1-based on k
    var k = 1
    while (k <= kMax) {
      var re = 0.0; var im = 0.0
      val w = 2.0 * math.Pi * k / m
      var t = 0
      while (t < m) { re += d(t) * math.cos(w * t); im += d(t) * math.sin(w * t); t += 1 }
      val psd = re * re + im * im
      ampl(k) = if (psd > 0) 10.0 * math.log10(psd) else -1e308
      k += 1
    }
    val pos = ampl.drop(1).filter(_ > 0)
    if (pos.isEmpty) return 7
    val med = quantileSorted(pos.sorted, 0.5)
    val above = pos.filter(_ > med)
    if (above.isEmpty) return 7
    val mu = above.sum / above.length
    val mad = above.map(v => math.abs(v - mu)).sum / above.length
    val thr = med + 6.0 * mad
    // strict local maxima rising >= 0.1 dB over both neighbors, above thr
    val sel = (2 to kMax - 1).filter { j =>
      ampl(j) - ampl(j - 1) >= 0.1 && ampl(j) - ampl(j + 1) >= 0.1 && ampl(j) > thr
    }
    val kept = sel.filter { kj =>
      !sel.exists { ki =>
        ki < kj && { val f = (kj.toDouble / ki) % 1.0; f < 0.01 || f > 0.99 }
      }
    }
    if (kept.isEmpty) 7
    else math.floor(m.toDouble / kept.max).toInt // min period = m / largest kept k
  }

  /** (seasonal_period, trend_mag, seasonality_mag, residual_std).
    * Series shorter than 5 points report NaN — a contract the DuckDB
    * oracle does not model (it assumes real series; every testdata
    * series is ≥100 points), so don't point q_feat_seasonalities at
    * toy series without extending the oracle's guard. */
  def features(xs: Array[Double]): Array[Double] = {
    val n = xs.length
    if (n < 5) return Array(Double.NaN, Double.NaN, Double.NaN, Double.NaN)
    val d = Array.tabulate(n - 1)(i => xs(i + 1) - xs(i))
    val period = fftPeriod(d)
    val half = period / 2

    def ma(a: Array[Double]): Array[Double] = Array.tabulate(n) { t =>
      val lo = math.max(0, t - half); val hi = math.min(n - 1, t + half)
      var s = 0.0; var i = lo
      while (i <= hi) { s += a(i); i += 1 }
      s / (hi - lo + 1)
    }
    // seasonal component: per-(t mod period) mean of the detrended series,
    // recentered by the all-row mean (group sizes weight the recentering)
    def seasonal(detr: Array[Double]): Array[Double] = {
      val sums = new Array[Double](period); val cnts = new Array[Int](period)
      var t = 0
      while (t < n) { sums(t % period) += detr(t); cnts(t % period) += 1; t += 1 }
      val means = Array.tabulate(period)(i => sums(i) / cnts(i))
      val sraw = Array.tabulate(n)(t => means(t % period))
      val c = sraw.sum / n
      sraw.map(_ - c)
    }

    val trend1 = ma(xs)
    val seasonal1 = seasonal(Array.tabulate(n)(t => xs(t) - trend1(t)))
    val trend2 = ma(Array.tabulate(n)(t => xs(t) - seasonal1(t)))
    val seasonal2 = seasonal(Array.tabulate(n)(t => xs(t) - trend2(t)))
    val resid = Array.tabulate(n)(t => xs(t) - trend2(t) - seasonal2(t))

    val s2sorted = seasonal2.sorted
    val seasonalityMag =
      math.floor(quantileSorted(s2sorted, 0.95) - quantileSorted(s2sorted, 0.05) + 0.5)
    var num = 0.0; var den = 0.0
    var t = 0
    while (t < n) { num += t * (trend2(t) - trend2(0)); den += t.toDouble * t; t += 1 }
    val trendMag = num / den
    val rm = resid.sum / n
    val residualStd = math.sqrt(math.max(resid.map(r => r * r).sum / n - rm * rm, 0.0))
    Array(period.toDouble, trendMag, seasonalityMag, residualStd)
  }
}
