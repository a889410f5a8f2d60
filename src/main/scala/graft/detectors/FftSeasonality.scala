package graft.detectors

import graft.{SeriesOps, TSSchema}
import org.apache.spark.sql.DataFrame

/** Periodogram-based seasonality detection (kats/detectors/seasonality.py:
  * FFTDetector). Explicit DFT over the mean-removed series at Fourier
  * frequencies k = 1..n/2; reports the dominant period and its share of
  * total spectral power. O(n²) per series on bounded-length series —
  * series length is capped by the resample grid, parallelism comes from
  * the series count. (An FFT drop-in is a local optimization only.)
  */
object FftSeasonality {

  /** (dominantPeriod, powerShare) */
  def dominantPeriod(xs: Array[Double]): (Double, Double) = {
    val n = xs.length
    if (n < 4) return (0.0, 0.0)
    val mean = xs.sum / n
    var bestK = 1; var bestP = 0.0; var total = 0.0
    var k = 1
    while (k <= n / 2) {
      var re = 0.0; var im = 0.0
      var t = 0
      val w = 2.0 * math.Pi * k / n
      while (t < n) {
        val v = xs(t) - mean
        re += v * math.cos(w * t)
        im -= v * math.sin(w * t)
        t += 1
      }
      val p = (re * re + im * im) / n
      total += p
      if (p > bestP) { bestP = p; bestK = k }
      k += 1
    }
    (n.toDouble / bestK, if (total > 0) bestP / total else 0.0)
  }

  def detect(df: DataFrame, s: TSSchema): DataFrame =
    SeriesOps.aggSeries(df, s, Seq("period", "power_share")) { xs =>
      val (p, sh) = dominantPeriod(xs)
      Array(p, sh)
    }
}
