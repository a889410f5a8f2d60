package graft.detectors

/** Siegel repeated-median regression (Siegel 1982) — the 50%-breakdown
  * robust line: slope = median over i of median over j≠i of pairwise
  * slopes, intercept = median of residuals against the snapped slope,
  * scale = 1.4826·median absolute residual. Entirely order statistics on
  * deterministically-computed values (no float sums), so the DuckDB
  * oracle's rank-pick replay agrees exactly by construction. Median
  * convention: mean of the two central order statistics (theil_sen's).
  */
object Siegel {

  /** (slope6dp, intercept6dp, madResidRaw, n) over xs at t = 0..n−1. */
  def fit(xs: Array[Double]): (Double, Double, Double, Int) = {
    val n = xs.length
    require(n >= 2, s"need at least 2 points, got $n")
    def med(v: Array[Double]): Double = {
      java.util.Arrays.sort(v)
      (v((v.length + 1) / 2 - 1) + v(v.length / 2)) / 2.0
    }
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val mi = Array.tabulate(n) { i =>
      val sl = new Array[Double](n - 1)
      var k = 0; var j = 0
      while (j < n) { if (j != i) { sl(k) = (xs(j) - xs(i)) / (j - i); k += 1 }; j += 1 }
      med(sl)
    }
    val slope = r6(med(mi))
    val icept = r6(med(Array.tabulate(n)(i => xs(i) - slope * i)))
    val madr = med(Array.tabulate(n)(i => math.abs(xs(i) - (icept + slope * i))))
    (slope, icept, 1.4826 * madr, n)
  }
}
