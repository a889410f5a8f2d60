package graft.models

/** Teunter-Syntetos-Babai intermittent-demand forecaster (Teunter,
  * Syntetos & Babai 2011) — the obsolescence-aware companion to
  * [[Croston]]: instead of smoothing inter-demand INTERVALS (which only
  * update when demand occurs, so a dying item keeps its stale forecast
  * forever), TSB smooths the demand PROBABILITY every period
  * (p ← β·1{d>0} + (1−β)·p), so the forecast decays through zero-demand
  * stretches. Demand sizes smooth exactly like Croston (α on demand
  * periods only). Forecast = p̂·ẑ.
  *
  * Conventions (deterministic, oracle-replayed as closed-form power
  * sums — the q_croston precedent): dense zero-filled grid; p inits at
  * the first period's indicator and updates from period 2 on; z inits
  * at the first nonzero demand.
  */
object Tsb {

  /** Demand-size smoothing (matches Croston.Alpha). */
  val Alpha = 0.1

  /** Probability smoothing — slower than α, the standard TSB choice:
    * probability drifts with item lifecycle, sizes track recent orders. */
  val Beta = 0.05

  /** xs = dense series. Returns
    * Array(nPeriods, nNonzero, pHat, zHat, tsb); all-zero series yield
    * (n, 0, pHat, 0, 0) — the probability still decays to ~0.
    */
  def fit(xs: Array[Double]): Array[Double] = {
    if (xs.isEmpty) return Array(0.0, 0.0, 0.0, 0.0, 0.0)
    var p = if (xs(0) > 0) 1.0 else 0.0
    var z = 0.0
    var k = 0L
    var i = 0
    while (i < xs.length) {
      if (i > 0) p = Beta * (if (xs(i) > 0) 1.0 else 0.0) + (1.0 - Beta) * p
      if (xs(i) > 0) {
        if (k == 0) z = xs(i) else z = Alpha * xs(i) + (1.0 - Alpha) * z
        k += 1
      }
      i += 1
    }
    Array(xs.length.toDouble, k.toDouble, p, z, p * z)
  }
}
