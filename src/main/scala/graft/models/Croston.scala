package graft.models

/** Croston's method for intermittent demand (Croston 1972) + the
  * Syntetos-Boylan approximation — the sparse-series forecaster the
  * reference's smoothing family (SES/Holt/HW) handles poorly: SES(α) runs
  * separately on the nonzero demand SIZES and on the INTER-DEMAND
  * intervals, and the per-period forecast is ẑ/ŷ (SBA multiplies by
  * 1−α/2 to correct Croston's inversion bias).
  *
  * Conventions (deterministic, oracle-replayed): the series is the DENSE
  * zero-filled grid; the first interval is the 1-based position of the
  * first demand (as if a demand sat at t=0); SES inits at the first
  * observation. The oracle evaluates the same smoothing as the
  * closed-form power sum (the q_ses precedent — recursion and power sum
  * agree under the 6-dp output rounding).
  */
object Croston {

  val Alpha = 0.1

  /** xs = dense series. Returns Array(nNonzero, zHat, yHat, croston, sba);
    * all-zero series yield zeros.
    */
  def fit(xs: Array[Double]): Array[Double] = {
    var zHat = 0.0; var yHat = 0.0
    var k = 0L
    var prev = 0
    var i = 0
    while (i < xs.length) {
      if (xs(i) > 0) {
        val gap = (i + 1 - prev).toDouble
        if (k == 0) { zHat = xs(i); yHat = gap }
        else {
          zHat = Alpha * xs(i) + (1.0 - Alpha) * zHat
          yHat = Alpha * gap + (1.0 - Alpha) * yHat
        }
        prev = i + 1
        k += 1
      }
      i += 1
    }
    if (k == 0) Array(0.0, 0.0, 0.0, 0.0, 0.0)
    else {
      val f = zHat / yHat
      Array(k.toDouble, zHat, yHat, f, (1.0 - Alpha / 2.0) * f)
    }
  }
}
