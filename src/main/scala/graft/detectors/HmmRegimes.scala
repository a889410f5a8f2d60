package graft.detectors

/** Two-state Gaussian HMM regime segmentation via Viterbi — the classic
  * regime-switching reading of a series (low/high regimes with sticky
  * transitions), complementing the changepoint family: PELT finds the
  * optimal MEAN-CHANGE partition, Viterbi finds the most likely LABELED
  * state path under a persistence prior, so regimes can recur.
  *
  * Everything is deterministic so the DuckDB oracle can replay it:
  * - moment fit: state means = mean below / above the lower median
  *   (order statistic at 1-based rank (n+1)//2), shared σ = population
  *   std clamped ≥ 1e-6; all three snapped to the 6-dp grid.
  * - sticky transitions p_stay = 0.95; the log constants are injected
  *   into both engines as the same Scala-printed double literals.
  * - emission −0.5·((x−μ_k)/σ)² (state-constant terms cancel in argmax).
  * - ties prefer the from-state-0 path and the state-0 endpoint, the
  *   convention CASE WHEN c0 >= c1 reproduces.
  *
  * Scale: O(n) per series after the one-row-per-series reduction.
  */
object HmmRegimes {

  val PStay = 0.95
  val LnStay: Double = math.log(PStay)
  val LnSwitch: Double = math.log(1.0 - PStay)

  private def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Segments as (state, startIdx, endIdxExcl, muState), ascending. */
  def segment(xs: Array[Double]): Seq[(Int, Int, Int, Double)] = {
    val n = xs.length
    require(n >= 2, s"need at least 2 points, got $n")
    val sorted = xs.clone(); java.util.Arrays.sort(sorted)
    val med = sorted((n - 1) / 2)
    var s0 = 0.0; var c0 = 0L; var s1 = 0.0; var c1 = 0L
    var i = 0
    while (i < n) {
      if (xs(i) <= med) { s0 += xs(i); c0 += 1 } else { s1 += xs(i); c1 += 1 }
      i += 1
    }
    val mu0 = r6(s0 / c0)
    val mu1 = if (c1 == 0) mu0 else r6(s1 / c1)
    var ss = 0.0; var sx = 0.0
    i = 0
    while (i < n) { sx += xs(i); ss += xs(i) * xs(i); i += 1 }
    // clamp BEFORE the sqrt: a constant series' variance can be a tiny
    // float negative, and max(NaN, eps) is NaN on the JVM
    val sigma = r6(math.max(math.sqrt(math.max((ss - sx * sx / n) / n, 0.0)), 1e-6))

    def e(x: Double, mu: Double): Double = {
      val z = (x - mu) / sigma
      -0.5 * (z * z)
    }
    var v0 = e(xs(0), mu0); var v1 = e(xs(0), mu1)
    val b0 = new Array[Int](n + 1); val b1 = new Array[Int](n + 1)
    var t = 2
    while (t <= n) {
      val c00 = v0 + LnStay; val c10 = v1 + LnSwitch
      val c01 = v0 + LnSwitch; val c11 = v1 + LnStay
      val m0 = if (c00 >= c10) c00 else c10
      b0(t) = if (c00 >= c10) 0 else 1
      val m1 = if (c01 >= c11) c01 else c11
      b1(t) = if (c01 >= c11) 0 else 1
      val x = xs(t - 1)
      v0 = m0 + e(x, mu0)
      v1 = m1 + e(x, mu1)
      t += 1
    }
    val states = new Array[Int](n + 1) // 1-based times
    states(n) = if (v0 >= v1) 0 else 1
    var tt = n
    while (tt > 1) {
      states(tt - 1) = if (states(tt) == 0) b0(tt) else b1(tt)
      tt -= 1
    }
    // islands over the state path
    val out = scala.collection.mutable.ListBuffer.empty[(Int, Int, Int, Double)]
    var start = 1
    var k = 2
    while (k <= n + 1) {
      if (k == n + 1 || states(k) != states(start)) {
        val st = states(start)
        out += ((st, start - 1, k - 1, if (st == 0) mu0 else mu1))
        start = k
      }
      k += 1
    }
    out.toList
  }
}
