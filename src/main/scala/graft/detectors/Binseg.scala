package graft.detectors

/** Binary segmentation changepoint scan (Scott & Knott 1974; the "binseg"
  * method of the ruptures family, Truong et al. 2020) — the greedy
  * O(n·depth) complement to the exact-but-O(n²) [[Pelt]] DP. Fixed
  * depth 2: the root SSE-gain argmax split, then the argmax split of each
  * child — up to 3 candidate changepoints per series, each reported with
  * its gain and a significance flag against the same BIC-flavored
  * penalty β = 2·σ̂²·ln n PELT charges per segment (the fixed-depth report
  * mirrors ruptures' `n_bkps` mode: the scan always returns its best
  * candidates and the caller thresholds).
  *
  * Determinism contract (shared with the DuckDB oracle): inputs are
  * quantized to 2 dp and prefix sums accumulate as EXACT scaled
  * integers (values ×10², squares ×10⁴ — sums fit a long at any
  * realistic series length), so the gain floats derive from identical
  * integers on both engines regardless of summation order (DuckDB's
  * windowed cumulative sums are segment-tree-ordered, which drifted a
  * double prefix by an ulp at 3600 rows — caught by the first full
  * sf0.1 gate, round 10); the gain expression tree is identical and
  * argmax ties keep the FIRST split index.
  *
  * Scale: O(n·depth) per series after the one-series-per-row reduction;
  * the scale axis stays series count. This is the scan you run where
  * PELT's n² per series is too hot (long series × many series).
  */
object Binseg {

  /** Candidate splits as (splitNo, idx, gain, significant) with
    * splitNo 1 = root, 2 = left child, 3 = right child; idx is the
    * 0-based boundary (first idx points fall left). A child row is absent
    * when its segment admits no split with both sides >= minSeg.
    */
  def splits(xs: Array[Double], minSeg: Int = 24): Seq[(Int, Int, Double, Boolean)] = {
    val n = xs.length
    require(n >= 2, s"need at least 2 points, got $n")
    val sx = new Array[Long](n + 1); val s2 = new Array[Long](n + 1)
    var i = 0
    while (i < n) {
      // 2-dp quantized, exact; round-half-away matches DuckDB round()
      val s = xs(i) * 100.0
      val v = (if (s >= 0) math.floor(s + 0.5) else math.ceil(s - 0.5)).toLong
      // addExact/multiplyExact: |value| ≳ 5e5 over thousands of rows could
      // wrap the ×10⁴ squared sum silently while the DuckDB twin (BIGINT
      // sum → cast) raises — overflow must be an ERROR on both engines,
      // never a silent divergence.
      sx(i + 1) = Math.addExact(sx(i), v)
      s2(i + 1) = Math.addExact(s2(i), Math.multiplyExact(v, v))
      i += 1
    }
    val sxT = sx(n).toDouble / 1e2; val s2T = s2(n).toDouble / 1e4
    val sigma2 = math.max((s2T - sxT * sxT / n) / n, 0.0)
    val beta = 2.0 * sigma2 * math.log(n.toDouble)
    def sse(a: Int, b: Int): Double = {
      val dx = (sx(b) - sx(a)).toDouble / 1e2
      (s2(b) - s2(a)).toDouble / 1e4 - dx * dx / (b - a)
    }
    // best split of [a, b): (t, gain), first argmax on ties; None when the
    // range admits no split with both sides >= minSeg
    def best(a: Int, b: Int): Option[(Int, Double)] = {
      var bt = -1; var bg = Double.NegativeInfinity
      var t = a + minSeg
      while (t <= b - minSeg) {
        val g = sse(a, b) - sse(a, t) - sse(t, b)
        if (g > bg) { bg = g; bt = t }
        t += 1
      }
      if (bt < 0) None else Some((bt, bg))
    }
    best(0, n).toSeq.flatMap { case (t1, g1) =>
      val root = (1, t1, g1, g1 > beta)
      val left = best(0, t1).map { case (t, g) => (2, t, g, g > beta) }
      val right = best(t1, n).map { case (t, g) => (3, t, g, g > beta) }
      Seq(root) ++ left ++ right
    }
  }
}
