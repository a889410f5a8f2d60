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
  * Determinism contract (shared with the DuckDB oracle): prefix sums are
  * accumulated sequentially in ts order, the gain formula is evaluated
  * with the identical expression tree, and argmax ties keep the FIRST
  * split index — so both engines walk the same float sequence and pick
  * the same splits.
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
    val sx = new Array[Double](n + 1); val s2 = new Array[Double](n + 1)
    var i = 0
    while (i < n) { sx(i + 1) = sx(i) + xs(i); s2(i + 1) = s2(i) + xs(i) * xs(i); i += 1 }
    val sigma2 = math.max((s2(n) - sx(n) * sx(n) / n) / n, 0.0)
    val beta = 2.0 * sigma2 * math.log(n.toDouble)
    def sse(a: Int, b: Int): Double = {
      val dx = sx(b) - sx(a)
      (s2(b) - s2(a)) - dx * dx / (b - a)
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
