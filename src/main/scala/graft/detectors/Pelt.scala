package graft.detectors

/** Optimal-partitioning multi-changepoint segmentation (the exact
  * objective PELT prunes — Killick, Fearnhead & Eckley 2012; same output,
  * pruning is a kernel-local speedup addable without touching results).
  * The CUSUM/BOCPD family finds ONE changepoint (or online posteriors);
  * this finds the globally optimal SET of mean-change segments:
  *
  *   F(t) = min_{0≤s<t} F(s) + SSE(x_{s+1..t}) + β,  F(0) = −β
  *
  * with SSE from prefix sums ((Σx²)−(Σx)²/len) and the BIC-flavored
  * penalty β = 2·σ̂²·ln n (σ̂² the population variance, clamped ≥ 0 so a
  * constant series yields one segment, not n). Ties in the minimization
  * keep the FIRST s — the convention DuckDB's list_position reproduces,
  * letting the oracle replay the whole DP as one recursive CTE carrying
  * the F and pointer lists.
  *
  * Scale: the DP is O(n²) in SERIES LENGTH only, run once per series
  * after the one-series-per-row reduction — the scale axis stays series
  * count, exactly like the other whole-series kernels.
  */
object Pelt {

  /** Segments as (startIdx, endIdxExcl, mean), ascending; 0-based over
    * the ordered series.
    */
  def segment(xs: Array[Double]): Seq[(Int, Int, Double)] = {
    val n = xs.length
    require(n >= 2, s"need at least 2 points, got $n")
    val sx = new Array[Double](n + 1); val s2 = new Array[Double](n + 1)
    var i = 0
    while (i < n) { sx(i + 1) = sx(i) + xs(i); s2(i + 1) = s2(i) + xs(i) * xs(i); i += 1 }
    val sigma2 = math.max((s2(n) - sx(n) * sx(n) / n) / n, 0.0)
    val beta = 2.0 * sigma2 * math.log(n.toDouble)
    val f = new Array[Double](n + 1); val cp = new Array[Int](n + 1)
    f(0) = -beta
    var t = 1
    while (t <= n) {
      var best = Double.MaxValue; var arg = 0
      var s = 0
      while (s < t) {
        val dx = sx(t) - sx(s)
        val v = f(s) + ((s2(t) - s2(s)) - dx * dx / (t - s)) + beta
        if (v < best) { best = v; arg = s }
        s += 1
      }
      f(t) = best; cp(t) = arg
      t += 1
    }
    var out = List.empty[(Int, Int, Double)]
    var e = n
    while (e > 0) {
      val st = cp(e)
      out = (st, e, (sx(e) - sx(st)) / (e - st)) :: out
      e = st
    }
    out
  }
}
