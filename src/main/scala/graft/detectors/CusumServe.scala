package graft.detectors

/** CUSUMDetectorModel serving loop (kats/detectors/cusum_model.py:594
  * fit_predict, re-derived): slide a step window over the served data; per
  * step, run changepoint detection over the trailing
  * historical+scan window and drive the alert state machine —
  *
  *  - no alert: detect over the scan window of the combined slice
  *    (cusum_model.py:415 _fit); on a significant changepoint, alert ON
  *    with baselines μ/σ from the combined slice up to the changepoint
  *    (cusum_model.py:323 _set_alert_on);
  *  - alert on: one "normal" scan-window mean back inside the
  *    direction-sided band [μ−δσ, μ] / [μ, μ+δσ] turns the alert OFF
  *    (NORMAL_TOLERENCE=1, cusum_model.py:331 _if_normal), as does a
  *    changepoint older than the 7-day retention (cusum_model.py:59);
  *  - scoring (cusum_model.py:502 _predict): zeros while no alert and for
  *    points at or before the changepoint; after it, z-score against the
  *    frozen baselines plus the absolute change.
  *
  * The inner detector is the dual-direction iterative CUSUM mean-split
  * (the [[CusumV2]] refinement convention, `MaxIter` steps per
  * direction, earliest significant candidate wins) with the CusumV2
  * Gaussian LLR gate plus the reference's delta_std_ratio gate.
  * Declared simplifications: no seasonality removal or pre-smoothing
  * (remove_seasonality=False is the reference default) and no magnitude
  * comparison (magnitude_quantile=None is the default). Prefix sums are
  * recomputed per index (not accumulated) so the DuckDB oracle's
  * list_sum-over-prefix-slice arithmetic is replayed exactly.
  */
object CusumServe {

  val Hist = 48 // historical window, points
  // scan REACH in points back from a step's last point: the scan slice is
  // Scan+1 = 25 points (ts >= t_end − Scan·granularity, INCLUSIVE — the
  // reference's time-based bound keeps both endpoints)
  val Scan = 24
  val Step = 12 // step window, points
  val NormalTolerance = 1
  val RetentionSec: Long = 7L * 24 * 3600
  val LlrThreshold: Double = CusumV2.LlrThreshold

  private def sumRange(xs: Array[Double], lo: Int, hiExcl: Int): Double = {
    var s = 0.0; var i = lo
    while (i < hiExcl) { s += xs(i); i += 1 }
    s
  }
  private def meanRange(xs: Array[Double], lo: Int, hiExcl: Int): Double =
    sumRange(xs, lo, hiExcl) / (hiExcl - lo)
  private def popStdRange(xs: Array[Double], lo: Int, hiExcl: Int): Double = {
    val m = meanRange(xs, lo, hiExcl)
    var ss = 0.0; var i = lo
    while (i < hiExcl) { val d = xs(i) - m; ss += d * d; i += 1 }
    math.sqrt(ss / (hiExcl - lo))
  }

  /** Dual-direction CUSUM over `w` with the reference's iterative
    * refinement (cusum_detection.py:_get_change_point, same convention as
    * [[CusumV2.detect]]): per direction, start from the arg extreme of
    * cumsum(w−μ) clamped to m−2, then run exactly `CusumV2.MaxIter`
    * refinement steps — each re-estimates the segment means, recomputes
    * cusum against their midpoint and re-picks the clamped extreme. Each
    * final candidate is gated by the CusumV2 LLR + direction consistency +
    * the delta_std_ratio gate; the earliest significant candidate wins
    * (kats sorts changepoints by start time), ties broken by LLR.
    * Returns (cpOff, dir) with dir ∈ {1 (increase), −1 (decrease)}.
    *
    * Cumulative sums are prefix-slice sums recomputed per index (not an
    * accumulator) so the oracle's list_sum(w[1:j]) arithmetic is replayed
    * bit-for-bit.
    */
  private[detectors] def detectOnce(w: Array[Double]): Option[(Int, Int)] = {
    val m = w.length
    if (m < 4) return None
    val mu = sumRange(w, 0, m) / m
    var ssT = 0.0
    var t = 0
    while (t < m) { val d = w(t) - mu; ssT += d * d; t += 1 }
    val sigt = math.sqrt(ssT / m)
    // degeneracy clamp: an (almost-)constant window carries no change
    // evidence, but its ~1e-15 prefix-sum noise would otherwise feed the
    // LLR a ratio of garbage variances and fire spuriously
    if (sigt <= math.max(math.abs(mu) * 1e-12, 1e-12)) return None
    // cs(j) against mean `mm`, as prefix-slice sums
    // (mirrors list_sum(w[1:j+1]) − (j+1)·mm)
    def cs(j: Int, mm: Double): Double = sumRange(w, 0, j + 1) - (j + 1) * mm
    def argPick(mm: Double, increase: Boolean): Int = {
      var best = 0
      var j = 1
      while (j < m) {
        val better = if (increase) cs(j, mm) < cs(best, mm) else cs(j, mm) > cs(best, mm)
        if (better) best = j
        j += 1
      }
      best
    }
    def refine(increase: Boolean): Int = {
      var cp = math.min(argPick(mu, increase), m - 2)
      var it = 0
      while (it < CusumV2.MaxIter) {
        val m0 = meanRange(w, 0, cp + 1)
        val m1 = meanRange(w, cp + 1, m)
        cp = math.max(1, math.min(argPick((m0 + m1) / 2, increase), m - 2))
        it += 1
      }
      cp
    }
    def clamp(i: Int): Int = math.max(1, math.min(i, m - 2))
    def llrAt(cp: Int): (Double, Double, Double) = {
      val mu0 = meanRange(w, 0, cp + 1)
      val mu1 = meanRange(w, cp + 1, m)
      var ss0 = 0.0; var ss1 = 0.0
      var i = 0
      while (i < m) {
        if (i <= cp) { val e = w(i) - mu0; ss0 += e * e }
        else { val e = w(i) - mu1; ss1 += e * e }
        i += 1
      }
      var scale = math.sqrt((ss0 + ss1) / (m - 2))
      if (scale == 0) scale = sigt * 0.01
      val llr = -2.0 * (m * math.log(scale / sigt)
        + 0.5 * ((ss0 + ss1) / (scale * scale) - ssT / (sigt * sigt)))
      (llr, mu0, mu1)
    }
    val cpInc = clamp(refine(increase = true))
    val cpDec = clamp(refine(increase = false))
    val (llrI, i0, i1) = llrAt(cpInc)
    val (llrD, d0, d1) = llrAt(cpDec)
    // the reference's delta_std_ratio gate (cusum_detection.py:645): the
    // mean delta must exceed delta_std_ratio (=1.0) × popstd of the data
    // BEFORE the changepoint
    val incOk = llrI > LlrThreshold && i1 > i0 &&
      math.abs(i1 - i0) > popStdRange(w, 0, cpInc)
    val decOk = llrD > LlrThreshold && d1 < d0 &&
      math.abs(d1 - d0) > popStdRange(w, 0, cpDec)
    (incOk, decOk) match {
      case (true, false) => Some((cpInc, 1))
      case (false, true) => Some((cpDec, -1))
      case (true, true) =>
        if (cpInc < cpDec) Some((cpInc, 1))
        else if (cpDec < cpInc) Some((cpDec, -1))
        else Some((cpInc, if (llrI >= llrD) 1 else -1))
      case _ => None
    }
  }

  /** Run the serving loop. `tss`/`xs` are the FULL ordered series
    * (historical ++ served); points from `servedFrom` (0-based) on are
    * scored. Returns (ts, value, score, change) per served point.
    */
  def serve(tss: Array[Long], xs: Array[Double], servedFrom: Int): Array[(Long, Double, Double, Double)] = {
    val n = xs.length
    val out = Array.newBuilder[(Long, Double, Double, Double)]
    var alert = false
    var preMean = 0.0
    var preStd = 0.0
    var dir = 0
    var lastCpTs = 0L // sentinel; only read once a real changepoint set it
    var nNormal = 0
    var s = servedFrom
    while (s < n) {
      val e = math.min(s + Step, n) // step window = [s, e)
      val h0 = math.max(0, s - Hist) // combined fit slice = [h0, e)
      val m = e - h0
      val scanStartOff = math.max(0, m - 1 - Scan)
      if (!alert) {
        if (m - scanStartOff > 1) {
          detectOnce(xs.slice(h0 + scanStartOff, e)).foreach { case (cpOff, d) =>
            val cpAbs = h0 + scanStartOff + cpOff
            lastCpTs = tss(cpAbs)
            preMean = meanRange(xs, h0, cpAbs + 1)
            preStd = popStdRange(xs, h0, cpAbs + 1)
            dir = d
            alert = true
            nNormal = 0
          }
        }
      } else {
        val curMean = meanRange(xs, h0 + scanStartOff, e)
        val normal =
          if (dir == 1) preMean - preStd <= curMean && curMean <= preMean
          else preMean <= curMean && curMean <= preMean + preStd
        if (normal) {
          nNormal += 1
          if (nNormal >= NormalTolerance) { alert = false; nNormal = 0 }
        } else nNormal = 0
        if (alert && tss(e - 1) - lastCpTs > RetentionSec) { alert = false; nNormal = 0 }
      }
      var i = s
      while (i < e) {
        if (alert && tss(i) > lastCpTs && preStd != 0) {
          out += ((tss(i), xs(i), (xs(i) - preMean) / preStd, xs(i) - preMean))
        } else if (alert && tss(i) > lastCpTs) {
          out += ((tss(i), xs(i), 0.0, xs(i) - preMean))
        } else {
          out += ((tss(i), xs(i), 0.0, 0.0))
        }
        i += 1
      }
      s += Step
    }
    out.result()
  }
}
