package graft.detectors

/** Generalized ESD many-outlier test (Rosner 1983, "Percentage Points for
  * a Generalized ESD Many-Outlier Procedure") — the statistic behind the
  * seasonal-ESD family of production anomaly detectors, and the
  * multi-outlier complement of the reference's IQR/z-score detectors
  * (kats/detectors/outlier.py tests points one at a time; ESD controls
  * the familywise error across up to r removals).
  *
  * Per series: repeatedly remove the point with the largest
  * |x − mean|/std over the REMAINING points, recomputing mean/std after
  * each removal from carried running sums; candidate i is significant
  * when R_i exceeds Rosner's critical value λ_i. The number of outliers
  * is the LARGEST significant i — points removed earlier belong to the
  * outlier set even if their own R was not individually significant.
  *
  * Cross-engine determinism (the oracle replays every step):
  *  - the initial Σx, Σx² are snapped to a 4-dp grid (half away from
  *    zero, DuckDB `round` semantics) and every later state update is a
  *    plain subtraction — after the snap both engines run the identical
  *    float sequence;
  *  - the λ_i comparison is evaluated in CDF space: R_i maps monotonically
  *    to a t statistic (t = R·√(ν(q+1)/(q²−R²(q+1))), ν = q−1, q = n−i),
  *    so "R_i > λ_i" becomes "F_ν(t) > 1 − α/(2(q+1))" and only a FORWARD
  *    t CDF is needed — no quantile inversion;
  *  - F_ν(t) uses the finite closed forms (even ν: ½ + (sinθ/2)·Σ e_j
  *    cos^{2j}θ; odd ν: ½ + (θ + sinθcosθ·Σ d_j cos^{2j}θ)/π with
  *    θ = atan(t/√ν)), with sinθ/cosθ computed ALGEBRAICALLY
  *    (t/√(ν+t²), √ν/√(ν+t²)) and the coefficient sums accumulated
  *    sequentially — the oracle's recursive CTE executes the same
  *    multiply/divide/add sequence term for term.
  */
object Esd {

  /** Half-away-from-zero 4-dp snap (DuckDB/Spark `round` semantics). */
  private def snap4(x: Double): Double =
    math.signum(x) * math.floor(math.abs(x) * 1e4 + 0.5) / 1e4

  /** Student-t CDF via the exact finite closed forms (any integer df). */
  def tCdf(t: Double, nu: Int): Double = {
    val sn = t / math.sqrt(nu + t * t)
    val cs = math.sqrt(nu.toDouble) / math.sqrt(nu + t * t)
    val c2 = cs * cs
    if (nu % 2 == 0) {
      var term = 1.0; var acc = 1.0; var j = 1
      while (j <= nu / 2 - 1) { term = term * c2 * (2.0 * j - 1) / (2.0 * j); acc += term; j += 1 }
      0.5 + (sn / 2) * acc
    } else if (nu == 1) {
      0.5 + math.atan(t / math.sqrt(nu.toDouble)) / math.Pi
    } else {
      var term = 1.0; var acc = 1.0; var j = 1
      while (j <= (nu - 3) / 2) { term = term * c2 * (2.0 * j) / (2.0 * j + 1); acc += term; j += 1 }
      0.5 + (math.atan(t / math.sqrt(nu.toDouble)) + sn * cs * acc) / math.Pi
    }
  }

  /** Run generalized ESD on one ts-ordered series.
    * Returns per candidate: (i, ts, value, R_i, F_ν(t_i), is_sig, in_set).
    */
  def run(ts: Seq[Long], xs: Seq[Double], r: Int = 10, alpha: Double = 0.05)
      : Array[(Int, Long, Double, Double, Double, Int, Int)] = {
    val n = xs.length
    val remT = scala.collection.mutable.ArrayBuffer(ts: _*)
    val remX = scala.collection.mutable.ArrayBuffer(xs: _*)
    var s1 = 0.0; var s2 = 0.0
    var p = 0
    while (p < n) { s1 += remX(p); p += 1 }
    p = 0
    while (p < n) { s2 += remX(p) * remX(p); p += 1 }
    s1 = snap4(s1); s2 = snap4(s2)
    val cands = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Double, Double, Double, Int)]
    var i = 1
    while (i <= r && remX.length >= 4) {
      val m = remX.length
      val mu = s1 / m
      // the 4-dp snap can leave s2 - s1²/m slightly negative on
      // near-constant series — clamp at 0 so sd is 0, never NaN
      val sd = math.sqrt(math.max(s2 - s1 * s1 / m, 0.0) / (m - 1))
      var idx = 0; var mx = -1.0
      var k = 0
      while (k < m) { val d = math.abs(remX(k) - mu); if (d > mx) { mx = d; idx = k }; k += 1 }
      val rStat = mx / sd
      val q = n - i
      val nu = q - 1
      val den = q.toDouble * q - rStat * rStat * (q + 1)
      val f =
        if (!(sd > 1e-12)) 0.5 // inverted so a NaN sd takes the degenerate branch
        else if (den <= 0) 1.0
        else tCdf(rStat * math.sqrt(nu * (q + 1) / den), nu)
      val sig = if (f > 1.0 - alpha / (2.0 * (q + 1))) 1 else 0
      cands += ((i, remT(idx), remX(idx), rStat, f, sig))
      s1 = s1 - remX(idx); s2 = s2 - remX(idx) * remX(idx)
      remT.remove(idx); remX.remove(idx)
      i += 1
    }
    val nOut = cands.collect { case c if c._6 == 1 => c._1 } match {
      case s if s.isEmpty => 0
      case s => s.max
    }
    cands.map(c => (c._1, c._2, c._3, c._4, c._5, c._6, if (c._1 <= nOut) 1 else 0)).toArray
  }

  /** Exact median of an unsorted buffer (odd: middle; even: mean of the
    * two middles) — order statistics only, no float accumulation. */
  private def median(v: Seq[Double]): Double = {
    val s = v.sorted
    val n = s.length
    (s((n + 1) / 2 - 1) + s(n / 2)) / 2.0
  }

  /** Hybrid (median/MAD) generalized ESD — the robust statistic the
    * seasonal-hybrid ESD production detectors substitute for mean/sd
    * (median and 1.4826·MAD are exact order statistics, so the whole
    * removal loop is float-summation-free and trivially engine-exact).
    * Critical values are Rosner's λ_i unchanged, evaluated in CDF space
    * like [[run]].
    */
  def runHybrid(ts: Seq[Long], xs: Seq[Double], r: Int = 10, alpha: Double = 0.05)
      : Array[(Int, Long, Double, Double, Double, Int, Int)] = {
    val n = xs.length
    val remT = scala.collection.mutable.ArrayBuffer(ts: _*)
    val remX = scala.collection.mutable.ArrayBuffer(xs: _*)
    val cands = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Double, Double, Double, Int)]
    var i = 1
    while (i <= r && remX.length >= 4) {
      val med = median(remX.toSeq)
      val devs = remX.map(x => math.abs(x - med))
      val sdH = 1.4826 * median(devs.toSeq)
      var idx = 0; var mx = -1.0
      var k = 0
      while (k < remX.length) { if (devs(k) > mx) { mx = devs(k); idx = k }; k += 1 }
      val q = n - i
      val nu = q - 1
      val (f, rStat) =
        if (sdH <= 1e-12) (0.5, 0.0)
        else {
          val rs = mx / sdH
          val den = q.toDouble * q - rs * rs * (q + 1)
          if (den <= 0) (1.0, rs) else (tCdf(rs * math.sqrt(nu * (q + 1) / den), nu), rs)
        }
      val sig = if (f > 1.0 - alpha / (2.0 * (q + 1))) 1 else 0
      cands += ((i, remT(idx), remX(idx), rStat, f, sig))
      remT.remove(idx); remX.remove(idx)
      i += 1
    }
    val nOut = cands.collect { case c if c._6 == 1 => c._1 } match {
      case s if s.isEmpty => 0
      case s => s.max
    }
    cands.map(c => (c._1, c._2, c._3, c._4, c._5, c._6, if (c._1 <= nOut) 1 else 0)).toArray
  }
}
