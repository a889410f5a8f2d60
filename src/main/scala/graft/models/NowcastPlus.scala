package graft.models

/** NowcastingPlus (kats/models/nowcasting/nowcastingplus.py:84) — the
  * seasonal-residual short-term forecaster that composes the three
  * nowcasting pieces this repo already proves separately:
  *
  *  1. a degree-5 polynomial-in-minute-of-day seasonal baseline
  *     (nowcastingplus.py:138/:162 — the q_nowcast_poly fit, on the
  *     CENTERED basis u = (minuteOfDay − 719.5)/719.5 for the κ(XᵀX)
  *     reasons documented at TechQueries "q_nowcast_poly"; a pure
  *     reparameterization of the same polynomial space);
  *  2. the MOM/ROC/LAG/MA feature battery (feature_extraction.py;
  *     nowcastingplus.py:169-180 — MOM/ROC n ∈ {10,15,20,25,30},
  *     LAG n ∈ 1..5, MA n ∈ {10,20,30}), standardized the
  *     StandardScaler way (population moments over ALL feature-complete
  *     rows, fit BEFORE the last `step` rows are dropped —
  *     nowcastingplus.py:203-212);
  *  3. a linear model on the deseasonalized diff(−step) label
  *     (nowcastingplus.py:209: y_train = (label − season).diff(−n)).
  *     The reference fits sklearn LassoCV; the exact path substitutes a
  *     DETERMINISTIC ridge (λ = RidgeFrac·nTrain on the standardized
  *     Gram diagonal) — the declared-substitution discipline of the
  *     prophet family's ridge-for-Laplace swap. LassoCV's CV folds are
  *     data-order randomness this engine refuses to carry.
  *
  * Prediction replays nowcastingplus.py:227-249 exactly:
  * ŷ = (y_now − season_now) − model(x̃_test) + season_next, where
  * season_next is the season value one step after the FIRST row whose
  * season equals season_now — implemented as the first row sharing the
  * last row's minute-of-day (integer compare; equal minute-of-day ⇒
  * equal season by construction, the reference's float-equality probe
  * made deterministic).
  *
  * Cross-engine parity: features are derived from 1e6-scaled BIGINT
  * values (hourly values sit on the 6-dp grid), so every MOM/ROC/LAG/MA
  * is the same one or two IEEE ops on exact integers in both engines;
  * the poly fit and the ridge normal equations run the identical
  * no-pivot Gauss–Jordan (divide-then-multiply, GaussJordan.sqlAug's op
  * order) so residual divergence is the 1e-15-relative moment-sum-order
  * noise, far inside the 6-dp output gate (κ ≈ 1e4 poly, ≈ 2e3 ridge).
  *
  * Scale shape: one O(n·p²) kernel per series inside the
  * one-series-per-row reduction — ONE keyed shuffle, driver state zero,
  * scale axis is series count (the q_nowcast_gbt discipline).
  */
object NowcastPlus {
  /** Lookbacks (nowcastingplus.py:169-180). */
  val MomNs: Seq[Int] = Seq(10, 15, 20, 25, 30)
  val RocNs: Seq[Int] = Seq(10, 15, 20, 25, 30)
  val LagNs: Seq[Int] = Seq(1, 2, 3, 4, 5)
  val MaNs: Seq[Int] = Seq(10, 20, 30)
  val NF: Int = MomNs.length + RocNs.length + LagNs.length + MaNs.length // 18

  /** Ridge fraction: λ = RidgeFrac · nTrain (standardized Gram diag ≈
    * nTrain, so this is a 1% relative ridge — the LassoCV-shrinkage
    * stand-in). */
  val RidgeFrac = 0.01

  /** Minimum train rows / series length (30 lookback + a fit worth
    * having). */
  val MinTrain = 40
  val MinSeries = 60

  /** No-pivot Gauss–Jordan on a row-major p×(p+1) augmented system —
    * the exact op order of GaussJordan.eliminate / sqlAug
    * (divide-then-multiply against a snapshot of the pre-step matrix),
    * so both engines run the identical float sequence given identical
    * inputs. Callers solve SPD systems; pivots stay positive. */
  private def gj(m: Array[Double], p: Int): Unit = {
    val cols = p + 1
    var s = 0
    while (s < p) {
      val piv = m(s * cols + s)
      val out = new Array[Double](m.length)
      var li = 0
      while (li < m.length) {
        val r = li / cols
        val c = li % cols
        out(li) =
          if (r == s) m(li) / piv
          else m(li) - m(r * cols + s) * (m(s * cols + c) / piv)
        li += 1
      }
      System.arraycopy(out, 0, m, 0, m.length)
      s += 1
    }
  }

  /** One series: epoch-second timestamps (ascending) + 6-dp hourly
    * values. Returns (nTrain, yhat_1, season_next) or None when the
    * series is too short, the last row is feature-incomplete, or the
    * season pattern has no next step. */
  def run(es: Array[Long], xs: Array[Double]): Option[(Long, Double, Double)] = {
    val n = xs.length
    if (n < MinSeries) return None
    val v = Array.tabulate(n)(i => math.round(xs(i) * 1e6)) // exact on the 6-dp grid
    val mod = Array.tabulate(n)(i => (es(i) % 86400L) / 60L) // minute-of-day (UTC)
    val u = Array.tabulate(n)(i => (mod(i) - 719.5) / 719.5)

    // ---- 1. poly seasonal fit over ALL rows (df_poly has no NaNs) ----
    val ps = new Array[Double](11) // Σ u^k, k = 0..10
    val pt = new Array[Double](6) // Σ u^k · y, k = 0..5
    var i = 0
    while (i < n) {
      var k = 0
      while (k <= 10) {
        val pw = math.pow(u(i), k)
        ps(k) += pw
        if (k <= 5) pt(k) += pw * xs(i)
        k += 1
      }
      i += 1
    }
    val pm = new Array[Double](6 * 7)
    var r = 0
    while (r < 6) {
      var c = 0
      while (c < 7) { pm(r * 7 + c) = if (c < 6) ps(r + c) else pt(r); c += 1 }
      r += 1
    }
    gj(pm, 6)
    val pb = Array.tabulate(6)(j => pm(j * 7 + 6))
    def season(ui: Double): Double = {
      var acc = 0.0
      var j = 0
      while (j <= 5) { acc += pb(j) * math.pow(ui, j); j += 1 }
      acc
    }

    // ---- 2. feature battery on the 1e6-scaled integers ----
    def denomOk(idx: Int): Boolean = RocNs.forall(nn => v(idx - (nn - 1)) != 0L)
    val valid = Array.tabulate(n)(idx => idx >= 30 && denomOk(idx))
    def feats(idx: Int): Array[Double] = {
      val f = new Array[Double](NF)
      var k = 0
      MomNs.foreach { nn => f(k) = (v(idx) - v(idx - nn)).toDouble / 1e6; k += 1 }
      RocNs.foreach { nn =>
        val d = v(idx - (nn - 1))
        f(k) = (v(idx) - d).toDouble / d.toDouble; k += 1
      }
      LagNs.foreach { nn => f(k) = v(idx - nn).toDouble / 1e6; k += 1 }
      MaNs.foreach { nn =>
        var ss = 0L
        var j = idx - nn + 1
        while (j <= idx) { ss += v(j); j += 1 }
        f(k) = ss.toDouble / (nn * 1e6); k += 1
      }
      f
    }
    val vIdx = (0 until n).filter(valid).toArray
    val m = vIdx.length
    // the reference reads season[-1] against y at the last FILTERED row
    // (nowcastingplus.py:244-248) — they coincide iff the last row is
    // feature-complete, the generic case this kernel requires.
    if (m < MinTrain + 1 || vIdx.last != n - 1) return None
    val x = vIdx.map(feats)
    val d = vIdx.map(idx => xs(idx) - season(u(idx)))
    val nTrain = m - 1
    val lab = Array.tabulate(nTrain)(j => d(j) - d(j + 1)) // diff(−1) over the valid sequence

    // ---- 3. StandardScaler moments over ALL valid rows (pre-drop) ----
    val fm = new Array[Double](NF)
    val fq = new Array[Double](NF)
    var j = 0
    while (j < m) {
      var k = 0
      while (k < NF) { fm(k) += x(j)(k); fq(k) += x(j)(k) * x(j)(k); k += 1 }
      j += 1
    }
    val mean = Array.tabulate(NF)(k => fm(k) / m)
    val sd = Array.tabulate(NF) { k =>
      val varr = fq(k) / m - mean(k) * mean(k)
      if (varr > 0) math.sqrt(varr) else 1.0
    }
    def std(f: Array[Double]): Array[Double] =
      Array.tabulate(NF)(k => (f(k) - mean(k)) / sd(k))
    var lsum = 0.0
    j = 0
    while (j < nTrain) { lsum += lab(j); j += 1 }
    val lmean = lsum / nTrain

    // ---- ridge normal equations over the train rows ----
    val p = NF
    val g = new Array[Double](p * (p + 1))
    j = 0
    while (j < nTrain) {
      val xr = std(x(j))
      val ly = lab(j) - lmean
      var a = 0
      while (a < p) {
        var b = 0
        while (b < p) { g(a * (p + 1) + b) += xr(a) * xr(b); b += 1 }
        g(a * (p + 1) + p) += xr(a) * ly
        a += 1
      }
      j += 1
    }
    val lam = RidgeFrac * nTrain
    var a = 0
    while (a < p) { g(a * (p + 1) + a) += lam; a += 1 }
    gj(g, p)
    val beta = Array.tabulate(p)(k => g(k * (p + 1) + p))

    // ---- predict (nowcastingplus.py:227-249) ----
    val xt = std(x(m - 1))
    var ypred = lmean
    a = 0
    while (a < p) { ypred += beta(a) * xt(a); a += 1 }
    val lastMod = mod(n - 1)
    var fo = 0
    while (fo < n && mod(fo) != lastMod) fo += 1
    if (fo + 1 >= n) return None
    val seasonNext = season(u(fo + 1))
    val dn = xs(n - 1) - season(u(n - 1))
    Some((nTrain.toLong, dn - ypred + seasonNext, seasonNext))
  }
}
