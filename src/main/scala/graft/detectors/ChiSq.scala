package graft.detectors

/** Chi-square upper-tail probability for ANY integer df, in a form a
  * DuckDB oracle can replay bit-for-bit (no erf, no data-dependent
  * stopping):
  *
  *  - even df = 2m: the finite closed sum e^{−h}·Σ_{i=0}^{m−1} h^i/i!
  *    (h = x/2) evaluated via the fixed Horner nesting
  *    f(i) = 1 + h/i·f(i+1) — the q_ljung_box shape, generalized to any
  *    even df;
  *  - odd df: the regularized lower incomplete gamma series
  *    P(a, h) = h^a e^{−h}/Γ(a+1) · Σ_{n≥0} h^n/((a+1)…(a+n)) with
  *    a = df/2 (NIST DLMF 8.11.4 / Abramowitz & Stegun 6.5.29),
  *    truncated at a FIXED 400 terms; sf = 1 − P. Γ(a+1) for
  *    half-integer a is the explicit ascending product
  *    √π·Π_{i=1}^{(df+1)/2}(i−½), and h^a = √h·h^{(df−1)/2} by
  *    sequential multiply — no pow(), whose last-ulp behavior differs
  *    across libm implementations;
  *  - h > 300 short-circuits to 0 (the true tail is < 1e−124, far below
  *    the 6-dp output grid), which also bounds the series truncation
  *    error: for h ≤ 300 the 400-term tail is geometric with ratio
  *    h/(a+400) < 0.43.
  *
  * Every accumulation is a fixed-order sequential multiply/add, so the
  * Scala loop and the oracle's recursive CTE execute the identical IEEE
  * operation sequence (the Esd.tCdf determinism discipline).
  */
object ChiSq {

  /** Series length for the odd-df incomplete-gamma branch. */
  val OddTerms = 400

  /** Upper-tail cutoff: h = x/2 beyond this returns exactly 0. */
  val HMax = 300.0

  def sf(x: Double, k: Int): Double = {
    val h = x / 2.0
    if (x <= 0) 1.0
    else if (h > HMax) 0.0
    else if (k % 2 == 0) {
      var f = 1.0
      var i = k / 2 - 1
      while (i >= 1) { f = 1.0 + h / i * f; i -= 1 }
      math.min(math.max(math.exp(-h) * f, 0.0), 1.0)
    } else {
      var g = math.sqrt(math.Pi)
      var i = 1
      while (i <= (k + 1) / 2) { g = g * (i - 0.5); i += 1 }
      var hp = math.sqrt(h)
      i = 1
      while (i <= (k - 1) / 2) { hp = hp * h; i += 1 }
      val a = k / 2.0
      var term = 1.0
      var acc = 1.0
      var n = 1
      while (n <= OddTerms) { term = term * (h / (a + n)); acc = acc + term; n += 1 }
      math.min(math.max(1.0 - hp * math.exp(-h) / g * acc, 0.0), 1.0)
    }
  }

  /** DuckDB replay. Given a CTE `src` with columns (keyCols…, x, k),
    * emits CTE text (to splice inside a WITH RECURSIVE) ending in a CTE
    * named `chisf` with columns (keyCols…, p) — p = sf(x, k) with the
    * identical float sequence as [[sf]]. */
  def sqlReplay(src: String, keyCols: Seq[String]): String = {
    val ks = keyCols.mkString(", ")
    val kq = keyCols.map("q." + _).mkString(", ")
    s"""chin AS (SELECT $ks, x, k, x / 2.0 AS h FROM $src),
       |chev AS (
       |  SELECT $ks, h, k // 2 - 1 AS i, 1.0::DOUBLE AS f
       |  FROM chin WHERE k % 2 = 0 AND x > 0 AND h <= $HMax
       |  UNION ALL
       |  SELECT $ks, h, i - 1, 1.0 + h / i * f FROM chev WHERE i >= 1),
       |chevf AS (SELECT $ks, least(greatest(exp(-h) * f, 0.0), 1.0) AS p
       |          FROM chev WHERE i = 0),
       |chod AS (
       |  SELECT $ks, h, k, 0 AS n, 1.0::DOUBLE AS term, 1.0::DOUBLE AS acc
       |  FROM chin WHERE k % 2 = 1 AND x > 0 AND h <= $HMax
       |  UNION ALL
       |  SELECT $ks, h, k, n + 1, term * (h / (k / 2.0 + (n + 1))),
       |         acc + term * (h / (k / 2.0 + (n + 1)))
       |  FROM chod WHERE n < $OddTerms),
       |chg AS (
       |  SELECT $ks, h, k, 1 AS i, sqrt(pi()) AS g, sqrt(h) AS hp
       |  FROM chin WHERE k % 2 = 1 AND x > 0 AND h <= $HMax
       |  UNION ALL
       |  SELECT $ks, h, k, i + 1, g * (i - 0.5),
       |         CASE WHEN i <= (k - 1) // 2 THEN hp * h ELSE hp END
       |  FROM chg WHERE i <= (k + 1) // 2),
       |chodf AS (
       |  SELECT $kq, least(greatest(1.0 - q.hp * exp(-q.h) / q.g * o.acc, 0.0), 1.0) AS p
       |  FROM (SELECT $ks, h, acc FROM chod WHERE n = $OddTerms) o
       |  JOIN (SELECT $ks, g, hp, h FROM chg WHERE i = (k + 1) // 2 + 1) q USING ($ks)),
       |chzf AS (SELECT $ks, CASE WHEN x <= 0 THEN 1.0 ELSE 0.0 END AS p
       |         FROM chin WHERE x <= 0 OR h > $HMax),
       |chisf AS (SELECT * FROM chevf UNION ALL SELECT * FROM chodf
       |          UNION ALL SELECT * FROM chzf)""".stripMargin
  }
}
