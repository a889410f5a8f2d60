package graft.detectors

import graft.{SeriesOps, TSSchema}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mann-Kendall trend test (kats/detectors/trend_mk.py:266 MKtest):
  *
  *   S   = Σ_{i<j} sgn(x_j - x_i)
  *   Var = [n(n-1)(2n+5) - Σ_ties t(t-1)(2t+5)] / 18
  *   z   = (S∓1)/√Var,  Tau = S / (n(n-1)/2)
  *
  * The reference computes S with an O(n²) double loop; here S is computed
  * in O(n log n) per series with a Fenwick tree over rank-compressed
  * values (S = Σ_j [#seen < x_j] - [#seen > x_j]), so a 1000× longer
  * series costs ~1300× not 10⁶× — that's the 100 TB path. The driver
  * oracle cross-checks against the O(n²) pair-join formulation in SQL.
  */
object MannKendall {

  /** (S, VarS) core — exposed separately so the Hirsch-Slack multivariate
    * test (trend_mk.py:296 multivariate_MKtest, which SUMS per-metric S
    * and Var before the z) can compose it.
    */
  def mkCore(xs: Array[Double]): (Long, Double) = {
    val n = xs.length
    val sorted = xs.clone().distinct.sorted
    val m = sorted.length
    val bit = new Array[Int](m + 1)
    def update(i0: Int): Unit = { var i = i0; while (i <= m) { bit(i) += 1; i += i & -i } }
    def query(i0: Int): Int = { var i = i0; var acc = 0; while (i > 0) { acc += bit(i); i -= i & -i }; acc }
    var s = 0L
    var seen = 0
    var j = 0
    while (j < n) {
      val r = java.util.Arrays.binarySearch(sorted, xs(j)) + 1
      val less = query(r - 1)
      val greater = seen - query(r)
      s += less - greater
      update(r)
      seen += 1
      j += 1
    }
    val tieSum = xs.groupBy(identity).valuesIterator
      .map(_.length.toLong).filter(_ > 1)
      .map(t => t * (t - 1) * (2 * t + 5)).sum
    val varS = (n.toLong * (n - 1) * (2L * n + 5) - tieSum) / 18.0
    (s, varS)
  }

  /** z statistic with the reference's continuity correction. */
  def mkZ(s: Long, varS: Double): Double =
    if (s > 0) (s - 1) / math.sqrt(varS)
    else if (s < 0) (s + 1) / math.sqrt(varS)
    else 0.0

  /** (S, tau, z, trendCode) — trendCode: 1 increasing, -1 decreasing, 0 none. */
  def mkStats(xs: Array[Double]): (Long, Double, Double, Int) = {
    val n = xs.length
    val (s, varS) = mkCore(xs)
    val z = mkZ(s, varS)
    val tau = s.toDouble / (n.toLong * (n - 1) / 2.0)
    val trend = if (z > 1.96) 1 else if (z < -1.96) -1 else 0
    (s, tau, z, trend)
  }

  def detect(df: DataFrame, s: TSSchema): DataFrame =
    SeriesOps.aggSeries(df, s, Seq("s", "tau", "z", "trend")) { xs =>
      val (sv, tau, z, tr) = mkStats(xs)
      Array(sv.toDouble, tau, z, tr.toDouble)
    }.withColumn("s", col("s").cast("long"))
      .withColumn("trend", col("trend").cast("int"))
}
