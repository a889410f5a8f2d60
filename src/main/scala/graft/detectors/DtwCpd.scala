package graft.detectors

import graft.{SeriesOps, TSSchema}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DTW-based changepoint detection (kats/detectors/dtwcpd.py re-derived):
  * slide non-overlapping windows along each series, score each boundary
  * by the Sakoe-Chiba-banded DTW distance between the adjacent windows,
  * and report the highest-scoring boundaries. Per-series O(n·w·band);
  * parallel across series.
  */
object DtwCpd {

  /** Banded DTW distance between two equal-length windows. */
  def dtw(a: Array[Double], b: Array[Double], band: Int): Double = {
    val n = a.length; val m = b.length
    val inf = Double.MaxValue / 4
    val prev = Array.fill(m + 1)(inf)
    val cur = Array.fill(m + 1)(inf)
    prev(0) = 0.0
    var i = 1
    while (i <= n) {
      java.util.Arrays.fill(cur, inf)
      val lo = math.max(1, i - band); val hi = math.min(m, i + band)
      var j = lo
      while (j <= hi) {
        val c = math.abs(a(i - 1) - b(j - 1))
        cur(j) = c + math.min(prev(j), math.min(cur(j - 1), prev(j - 1)))
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, m + 1)
      i += 1
    }
    prev(m)
  }

  /** (boundaryIndex, normalizedScore) of each window boundary: DTW distance
    * between window [t-w, t) and [t, t+w), z-scored across boundaries.
    */
  def boundaryScores(xs: Array[Double], w: Int, band: Int): Array[(Int, Double)] = {
    val bounds = (w until (xs.length - w + 1) by w).toArray
    if (bounds.isEmpty) return Array.empty
    val raw = bounds.map { t =>
      dtw(xs.slice(t - w, t), xs.slice(t, t + w), band)
    }
    val mu = raw.sum / raw.length
    val sd = math.sqrt(raw.map(v => (v - mu) * (v - mu)).sum / raw.length)
    bounds.zip(raw.map(v => if (sd > 0) (v - mu) / sd else 0.0))
  }

  /** Top scoring boundary per series: (cp index, dtw z-score). */
  def detect(df: DataFrame, s: TSSchema, w: Int = 24, band: Int = 4): DataFrame =
    SeriesOps.aggSeries(df, s, Seq("cp_idx", "dtw_z")) { xs =>
      val scores = boundaryScores(xs, w, band)
      if (scores.isEmpty) Array(-1.0, 0.0)
      else {
        val best = scores.maxBy(_._2)
        Array(best._1.toDouble, best._2)
      }
    }.withColumn("cp_idx", col("cp_idx").cast("long"))
}
