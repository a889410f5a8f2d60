package graft.models

/** GBT nowcasting (kats/models/nowcasting/nowcasting.py:33): fit a
  * gradient-boosted regressor on the ROC/LAG feature battery
  * (feature_extraction.py ROC_n = diff(n−1)/shift(n−1), LAG_n =
  * shift(n), n ∈ {10,15,20,25,30}), label = y shifted −step, predict
  * the one step past the end of the series.
  *
  * The reference fits sklearn's GradientBoostingRegressor; this exact
  * path substitutes boosted DEPTH-1 trees (stumps) with a fixed
  * quartile candidate grid and 1/10 shrinkage so the ENTIRE fit is
  * oracle-replayable (the declared-substitution discipline of
  * q_holtwinters_opt's grid-for-MLE swap; NowcastGbtSpec validates the
  * MLlib GBTRegressor twin against this path's holdout error):
  *
  *  - values enter as 1e6-scaled BIGINTs; LAG features are exact
  *    integers, ROC features are one IEEE divide snapped back to the
  *    1e6 grid — after that, residuals, split sums and leaf means are
  *    exact integer arithmetic (truncated-toward-zero division), so no
  *    float boundary can flip a split;
  *  - split gain sL²/nL + sR²/nR is evaluated in double from exact
  *    integers with a fixed operation order, ties broken by candidate
  *    index — the DuckDB replay orders by (gain DESC, ci ASC) and gets
  *    the identical argmax;
  *  - M = 20 rounds; each round the chosen stump's leaf means update
  *    every row's fit F (and the one prediction row) by γ div 10.
  *
  * Scale shape: the kernel is O(M·|cands|·n) per series inside the
  * one-series-per-row reduction — ONE keyed shuffle, scale axis is
  * series count (the q_esd_outliers discipline).
  */
object NowcastGbt {
  import org.apache.spark.sql.{DataFrame, functions => F}
  import org.apache.spark.sql.functions.{col, lag, lead, lit, round => sround}

  /** ROC/LAG lookbacks (nowcasting.py:120-125). */
  val Ns: Seq[Int] = Seq(10, 15, 20, 25, 30)

  /** Boosting rounds and the 1/10 shrinkage denominator. */
  val Rounds = 20
  val NuDen = 10L

  /** Quartile candidate thresholds per feature. */
  val QKs: Seq[Int] = Seq(1, 2, 3)

  /** Minimum training rows (features need 30 lookback + quartiles). */
  val MinTrain = 40

  /** Truncated-toward-zero integer division (JVM `/` == the oracle's
    * sign-cased `//`). */
  private def tdiv(a: Long, b: Long): Long = a / b

  private def snap6(v: Double): Long =
    (math.signum(v) * math.floor(math.abs(v * 1e6) + 0.5)).toLong

  /** One series, ts-ascending raw values. Returns
    * (nTrain, yhat·1e6, rmse·1e6-scale) or None when the series is too
    * short / the prediction row's features are undefined. */
  def run(xs: Array[Double]): Option[(Int, Long, Double)] = {
    val nn = xs.length
    val iv = xs.map(snap6)
    val nF = 2 * Ns.length
    // features per 1-based t: ROC_n then LAG_n blocks; null encoded as None
    def featRow(t: Int): Option[Array[Long]] = {
      val x = new Array[Long](nF)
      var ok = true
      var fi = 0
      Ns.foreach { n =>
        val p = t - (n - 1)
        if (p >= 1 && iv(p - 1) != 0L)
          x(fi) = snap6((iv(t - 1) - iv(p - 1)).toDouble / iv(p - 1))
        else ok = false
        fi += 1
      }
      Ns.foreach { n =>
        val p = t - n
        if (p >= 1) x(fi) = iv(p - 1) else ok = false
        fi += 1
      }
      if (ok) Some(x) else None
    }
    val rows = (1 to nn).flatMap { t =>
      featRow(t).map(x => (t, x, if (t < nn) Some(iv(t)) else None))
    } // label at t is iv[t+1] 1-based = iv(t) 0-based
    val train = rows.filter(_._3.isDefined)
    val pred = rows.filter(_._3.isEmpty)
    if (train.length < MinTrain || pred.length != 1) return None
    val nTr = train.length
    var slbl = 0L
    train.foreach(slbl += _._3.get)
    val mu = tdiv(slbl, nTr)
    // candidate grid: per feature the 3 quartile order statistics
    val sortedByFeat = Array.tabulate(nF)(f => train.map(_._2(f)).sorted)
    val cands = for { f <- 0 until nF; k <- QKs } yield
      (f, sortedByFeat(f)((k * nTr) / 4 - 1))
    val fit = scala.collection.mutable.ArrayBuffer.fill(rows.length)(mu)
    val lbls = rows.map(_._3)
    val xsA = rows.map(_._2)
    var m = 0
    while (m < Rounds) {
      var sTot = 0L
      var i = 0
      while (i < rows.length) {
        if (lbls(i).isDefined) sTot += lbls(i).get - fit(i)
        i += 1
      }
      var bestGain = Double.NegativeInfinity
      var bf = -1; var bth = 0L; var bsl = 0L; var bnl = 0L
      cands.foreach { case (f, th) =>
        var nl = 0L; var sl = 0L
        var j = 0
        while (j < rows.length) {
          if (lbls(j).isDefined && xsA(j)(f) <= th) { nl += 1; sl += lbls(j).get - fit(j) }
          j += 1
        }
        if (nl > 0 && nl < nTr) {
          val sr = sTot - sl
          val nr = nTr - nl
          val gain = sl.toDouble * sl / nl + sr.toDouble * sr / nr
          if (gain > bestGain) { bestGain = gain; bf = f; bth = th; bsl = sl; bnl = nl }
        }
      }
      if (bf >= 0) {
        val gl = tdiv(bsl, bnl)
        val gr = tdiv(sTot - bsl, nTr - bnl)
        val dl = tdiv(gl, NuDen)
        val dr = tdiv(gr, NuDen)
        var j = 0
        while (j < rows.length) {
          fit(j) += (if (xsA(j)(bf) <= bth) dl else dr)
          j += 1
        }
      }
      m += 1
    }
    var sse = 0.0
    var i = 0
    while (i < rows.length) {
      if (lbls(i).isDefined) { val d = (lbls(i).get - fit(i)).toDouble; sse += d * d }
      i += 1
    }
    val predIdx = rows.indexWhere(_._3.isEmpty)
    Some((nTr, fit(predIdx), math.sqrt(sse / nTr)))
  }

  /** MLlib twin: ONE global GBTRegressor over the pooled per-series
    * ROC/LAG features (the cross-series learning shape of MlAr.forecast
    * — feature build is a window plan, scoring a broadcast-able
    * transform). sklearn defaults mapped to MLlib: 100 trees is cut to
    * 20 at lr 0.1, depth 3, fixed seed. NowcastGbtSpec holds its
    * holdout error against [[run]]'s exact path and the constant-mean
    * baseline — the declared-substitution evidence, since a tree
    * ensemble fit is not oracle-replayable.
    */
  def forecastMllib(df: DataFrame, s: graft.TSSchema): DataFrame = {
    import org.apache.spark.ml.feature.VectorAssembler
    import org.apache.spark.ml.regression.GBTRegressor
    val w = s.orderedWindow
    val featCols = Ns.map(n => s"roc_$n") ++ Ns.map(n => s"lag_$n")
    var d = df
    Ns.foreach { n =>
      d = d
        .withColumn(s"roc_$n",
          (col(s.value) - lag(col(s.value), n - 1).over(w)) /
            lag(col(s.value), n - 1).over(w))
        .withColumn(s"lag_$n", lag(col(s.value), n).over(w))
    }
    d = d.withColumn("label1", lead(col(s.value), 1).over(w))
    // the reference drops ±inf rows (zero-valued ROC denominators)
    val finite = featCols.map(c => F.abs(col(c)) < lit(1e300)).reduce(_ && _)
    val train = d.na.drop(featCols :+ "label1").where(finite)
    val asm = new VectorAssembler().setInputCols(featCols.toArray).setOutputCol("features")
    val model = new GBTRegressor()
      .setMaxIter(Rounds).setMaxDepth(3).setStepSize(0.1).setSeed(7L)
      .setLabelCol("label1").setFeaturesCol("features")
      .fit(asm.transform(train))
    // score the one row past each series end: the last feature-complete row
    val wDesc = org.apache.spark.sql.expressions.Window
      .partitionBy(s.keyCols: _*).orderBy(col(s.ts).desc)
    val last = d.na.drop(featCols).where(finite)
      .withColumn("_rk", F.row_number().over(wDesc)).where(col("_rk") === 1)
    model.transform(asm.transform(last))
      .select((s.keyCols :+ sround(col("prediction"), 6).as("yhat_1")): _*)
  }
}
