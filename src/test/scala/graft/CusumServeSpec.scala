package graft

import graft.detectors.CusumServe
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral spec for the CUSUMDetectorModel serving loop: alert fires on
  * a level shift, points at/before the changepoint stay zero, scores use
  * the frozen pre-change baselines, and one normal scan turns the alert
  * back off (NORMAL_TOLERENCE = 1).
  */
class CusumServeSpec extends AnyFunSuite {

  private def hourly(n: Int): Array[Long] = Array.tabulate(n)(i => 1000000L + i * 3600L)

  // baseline 10 + deterministic 5-cycle jitter (mean 10.2, popsd ≈ 0.141),
  // a ±20 pulse on [80, 98), then a flat level inside the one-sided normal
  // band — which sits BELOW μ for an increase alert ([μ−σ, μ]) and ABOVE μ
  // for a decrease alert ([μ, μ+σ]), per cusum_model.py:331 _if_normal
  private def pulseSeries(up: Boolean): Array[Double] = Array.tabulate(160) { i =>
    val base = 10.0 + (i % 5) * 0.1
    val sign = if (up) 1.0 else -1.0
    val post = if (up) 10.1 else 10.3
    if (i >= 80 && i < 98) base + sign * 20.0 else if (i >= 98) post else base
  }

  test("level shift fires the alert; pre-changepoint points stay zero; normal scan clears it") {
    val xs = pulseSeries(up = true)
    val tss = hourly(160)
    val out = CusumServe.serve(tss, xs, 60)
    assert(out.length === 100)
    val byIdx = out.zipWithIndex.map { case (o, k) => (k + 60, o) }.toMap
    // before the shift: no alert, all zeros
    (60 until 80).foreach(i => assert(byIdx(i)._3 === 0.0, s"score at $i"))
    // the step containing the shift (72..83): zeros at/before the cp, large
    // positive scores after it
    assert((80 to 83).count(i => byIdx(i)._3 > 5.0) >= 3,
      s"post-cp points in the firing step should score high: ${(80 to 83).map(byIdx(_)._3)}")
    // full pulse steps score against the frozen baseline
    (84 to 95).foreach(i => assert(byIdx(i)._3 > 5.0, s"score at $i = ${byIdx(i)._3}"))
    // change column is the absolute change vs pre-mean
    (84 to 95).foreach(i => assert(byIdx(i)._4 > 15.0, s"change at $i = ${byIdx(i)._4}"))
    // after the pulse ends and a scan window of in-band data passes, ONE
    // normal scan clears the alert: step [120, 132) scans flat 10.1 data
    (120 until 160).foreach(i => assert(byIdx(i)._3 === 0.0, s"score at $i = ${byIdx(i)._3}"))
  }

  test("decrease direction: downward shift fires with negative scores") {
    val xs = pulseSeries(up = false)
    val tss = hourly(160)
    val out = CusumServe.serve(tss, xs, 60)
    val byIdx = out.zipWithIndex.map { case (o, k) => (k + 60, o) }.toMap
    (84 to 95).foreach(i => assert(byIdx(i)._3 < -5.0, s"score at $i = ${byIdx(i)._3}"))
    (84 to 95).foreach(i => assert(byIdx(i)._4 < -15.0, s"change at $i = ${byIdx(i)._4}"))
    (120 until 160).foreach(i => assert(byIdx(i)._3 === 0.0, s"score at $i = ${byIdx(i)._3}"))
  }

  test("quiet series never alerts; retention clears a stale alert") {
    val quiet = Array.tabulate(160)(i => 10.0 + (i % 5) * 0.1)
    val out = CusumServe.serve(hourly(160), quiet, 60)
    assert(out.forall(_._3 == 0.0) && out.forall(_._4 == 0.0))
    // retention: shift at 80 that never comes back in-band, with > 7 days
    // of hourly points after it — the changepoint ages out and scoring stops
    val n = 60 + 12 * 20 // 300 points, ~9.2 days after the shift
    val xs = Array.tabulate(n)(i => if (i >= 80) 30.0 + (i % 5) * 0.1 else 10.0 + (i % 5) * 0.1)
    val tss = hourly(n)
    val late = CusumServe.serve(tss, xs, 60).filter(o => o._1 > tss(80) + CusumServe.RetentionSec + 12 * 3600)
    assert(late.nonEmpty && late.forall(_._3 == 0.0),
      s"scores should stop after retention: ${late.count(_._3 != 0.0)} nonzero")
  }
}
