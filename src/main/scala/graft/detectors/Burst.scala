package graft.detectors

/** Kleinberg burst detection (Kleinberg 2002, "Bursty and Hierarchical
  * Structure in Streams") — the 2-state automaton over event
  * inter-arrival gaps: state 0 emits gaps at the base rate α₀ = n/T,
  * state 1 at α₁ = s·α₀; entering the burst state costs γ·ln n. The
  * minimum-cost state sequence (Viterbi) marks the bursty stretches of
  * an event stream — the classic "when did this topic/user/error
  * spike" primitive the reference's calendar-window detectors don't
  * cover.
  *
  * Determinism: per-step emission costs α·x − ln α and the transition
  * cost γ·ln n are snapped to 6 dp (half away from zero) before
  * entering the DP, so both engines add identical doubles; tie rules
  * prefer the non-burst state / staying put.
  */
object Burst {

  /** state-1 rate multiplier and transition-cost scale */
  val S = 2.0
  val Gamma = 0.3

  private def snap6(x: Double): Double =
    math.signum(x) * math.floor(math.abs(x) * 1e6 + 0.5) / 1e6

  /** Detect bursts over a sorted sequence of event times (microseconds).
    * Returns (burst_no, start_epoch_sec, end_epoch_sec, n_gaps) per
    * burst, numbered in time order.
    */
  def detect(tus: Seq[Long]): Array[(Int, Long, Long, Int)] = {
    val n = tus.length - 1 // gaps
    if (n < 2) return Array.empty
    val tSpan = (tus.last - tus.head) / 1e6
    if (tSpan <= 0) return Array.empty
    val a0 = n / tSpan
    val a1 = S * a0
    val tau = snap6(Gamma * math.log(n.toDouble))
    val c0 = Array.tabulate(n)(i => snap6(a0 * ((tus(i + 1) - tus(i)) / 1e6) - math.log(a0)))
    val c1 = Array.tabulate(n)(i => snap6(a1 * ((tus(i + 1) - tus(i)) / 1e6) - math.log(a1)))
    var v0 = c0(0); var v1 = tau + c1(0)
    val b0 = new Array[Int](n); val b1 = new Array[Int](n)
    b0(0) = 0; b1(0) = 1
    var t = 1
    while (t < n) {
      val p0 = if (v0 <= v1) 0 else 1
      val nv0 = (if (p0 == 0) v0 else v1) + c0(t)
      val p1 = if (v1 <= v0 + tau) 1 else 0
      val nv1 = (if (p1 == 1) v1 else v0 + tau) + c1(t)
      v0 = nv0; v1 = nv1; b0(t) = p0; b1(t) = p1
      t += 1
    }
    val states = new Array[Int](n)
    states(n - 1) = if (v0 <= v1) 0 else 1
    t = n - 1
    while (t > 0) {
      states(t - 1) = if (states(t) == 0) b0(t) else b1(t)
      t -= 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Int)]
    var i = 0; var no = 0
    while (i < n) {
      if (states(i) == 1) {
        var j = i
        while (j + 1 < n && states(j + 1) == 1) j += 1
        no += 1
        // gap k (0-based) spans events k..k+1
        out += ((no, tus(i) / 1000000L, tus(j + 1) / 1000000L, j - i + 1))
        i = j + 1
      } else i += 1
    }
    out.toArray
  }
}
