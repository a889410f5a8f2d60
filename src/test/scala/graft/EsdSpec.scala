package graft

import graft.detectors.Esd
import org.scalatest.funsuite.AnyFunSuite

/** Kernel-level validation of the generalized ESD procedure
  * (detectors/Esd.scala): planted outliers are recovered, clean Gaussian
  * data is left alone, the masking scenario that defeats single-pass
  * z-score tests is handled, and the t CDF matches reference values.
  */
class EsdSpec extends AnyFunSuite {

  // deterministic LCG noise, ~N(0,1) via sum-of-12 uniforms
  private def noise(seed: Int, n: Int): Array[Double] = {
    var s = seed.toLong
    def u(): Double = { s = (s * 48271) % 2147483647L; (s % 10000) / 10000.0 }
    Array.fill(n) { (1 to 12).map(_ => u()).sum - 6.0 }
  }

  test("t CDF matches reference values at 1e-12") {
    val cases = Seq(
      (1.0, 1, 0.75), (1.0, 2, 0.7886751345948129), (1.0, 3, 0.8044988905221148),
      (2.5, 10, 0.9842765778816956), (0.0, 7, 0.5), (-1.7, 8, 0.06377643485161716))
    cases.foreach { case (t, nu, want) =>
      assert(math.abs(Esd.tCdf(t, nu) - want) < 1e-12, s"tCdf($t, $nu)")
    }
  }

  test("planted spikes are exactly the outlier set; clean data yields none") {
    val ts = Array.tabulate(200)(i => 1000L + i)
    // clean: a bounded sinusoid has no points anywhere near the critical
    // deviation, so the outlier set must be empty
    val clean = Esd.run(ts, Array.tabulate(200)(i => math.sin(i / 7.0)).toSeq)
    assert(clean.forall(_._7 == 0), "clean series must have an empty outlier set")
    val base = noise(7, 200)
    // plant three large spikes
    val spiked = base.clone()
    spiked(20) += 15.0; spiked(100) -= 12.0; spiked(150) += 10.0
    val out = Esd.run(ts, spiked.toSeq)
    val flagged = out.filter(_._7 == 1).map(_._2).toSet
    // all three plants caught; the crude LCG noise itself may contribute a
    // genuine borderline point or two, so assert subset + small total
    assert(Set(1020L, 1100L, 1150L).subsetOf(flagged), s"flagged $flagged")
    assert(flagged.size <= 5, s"too many flagged: $flagged")
    // removal order is by deviation magnitude: largest spike first
    assert(out.head._2 == 1020L && out.head._6 == 1)
  }

  test("masking: two near-identical spikes are both caught (the ESD selling point)") {
    val base = noise(11, 150)
    val ts = Array.tabulate(150)(i => i.toLong)
    val spiked = base.clone()
    spiked(30) += 11.0; spiked(31) += 11.2 // a pair that inflates sigma for single-pass tests
    val out = Esd.run(ts, spiked.toSeq)
    val flagged = out.filter(_._7 == 1).map(_._2).toSet
    assert(flagged.contains(30L) && flagged.contains(31L), s"flagged $flagged")
  }

  test("hybrid (median/MAD) variant: immune to a heavy spike inflating the scale") {
    val ts = Array.tabulate(120)(i => i.toLong)
    val xs = Array.tabulate(120)(i => math.sin(i / 5.0))
    xs(60) += 50.0 // one enormous spike
    xs(90) += 5.0  // one modest spike: classic sd would be inflated by the big one
    val out = Esd.runHybrid(ts, xs.toSeq)
    val flagged = out.filter(_._7 == 1).map(_._2).toSet
    assert(flagged.contains(60L) && flagged.contains(90L), s"flagged $flagged")
    // removal order: biggest deviation first
    assert(out.head._2 == 60L)
  }
}
