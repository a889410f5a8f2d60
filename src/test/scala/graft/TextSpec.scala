package graft

import graft.text.TextFunctions
import org.scalatest.funsuite.AnyFunSuite

class TextSpec extends AnyFunSuite {

  test("simhash: identical token sets collide, disjoint ones don't") {
    val a = Seq("the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog")
    val b = scala.util.Random.shuffle(a) // order-insensitive (set semantics)
    val c = Seq("completely", "different", "vocabulary", "entirely", "unrelated", "words", "here", "now")
    assert(TextFunctions.simhash64(a) === TextFunctions.simhash64(b))
    val ham = java.lang.Long.bitCount(TextFunctions.simhash64(a) ^ TextFunctions.simhash64(c))
    assert(ham > 10, s"hamming=$ham")
  }

  test("simhash: one-token change stays within small hamming distance") {
    val base = (1 to 60).map(i => s"word$i")
    val tweaked = base.updated(30, "REPLACED")
    val ham = java.lang.Long.bitCount(TextFunctions.simhash64(base) ^ TextFunctions.simhash64(tweaked))
    assert(ham <= 12, s"hamming=$ham")
  }

  test("simhash128: word 0 equals the 64-bit kernel; set semantics and locality hold over 128 bits") {
    val a = Seq("the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog")
    val b = scala.util.Random.shuffle(a)
    // word 0 votes on the same md5 bytes 0..7 the 64-bit kernel reads —
    // the wide fingerprint is a strict extension, not a new hash family
    assert(TextFunctions.simhash128(a)(0) === TextFunctions.simhash64(a))
    assert(TextFunctions.simhash128(a).toSeq === TextFunctions.simhash128(b).toSeq)
    def ham128(x: Array[Long], y: Array[Long]) =
      java.lang.Long.bitCount(x(0) ^ y(0)) + java.lang.Long.bitCount(x(1) ^ y(1))
    val c = Seq("completely", "different", "vocabulary", "entirely", "unrelated", "words", "here", "now")
    assert(ham128(TextFunctions.simhash128(a), TextFunctions.simhash128(c)) > 20)
    val base = (1 to 60).map(i => s"word$i")
    val tweaked = base.updated(30, "REPLACED")
    assert(ham128(TextFunctions.simhash128(base), TextFunctions.simhash128(tweaked)) <= 24)
  }

  test("minhash permutation params are deterministic") {
    assert(TextFunctions.permParams(8) === TextFunctions.permParams(8))
    assert(TextFunctions.permParams(64).map(_._1).distinct.size === 64)
  }
}
