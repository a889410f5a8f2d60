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

  test("minhash permutation params are deterministic") {
    assert(TextFunctions.permParams(8) === TextFunctions.permParams(8))
    assert(TextFunctions.permParams(64).map(_._1).distinct.size === 64)
  }
}
