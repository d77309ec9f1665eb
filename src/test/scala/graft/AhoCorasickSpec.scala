package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.AhoCorasick

/** The automaton is verified against an INDEPENDENT per-pattern
  * indexOf-and-skip scan (the same leftmost-greedy non-overlap semantics
  * SQL replace() has), over adversarial fixed cases and a seeded random
  * sweep on a tiny alphabet — the regime where nesting, shared prefixes,
  * self-borders, and fail-link chains all collide constantly.
  */
class AhoCorasickSpec extends AnyFunSuite {

  private def naive(pats: Array[String], text: String): Array[Int] =
    pats.map { p =>
      var cnt = 0
      var idx = text.indexOf(p)
      while (idx >= 0) { cnt += 1; idx = text.indexOf(p, idx + p.length) }
      cnt
    }

  test("fixed adversarial cases: nesting, borders, overlap, absence") {
    val pats = Array("a", "aa", "aaa", "ab", "aba", "bab", "a a", "zq")
    val ac = AhoCorasick.build(pats)
    for (text <- Seq("", "a", "aaaa", "aaaaaaa", "ababab", "babab",
        "a a a a", "a a  a a", "xyz", "abaaababaaa")) {
      assert(ac.countNonOverlapping(text).toSeq == naive(pats, text).toSeq,
        s"mismatch on '$text'")
    }
  }

  test("duplicate patterns count independently") {
    val pats = Array("ab", "ab", "b")
    val ac = AhoCorasick.build(pats)
    assert(ac.countNonOverlapping("abab").toSeq == Seq(2, 2, 2))
  }

  test("seeded random sweep vs indexOf-and-skip (500 rounds)") {
    val rnd = new scala.util.Random(20260815L)
    val alphabet = "ab c"
    (1 to 500).foreach { round =>
      val nPats = 1 + rnd.nextInt(8)
      val pats = Array.fill(nPats) {
        val len = 1 + rnd.nextInt(5)
        Array.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString
      }
      val text = Array.fill(rnd.nextInt(300))(
        alphabet(rnd.nextInt(alphabet.length))).mkString
      val ac = AhoCorasick.build(pats)
      assert(ac.countNonOverlapping(text).toSeq == naive(pats, text).toSeq,
        s"round $round pats=${pats.mkString("[", ",", "]")} text='$text'")
    }
  }

  test("build determinism: two builds match counts on a long mixed text") {
    val pats = graft.operators.TextOps.blocklistPatterns
    val a = AhoCorasick.build(pats)
    val b = AhoCorasick.build(pats)
    val text = ("fast table table table a a a scan slow value part hash " * 50) +
      "window spark big vector merge batch"
    assert(a.countNonOverlapping(text).toSeq == b.countNonOverlapping(text).toSeq)
    assert(a.countNonOverlapping(text).toSeq == naive(pats, text).toSeq)
  }
}
