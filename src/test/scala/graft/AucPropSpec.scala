package graft

import org.scalatest.funsuite.AnyFunSuite

/** The q239 midrank identity — 2·R⁺ accumulated per tie group as
  * np·(c_lo + c_hi + 1) — checked against the definitional AUC
  * (#{pos > neg} + ½·#{pos = neg}) / (n⁺n⁻) on seeded random score/label
  * sets dense with ties, exactly the regime ppm-integer scores create.
  */
class AucPropSpec extends AnyFunSuite {

  private def midrankAuc2U(scores: Array[Long], pos: Array[Boolean]): Long = {
    // the grouped-midrank accumulation q239 performs, in plain Scala
    val groups = scores.zip(pos).groupBy(_._1).toSeq.sortBy(_._1)
    var cHi = 0L; var r2 = 0L
    groups.foreach { case (_, g) =>
      val n = g.length.toLong
      val np = g.count(_._2).toLong
      val cLo = cHi; cHi += n
      r2 += np * (cLo + cHi + 1)
    }
    val nPos = pos.count(identity).toLong
    r2 - nPos * (nPos + 1) // = 2U
  }

  test("grouped midrank 2U equals definitional 2*(wins + ties/2) on 300 seeded sets") {
    val rnd = new scala.util.Random(239L)
    (1 to 300).foreach { round =>
      val n = 2 + rnd.nextInt(60)
      val scores = Array.fill(n)(rnd.nextInt(8).toLong) // few levels → many ties
      val pos = Array.fill(n)(rnd.nextBoolean())
      if (pos.exists(identity) && pos.exists(!_)) {
        val twoU = midrankAuc2U(scores, pos)
        var wins2 = 0L
        for (i <- 0 until n if pos(i); j <- 0 until n if !pos(j)) {
          if (scores(i) > scores(j)) wins2 += 2
          else if (scores(i) == scores(j)) wins2 += 1
        }
        assert(twoU == wins2, s"round $round: 2U=$twoU brute=$wins2")
      }
    }
  }
}
