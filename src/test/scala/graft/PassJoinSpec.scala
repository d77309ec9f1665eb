package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** PassJoin's lossless-blocking claim checked against an INDEPENDENT
  * quadratic scan with an in-JVM Levenshtein DP: seeded corpora built
  * from base strings plus perturbed near-copies (the adversarial regime
  * where true pairs abound at every distance 0..τ and just past it),
  * mixed lengths 1..16 so the zero-length-segment degenerate bucket and
  * the length-window edges are exercised, not just the uniform-16 shape
  * q237 runs on.
  */
class PassJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ed(a: String, b: String): Int = {
    val dp = Array.tabulate(b.length + 1)(identity)
    var i = 1
    while (i <= a.length) {
      var prev = dp(0); dp(0) = i
      var j = 1
      while (j <= b.length) {
        val cur = dp(j)
        dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
          prev + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1))
        prev = cur; j += 1
      }
      i += 1
    }
    dp(b.length)
  }

  private def perturb(s: String, ops: Int, rnd: scala.util.Random,
      alphabet: String): String = {
    var t = s
    (0 until ops).foreach { _ =>
      val c = alphabet(rnd.nextInt(alphabet.length))
      rnd.nextInt(3) match {
        case 0 if t.nonEmpty => // substitute
          val p = rnd.nextInt(t.length); t = t.updated(p, c)
        case 1 => // insert
          val p = rnd.nextInt(t.length + 1); t = t.substring(0, p) + c + t.substring(p)
        case _ if t.nonEmpty => // delete
          val p = rnd.nextInt(t.length); t = t.substring(0, p) + t.substring(p + 1)
        case _ => ()
      }
    }
    t
  }

  test("passJoinPairs equals quadratic brute force on seeded perturbed corpora") {
    val rnd = new scala.util.Random(20260815L)
    val alphabet = "abc"
    (1 to 4).foreach { round =>
      val bases = Array.fill(30)(
        Array.fill(1 + rnd.nextInt(16))(alphabet(rnd.nextInt(3))).mkString)
      val strs = bases.flatMap { b =>
        Seq(b) ++ (0 until 2).map(_ => perturb(b, rnd.nextInt(4), rnd, alphabet))
      }.filter(_.nonEmpty)
      val docs = strs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = spark.createDataFrame(docs.toIndexedSeq).toDF("doc_id", "t")
      val got = TextOps.passJoinPairs(df, tau = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val exp = (for {
        (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
        d = ed(ta, tb) if d <= 2
      } yield (ia, ib, d.toLong)).toSet
      assert(got == exp,
        s"round $round: missing=${(exp -- got).take(5)} extra=${(got -- exp).take(5)}")
    }
  }

  test("sortedNeighborhoodPairs equals the rank-window definition (seeded sweep)") {
    val rnd = new scala.util.Random(242L)
    val alphabet = "abc"
    (1 to 3).foreach { round =>
      val strs = Array.fill(80)(
        Array.fill(1 + rnd.nextInt(12))(alphabet(rnd.nextInt(3))).mkString)
      val docs = strs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = spark.createDataFrame(docs.toIndexedSeq).toDF("doc_id", "t")
      val got = TextOps.sortedNeighborhoodPairs(df, w = 5, tau = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // independent replay: explicit sort, explicit rank-distance window
      val ranked = docs.sortBy { case (id, t) => (t, id) }.zipWithIndex
      val exp = (for {
        (a, ra) <- ranked; (b, rb) <- ranked
        if rb > ra && rb - ra <= 5
        d = ed(a._2, b._2) if d <= 2
      } yield (math.min(a._1, b._1), math.max(a._1, b._1), d.toLong)).toSet
      assert(got == exp,
        s"round $round: missing=${(exp -- got).take(5)} extra=${(got -- exp).take(5)}")
    }
  }

  test("tau=1: blocking stays lossless at the tighter threshold") {
    val rnd = new scala.util.Random(99L)
    val strs = Array.fill(60)(
      Array.fill(3 + rnd.nextInt(10))("ab" (rnd.nextInt(2))).mkString)
    val docs = strs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = spark.createDataFrame(docs.toIndexedSeq).toDF("doc_id", "t")
    val got = TextOps.passJoinPairs(df, tau = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val exp = (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      d = ed(ta, tb) if d <= 1
    } yield (ia, ib, d.toLong)).toSet
    assert(got == exp)
  }
}
