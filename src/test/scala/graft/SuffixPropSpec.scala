package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SuffixOps

/** Adversarial corpora for the distributed suffix-array construction —
  * shapes chosen to attack specific mechanisms of the prefix doubling:
  * single-char runs defeat the early exit (rank classes stay maximal
  * until width ≥ doc length), periodic strings create deep ties broken
  * only by the 0-sentinel end-of-document, shared-prefix families tie
  * exactly at the packed-start width, non-ASCII text forces the width-1
  * fallback path, and empty documents must contribute nothing (Spark's
  * sequence(1, 0) steps DOWN — the regression this suite pins).
  *
  * Ground truth is a local sort of every capped suffix, independent of
  * all engine code under test.
  */
class SuffixPropSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Brute-force ranks: (doc_id, pos) -> 1-based rank by
    * (first-Cap-chars, doc_id, pos); plus per-position dup_len from a
    * neighbor LCP scan. */
  private def bruteForce(docs: Seq[(Long, String, String)])
      : (Map[(Long, Int), Long], Map[(Long, Int), Long], Map[(Long, Int), Long],
         Map[(Long, Int), Map[String, Long]]) = {
    val srcOf = docs.map { case (id, src, _) => id -> src }.toMap
    val sufs = docs.flatMap { case (id, _, txt) =>
      (1 to txt.length).map { p =>
        (id, p, txt.substring(p - 1, math.min(txt.length, p - 1 + SuffixOps.Cap)))
      }
    }
    val sorted = sufs.sortBy { case (id, p, pref) => (pref, id, p) }
    val ranks = sorted.zipWithIndex
      .map { case ((id, p, _), i) => (id, p) -> (i + 1L) }.toMap
    def cpl(a: String, b: String): Long = {
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n && a.charAt(i) == b.charAt(i)) i += 1
      i.toLong
    }
    val dup = sorted.indices.map { i =>
      val (id, p, pref) = sorted(i)
      val lp = if (i > 0) cpl(pref, sorted(i - 1)._3) else 0L
      val ln = if (i < sorted.length - 1) cpl(pref, sorted(i + 1)._3) else 0L
      (id, p) -> math.max(lp, ln)
    }.toMap
    // cross-source: max LCP against EVERY suffix from a different source
    // (quadratic on purpose — independent of the runs decomposition under
    // test, which claims the nearest adjacent-run edge suffices), plus
    // the per-SOURCE best (for partner-attribution soundness: q233's
    // attributed source must actually achieve the max)
    val cross = sufs.map { case (id, p, pref) =>
      val best = sufs.iterator
        .filter { case (id2, _, _) => srcOf(id2) != srcOf(id) }
        .map { case (_, _, pref2) => cpl(pref, pref2) }
        .foldLeft(0L)(math.max)
      (id, p) -> best
    }.toMap
    val crossBySrc = sufs.map { case (id, p, pref) =>
      (id, p) -> sufs.groupBy { case (id2, _, _) => srcOf(id2) }
        .view.mapValues(_.iterator.map { case (_, _, pref2) => cpl(pref, pref2) }
          .foldLeft(0L)(math.max)).toMap
    }.toMap
    (ranks, dup, cross, crossBySrc)
  }

  private def check(docs: Seq[(Long, String, String)], label: String): Unit = {
    import spark.implicits._
    val df = docs.toDF("doc_id", "source", "text")
    val (expRanks, expDup, expCross, expCrossBySrc) = bruteForce(docs)
    val gotRanks = SuffixOps.ranksOf(df)
    val rankRows = gotRanks.collect()
      .map(r => (r.getLong(0), r.getAs[Number]("pos").intValue()) -> r.getLong(r.fieldIndex("rank")))
      .toMap
    assert(rankRows.size == expRanks.size, s"$label: suffix count")
    expRanks.foreach { case (k, v) =>
      assert(rankRows(k) == v, s"$label: rank at $k")
    }
    val gotDup = SuffixOps.dupLensOf(spark, gotRanks).collect()
      .map(r => (r.getLong(0), r.getAs[Number]("pos").intValue()) -> r.getLong(r.fieldIndex("dup_len")))
      .toMap
    expDup.foreach { case (k, v) =>
      assert(gotDup(k) == v, s"$label: dup_len at $k")
    }
    val crossRows = SuffixOps.crossLensOf(spark, gotRanks).collect()
    val gotCross = crossRows
      .map(r => (r.getLong(0), r.getAs[Number]("pos").intValue()) -> r.getLong(r.fieldIndex("cross_len")))
      .toMap
    expCross.foreach { case (k, v) =>
      assert(gotCross(k) == v, s"$label: cross_len at $k")
      assert(gotCross(k) <= gotDup(k), s"$label: cross_len must never exceed dup_len at $k")
    }
    // q233 partner-attribution soundness: wherever cross_len > 0, the
    // attributed partner source must ACHIEVE that LCP (the brute force
    // computes every source's best independently of the runs machinery)
    crossRows.foreach { r =>
      val k = (r.getLong(0), r.getAs[Number]("pos").intValue())
      val cl = r.getLong(r.fieldIndex("cross_len"))
      if (cl > 0) {
        val partner = r.getString(r.fieldIndex("partner_src"))
        assert(partner != null, s"$label: null partner at $k with cross_len $cl")
        assert(expCrossBySrc(k).getOrElse(partner, 0L) == cl,
          s"$label: partner $partner does not achieve cross_len $cl at $k " +
            s"(per-source best: ${expCrossBySrc(k)})")
      }
    }
  }

  test("single-char runs: early exit never fires, order is by length") {
    check(Seq(
      (1L, "a", "a" * 100),
      (2L, "a", "a" * 73),
      (3L, "a", "a" * 1)), "runs")
  }

  test("periodic strings: deep ties broken only by the end-of-doc sentinel") {
    check(Seq(
      (1L, "p", "ab" * 60),
      (2L, "p", "ab" * 60),            // identical doc: ties broken by doc_id
      (3L, "p", "aba" * 33),
      (4L, "p", "abcabc" * 25)), "periodic")
  }

  test("shared 8/64-char prefixes: ties at exactly the packed-start and Cap widths") {
    val p8 = "xyzwxyzw"             // 8 chars == packed start width
    val p64 = "m" * SuffixOps.Cap   // 64 chars == Cap: suffixes tie fully
    check(Seq(
      (1L, "s", p8 + "aaa"),
      (2L, "s", p8 + "aab"),
      (3L, "s", p64 + "tailA"),
      (4L, "s", p64 + "tailB")), "prefixes")
  }

  test("non-ASCII text: width-1 fallback path, BMP codepoint order") {
    check(Seq(
      (1L, "u", "héllo wörld héllo"),
      (2L, "u", "hèllo wörld"),
      (3L, "u", "plain ascii text here"),
      (4L, "u", "héllo wörld héllo")), "unicode")
  }

  test("empty and single-char documents contribute exactly their suffixes") {
    check(Seq(
      (1L, "e", ""),
      (2L, "e", "k"),
      (3L, "e", ""),
      (4L, "e", "kk")), "empties")
  }

  test("random two-letter corpus: dense tie structure end-to-end") {
    val rnd = new scala.util.Random(20260814)
    val docs = (1L to 12L).map { id =>
      val len = 1 + rnd.nextInt(120)
      (id, s"r${id % 3}", Array.fill(len)(if (rnd.nextBoolean()) 'a' else 'b').mkString)
    }
    check(docs, "random-ab")
  }

  test("planted cross-source contamination: the shared span is found at full length") {
    val leak = "this exact fifty-plus-character span leaks between sources!"
    check(Seq(
      (1L, "train", "prefix junk " + leak + " suffix junk"),
      (2L, "evalu", "other words " + leak),
      (3L, "train", "unrelated content entirely"),
      (4L, "third", "more unrelated filler text")), "planted-leak")
  }
}
