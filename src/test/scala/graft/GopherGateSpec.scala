package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** Boundary algebra of the q218/q221 Gopher gates: every threshold is an
  * EXACT integer comparison, so each rule must flip at precisely its
  * boundary — one word, one character, one stopword either side. Synthetic
  * word lists are built to land exactly ON each boundary and one step off
  * it; a float-ratio implementation would wobble on several of these.
  */
class GopherGateSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Run the gate core over one synthetic word list, return (r1..r5). */
  private def gates(w: Seq[String]): (Boolean, Boolean, Boolean, Boolean, Boolean) = {
    import spark.implicits._
    val df = Seq((1L, "s", w)).toDF("doc_id", "source", "w")
    val r = TextOps.gopherGates(df)
      .select("r1", "r2", "r3", "r4", "r5").collect()(0)
    (r.getBoolean(0), r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4))
  }

  // distinct-ish filler words of length 3 that are neither stopwords nor
  // repeats: wa0, wa1, ... (distinct ratio stays 1 unless repeats added)
  private def fill(n: Int): Seq[String] = (0 until n).map(i => f"w$i%02d")

  test("r1 word count flips exactly at 50") {
    // pad with 'the','and' so r3 (>=2 distinct stopwords) holds; fill words
    // keep length ~3 so r2 holds and stop fraction 2/n sits inside r5
    def doc(n: Int) = Seq("the", "and") ++ fill(n - 2)
    val (r1a, _, _, _, _) = gates(doc(49))
    val (r1b, _, _, _, _) = gates(doc(50))
    assert(!r1a && r1b)
  }

  test("r2 mean word length flips exactly at 3 and 10 (integer cross-multiplication)") {
    // 50 words ALL of length 3 → sum_wl = 3*nw exactly: pass
    val exact3 = (0 until 50).map(i => f"a$i%02d").map(_.take(3))
    assert(exact3.forall(_.length == 3))
    val (_, r2eq3, _, _, _) = gates(Seq("the", "and") ++ exact3.drop(2))
    assert(r2eq3, "mean length exactly 3 must pass")
    // one word shortened by one char → sum_wl = 3*nw - 1 < 3*nw: fail
    val below = (Seq("the", "and") ++ exact3.drop(2)).updated(2, "aa")
    val (_, r2lo, _, _, _) = gates(below)
    assert(!r2lo, "mean length a hair under 3 must fail")
    // 50 words of length 10 → sum_wl = 10*nw exactly: pass; +1 char: fail.
    // ('the'/'and' are 3 chars, so compensate: use 48 words of length 10
    // plus two stopword pads and extend two fillers to keep the mean at
    // exactly 10: sum must equal 10*50 = 500; 2*3 + 48*x = 500 → pad two
    // fillers with extra chars instead: 46 of len 10 + 2 of len 17)
    val tens = (0 until 46).map(i => f"abcdefg$i%03d")
    assert(tens.forall(_.length == 10))
    val long17 = Seq("abcdefghijklmnop0", "abcdefghijklmnop1")
    assert(long17.forall(_.length == 17))
    val eq10 = Seq("the", "and") ++ tens ++ long17
    assert(eq10.map(_.length).sum == 10 * eq10.length)
    val (_, r2eq10, _, _, _) = gates(eq10)
    assert(r2eq10, "mean length exactly 10 must pass")
    val over = eq10.updated(2, eq10(2) + "z")
    val (_, r2hi, _, _, _) = gates(over)
    assert(!r2hi, "mean length a hair over 10 must fail")
  }

  test("r3 needs two DISTINCT stopwords — repeating one is not enough") {
    val base = fill(48)
    val (_, _, r3one, _, _) = gates(Seq("the", "the") ++ base)
    val (_, _, r3two, _, _) = gates(Seq("the", "and") ++ base)
    assert(!r3one && r3two)
  }

  test("r4 distinct ratio flips exactly at 1/2") {
    // 50 words, 25 distinct (each filler repeated once + 'the','and'
    // repeated): 2*n_dist == nw → pass
    val half = Seq("the", "the", "and", "and") ++ fill(23).flatMap(w => Seq(w, w))
    assert(half.length == 50 && half.distinct.length == 25)
    val (_, _, _, r4eq, _) = gates(half)
    assert(r4eq, "distinct ratio exactly 0.5 must pass")
    // drop one distinct word (replace BOTH copies of a doubled filler
    // with an existing stopword): 24 distinct of 50 → fail
    val under = half.updated(4, "the").updated(5, "the")
    assert(under.distinct.length == 24)
    val (_, _, _, r4lo, _) = gates(under)
    assert(!r4lo, "distinct ratio under 0.5 must fail")
  }

  test("r5 stopword fraction flips exactly at 2% and 30%") {
    // 50 words, exactly 1 stopword occurrence → 50*1 == 50: pass;
    // 100 words, 1 stopword → 50 < 100: fail
    val (_, _, _, _, r5loEq) = gates(Seq("the") ++ fill(49))
    assert(r5loEq, "stop fraction exactly 0.02 must pass")
    val (_, _, _, _, r5loUnder) = gates(Seq("the") ++ fill(99))
    assert(!r5loUnder, "stop fraction 0.01 must fail")
    // 50 words, 15 stopword occurrences → 10*15 == 3*50: pass; 16: fail
    val mix15 = Seq.fill(14)("the") ++ Seq("and") ++ fill(35)
    val (_, _, _, _, r5hiEq) = gates(mix15)
    assert(r5hiEq, "stop fraction exactly 0.30 must pass")
    val mix16 = Seq.fill(15)("the") ++ Seq("and") ++ fill(34)
    val (_, _, _, _, r5hiOver) = gates(mix16)
    assert(!r5hiOver, "stop fraction over 0.30 must fail")
  }

  test("q221 funnel is monotone and its dedup stage only ever removes later doc_ids") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q221_curation_funnel")(spark, dir).collect()
    rows.foreach { r =>
      val seq = Seq("n_docs", "n_s1", "n_s2", "n_s3", "n_s4", "n_s5", "n_kept")
        .map(c => r.getLong(r.fieldIndex(c)))
      assert(seq.zip(seq.tail).forall { case (a, b) => a >= b },
        s"funnel stages must be monotone non-increasing: $seq")
    }
    // independent replay of the dedup stage on the survivors
    val g = TextOps.gopherGates(
      spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("source"), col("text"),
          array_remove(split(col("text"), "\\s+"), "").as("w"))
        .filter(size(col("w")) >= 3))
      .filter(col("r1") && col("r2") && col("r3") && col("r4") && col("r5"))
      .select("doc_id", "source", "text").collect()
    val kept = g.groupBy(_.getString(2)).map { case (_, ds) => ds.map(_.getLong(0)).min }.toSet
    val bySrc = g.filter(r => kept(r.getLong(0))).groupBy(_.getString(1)).view.mapValues(_.length).toMap
    rows.foreach { r =>
      val src = r.getString(r.fieldIndex("source"))
      assert(r.getLong(r.fieldIndex("n_kept")) == bySrc.getOrElse(src, 0).toLong,
        s"dedup keeper count mismatch for $src")
    }
  }

  test("wpSegment: greedy longest-prefix rule, UNK consumption, full coverage") {
    import graft.operators.TextOps.wpSegment
    // "stream" -> str + eam (greedy longest), never s|t|r|e|a|m
    assert(wpSegment("stream") == (2L, 0L, 0L + 1L))
    // "window" -> wind + ow
    assert(wpSegment("window") == (2L, 0L, 2L + 3L))
    // "batch" -> bat + ch
    assert(wpSegment("batch") == (2L, 0L, 4L + 5L))
    // greedy is NOT optimal and that is the spec: "sorta" -> sort + a,
    // while "sorta" could also be s|o|r|t|a — greedy takes the merge
    assert(wpSegment("sorta") == (2L, 0L, 11L + 20L + 0L))
    // single chars fall back to the alphabet tier: "fast" -> f,a,s,t
    val (n, u, ids) = wpSegment("fast")
    assert(n == 4L && u == 0L && ids == (20 + 5) + (20 + 0) + (20 + 18) + (20 + 19))
    // a char with no vocab entry is one UNK token, id_sum unchanged
    assert(wpSegment("a9b") == (3L, 1L, (20 + 0) + (20 + 1)))
    // empty word: zero tokens
    assert(wpSegment("") == (0L, 0L, 0L))
    // coverage: token count of any word is at most its length
    for (w <- Seq("querystream", "xxzzqq", "aggsortkey", "merge")) {
      val (nt, nu, _) = wpSegment(w)
      assert(nt >= 1 && nt <= w.length && nu <= nt)
    }
  }
}
