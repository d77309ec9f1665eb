package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CurationOps

/** Property-style sweeps (seeded random fixtures, plain loops — the
  * scalatest/scalacheck bridge isn't in the offline dependency set) for
  * the round-5 contracts that must hold on ANY input, not just the
  * shipped testdata: prefix-filter completeness (no missed pair at the
  * threshold, ever) and the micro-unit quotient's equivalence to
  * BigDecimal HALF_UP rounding (the rule every emitted ratio rides).
  */
class CurationPropSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val rand = new scala.util.Random(20260813L)

  test("prefix-filter join ≡ brute-force all-pairs on random corpora (completeness sweep)") {
    import spark.implicits._
    for (round <- 1 to 8) {
      // small alphabet forces shingle collisions; planted near-dups by
      // cloning a base doc and mutating a random suffix
      val vocab = (1 to (5 + rand.nextInt(10))).map(i => s"w$i")
      def randDoc(n: Int): String =
        (1 to n).map(_ => vocab(rand.nextInt(vocab.size))).mkString(" ")
      val bases = (1 to 10).map(i => (i.toLong, randDoc(8 + rand.nextInt(20))))
      val clones = bases.take(5).map { case (id, text) =>
        val ws = text.split(" ")
        val keep = ws.length - 1 - rand.nextInt(3)
        (id + 100L, (ws.take(keep) ++ Seq(vocab(rand.nextInt(vocab.size)))).mkString(" "))
      }
      val docs = bases ++ clones
      val got = CurationOps.prefixFilterJoin(docs.toDF("doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      val sets = docs.map { case (id, text) =>
        val ws = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
        (id, ws.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet)
      }.filter(_._2.nonEmpty)
      val brute = (for {
        (a, sa) <- sets; (b, sb) <- sets if a < b
        inter = (sa & sb).size.toLong
        uni = (sa | sb).size.toLong
        if inter * 5 >= uni * 3
      } yield (a, b, inter, uni, (2 * inter * 1000000L + uni) / (2 * uni)))
        .sortBy { case (x, y, _, _, j) => (-j, x, y) }.take(50)
      assert(got.toSeq == brute.toSeq,
        s"round $round: got ${got.length} pairs, brute ${brute.length}")
    }
  }

  test("containment join ≡ brute-force all-pairs on random corpora (asymmetric prefix filter)") {
    import spark.implicits._
    for (round <- 1 to 8) {
      // planted near-subsets: short docs embedded verbatim inside longer
      // hosts — the asymmetric case (tiny Jaccard, containment ≈ 1) the
      // probe-side-only prefix rule must still catch
      val vocab = (1 to (5 + rand.nextInt(10))).map(i => s"w$i")
      def randWords(n: Int): Seq[String] =
        (1 to n).map(_ => vocab(rand.nextInt(vocab.size)))
      val shorts = (1 to 6).map(i => (i.toLong, randWords(4 + rand.nextInt(6))))
      val hosts = shorts.take(3).map { case (id, ws) =>
        (id + 100L, randWords(rand.nextInt(8)) ++ ws ++ randWords(rand.nextInt(8)))
      }
      val fillers = (1 to 6).map(i => (i + 200L, randWords(6 + rand.nextInt(15))))
      val docs = (shorts ++ hosts ++ fillers).map { case (id, ws) => (id, ws.mkString(" ")) }
      val got = CurationOps.containmentJoin(docs.toDF("doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      val sets = docs.map { case (id, text) =>
        val ws = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
        (id, ws.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet)
      }.filter(_._2.nonEmpty)
      val brute = (for {
        (a, sa) <- sets; (b, sb) <- sets if a != b
        inter = (sa & sb).size.toLong
        na = sa.size.toLong
        if inter * 5 >= na * 4
      } yield (a, b, na, inter, (2 * inter * 1000000L + na) / (2 * na)))
        .sortBy { case (x, y, _, _, c) => (-c, x, y) }.take(50)
      assert(got.toSeq == brute.toSeq,
        s"round $round: got ${got.length} pairs, brute ${brute.length}")
    }
  }

  test("Hamilton quotas: apportionment invariants hold on random strata") {
    import spark.implicits._
    for (round <- 1 to 6) {
      val slots = Seq(10L, 100L, 1000L)(rand.nextInt(3))
      val nStrata = 2 + rand.nextInt(30)
      val strata = (1 to nStrata).map(i =>
        (s"s${i % 5}", s"l$i", 1L + rand.nextLong(10000L)))
      val got = CurationOps.hamiltonQuotas(
          strata.toDF("source", "lang", "n_docs"), slots)
        .collect().map(r => ((r.getString(0), r.getString(1)),
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      val t = strata.map(_._3).sum
      // 1. the budget is hit exactly
      assert(got.map(_._2._4).sum == slots, s"round $round budget")
      got.foreach { case ((src, l), (n, base, rem, quota)) =>
        // 2. base/rem are the exact integer division of the ideal share
        assert(base == n * slots / t && rem == n * slots % t, s"round $round ($src,$l)")
        // 3. quota rule: every stratum gets floor or ceiling of its share
        assert(quota == base || quota == base + 1, s"round $round ($src,$l)")
      }
      // 4. bumps go to the largest remainders under the total tie order
      val bumped = got.filter(x => x._2._4 == x._2._2 + 1)
        .map { case ((src, l), (_, _, rem, _)) => (-rem, src, l) }
      val notBumped = got.filter(x => x._2._4 == x._2._2)
        .map { case ((src, l), (_, _, rem, _)) => (-rem, src, l) }
      if (bumped.nonEmpty && notBumped.nonEmpty)
        assert(Ordering[(Long, String, String)].lt(bumped.max, notBumped.min),
          s"round $round bump order")
    }
  }

  test("containment join degenerates: identical clones all-pair at containment 1; short docs excluded") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e"), (2L, "a b c d e"), (3L, "a b c d e"), // identical clones
      (4L, "x y"),                                             // < 3 tokens: no shingles
      (5L, "p q r s t u v w")                                  // unrelated
    ).toDF("doc_id", "text")
    val got = CurationOps.containmentJoin(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    // every ORDERED clone pair, containment exactly 1.0 (micro = 1e6)
    val clones = Seq(1L, 2L, 3L)
    val wantPairs = for (a <- clones; b <- clones if a != b) yield (a, b, 1000000L)
    assert(got.toSet == wantPairs.toSet)
    assert(!got.exists(p => p._1 == 4L || p._2 == 4L || p._1 == 5L || p._2 == 5L))
  }

  test("micro-unit quotient (2a·s + n) div (2n) ≡ BigDecimal HALF_UP at 6 places") {
    for (_ <- 1 to 3000) {
      val sum = rand.nextLong(2_000_000_000L)
      val n = 1L + rand.nextLong(100_000L)
      val micro = (2 * sum * 1000000L + n) / (2 * n)
      val want = (BigDecimal(sum) / BigDecimal(n))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      assert(BigDecimal(micro, 6) == want, s"sum=$sum n=$n")
    }
    // the exact half tie that broke q149 round 4: 4396875/2000 in cents
    // space — HALF_UP must round the 6th place up
    val micro = (2 * 4396875L * 1000000L + 2000L) / (2 * 2000L)
    assert(micro == 2198437500L &&
      BigDecimal(micro, 6) == BigDecimal("2198.437500"))
  }

  test("serpentine LPT striping: beats modulo striping and bounds the spread on skewed sizes") {
    // the q228 assignment rule, simulated locally on adversarial size
    // distributions: Zipf-ish (heavy head), uniform, and constant. The
    // CONTRACT of serpentine striping over a desc-sorted order: (a) never
    // worse than plain modulo striping, (b) max-min shard load bounded by
    // the largest single item (each K-group contributes at most its own
    // within-group spread, and consecutive groups deal in opposite
    // directions, cancelling the positional bias modulo accumulates).
    val k = 16
    for (round <- 1 to 12) {
      val n = 200 + rand.nextInt(3000)
      val sizes = (0 until n).map { _ =>
        rand.nextInt(4) match {
          case 0 => (50000.0 / (1 + rand.nextInt(500))).toLong + 1 // zipf-ish
          case 1 => 1L + rand.nextInt(1000)                        // uniform
          case 2 => 500L                                           // constant
          case _ => math.abs(rand.nextGaussian() * 300).toLong + 1 // half-normal
        }
      }.sortBy(-_)
      val serp = Array.fill(k)(0L)
      val modu = Array.fill(k)(0L)
      sizes.zipWithIndex.foreach { case (sz, i) =>
        val g = i / k; val p = i % k
        serp(if (g % 2 == 0) p else k - 1 - p) += sz
        modu(p) += sz
      }
      val serpSpread = serp.max - serp.min
      val moduSpread = modu.max - modu.min
      assert(serpSpread <= moduSpread,
        s"round $round: serpentine spread $serpSpread > modulo spread $moduSpread (n=$n)")
      assert(serpSpread <= sizes.max,
        s"round $round: serpentine spread $serpSpread exceeds largest item ${sizes.max} (n=$n)")
    }
  }
}
