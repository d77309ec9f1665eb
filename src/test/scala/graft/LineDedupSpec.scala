package graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** Brute-force replay of the q243 CCNet line-dedup rule: a line carried
  * by more than T DISTINCT documents is boilerplate and is removed from
  * every carrier. The replay recomputes df, removal accounting, and the
  * order-free kept-line signature (sum of 32-bit md5 prefixes) in plain
  * Scala over seeded random corpora, plus the boundary cases the rule
  * must get exactly right (df == T kept, df == T+1 removed; duplicate
  * lines inside ONE doc count once toward df). The broadcast-guard
  * fallback — the round-7 verdict item — is proven result-identical to
  * the broadcast form by forcing the guard to zero.
  */
class LineDedupSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Per-source expected row, mirroring lineDedupStats' output columns. */
  private case class Src(nDocs: Long, nLines: Long, nRemoved: Long,
      charsRemoved: Long, nDocsTouched: Long, keptSig: Long)

  /** First 8 hex chars of md5 as a long — conv(substring(md5(l),1,8),16,10). */
  private def sig32(line: String): Long = {
    val d = MessageDigest.getInstance("MD5")
      .digest(line.getBytes(StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  private def replay(rows: Seq[(Long, String, String)], t: Int): Map[String, Src] = {
    val df = rows.groupBy(_._3).map { case (l, g) =>
      l -> g.map(_._1).distinct.size
    }
    val boiler = df.filter(_._2 > t).keySet
    rows.groupBy(_._2).map { case (src, g) =>
      val removed = g.filter(r => boiler(r._3))
      src -> Src(
        nDocs = g.map(_._1).distinct.size.toLong,
        nLines = g.size.toLong,
        nRemoved = removed.size.toLong,
        charsRemoved = removed.map(_._3.length.toLong).sum,
        nDocsTouched = removed.map(_._1).distinct.size.toLong,
        keptSig = g.filterNot(r => boiler(r._3)).map(r => sig32(r._3)).sum)
    }
  }

  private def run(rows: Seq[(Long, String, String)], t: Int,
      guard: Long = 4000000L): Map[String, Src] = {
    import spark.implicits._
    val lines = rows.toDF("doc_id", "source", "line")
    TextOps.lineDedupStats(lines, t, guard).collect().map { r =>
      r.getString(0) -> Src(r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))
    }.toMap
  }

  test("engine matches the brute-force replay on 20 seeded corpora") {
    val rnd = new scala.util.Random(243L)
    (1 to 20).foreach { round =>
      val nDocs = 4 + rnd.nextInt(30)
      val nBoiler = 1 + rnd.nextInt(4)
      val boiler = (0 until nBoiler).map(i => s"shared banner line $i")
      val rows = (0L until nDocs.toLong).flatMap { d =>
        val src = s"src${d % 3}"
        val own = (0 until 1 + rnd.nextInt(5))
          .map(j => (d, src, s"unique content $d $j ${rnd.nextInt(1000)}"))
        // each doc carries each boilerplate line with prob ~1/2, sometimes twice
        val shared = boiler.flatMap { b =>
          if (rnd.nextBoolean())
            Seq.fill(1 + rnd.nextInt(2))((d, src, b))
          else Seq.empty
        }
        own ++ shared
      }
      val t = 1 + rnd.nextInt(3)
      assert(run(rows, t) == replay(rows, t), s"round $round (T=$t) diverged")
    }
  }

  test("df boundary: exactly T carriers kept, T+1 removed") {
    val t = 3
    def corpus(carriers: Int) =
      (0L until carriers.toLong).map(d => (d, "s", "the boundary line")) ++
        Seq((100L, "s", "filler one"), (101L, "s", "filler two"))
    val kept = run(corpus(t), t)("s")
    assert(kept.nRemoved == 0 && kept.nDocsTouched == 0,
      s"df == T must be kept: $kept")
    val gone = run(corpus(t + 1), t)("s")
    assert(gone.nRemoved == t + 1 && gone.nDocsTouched == t + 1,
      s"df == T+1 must be removed from every carrier: $gone")
  }

  test("duplicate lines inside one doc count once toward df, all removed") {
    // doc 0 repeats the line 5 times; docs 1 and 2 carry it once → df = 3
    val rows = Seq.fill(5)((0L, "s", "repeated line")) ++
      Seq((1L, "s", "repeated line"), (2L, "s", "repeated line"),
        (0L, "s", "keeper"))
    val rT2 = run(rows, 2)("s") // df = 3 > 2: removed (7 occurrences)
    assert(rT2.nRemoved == 7 && rT2.nDocsTouched == 3 &&
      rT2.keptSig == sig32("keeper"), s"T=2: $rT2")
    val rT3 = run(rows, 3)("s") // df = 3, not > 3: kept
    assert(rT3.nRemoved == 0 && rT3.keptSig == 7 * sig32("repeated line") +
      sig32("keeper"), s"T=3: $rT3")
  }

  test("guard fallback (plain shuffle join) is result-identical to broadcast") {
    val rnd = new scala.util.Random(2430L)
    val rows = (0L until 40L).flatMap { d =>
      val src = s"src${d % 2}"
      Seq((d, src, s"own ${rnd.nextInt(100)} $d"), (d, src, "footer all rights"))
    }
    assert(run(rows, 2, guard = 0L) == run(rows, 2, guard = 4000000L),
      "forcing the non-broadcast path must not change any output")
  }
}
