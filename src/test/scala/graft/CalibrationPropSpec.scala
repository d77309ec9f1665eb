package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** ECE/MCE recomputation for the q244 reliability-bin core: the Spark
  * rollup (ppm DIV 100000 bins, half-up-ppm means, ECE = Σ n_b·|acc−conf|
  * / N half-up, MCE = max gap) against a plain-Scala replay on seeded
  * (conf, p) sets dense with repeated confidences — exactly the regime
  * integer ppm scores create — plus the half-up rounding boundaries the
  * integer form must land exactly.
  */
class CalibrationPropSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private case class Bin(bin: Long, n: Long, nPos: Long, confPpm: Long,
      accPpm: Long, gapPpm: Long, ecePpm: Long, mcePpm: Long)

  /** Half-up integer division for non-negative a, positive b. */
  private def halfUp(a: Long, b: Long): Long = (2 * a + b) / (2 * b)

  private def replay(rows: Seq[(Long, Long)]): Seq[Bin] = {
    val bins = rows.groupBy(_._1 / 100000).toSeq.sortBy(_._1).map {
      case (b, g) =>
        val n = g.size.toLong
        val nPos = g.map(_._2).sum
        val conf = halfUp(g.map(_._1).sum, n)
        val acc = halfUp(nPos * 1000000L, n)
        (b, n, nPos, conf, acc, math.abs(acc - conf))
    }
    val nTot = bins.map(_._2).sum
    val ece = halfUp(bins.map(x => x._2 * x._6).sum, nTot)
    val mce = bins.map(_._6).max
    bins.map(x => Bin(x._1, x._2, x._3, x._4, x._5, x._6, ece, mce))
  }

  private def run(rows: Seq[(Long, Long)]): Seq[Bin] = {
    import spark.implicits._
    val scored = rows.toDF("conf", "p")
    TextOps.calibrationEce(scored).collect().map { r =>
      Bin(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
    }.toSeq
  }

  test("Spark bins/ECE/MCE match the Scala replay on 25 seeded score sets") {
    val rnd = new scala.util.Random(244L)
    (1 to 25).foreach { round =>
      val n = 5 + rnd.nextInt(200)
      // few distinct ppm levels → repeated confidences and part-empty bins
      val levels = Array.fill(3 + rnd.nextInt(8))(rnd.nextInt(1000000).toLong)
      val rows = Seq.fill(n)((levels(rnd.nextInt(levels.length)),
        if (rnd.nextBoolean()) 1L else 0L))
      assert(run(rows) == replay(rows), s"round $round diverged")
    }
  }

  test("half-up boundaries land exactly") {
    // two rows in one bin with conf sum 100001 → mean 50000.5 → half-up 50001
    val r = run(Seq((50000L, 1L), (50001L, 0L)))
    assert(r.size == 1 && r.head.confPpm == 50001L,
      s"mean conf 50000.5 must round half-up to 50001: $r")
    // accuracy 1/2 → 500000 exactly (no rounding); gap = 450001 drives both
    assert(r.head.accPpm == 500000L && r.head.gapPpm == 449999L &&
      r.head.ecePpm == 449999L && r.head.mcePpm == 449999L, s"$r")
    // ECE across bins: 1 row gap 0, 3 rows gap 1 → (3*1 + 0) / 4 = 0.75 → 1
    val twoBins = run(Seq((0L, 0L)) ++ Seq.fill(3)((999999L, 1L)))
    val eces = twoBins.map(_.ecePpm).distinct
    assert(twoBins.map(_.gapPpm).sorted == Seq(0L, 1L) && eces == Seq(1L),
      s"ECE (3·1+0)/4 must half-up to 1: $twoBins")
  }
}
