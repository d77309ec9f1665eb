package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AnalyticsOps

/** Property-style sweeps (seeded random fixtures, plain loops — the
  * scalatest/scalacheck bridge isn't in the offline dependency set) for
  * the analytics-tier helpers whose contracts must hold on ANY input,
  * not just the shipped testdata: the exact bitmap semi-join.
  */
class AnalyticsPropSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val rand = new scala.util.Random(20260813L)

  test("bitmap semi-join ≡ exact semi join on random key sets (incl. empty, dense, out-of-range probes)") {
    import spark.implicits._
    for (round <- 1 to 12) {
      val maxKey = 64L + rand.nextInt(4000)
      val nKeys = round match {
        case 1 => 0 // empty dimension: nothing may survive
        case 2 => maxKey.toInt // fully dense: everything in-range survives
        case _ => 1 + rand.nextInt(maxKey.toInt)
      }
      val keySet = rand.shuffle((0L to maxKey).toVector).take(nKeys)
      val keys = keySet.toDF("k")
      // probes deliberately overshoot the key domain (negative + beyond max)
      val probes = Seq.fill(500)(rand.nextLong(maxKey + 200) - 100).toDF("p")
      val bm = AnalyticsOps.bitmapWords(keys, "k", maxKey)
      val pruned = AnalyticsOps.bitmapSemi(probes, "p", bm)
        .collect().map(_.getLong(0)).sorted
      val want = probes.collect().map(_.getLong(0))
        .filter(keySet.toSet.contains).sorted
      assert(pruned.sameElements(want),
        s"round $round maxKey=$maxKey nKeys=$nKeys: ${pruned.length} vs ${want.length}")
    }
  }
}
