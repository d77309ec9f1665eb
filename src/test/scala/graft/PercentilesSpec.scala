package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Percentiles

/** Distributed rank-selection exact percentiles (Percentiles.exactByRank):
  * value parity with Spark's `percentile` sort-agg across group shapes
  * (ties, singletons, constant groups, interpolated ranks), and the
  * scale-shape guarantee that no window ever partitions by the bare group.
  */
class PercentilesSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "7") // odd: forces multi-partition groups
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val ps = Seq(0.0, 0.01, 0.25, 0.5, 0.9, 0.99, 1.0)

  test("exactByRank matches the percentile sort-agg bit-for-bit") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // heavy ties (quantized values) + a singleton group + a constant group
    val rows = (1 to 5000).map { i =>
      val g = s"g${i % 3}"
      (g, math.rint(rnd.nextGaussian() * 50) / 4.0 + 100.0)
    } ++ Seq(("solo", 42.5)) ++ (1 to 97).map(_ => ("const", 7.25))
    val df = rows.toDF("grp", "v")

    val got = Percentiles.exactByRank(df, "grp", "v", ps)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
      .toMap

    val aggs = ps.map(p => expr(s"percentile(v, ${p}D)").as(s"p$p"))
    val want = df.groupBy("grp")
      .agg(aggs.head, aggs.tail: _*)
      .collect()
      .flatMap(r => ps.zipWithIndex.map { case (p, i) => (r.getString(0), p) -> r.getDouble(i + 1) })
      .toMap

    assert(got.keySet == want.keySet)
    want.foreach { case (k, w) =>
      assert(got(k) == w, s"$k: got ${got(k)}, want $w")
    }
  }

  test("no window partitions by the bare group (the 100 TB shape guarantee)") {
    import spark.implicits._
    val df = (1 to 500).map(i => (s"g${i % 2}", i.toDouble)).toDF("grp", "v")
    val plan = Percentiles.exactByRank(df, "grp", "v", Seq(0.5))
      .queryExecution.optimizedPlan.toString()
    // the running-count window must be keyed by (partition id, group) —
    // a bare-group window would put an entire group in one task
    val windowLines = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windowLines.nonEmpty)
    val runCount = windowLines.filter(l => l.contains("pid"))
    assert(runCount.nonEmpty, s"expected a (pid, g)-keyed window in:\n$plan")
    // and the heavy path must not use the percentile sort-agg at all
    assert(!plan.contains("percentile("), s"sort-agg percentile leaked into:\n$plan")
  }
}
