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

  test("exactByRank edge inputs: empty frame, all-null group, single row") {
    import spark.implicits._
    val empty = Seq.empty[(String, Double)].toDF("grp", "v")
    for (collapse <- Seq(true, false)) {
      assert(Percentiles.exactByRank(empty, "grp", "v", Seq(0.5), collapse).count() == 0)
    }
    // a group whose every value is null contributes no rows; a single-row
    // group returns its value at every p
    val mixed = Seq(("a", Some(5.0)), ("b", None), ("b", None)).toDF("grp", "v")
    for (collapse <- Seq(true, false)) {
      val got = Percentiles.exactByRank(mixed, "grp", "v", Seq(0.0, 0.5, 1.0), collapse)
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      assert(got.forall(_._1 == "a"), s"null-only group leaked: ${got.mkString(",")}")
      assert(got.length == 3 && got.forall(_._3 == 5.0))
    }
  }

  test("exactByRank matches the percentile sort-agg bit-for-bit") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // heavy ties (quantized values) + a singleton group + a constant group
    val rows = (1 to 5000).map { i =>
      val g = s"g${i % 3}"
      (g, math.rint(rnd.nextGaussian() * 50) / 4.0 + 100.0)
    } ++ Seq(("solo", 42.5)) ++ (1 to 97).map(_ => ("const", 7.25))
    val df = rows.toDF("grp", "v")

    def run(collapse: Boolean) = Percentiles.exactByRank(df, "grp", "v", ps, collapse)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
      .toMap
    val got = run(collapse = true)
    // uncollapsed mode must agree even on this heavily-tied data
    val gotRaw = run(collapse = false)
    assert(gotRaw == got)

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

  test("robustNormalize: approx default stays within rank-error of exact, exact matches q45 arithmetic") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val df = (1 to 4000).map(i => (s"v${i % 2}", rnd.nextDouble() * 100)).toDF("vol", "x")

    val ex = Percentiles.robustNormalize(df, "vol", "x", exact = true)
    // exact path reproduces the inline-q45 normalization bit-for-bit
    val pp = df.groupBy("vol").agg(
      expr("percentile(x, 0.02D)").as("plo"), expr("percentile(x, 0.98D)").as("phi"))
    val want = df.join(pp, "vol")
      .withColumn("norm", expr("greatest(least((x - plo) / (phi - plo), 1.0D), 0.0D)"))
    val key = (r: org.apache.spark.sql.Row) => (r.getAs[String]("vol"), r.getAs[Double]("x"))
    val gotM = ex.collect().map(r => key(r) -> r.getAs[Double]("norm")).toMap
    want.collect().foreach { r =>
      assert(gotM(key(r)) == r.getAs[Double]("norm"))
    }

    // approx default: same clip behavior, bounds within GK rank error
    val ap = Percentiles.robustNormalize(df, "vol", "x")
    val diffs = ap.collect().map(r => math.abs(gotM(key(r)) - r.getAs[Double]("norm")))
    assert(diffs.max < 0.01, s"approx norm drifted ${diffs.max} from exact")

    // degenerate range guard: constant group → norm 1.0 (reference vmax<=vmin+1e-8)
    val const = Seq(("c", 5.0), ("c", 5.0), ("c", 5.0)).toDF("vol", "x")
    assert(Percentiles.robustNormalize(const, "vol", "x", exact = true)
      .collect().forall(_.getAs[Double]("norm") == 1.0))
  }

  test("no window partitions by the bare group (the 100 TB shape guarantee)") {
    import spark.implicits._
    val df = (1 to 500).map(i => (s"g${i % 2}", i.toDouble)).toDF("grp", "v")
    // inspect the pre-checkpoint plan: the public method returns a
    // checkpointed LogicalRDD that hides the window keying
    val plan = Percentiles.exactByRankPlan(df, "grp", "v", Seq(0.5))._1
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
