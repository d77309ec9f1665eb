package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skew hardening for the LSH self-joins (TextOps.boundedBucketPairs):
  * an adversarially hot band value (30% of all docs in ONE bucket) must
  * yield (a) exactly the naive pair set, each pair once, and (b) a bounded
  * per-task pair count — the quadratic-bucket case AQE cannot split. */
class SkewSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("AQE splits the skewed partition of a hot-key shuffle join (runtime skew resilience)") {
    // The complement of boundedBucketPairs' static capping: for plain
    // equi-joins the engine leans on AQE's runtime skew split (SURVEY
    // §2 scale rules), so PROVE it actually fires under our session
    // shape rather than assuming: one key holding half the fact side
    // must show up as skew=true in the final adaptive SMJ, with results
    // still exact.
    val s = spark
    val prev = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold").map(k =>
      k -> scala.util.Try(s.conf.get(k)).toOption)
    try {
      s.conf.set("spark.sql.adaptive.enabled", "true")
      s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32k")
      s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
      s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val pad = "x" * 100
      val fact = s.range(0, 20000).select(
        when(col("id") < 10000, 0L).otherwise(col("id") % 10000).as("k"),
        concat(lit(pad), col("id")).as("payload"))
      val dim = s.range(0, 10000).select(col("id").as("k"),
        (col("id") * 2).as("v"))
      val joined = fact.join(dim, "k")
      // Execute THIS plan (count() would plan a separate aggregate query and
      // leave joined's adaptive plan unexecuted → isFinalPlan=false, no skew
      // handling visible). collect() materializes the adaptive final plan.
      assert(joined.collect().length == 20000, "join result must stay exact under the skew split")
      val plan = joined.queryExecution.executedPlan.toString()
      assert(plan.contains("skew=true"),
        s"AQE must have split the hot partition (no skew=true in final plan):\n$plan")
    } finally prev.foreach { case (k, v) =>
      v match { case Some(x) => s.conf.set(k, x); case None => s.conf.unset(k) }
    }
  }

  test("hot bucket (30% of corpus): exact pair set, exactly once, per-task pairs bounded by the cap") {
    import spark.implicits._
    val cap = 50
    // 1000 ids; ids 1..300 all share band value 0 — the degenerate band —
    // the rest spread over ~100 small buckets of ~7
    val rows = (1L to 1000L).map(id => (id, if (id <= 300) 0L else id % 100 + 1))
    val df = rows.toDF("id", "bk")

    val pairs = graft.operators.TextOps
      .boundedBucketPairs(df, Seq("bk"), "id", Seq.empty, cap)
      .select(col("bk"), col("lo"), col("hi"), col("a"), col("b_id"))
      .collect()

    // (a) exact, exactly-once pair coverage vs the naive per-bucket self-join
    val want = rows.groupBy(_._2).values.flatMap { members =>
      val ids = members.map(_._1)
      for (x <- ids; y <- ids if x < y) yield (x, y)
    }.toSet
    val got = pairs.map(r => (r.getAs[Long]("a"), r.getAs[Long]("b_id")))
    assert(got.length == want.size, s"expected ${want.size} pairs, got ${got.length} (dups or misses)")
    assert(got.toSet == want)
    assert(want.size > 44000) // the hot bucket alone contributes 300·299/2

    // (b) per-task bound: each (bucket, cellLo, cellHi) join key is its own
    // task's work; none may approach the hot bucket's quadratic 44850.
    // ⌈300/50⌉ = 6 cells → ~50×50 pairs per key, 4× slack for hash imbalance
    val perTask = pairs.groupBy(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .view.mapValues(_.length)
    val worst = perTask.values.max
    assert(worst <= 4 * cap * cap, s"per-task pair count $worst exceeds bound ${4 * cap * cap}")
    // the hot bucket must actually be decomposed into the 6-cell triangle
    val hotTasks = perTask.keys.count(_._1 == 0L)
    assert(hotTasks == 6 * 7 / 2, s"expected 21 cell-pair tasks for the hot bucket, got $hotTasks")

    // (c) small buckets pay nothing: one cell, one task key
    assert(perTask.keys.filter(_._1 != 0L).forall(k => k._2 == 0L && k._3 == 0L))
  }
}
