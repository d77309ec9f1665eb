package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 contract for the conditional kernel spread (r12 VERDICT #1/#3):
  * `Spread.ifNarrow` must inject the round-robin exchange for a NARROW
  * source (one parquet file, one row group — every testdata table, and the
  * moral equivalent of one unsplittable gzip at 100 TB) and must NOT
  * inject it for a source that already scans wide (≥ defaultParallelism
  * files), where a keyless repartition of the full payload would be pure
  * added shuffle + the sortBeforeRepartition local sort.
  */
class SpreadSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def hasRoundRobinExchange(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.catalyst.plans.logical.Repartition => r
      case r: org.apache.spark.sql.catalyst.plans.logical.RepartitionByExpression => r
    }.nonEmpty

  test("narrow source (1 file, 1 row group) gets the spread") {
    import spark.implicits._
    val d = Scratch.fresh("spread_narrow_")
    (1L to 1000L).toDF("v").coalesce(1).write.mode("overwrite").parquet(d)
    val src = spark.read.parquet(d)
    assert(Spread.effectiveScanParallelism(spark, src) <
      spark.sparkContext.defaultParallelism)
    val out = Spread.ifNarrow(spark, src)
    assert(hasRoundRobinExchange(out), "narrow source must be spread")
    assert(out.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    assert(out.count() == 1000L)
  }

  test("pre-split source (>= defaultParallelism files) skips the spread") {
    import spark.implicits._
    val par = spark.sparkContext.defaultParallelism
    val d = Scratch.fresh("spread_wide_")
    (1L to 1000L).toDF("v").repartition(par * 2)
      .write.mode("overwrite").parquet(d)
    val src = spark.read.parquet(d)
    assert(Spread.effectiveScanParallelism(spark, src) >= par)
    val out = Spread.ifNarrow(spark, src)
    assert(out eq src, "pre-split source must pass through untouched")
    assert(!hasRoundRobinExchange(out), "no repartition for a wide source")
    assert(out.count() == 1000L)
  }

  test("non-file source (cannot prove wide) keeps the spread") {
    import spark.implicits._
    val src = (1L to 100L).toDF("v") // LocalRelation: no input files
    assert(Spread.effectiveScanParallelism(spark, src) == 0)
    val out = Spread.ifNarrow(spark, src)
    assert(hasRoundRobinExchange(out))
    assert(out.count() == 100L)
  }

  test("typed Dataset passes through with its type") {
    import spark.implicits._
    val d = Scratch.fresh("spread_typed_")
    (1L to 100L).toDF("v").coalesce(1).write.mode("overwrite").parquet(d)
    val ds = spark.read.parquet(d).as[Long].filter(_ % 2 == 0)
    val out: org.apache.spark.sql.Dataset[Long] = Spread.ifNarrow(spark, ds)
    assert(out.map(_ + 1).collect().sorted.head == 3L)
  }
}
