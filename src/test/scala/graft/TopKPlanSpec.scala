package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{TopKPerKey, TopKPerKeyFinalExec, TopKPerKeyPartialExec}

class TopKPlanSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.adaptive.enabled", "false") // static plan assertions
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def df = {
    import spark.implicits._
    Seq(
      ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 20.0), ("a", 4L, 40.0),
      ("b", 5L, 5.0), ("b", 6L, 1.0),
      ("c", 7L, 7.0)
    ).toDF("k", "id", "v").repartition(3)
  }

  test("custom top-k returns exactly the window row_number result") {
    val got = TopKPerKey(df, Seq("k"), Seq(("v", false), ("id", true)), 2)
      .select("k", "id", "v").orderBy("k", "id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq(
      ("a", 2L, 30.0), ("a", 4L, 40.0),
      ("b", 5L, 5.0), ("b", 6L, 1.0),
      ("c", 7L, 7.0)))
  }

  test("plan is two-phase: partial before the exchange, final after") {
    val plan = TopKPerKey(df, Seq("k"), Seq(("v", false), ("id", true)), 2)
      .queryExecution.executedPlan
    val partials = plan.collect { case p: TopKPerKeyPartialExec => p }
    val finals = plan.collect { case f: TopKPerKeyFinalExec => f }
    assert(partials.length == 1 && finals.length == 1)
    val planStr = plan.toString()
    val iPartial = planStr.indexOf("TopKPerKeyPartial")
    val iFinal = planStr.indexOf("TopKPerKeyFinal")
    val iExchange = planStr.indexOf("Exchange hashpartitioning")
    assert(iFinal < iExchange && iExchange < iPartial,
      s"expected Final above Exchange above Partial:\n$planStr")
  }

  test("ascending order and k larger than group size") {
    val got = TopKPerKey(df, Seq("k"), Seq(("v", true), ("id", true)), 10)
      .count()
    assert(got == 7) // k > group sizes → everything survives
    val top1 = TopKPerKey(df, Seq("k"), Seq(("v", true), ("id", true)), 1)
      .select("k", "v").orderBy("k")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(top1 == Seq(("a", 10.0), ("b", 1.0), ("c", 7.0)))
  }
}
