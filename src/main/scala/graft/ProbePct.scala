package graft

import org.apache.spark.sql.SparkSession

/** Dev measurement main (not part of the driver contract): prints the
  * formatted physical plan of Percentiles.exactByRankPlan — the public
  * exactByRank returns a checkpointed LogicalRDD that hides the plan, so
  * the round-13 plan-shape evidence (range exchange removed, one hash
  * exchange feeding the (pid, g) windows) is captured here.
  *
  * Usage: runMain graft.ProbePct [sfDir]
  */
object ProbePct {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = Tables(spark, sfDir, "lineitem")
      .select("l_returnflag", "l_extendedprice")
    for (collapse <- Seq(true, false)) {
      val (out, _) = graft.functions.Percentiles.exactByRankPlan(
        li, "l_returnflag", "l_extendedprice", Seq(0.5, 0.99), collapse)
      println(s"==== exactByRankPlan collapse=$collapse ====")
      println(out.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
