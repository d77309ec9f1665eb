package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan of selected queries and
  * a summary of the plan properties that matter at 100 TB — parquet filter/
  * schema pushdown, broadcast vs shuffle joins, whole-stage codegen spans.
  *
  * Usage: runMain graft.Explain [sfDir] [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // static plans: AQE's initial AdaptiveSparkPlan hides codegen spans
      // and final join strategies from toString
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    names.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          val pushed = "PushedFilters: \\[[^\\]]+\\]".r.findAllIn(plan)
            .filterNot(_.contains("PushedFilters: []")).size
          val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
          val smj = "SortMergeJoin".r.findAllIn(plan).size
          val shj = "ShuffledHashJoin".r.findAllIn(plan).size
          val exch = "Exchange".r.findAllIn(plan).size
          val wsc = "codegen id : (\\d+)".r.findAllMatchIn(plan)
            .map(_.group(1).toInt).toSeq.distinct.size
          println(f"$name%-28s pushedFilters=$pushed broadcastJoins=$bhj " +
            f"sortMerge=$smj shuffledHash=$shj exchanges=$exch codegenSpans=$wsc")
          if (args.length > 1) {
            df.explain("formatted")
          }
        } catch {
          case e: Throwable => println(s"$name EXPLAIN FAILED: ${e.getMessage}")
        }
      }
    }
    spark.stop()
  }
}
