package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Phase-breakdown probe for knnCore's peel loop (round-12 measurement
  * harness, kept alongside Explain as a local dev main — NOT part of the
  * driver contract). Variants via PROBE_VARIANT (base | narrow8 |
  * narrow8noaqe | narrow1noaqe) and PROBE_CHAIN (rounds per rebase);
  * the measurements that chose the shipped narrow8 design are recorded
  * in OPTIMIZATION_r12.md. */
object ProbeKnn {
  @volatile var jobs = 0
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs += 1
    })
    spark.range(1000000).selectExpr("sum(id)").collect()
    def timed(tag: String)(f: => Unit): Unit = {
      val j0 = jobs
      val t0 = System.nanoTime()
      f
      println(f"[probe] $tag%-34s ${(System.nanoTime() - t0) / 1e9}%7.3f s  jobs=${jobs - j0}")
    }
    val emb = Tables(spark, sfDir, "embeddings").select(col("vec_id"), col("embedding"))
    val variant = sys.env.getOrElse("PROBE_VARIANT", "narrow8")
    for (rep <- 1 to 3) {
      println(s"--- rep $rep variant=$variant")
      // build the mutual graph once (mp form), rebased on the chosen session
      val mutual = operators.VectorOps.probeMutual(spark, emb, banded = true, multiprobe = true)
      val loopS = variant match {
        case "base" => spark
        case "narrow8" => LoopSession.narrow(spark, 8)
        case "narrow8noaqe" => LoopSession.narrow(spark, 8, aqe = false)
        case "narrow1noaqe" => LoopSession.narrow(spark, 1, aqe = false)
      }
      var adj: DataFrame = null
      timed("adj rebase") {
        adj = LoopSession.rehome(
          mutual.select(col("u").as("a"), col("v").as("b"))
            .union(mutual.select(col("v").as("a"), col("u").as("b"))), loopS)
      }
      var alive: DataFrame = null
      var nAlive = 0L
      timed("alive init") {
        alive = Barrier.rebase(adj.select("a").distinct())
        nAlive = alive.count()
      }
      var deg: DataFrame = null
      var stable = false
      var rounds = 0
      val chain = sys.env.getOrElse("PROBE_CHAIN", "1").toInt
      def step(a: DataFrame): DataFrame =
        adj.join(a, "a")
          .join(a.select(col("a").as("b")), "b")
          .groupBy("a").agg(count(lit(1)).as("core_deg"))
          .filter(col("core_deg") >= 3)
      val tLoop = System.nanoTime()
      while (!stable && rounds < 48) {
        timed(s"chain@$rounds (n=$nAlive)") {
          var d = step(alive)
          rounds += 1
          var c = 1
          while (c < chain) { d = step(d.select("a")); rounds += 1; c += 1 }
          deg = Barrier.rebase(d)
          val n2 = deg.count()
          stable = n2 == nAlive
          nAlive = n2
          alive = deg.select("a")
        }
      }
      println(f"[probe] LOOP total rounds=$rounds ${(System.nanoTime() - tLoop) / 1e9}%7.3f s")
    }
    spark.stop()
  }
}
