package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Dev measurement main (not part of the driver contract): per-phase
  * breakdown of a streaming drain query (q185 shape) — batch prep, stream
  * start, per-drain waits, stop, serving rollup — so the round-13
  * streaming-floor work optimizes the measured phase, not a guess.
  *
  * Usage: runMain graft.ProbeDrain [sfDir] [reps]
  */
object ProbeDrain {
  private def ms(t0: Long): Double = (System.nanoTime() - t0) / 1e6

  private def writeBatchFile(df: DataFrame, dest: java.nio.file.Path, modTime: Long): Unit = {
    val tmp = graft.Scratch.freshPath("wmbatch_")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = new java.io.File(tmp.toString).listFiles()
      .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_")).get
    java.nio.file.Files.move(part.toPath, dest,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    dest.toFile.setLastModified(modTime)
    ()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // match the Bench environment: Scratch staging + stream checkpoints on
    // tmpfs, so commit latencies are what the sweep actually sees
    val shm = new java.io.File("/dev/shm/graft_probe_drain")
    if (shm.isDirectory || shm.mkdirs()) System.setProperty("java.io.tmpdir", shm.getAbsolutePath)
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.graft.stream.benchParts",
        sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTS", "4"))
      .config("spark.sql.streaming.stateStore.maintenanceInterval",
        sys.env.getOrElse("PROBE_MAINT", "60s"))
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled",
        sys.env.getOrElse("PROBE_CKSUM", "true"))
      .config("spark.sql.streaming.checkpointFileManagerClass",
        sys.env.getOrElse("PROBE_CFM", "org.apache.spark.sql.execution.streaming" +
          ".checkpointing.FileContextBasedCheckpointFileManager"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s.range(1000000).selectExpr("sum(id)").collect()

    // job-level attribution: wall between job submit and completion, and
    // the sum of task run times inside it — the gap is driver/scheduler
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long)]()
    @volatile var jobLog = List.empty[String]
    s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      private val taskSum = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      private val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.put(e.jobId, (e.time, 0L))
        e.stageIds.foreach(sid => stageToJob.put(sid, e.jobId))
      }
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val j = stageToJob.getOrDefault(e.stageId, -1)
        if (j >= 0 && e.taskInfo != null)
          taskSum.merge(j, e.taskInfo.duration, (a, b) => a + b)
      }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val st = jobs.getOrDefault(e.jobId, (e.time, 0L))._1
        val wall = e.time - st
        val tsum = taskSum.getOrDefault(e.jobId, 0L)
        jobLog ::= f"job${e.jobId} wall=${wall}ms tasks=${tsum}ms"
      }
    })

    for (r <- 1 to reps) {
      var t = System.nanoTime()
      val ev = Tables(s, sfDir, "events").select("user_id", "ts", "event_type")
      val maxTs = ev.agg(max("ts")).head().getTimestamp(0)
      val tMax = ms(t)

      t = System.nanoTime()
      import s.implicits._
      def sentinel(uid: Long, tpe: String, offsetMs: Long) =
        Seq((uid, new java.sql.Timestamp(maxTs.getTime + offsetMs), tpe))
          .toDF("user_id", "ts", "event_type")
      val d = graft.Scratch.freshPath("probe_outer_")
      val t0w = System.currentTimeMillis() - 120000
      writeBatchFile(ev, d.resolve("b0.parquet"), t0w)
      val tWrite0 = ms(t)

      t = System.nanoTime()
      val ss = graft.streaming.EventStreams.drainSession(s)
      val schema = ss.read.parquet(d.resolve("b0.parquet").toString).schema
      val src = ss.readStream.schema(schema).parquet(d.toString)
      val clicks = src.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("c_ts"))
        .withWatermark("c_ts", "10 minutes")
      val purchases = src.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
        .withWatermark("p_ts", "10 minutes")
      val joined = clicks.join(purchases,
        col("user_id") === col("p_user") &&
          col("p_ts") >= col("c_ts") &&
          col("p_ts") <= col("c_ts") + expr("INTERVAL 30 MINUTES"),
        "left_outer")
      val q = joined.writeStream.format("memory").queryName(s"probe_outer_$r")
        .outputMode(OutputMode.Append()).start()
      val tStart = ms(t)

      t = System.nanoTime()
      q.processAllAvailable()
      val tDrain1 = ms(t)

      t = System.nanoTime()
      writeBatchFile(sentinel(-1L, "click", 1000L * 3600 * 1000)
        .unionByName(sentinel(-2L, "purchase", 1000L * 3600 * 1000 + 3600000L)),
        d.resolve("b1.parquet"), t0w + 30000)
      val tWrite1 = ms(t)

      t = System.nanoTime()
      q.processAllAvailable()
      val tDrain2 = ms(t)

      t = System.nanoTime()
      q.stop()
      val tStop = ms(t)

      t = System.nanoTime()
      ss.table(s"probe_outer_$r")
        .filter(col("user_id") >= 0)
        .select(date_trunc("hour", col("c_ts")).as("click_hour"),
          col("user_id"), col("p_ts"))
        .groupBy("click_hour")
        .agg(count(lit(1)).as("n_rows"),
          count(col("p_ts")).as("n_matched"),
          (count(lit(1)) - count(col("p_ts"))).as("n_unmatched"),
          countDistinct("user_id").as("n_users"))
        .orderBy("click_hour")
        .write.format("noop").mode("overwrite").save()
      val tServe = ms(t)

      // micro-batch breakdown from the query's own progress log
      val prog = q.recentProgress.map { p =>
        f"b${p.batchId}%d dur=${p.durationMs.getOrDefault("triggerExecution", -1L)}ms " +
          f"addBatch=${p.durationMs.getOrDefault("addBatch", -1L)} " +
          f"getBatch=${p.durationMs.getOrDefault("getBatch", -1L)} " +
          f"latestOffset=${p.durationMs.getOrDefault("latestOffset", -1L)} " +
          f"queryPlanning=${p.durationMs.getOrDefault("queryPlanning", -1L)} " +
          f"walCommit=${p.durationMs.getOrDefault("walCommit", -1L)} " +
          f"commitOffsets=${p.durationMs.getOrDefault("commitOffsets", -1L)} " +
          f"stateCommit=${p.stateOperators.map(_.commitTimeMs).sum}"
      }.mkString("\n  ")
      println(f"[probe q185 r$r] maxTs=$tMax%.0f write0=$tWrite0%.0f start=$tStart%.0f " +
        f"drain1=$tDrain1%.0f write1=$tWrite1%.0f drain2=$tDrain2%.0f stop=$tStop%.0f serve=$tServe%.0f " +
        f"total=${tMax + tWrite0 + tStart + tDrain1 + tWrite1 + tDrain2 + tStop + tServe}%.0f")
      println(s"  $prog")
      println(s"  jobs: ${jobLog.reverse.mkString(" | ")}")
      jobLog = Nil
    }
    s.stop()
  }
}
