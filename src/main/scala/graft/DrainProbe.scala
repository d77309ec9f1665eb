package graft

import org.apache.spark.sql.SparkSession

/** Temporary diagnostic: phase timing for the streaming-drain queries
  * (round-8 item 5). Not part of the driver contract; removed after the
  * floor analysis lands in PLANS.md. */
object DrainProbe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.graft.stream.benchParts",
        sys.env.getOrElse("PROBE_PARTS", "4"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warm the session the way the bench sweep does (events table cached
    // reads, codegen warm)
    time("warmup q60")(graft.streaming.EventStreams
      .queries("q60_stream_tumbling")(spark, sf).collect())
    Seq("q185_stream_outer_join", "q107_stream_late_data",
      "q188_stream_chained_agg", "q61_stream_sliding").foreach { q =>
      (1 to 2).foreach { i =>
        time(s"$q rep$i")(graft.streaming.EventStreams.queries(q)(spark, sf).collect())
      }
    }
    // micro-batch overhead floor: an EMPTY staged source through the same
    // machinery — one row, two pAA drains, memory sink
    import spark.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    (1 to 3).foreach { i =>
      time(s"floor: 1-row staged stream, 2 drains, rep$i") {
        val d = graft.Scratch.freshPath("probe_")
        Seq((1L, "x")).toDF("id", "v").write.parquet(d.resolve("b0.parquet").toString)
        val schema = spark.read.parquet(d.resolve("b0.parquet").toString).schema
        val src = spark.readStream.schema(schema).parquet(d.toString)
        val agg = src.groupBy("v").count()
        val prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        try {
          val qq = agg.writeStream.format("memory").queryName(s"probe_$i")
            .outputMode(OutputMode.Complete()).start()
          try {
            qq.processAllAvailable()
            Seq((2L, "y")).toDF("id", "v").write.parquet(d.resolve("b1.parquet").toString)
            qq.processAllAvailable()
          } finally qq.stop()
        } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
      }
    }
    // q185 inline with per-batch progress: where do the seconds go?
    time("q185 inline with progress") {
      import org.apache.spark.sql.functions._
      val ev = Tables(spark, sf, "events").select("user_id", "ts", "event_type")
      val maxTs = ev.agg(max("ts")).head().getTimestamp(0)
      val d = graft.Scratch.freshPath("probe185_")
      def stage(df: org.apache.spark.sql.DataFrame, dest: java.nio.file.Path, modTime: Long): Unit = {
        val tmp = graft.Scratch.freshPath("wmbatch_")
        df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val part = new java.io.File(tmp.toString).listFiles()
          .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_")).get
        java.nio.file.Files.move(part.toPath, dest,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        dest.toFile.setLastModified(modTime)
        ()
      }
      val t0w = System.currentTimeMillis() - 120000
      time("  write b0")(stage(ev, d.resolve("b0.parquet"), t0w))
      val schema = spark.read.parquet(d.resolve("b0.parquet").toString).schema
      val src = spark.readStream.schema(schema).parquet(d.toString)
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
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      val q = joined.writeStream.format("memory").queryName("probe185")
        .outputMode(OutputMode.Append()).start()
      time("  pAA #1")(q.processAllAvailable())
      time("  write b1") {
        val sent = Seq(
          (-1L, new java.sql.Timestamp(maxTs.getTime + 1000L * 3600 * 1000), "click"),
          (-2L, new java.sql.Timestamp(maxTs.getTime + 1000L * 3600 * 1000 + 3600000L), "purchase"))
          .toDF("user_id", "ts", "event_type")
        stage(sent, d.resolve("b1.parquet"), t0w + 30000)
      }
      time("  pAA #2")(q.processAllAvailable())
      q.recentProgress.foreach { p =>
        val dm = p.durationMs
        println(s"[probe]   batch ${p.batchId}: rows=${p.numInputRows} " +
          s"total=${dm.get("triggerExecution")} addBatch=${dm.get("addBatch")} " +
          s"getBatch=${dm.get("getBatch")} latestOffset=${dm.get("latestOffset")} " +
          s"commit=${dm.get("commitOffsets")} wal=${dm.get("walCommit")} " +
          s"stateRows=${p.stateOperators.headOption.map(_.numRowsTotal)} " +
          s"stateMs=${p.stateOperators.headOption.map(o => o.allUpdatesTimeMs + o.allRemovalsTimeMs + o.commitTimeMs)}")
      }
      q.stop()
      spark.conf.set("spark.sql.shuffle.partitions", "32")
    }
    spark.stop()
  }
}
