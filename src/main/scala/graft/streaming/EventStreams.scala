package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState,
  GroupStateTimeout, ListState, MapState, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}
import graft.Tables

/** Structured Streaming surface (SURVEY.md §2.11): the reference's
  * append-only audit log (S12) and incremental counters (A1) re-expressed as
  * genuine streams over the `events` table.
  *
  * Each query runs a real streaming pipeline (readStream → transform →
  * memory sink, processAllAvailable) and returns the resulting table, so the
  * driver's DuckDB oracle can hash-compare streaming semantics against the
  * batch-equivalent SQL. Watermarks are declared as they would be in
  * production; with a single replayed batch they don't evict (complete mode).
  */
object EventStreams {

  /** Once per (SparkContext, corpus, table): the table staged as
    * min(defaultParallelism, 8) parquet files for the file stream source
    * (round 13). The old per-call symlink exposed the ONE-row-group
    * testdata file, so every drain's micro-batch 0 decoded the whole
    * table on a single task (§2.5 input skew — the same narrow-source
    * rule as the batch-side kernel spreads); the staged copy scans wide.
    * For events the staging write runs through [[Tables]], so ts is
    * already normalized and every generation's physical type round-trips
    * to one µs-timestamp layout. Batch CONTENT is unchanged — the
    * sources set no maxFilesPerTrigger, so all staged files land in
    * micro-batch 0 exactly as the single file did. Shared across the
    * stream()-based drains of a session like the other session-scoped
    * derivations (round-6 prewarm policy); each query still runs its
    * whole streaming pipeline from parquet files. Re-validated against
    * the filesystem on every use because Bench's pre-rerun Scratch sweep
    * legitimately deletes staged dirs of the main pass. */
  private val stagedDirs =
    new java.util.WeakHashMap[org.apache.spark.SparkContext,
      java.util.concurrent.ConcurrentHashMap[String, String]]()

  private[graft] def stagedTableDir(s: SparkSession, dir: String, table: String): String = {
    val m = stagedDirs.synchronized {
      var mm = stagedDirs.get(s.sparkContext)
      if (mm == null) {
        mm = new java.util.concurrent.ConcurrentHashMap[String, String]()
        stagedDirs.put(s.sparkContext, mm)
      }
      mm
    }
    val key = s"$dir|$table"
    val cached = m.get(key)
    val live = cached != null && {
      val f = new java.io.File(cached)
      f.isDirectory && Option(f.listFiles()).exists(_.exists(_.getName.endsWith(".parquet")))
    }
    if (live) cached
    else {
      val d = graft.Scratch.fresh("stream_staged_")
      Tables(s, dir, table)
        .repartition(math.min(s.sparkContext.defaultParallelism, 8))
        .write.mode("overwrite").parquet(d)
      m.put(key, d)
      d
    }
  }

  /** Raw streamed events (ts pre-normalized by the staging write).
    * Callers pass the DRAIN session ([[drainSession]]), which carries the
    * nanosAsLong decode conf from creation — never the caller's session. */
  private def stream(s: SparkSession, dir: String): DataFrame = {
    val staged = stagedTableDir(s, dir, "events")
    val schema = s.read.parquet(staged).schema
    Tables.normalizeTs(s.readStream.schema(schema).parquet(staged))
  }

  /** Bench untimed-warmup hook (round-6 verdict #1 policy): build the
    * staged stream-source copies the drains share. */
  private[graft] def prewarmStaging(s: SparkSession, dir: String): Unit = {
    stagedTableDir(drainSession(s), dir, "events")
    stagedTableDir(drainSession(s), dir, "documents")
    ()
  }

  /** The live staged stream-source dirs of this context — Bench's
    * pre-rerun Scratch sweep spares them (they are deterministic
    * derivations the rerun pass would otherwise rebuild inside its timed
    * window; everything else staged by a query run is per-run garbage). */
  private[graft] def stagedLivePaths(s: SparkSession): Set[String] =
    stagedDirs.synchronized {
      val m = stagedDirs.get(s.sparkContext)
      if (m == null) Set.empty
      else m.values().toArray(Array.empty[String]).toSet
    }

  /** Stream-scoped shuffle-partition count: every partition costs a
    * state-store instance per micro-batch (a RocksDB instance each for the
    * transformWithState queries), which dominates the replayed-batch
    * queries' wall time. Default 8; Bench pins a smaller count via this
    * conf (results are partition-count-invariant — same aggregations, same
    * watermarks — so the correctness gate, which never sets the conf, is
    * unchanged). On a production cluster you would size it to cores ×
    * smallish. */
  private[graft] def streamParts(s: SparkSession): String =
    s.conf.getOption("spark.graft.stream.benchParts").getOrElse("8")

  /** Dedicated DRAIN sessions (round-11 verdict #2): the state-store
    * partition count must be fixed before a streaming query's first
    * checkpoint, and the drains used to set/restore
    * `spark.sql.shuffle.partitions` (and the RocksDB provider) on the
    * CALLER's session — a set/restore race under concurrent queries, and
    * a window where an unrelated batch query planned at the narrowed
    * width. Each drain now builds its WHOLE streaming plan on a memoized
    * `newSession()` clone — same SparkContext and shared state, its OWN
    * SQLConf and temp-view registry — whose conf is written exactly once
    * at creation and never mutated after: scoping is structural, not
    * save/restore, so there is nothing left to race and the caller's
    * session is never touched. One clone per (base session, provider);
    * the RocksDB clone exists because transformWithState requires that
    * provider while the windowed/agg drains keep the default HDFS-backed
    * one. Keyed weakly on the base session (the SessionCache convention)
    * so a stopped session's clones become collectable. */
  private val drainSessions =
    new java.util.WeakHashMap[SparkSession, Array[SparkSession]]()

  private[graft] def drainSession(s: SparkSession, rocksdb: Boolean = false): SparkSession =
    drainSessions.synchronized {
      var arr = drainSessions.get(s)
      if (arr == null) { arr = new Array[SparkSession](2); drainSessions.put(s, arr) }
      val i = if (rocksdb) 1 else 0
      if (arr(i) == null) {
        val ss = s.newSession()
        ss.conf.set("spark.sql.shuffle.partitions", streamParts(s))
        ss.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        // Checkpoint-manifest churn is the measured fixed cost of every
        // micro-batch (round-13 ProbeDrain, q185 at sf0.1/tmpfs): with the
        // default FileContext-based manager each offsets/commits/state
        // file costs a steady ~25-35 ms of pure code-path overhead even on
        // tmpfs — walCommit 33 ms, commitOffsets 33 ms, per-instance state
        // commits ~40 ms, ~270 ms per batch across a 4-batch drain. The
        // FileSystem-based manager (Spark's own implementation for schemes
        // without FileContext) does the identical create-temp-then-rename
        // protocol through the cached FileSystem API: walCommit/commit-
        // Offsets drop to ~8 ms, state commit sums 650→40 ms, q185
        // 4.1→2.9 s. On a SINGLE-DRIVER local-fs checkpoint the rename is
        // atomic and nothing else writes the directory, so the managers
        // are interchangeable; multi-driver HDFS deployments (zombie-
        // driver fencing via FileContext rename-no-overwrite) should set
        // spark.graft.stream.checkpointFileManager to the FileContext
        // class — parameterized, never hardcoded to the local choice.
        ss.conf.set("spark.sql.streaming.checkpointFileManagerClass",
          s.conf.getOption("spark.graft.stream.checkpointFileManager")
            .getOrElse("org.apache.spark.sql.execution.streaming" +
              ".checkpointing.FileSystemBasedCheckpointFileManager"))
        if (rocksdb) ss.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        arr(i) = ss
      }
      arr(i)
    }

  /** Streaming queries still alive on `s`'s drain clones — each clone has
    * its own StreamingQueryManager, so a leak check on the base session's
    * `streams.active` alone would be blind to them (Bench's pre-sweep
    * quiescence guard checks both). */
  private[graft] def activeDrainStreams(
      s: SparkSession): Array[org.apache.spark.sql.streaming.StreamingQuery] =
    drainSessions.synchronized {
      val arr = drainSessions.get(s)
      if (arr == null) Array.empty
      else arr.toSeq.filter(_ != null).flatMap(_.streams.active).toArray
    }

  /** Build a streaming DF on the drain session, run it to a memory sink,
    * and return the materialized table (registered on the drain session —
    * the caller's temp-view namespace is untouched). */
  private def run(s: SparkSession, build: SparkSession => DataFrame, name: String,
      mode: OutputMode, rocksdb: Boolean = false): DataFrame = {
    val ss = drainSession(s, rocksdb)
    val q = build(ss).writeStream.format("memory").queryName(name).outputMode(mode).start()
    try q.processAllAvailable() finally q.stop()
    ss.table(name)
  }

  /** Tumbling 1-hour windows with watermark (window() + complete mode). */
  private def q60(s: SparkSession, dir: String): DataFrame = {
    run(s, ss => stream(ss, dir)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 3).as("sum_value")),
      "stream_tumbling", OutputMode.Complete())
      .select(col("window.start").as("hour"), col("event_type"), col("n"), col("sum_value"))
      .orderBy("hour", "event_type")
  }

  /** Sliding windows (2h window, 1h slide). Streaming aggregation is per
    * (window, user) — distinct users are counted exactly on the materialized
    * result (streaming countDistinct is unsupported; approx_count_distinct
    * would break oracle parity). */
  private def q61(s: SparkSession, dir: String): DataFrame = {
    run(s, ss => stream(ss, dir)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("user_id"))
      .agg(count(lit(1)).as("n")),
      "stream_sliding", OutputMode.Complete())
      .groupBy(col("window.start").as("w_start"))
      .agg(sum("n").as("n"), countDistinct("user_id").as("n_users"))
      .orderBy("w_start")
  }

  /** session_window(ts, 30 min) per user — the streaming twin of the batch
    * lag-gap sessionization (Relational q20; same oracle CTE shape). */
  private def q62(s: SparkSession, dir: String): DataFrame = {
    run(s, ss => stream(ss, dir)
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events")),
      "stream_session", OutputMode.Complete())
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
      .orderBy("user_id")
  }

  /** Streaming exact dedup: dropDuplicates on a content key + counts. */
  private def q63(s: SparkSession, dir: String): DataFrame = {
    run(s, ss => stream(ss, dir)
      .withWatermark("ts", "1 hour")
      .dropDuplicates("user_id", "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_unique_users")),
      "stream_dedup", OutputMode.Complete())
      .orderBy("event_type")
  }

  /** Stateful per-key counter via flatMapGroupsWithState — the A1 running
    * counters as explicit state (reference merges worker partials,
    * v2/nii_to_lmdb_paralel.py:357-369). */
  private def q64(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    run(s, ss => stream(ss, dir)
      .select(col("user_id"), col("value")).as[(Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Double), (Long, Long, Double)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Double)],
         state: GroupState[(Long, Double)]) =>
          val (n0, s0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0; var sum = s0
          rows.foreach { r => n += 1; sum += r._2 }
          state.update((n, sum))
          Iterator((user, n, sum))
      }
      .toDF("user_id", "n_events", "sum_value")
      .withColumn("sum_value", round(col("sum_value"), 3)),
      "stream_stateful", OutputMode.Update())
      .orderBy("user_id")
  }

  /** Stream-stream interval join (§2.11): clicks joined to purchases by
    * the same user within [click_ts, click_ts + 30 min], both sides
    * watermarked so join state is evictable in production; the joined
    * pairs land append-mode in the sink and are then rolled up per click
    * hour. The oracle mirrors the interval join in batch SQL. */
  private def q85(s: SparkSession, dir: String): DataFrame = {
    val pairs = run(s, { ss =>
      val ev = stream(ss, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("c_ts"))
        .withWatermark("c_ts", "1 hour")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
        .withWatermark("p_ts", "1 hour")
      clicks.join(purchases,
        col("user_id") === col("p_user") &&
          col("p_ts") >= col("c_ts") &&
          col("p_ts") <= col("c_ts") + expr("INTERVAL 30 MINUTES"))
    }, "stream_join", OutputMode.Append())
    pairs
      .select(date_trunc("hour", col("c_ts")).as("click_hour"), col("user_id"))
      .groupBy("click_hour")
      .agg(count(lit(1)).as("n_pairs"), countDistinct("user_id").as("n_users"))
      .orderBy("click_hour")
  }

  /** foreachBatch sink integration: stream the events into the sharded
    * KvStore per micro-batch through [[graft.sinks.KvStore.appendBatch]]
    * — the EXACTLY-ONCE ledger path (round-8 built the ledger and proved
    * it replay-safe in KvStoreAppendSpec; this is the one streaming
    * KvStore consumer, previously on hand-rolled ShardWriters + a single
    * end-of-stream commit, i.e. exactly the at-least-once seam q206
    * closed for LMDB). Two ts-split staged files force ≥ 2 real
    * micro-batches so the per-batch ledger commit is actually exercised;
    * after the stream stops, batch 0 is REPLAYED through appendBatch
    * (the foreachBatch failure-retry contract) and must be a ledger
    * no-op — n_stored/n_hash_matched count the POST-replay store, so the
    * oracle equalities prove no key was double-appended. */
  private def q78(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables(s, dir, "events")
      .filter(col("event_id") % 20 === 0)
      .select(col("event_id"), col("ts"), col("props"))
    val bounds = ev.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
    val midUs = (bounds.getLong(0) + bounds.getLong(1)) / 2
    val d = graft.Scratch.freshPath("kvstream_")
    val t0 = System.currentTimeMillis() - 120000
    writeBatchFile(ev.filter(unix_micros(col("ts")) <= midUs), d.resolve("b0.parquet"), t0)
    writeBatchFile(ev.filter(unix_micros(col("ts")) > midUs), d.resolve("b1.parquet"), t0 + 30000)
    val schema = s.read.parquet(d.resolve("b0.parquet").toString).schema

    val store = graft.Scratch.fresh("stream_kv_")
    new java.io.File(store).delete()
    graft.sinks.KvStore.createCommitted(store)
    def recs(df: DataFrame, batchId: Long): DataFrame = df.select(
      concat(lit(f"batch$batchId%03d/"), col("event_id")).as("key"),
      col("props").cast("binary").as("value"),
      array(lit(1)).as("shape"), lit("bytes").as("dtype"))
    var nBatches = 0L
    // the stream runs on the drain clone for its checkpoint-manager conf
    // (round 13); the foreachBatch body only touches the batch frame and
    // the KvStore ledger, so the clone's narrow width is irrelevant here
    val q = drainSession(s).readStream.schema(schema).option("maxFilesPerTrigger", "1")
      .parquet(d.toString)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.sinks.KvStore.appendBatch(recs(batch, batchId), store, batchId)
        nBatches += 1
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    // at-least-once replay: the whole filtered set again under batch 0's
    // already-committed id — the manifest ledger must no-op it
    val replayed = graft.sinks.KvStore.appendBatch(recs(ev, 0L), store, 0L)

    val back = graft.sinks.KvStore.read(s, store)
      .select(col("key"), md5(col("value")).as("h"))
    val expected = ev.select(
      concat(when(unix_micros(col("ts")) <= midUs, lit("batch000/"))
        .otherwise(lit("batch001/")), col("event_id")).as("key"),
      md5(col("props").cast("binary")).as("h"))
    val matched = back.join(expected, Seq("key", "h")).count()
    val keySample = graft.sinks.KvStore.listKeys(store, Some("^batch\\d{3}/"), 10).length.toLong
    Seq((expected.count(), back.count(), matched, keySample, nBatches >= 2, !replayed))
      .toDF("n_expected", "n_stored", "n_hash_matched", "n_key_sample",
        "multi_batch", "exactly_once")
  }

  /** Streaming corpus ingest: the curation tier's front door as a stream —
    * documents arrive as files, are quality-filtered per row, exact-deduped
    * on (source, content-hash) in streaming state, and counted per source.
    * Dedup keys scope to the source so the surviving-row choice can never
    * leak across output groups (survivor-invariant counts → deterministic
    * oracle). At 100 TB this is the continuous-crawl ingest loop:
    * per-file micro-batches, dedup state in the state store (RocksDB in
    * production), counters in complete mode. */
  private def q101(s: SparkSession, dir: String): DataFrame = {
    run(s, { ss =>
      val staged = stagedTableDir(ss, dir, "documents")
      val schema = ss.read.parquet(staged).schema
      ss.readStream.schema(schema).parquet(staged)
        .withColumn("nw", size(array_remove(split(col("text"), "\\s+"), "")).cast("long"))
        .filter(col("nw") >= 5 && col("n_chars") >= 100)
        .withColumn("fp", md5(col("text")))
        .dropDuplicates("source", "fp")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("nw").as("sum_tokens"))
    }, "stream_corpus_ingest", OutputMode.Complete())
      .orderBy("source")
  }

  /** Write `df` as a single parquet file at `dest` with a forced modification
    * time, so the file stream source (which orders by modTime) sees a
    * deterministic arrival order. */
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

  /** Stage one ARRIVAL of a multi-arrival drain as SEVERAL parquet files
    * sharing one forced modTime (round 13; guide §1.2 + §2.5). The sources
    * that use this set no maxFilesPerTrigger, so every file of the arrival
    * lands in the SAME micro-batch — batch content (a set union) and hence
    * watermarks and results are identical to the old single-file staging;
    * only the staging write and the batch-0 scan stop being single-task
    * (coalesce(1) serialized the write, and one parquet file decoded ~N
    * rows on one core inside the first micro-batch). Also folds the
    * sentinel's max(tsCol) into the write job via `observe`, replacing the
    * separate full-scan aggregation every drain paid up front — one pass
    * instead of two. Returns null iff `df` is empty. */
  private def stageArrival(df: DataFrame, destDir: java.nio.file.Path, prefix: String,
      modTime: Long, tsCol: String): java.sql.Timestamp = {
    val s = df.sparkSession
    val obs = org.apache.spark.sql.Observation()
    val tmp = graft.Scratch.freshPath("wmbatch_")
    val n = math.min(s.sparkContext.defaultParallelism, 8)
    df.observe(obs, max(col(tsCol)).as("mx"))
      .repartition(n).write.mode("overwrite").parquet(tmp.toString)
    val parts = new java.io.File(tmp.toString).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
      .sortBy(_.getName)
    parts.zipWithIndex.foreach { case (part, i) =>
      val dest = destDir.resolve(f"${prefix}_$i%03d.parquet")
      java.nio.file.Files.move(part.toPath, dest,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      dest.toFile.setLastModified(modTime)
    }
    obs.get("mx") match {
      case t: java.sql.Timestamp => t
      case _ => null
    }
  }

  /** Watermark late-data semantics across real micro-batches (§2.11): the
    * one streaming behavior a single replayed batch can't exercise. Files
    * arrive one at a time with the stream drained between arrivals (the
    * continuous-ingest shape): even-id events first — advancing the
    * watermark to max(even ts) − 10 min — then the odd-id events, now LATE,
    * then a far-future sentinel that pushes the watermark past every real
    * window so append mode finalizes them. Spark filters a late row iff its
    * window end ≤ the watermark of the previously executed batch (the
    * post-3.4 two-watermark rule; draining between arrivals runs the
    * zero-data promotion batch, making that watermark deterministic); the
    * oracle replays exactly that rule in SQL. The sentinel's own window
    * never closes, so it never reaches the sink. */
  private def q107(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables(s, dir, "events").select("event_id", "ts", "event_type")
    val d = graft.Scratch.freshPath("late_")
    val t0 = System.currentTimeMillis() - 120000
    // per-arrival maxima observed during the staging writes replace the
    // old up-front full-scan agg: max(all) = max(max(evens), max(odds))
    val mxEven = stageArrival(ev.filter(col("event_id") % 2 === 0), d, "b0", t0, "ts")
    val ss = drainSession(s)
    val schema = ss.read.parquet(d.toString).schema
    val agg = ss.readStream.schema(schema)
      .parquet(d.toString)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("event_id").as("id_sum"))
    val q = agg.writeStream.format("memory").queryName("stream_late_data")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable() // batch(evens) + zero-data watermark promotion
      val mxOdd = stageArrival(ev.filter(col("event_id") % 2 === 1), d, "b1", t0 + 30000, "ts")
      q.processAllAvailable() // batch(odds): late filter vs max(even)−10min
      val maxTs = if (mxOdd == null || (mxEven != null && mxEven.after(mxOdd))) mxEven else mxOdd
      val sentinel = Seq((-1L, new java.sql.Timestamp(maxTs.getTime + 1000L * 3600 * 1000), "sentinel"))
        .toDF("event_id", "ts", "event_type")
      writeBatchFile(sentinel, d.resolve("b2.parquet"), t0 + 60000)
      q.processAllAvailable() // sentinel advances watermark → all real windows emit
    } finally q.stop()
    ss.table("stream_late_data")
      .select(col("window.start").as("hour"), col("event_type"), col("n"), col("id_sum"))
      .filter(col("event_type") =!= "sentinel")
      .orderBy("hour", "event_type")
  }

  /** Stream-static join: the streaming event flow enriched with a static
    * dimension (customer market segment keyed by user id) before a
    * windowless running aggregation — the enrichment topology every
    * production stream runs (fact stream + slowly-changing dim). The
    * static side is broadcast and re-resolved per micro-batch (Spark's
    * stream-static contract — a dim update is picked up by the next
    * batch with no restart); no state is keyed on the dim, so dim size
    * never bloats the state store. */
  private def q119(s: SparkSession, dir: String): DataFrame = {
    run(s, { ss =>
      val dim = Tables(ss, dir, "customer")
        .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("segment"))
      stream(ss, dir)
        .join(broadcast(dim), Seq("user_id"))
        .groupBy("segment", "event_type")
        .agg(count(lit(1)).as("n"), round(sum("value"), 3).as("sum_value"))
    }, "stream_static_join", OutputMode.Complete())
      .orderBy("segment", "event_type")
  }

  /** Spark 4 arbitrary-state processor for q173: per-user running
    * (count, max-cents) in a typed ValueState — the transformWithState
    * successor to q64's flatMapGroupsWithState, with explicit state
    * handles (named states, TTL-capable) instead of a single implicit
    * state value. Inputs arrive pre-rounded to integer cents (the
    * repo-wide `round(col * 100)` SQL-HALF_UP convention lives in the
    * DataFrame projection, not in JVM `math.round`, whose half-toward-
    * +inf diverges on negative exact halves); the processor only counts
    * and maxes longs. Emits the running pair on every input batch
    * (Update mode); downstream keeps the last. */
  private class RunningMaxCount
      extends StatefulProcessor[Long, (Long, Long), (Long, Long, Long)] {
    @transient private var st: ValueState[(Long, Long)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Long)]("s",
        org.apache.spark.sql.Encoders.product[(Long, Long)], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
        tv: TimerValues): Iterator[(Long, Long, Long)] = {
      var (n, mx) = if (st.exists()) st.get() else (0L, Long.MinValue)
      rows.foreach { case (_, c) => n += 1; mx = math.max(mx, c) }
      st.update((n, mx))
      Iterator.single((key, n, mx))
    }
  }

  /** transformWithState (the Spark 4 arbitrary-state API): per-user
    * running counters in a named RocksDB-backed ValueState (the API
    * requires the RocksDB provider — structurally scoped via the
    * dedicated rocksdb drain session, never set on the caller).
    * Update-mode emissions are monotone, so the batch-side max IS the
    * final state; oracle = the plain batch rollup. */
  private def q173(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    run(s, ss => stream(ss, dir)
      .select(col("user_id"), round(col("value") * 100).cast("long").as("cents"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new RunningMaxCount, TimeMode.None(), OutputMode.Update())
      .toDF("user_id", "n_events", "max_cents"),
      "stream_tws", OutputMode.Update(), rocksdb = true)
      .groupBy("user_id")
      .agg(max("n_events").as("n_events"), max("max_cents").as("max_cents"))
      .orderBy("user_id")
  }

  /** Stream-stream LEFT OUTER interval join (§2.11's last missing join
    * mode): every click emits exactly once — matched rows as purchases
    * arrive, UNMATCHED clicks as nulls only after the watermark passes
    * their join-window expiry (the state-expiry semantics that make outer
    * join state bounded in production; an inner join q85 never has to
    * evict-and-emit). Two staged arrivals via the q107 file machinery:
    * the real events, then far-future sentinels on BOTH sides (each
    * side's watermark advances only through its own filter; distinct
    * sentinel users 30+ min apart so they cannot match each other) —
    * after which every unmatched click has flushed, so the result equals
    * the batch left join the oracle runs. Rolled up per click hour. */
  private def q185(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables(s, dir, "events").select("user_id", "ts", "event_type")
    val d = graft.Scratch.freshPath("outer_")
    val t0 = System.currentTimeMillis() - 120000
    // one pass: parallel multi-file staging + sentinel timestamp observed
    // during the write (round 13 — was a full-scan agg + coalesce(1) write)
    val maxTs = stageArrival(ev, d, "b0", t0, "ts")
    def sentinel(uid: Long, tpe: String, offsetMs: Long) =
      Seq((uid, new java.sql.Timestamp(maxTs.getTime + offsetMs), tpe))
        .toDF("user_id", "ts", "event_type")
    val ss = drainSession(s)
    val schema = ss.read.parquet(d.toString).schema
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
    val q = joined.writeStream.format("memory").queryName("stream_outer_join")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable() // real data + zero-data watermark promotion
      writeBatchFile(sentinel(-1L, "click", 1000L * 3600 * 1000)
        .unionByName(sentinel(-2L, "purchase", 1000L * 3600 * 1000 + 3600000L)),
        d.resolve("b1.parquet"), t0 + 30000)
      q.processAllAvailable() // watermark passes every expiry → outer rows flush
    } finally q.stop()
    ss.table("stream_outer_join")
      .filter(col("user_id") >= 0) // drop only the negative-id sentinels
      .select(date_trunc("hour", col("c_ts")).as("click_hour"),
        col("user_id"), col("p_ts"))
      .groupBy("click_hour")
      .agg(count(lit(1)).as("n_rows"),
        count(col("p_ts")).as("n_matched"),
        (count(lit(1)) - count(col("p_ts"))).as("n_unmatched"),
        countDistinct("user_id").as("n_users"))
      .orderBy("click_hour")
  }

  /** Event-time TIMER processor for q186 (the half of the Spark-4
    * arbitrary-state API q173 doesn't touch): per-user abandoned-cart
    * detection. Clicks enter a pending ListState and register an
    * event-time timer just past their 30-minute conversion window;
    * purchases clear every pending click they cover; when the watermark
    * passes a timer, the still-pending clicks emit as abandonments.
    * Matching runs on integer epoch SECONDS (floored identically in the
    * oracle), so no timestamp arithmetic reaches the comparison. The
    * purchase list is kept unpruned here (bounded replay); production
    * would drop purchases older than watermark − window. */
  private class AbandonedCarts
      extends StatefulProcessor[Long, (Long, java.sql.Timestamp, String), (Long, Long)] {
    @transient private var pending: ListState[Long] = _ // click epoch-sec
    @transient private var purch: ListState[Long] = _   // purchase epoch-sec
    private def expiryMs(c: Long): Long = (c + 1800L) * 1000L + 1000L
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      pending = getHandle.getListState[Long]("pending",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
      purch = getHandle.getListState[Long]("purch",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    }
    override def handleInputRows(key: Long,
        rows: Iterator[(Long, java.sql.Timestamp, String)],
        tv: TimerValues): Iterator[(Long, Long)] = {
      val in = rows.toSeq
      val newClicks = in.filter(_._3 == "click").map(_._2.getTime / 1000L)
      val newPurch = in.filter(_._3 == "purchase").map(_._2.getTime / 1000L)
      val allPurch = purch.get().toSeq ++ newPurch
      val open = (pending.get().toSeq ++ newClicks)
        .filterNot(c => allPurch.exists(p => p >= c && p <= c + 1800L))
      pending.clear()
      open.foreach(pending.appendValue)
      purch.clear()
      allPurch.foreach(purch.appendValue)
      open.map(expiryMs).distinct.foreach(getHandle.registerTimer)
      Iterator.empty
    }
    override def handleExpiredTimer(key: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[(Long, Long)] = {
      val e = info.getExpiryTimeInMs
      val (due, rest) = pending.get().toSeq.partition(c => expiryMs(c) <= e)
      pending.clear()
      rest.foreach(pending.appendValue)
      due.sorted.map(c => (key, c)).iterator
    }
  }

  /** transformWithState with EVENT-TIME TIMERS: per-user abandoned-cart
    * counts — a click with no purchase in its 30-minute window emits
    * exactly once, when the watermark passes the window (the timer-driven
    * emission pattern session timeouts, SLA alerts, and cart-recovery
    * jobs all share). Same staged arrivals as q185: real events, then a
    * far-future sentinel advancing the watermark past every timer. The
    * oracle recomputes abandoned clicks relationally on epoch seconds —
    * timer semantics against batch anti-join semantics, row-for-row. */
  private def q186(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables(s, dir, "events").select("user_id", "ts", "event_type")
      .filter(col("event_type").isin("click", "purchase"))
    val d = graft.Scratch.freshPath("carts_")
    val t0 = System.currentTimeMillis() - 120000
    // one pass: parallel staging + observed sentinel timestamp (round 13)
    val maxTs = stageArrival(ev, d, "b0", t0, "ts")
    val ss = drainSession(s, rocksdb = true) // timers API requires RocksDB
    val schema = ss.read.parquet(d.toString).schema
    val typed = ss.readStream.schema(schema).parquet(d.toString)
      .withWatermark("ts", "10 minutes")
      .as[(Long, java.sql.Timestamp, String)]
    val out = typed.groupByKey(_._1)
      .transformWithState(new AbandonedCarts, TimeMode.EventTime(), OutputMode.Append())
      .toDF("user_id", "click_es")
    val q = out.writeStream.format("memory").queryName("stream_timers")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable() // real data + zero-data watermark promotion
      writeBatchFile(Seq((-1L,
        new java.sql.Timestamp(maxTs.getTime + 1000L * 3600 * 1000), "click"))
        .toDF("user_id", "ts", "event_type"), d.resolve("b1.parquet"), t0 + 30000)
      q.processAllAvailable() // watermark passes every timer -> abandonments flush
    } finally q.stop()
    ss.table("stream_timers")
      .filter(col("user_id") >= 0)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_abandoned"),
        min("click_es").as("first_abandoned_es"))
      .orderBy("user_id")
  }

  /** MapState processor for q187 — the third and last state primitive of
    * the Spark-4 API (ValueState q173, ListState+timers q186): per-user
    * map of event_type → (count, cents-sum), updated key-at-a-time so
    * state grows with the user's distinct types, not their event count.
    * Update-mode emissions are monotone per (user, type); the batch-side
    * max keeps the final value. */
  private class TypeTotals
      extends StatefulProcessor[Long, (Long, String, Long), (Long, String, Long, Long)] {
    @transient private var m: MapState[String, (Long, Long)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      m = getHandle.getMapState[String, (Long, Long)]("totals",
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.product[(Long, Long)], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[(Long, String, Long)],
        tv: TimerValues): Iterator[(Long, String, Long, Long)] = {
      val touched = scala.collection.mutable.Set[String]()
      rows.foreach { case (_, tpe, cents) =>
        val (n, c) = if (m.containsKey(tpe)) m.getValue(tpe) else (0L, 0L)
        m.updateValue(tpe, (n + 1L, c + cents))
        touched += tpe
      }
      touched.toSeq.sorted.map { tpe =>
        val (n, c) = m.getValue(tpe)
        (key, tpe, n, c)
      }.iterator
    }
  }

  /** transformWithState with MapState: per-(user, event_type) running
    * count and cents volume in a keyed map — the per-entry-addressable
    * state shape (update one type without rewriting the user's whole
    * state) that a ValueState of the full map would lose. Oracle = the
    * plain batch rollup. Final state is reconstructed from the update
    * stream by LAST emission per key, ordered by n_events — the count is
    * strictly increasing on every emission (each touched type emits once
    * per micro-batch after ≥1 increment), so max_by(sum_cents, n_events)
    * picks the terminal state even with negative cents or multi-batch
    * delivery, where a bare max(sum_cents) would pick a stale peak. */
  private def q187(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    run(s, ss => stream(ss, dir)
      .select(col("user_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .transformWithState(new TypeTotals, TimeMode.None(), OutputMode.Update())
      .toDF("user_id", "event_type", "n_events", "sum_cents"),
      "stream_mapstate", OutputMode.Update(), rocksdb = true)
      .groupBy("user_id", "event_type")
      .agg(max("n_events").as("n_events"),
        max_by(col("sum_cents"), col("n_events")).as("sum_cents"))
      .orderBy("user_id", "event_type")
  }

  /** The chained two-stage aggregation of q188, factored so the spec can
    * run it against its own staged source and count state operators. */
  private[graft] def chainedAgg(src: DataFrame): DataFrame =
    src
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("cents").as("cents"))
      .groupBy(window(window_time(col("window")), "1 hour"), col("event_type"))
      .agg(sum("n").as("n_events"), sum("cents").as("sum_cents"),
        count(lit(1)).as("n_buckets"), max("n").as("max_bucket_n"))

  /** CHAINED stateful operators in one streaming query (Spark 4's
    * multiple-stateful-operator support): a 30-minute tumbling
    * pre-aggregation re-aggregated to hourly rollups INSIDE the same
    * stream via `window_time` (the event-time column of a finalized
    * window), both stages in append mode sharing one watermark. This is
    * the production two-tier rollup topology (fine windows for serving,
    * coarse for storage) that previously required two jobs and an
    * intermediate topic; state stays bounded because stage 1 evicts
    * 30-min buckets as the watermark passes and stage 2 only ever holds
    * open hours. Real events then a far-future sentinel (q107 staging)
    * flush every real window through BOTH stages; the sentinel's own
    * windows never close, so it never reaches the sink. The oracle
    * recomputes the two-tier rollup relationally on epoch-second
    * buckets; cents are pre-rounded integers (repo rounding rule). */
  private def q188(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables(s, dir, "events").select("ts", "event_type", "value")
    val d = graft.Scratch.freshPath("chain_")
    val t0 = System.currentTimeMillis() - 120000
    // one pass: parallel staging + observed sentinel timestamp (round 13)
    val maxTs = stageArrival(ev, d, "b0", t0, "ts")
    val sentinel = Seq((new java.sql.Timestamp(maxTs.getTime + 1000L * 3600 * 1000),
      "sentinel", 0.0)).toDF("ts", "event_type", "value")
    val ss = drainSession(s)
    val schema = ss.read.parquet(d.toString).schema
    val agg = chainedAgg(ss.readStream.schema(schema).parquet(d.toString))
    val q = agg.writeStream.format("memory").queryName("stream_chained")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable() // real data + zero-data watermark promotion
      writeBatchFile(sentinel, d.resolve("b1.parquet"), t0 + 30000)
      q.processAllAvailable() // watermark passes every hour → both stages flush
    } finally q.stop()
    ss.table("stream_chained")
      .filter(col("event_type") =!= "sentinel")
      .select(col("window.start").as("hour"), col("event_type"),
        col("n_events"), col("sum_cents"), col("n_buckets"), col("max_bucket_n"))
      .orderBy("hour", "event_type")
  }

  /** BOUNDED-STATE streaming dedup: `dropDuplicatesWithinWatermark` — the
    * scale-correct replacement for q63's plain dropDuplicates, whose key
    * state grows with stream HISTORY (unbounded at 100 TB/day). Here a
    * key's state is evicted once the watermark passes its event time +
    * the 2-hour delay, so state is bounded by the late-data horizon ×
    * key arrival rate regardless of how long the stream runs. Dedup key
    * is (user_id, event_type, epoch-day): the "count each user/type at
    * most once per day, tolerating redelivery inside the horizon"
    * metering shape. The streaming query does ONLY the dedup (append
    * mode — first-seen rows emit immediately); the per-type rollup runs
    * as a batch aggregation over the sink table. In this single-file
    * staging everything arrives in micro-batch 0 (watermark still at
    * epoch), so no state has expired and the emitted set is EXACTLY the
    * distinct key set — the oracle is a plain relational DISTINCT; the
    * cross-batch eviction behavior this API exists for is the q107
    * two-batch machinery and is state-size, not result, semantics. */
  private def q196(s: SparkSession, dir: String): DataFrame = {
    run(s, ss => stream(ss, dir)
      .withColumn("day", expr("unix_micros(ts) div 86400000000"))
      .select("user_id", "event_type", "day", "ts")
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("user_id", "event_type", "day"),
      "stream_dedup_wm", OutputMode.Append())
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_user_days"))
      .orderBy("event_type")
  }

  /** Streaming UPSERT sink: `foreachBatch` applying CDC MERGE semantics
    * to a versioned parquet target, IDEMPOTENT under micro-batch retry —
    * the contract every at-least-once foreachBatch sink must honor and
    * the streaming twin of q199's batch MERGE. Events become a CDC feed
    * (op = 'D' for error events, else 'U' carrying integer cents);
    * within a batch, last-writer-wins per user via max(struct(ts,
    * event_id, ...)) — one aggregation, no per-user sort. Each batch b
    * writes target_v{b} from target_v{b−1} + resolved delta (full-outer
    * clause resolution), so REPROCESSING b re-reads the intact v{b−1}
    * and rewrites v{b} byte-identically: the merge is applied TWICE per
    * batch and the query emits the digests-equal proof alongside the
    * final-state digest (the Delta-txn-log guarantee reconstructed on
    * plain parquet). Two ts-ordered staged files → two real micro-batches,
    * so batch-sequential apply provably equals global last-writer-wins —
    * which is exactly what the relational oracle computes. */
  private def q200(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
    val Row2 = ev.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
    val midUs = (Row2.getLong(0) + Row2.getLong(1)) / 2
    val d = graft.Scratch.freshPath("mergesink_")
    val tgtRoot = graft.Scratch.freshPath("mergetgt_")
    val t0 = System.currentTimeMillis() - 120000
    writeBatchFile(ev.filter(unix_micros(col("ts")) <= midUs), d.resolve("b0.parquet"), t0)
    writeBatchFile(ev.filter(unix_micros(col("ts")) > midUs), d.resolve("b1.parquet"), t0 + 30000)
    val schema = s.read.parquet(d.resolve("b0.parquet").toString).schema

    def digest(df: DataFrame): (Long, Long, Long) = {
      val r = df.agg(count(lit(1)), coalesce(sum("cents"), lit(0L)),
        coalesce(sum(expr(
          "cast(conv(substring(md5(concat_ws('|', user_id, cents)), 1, 8), 16, 10) as bigint)")),
          lit(0L))).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    var lastVersion = -1L
    var idempotent = true
    def mergeBatch(batch: DataFrame, batchId: Long): Unit = {
      val delta = batch
        .groupBy("user_id")
        .agg(max(struct(col("ts"), col("event_id"),
          when(col("event_type") === "error", "D").otherwise("U").as("op"),
          col("cents"))).as("last"))
        .select(col("user_id"), col("last.op").as("op"), col("last.cents").as("s_cents"))
      val bs = batch.sparkSession // single-session merge join (round 13)
      val prevState =
        if (batchId == 0) bs.createDataFrame(bs.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("cents", org.apache.spark.sql.types.LongType))))
        else bs.read.parquet(tgtRoot.resolve(s"target_v${batchId - 1}").toString)
      val next = prevState.as("t").join(delta.as("s"), Seq("user_id"), "full_outer")
        .withColumn("f_cents", when(col("s.op").isNull, col("t.cents"))
          .when(col("s.op") === "U", col("s.s_cents")))
        .filter(col("f_cents").isNotNull) // D (and D-on-absent) rows vanish
        .select(col("user_id"), col("f_cents").as("cents"))
      next.write.mode("overwrite").parquet(tgtRoot.resolve(s"target_v$batchId").toString)
      lastVersion = math.max(lastVersion, batchId)
    }
    // drain clone for the checkpoint-manager conf (round 13); mergeBatch
    // reads/writes its versioned targets through the BATCH's own session
    // so every frame in the merge join shares one session
    val q = drainSession(s).readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(d.toString)
      .writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBatch(batch, batchId)
        val first = digest(s.read.parquet(tgtRoot.resolve(s"target_v$batchId").toString))
        mergeBatch(batch, batchId) // simulated retry: re-reads v{b-1}, rewrites v{b}
        val second = digest(s.read.parquet(tgtRoot.resolve(s"target_v$batchId").toString))
        idempotent &&= first == second
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    require(lastVersion >= 1, "expected two micro-batches")
    val fin = s.read.parquet(tgtRoot.resolve(s"target_v$lastVersion").toString)
    fin.agg(count(lit(1)).as("n_users"), sum("cents").as("sum_cents"),
        sum(expr(
          "cast(conv(substring(md5(concat_ws('|', user_id, cents)), 1, 8), 16, 10) as bigint)"))
          .as("checksum"))
      .withColumn("idempotent_ok", lit(idempotent))
  }

  /** Streaming ingest into the genuine-LMDB store: each micro-batch lands
    * via [[graft.sinks.LmdbStore.append]] as additional immutable
    * environments behind a manifest re-commit — the continuous form of the
    * reference's LMDB ingest (lmdb_util.py:126-128 txn batches), with the
    * single-writer wall replaced by per-partition envs per batch. Two
    * ts-split staged files force ≥ 2 real micro-batches, so the
    * append-loop (manifest grows, earlier shards untouched) is actually
    * exercised; scan-back must hash-match every event's props payload. */
  private def q206(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables(s, dir, "events")
      .filter(col("event_id") % 20 === 0)
      .select(col("event_id"), col("ts"), col("props"))
    val bounds = ev.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
    val midUs = (bounds.getLong(0) + bounds.getLong(1)) / 2
    val d = graft.Scratch.freshPath("lmdbstream_")
    val t0 = System.currentTimeMillis() - 120000
    writeBatchFile(ev.filter(unix_micros(col("ts")) <= midUs), d.resolve("b0.parquet"), t0)
    writeBatchFile(ev.filter(unix_micros(col("ts")) > midUs), d.resolve("b1.parquet"), t0 + 30000)
    val schema = s.read.parquet(d.resolve("b0.parquet").toString).schema

    val store = graft.Scratch.fresh("stream_lmdb_")
    new java.io.File(store).delete()
    graft.sinks.LmdbStore.create(store)
    var nBatches = 0L
    // drain clone for the checkpoint-manager conf (round 13)
    val q = drainSession(s).readStream.schema(schema).option("maxFilesPerTrigger", "1")
      .parquet(d.toString)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.sinks.LmdbStore.appendBatch(
          batch.select(format_string("e%010d", col("event_id")).as("key"),
            col("props").cast("binary").as("value")), store, batchId)
        nBatches += 1
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    // foreachBatch's contract is at-least-once: simulate the failure-retry
    // replay of batch 0 — the manifest's batch ledger makes it a no-op, and
    // because n_stored/entries_stat below count the POST-replay store, the
    // existing equalities prove no key was double-appended
    val replayed = graft.sinks.LmdbStore.appendBatch(
      ev.select(format_string("e%010d", col("event_id")).as("key"),
        col("props").cast("binary").as("value")), store, 0L)

    val back = graft.sinks.LmdbStore.read(s, store)
      .select(col("key"), md5(col("value")).as("h"))
    val expected = ev.select(format_string("e%010d", col("event_id")).as("key"),
      md5(col("props").cast("binary")).as("h"))
    val matched = back.join(expected, Seq("key", "h")).count()
    val entriesStat = graft.sinks.LmdbStore.auditAll(store).map(_._2.entries).sum
    Seq((expected.count(), back.count(), matched, entriesStat, nBatches >= 2, !replayed))
      .toDF("n_expected", "n_stored", "n_hash_matched", "entries_stat",
        "multi_batch", "exactly_once")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q206_stream_to_lmdb" -> (q206 _),
    "q200_stream_merge_sink" -> (q200 _),
    "q196_stream_dedup_bounded" -> (q196 _),
    "q188_stream_chained_agg" -> (q188 _),
    "q187_stream_mapstate" -> (q187 _),
    "q186_stream_timers" -> (q186 _),
    "q185_stream_outer_join" -> (q185 _),
    "q173_stream_transform_state" -> (q173 _),
    "q144_stream_trending" -> (q144 _),
    "q119_stream_static_join" -> (q119 _),
    "q107_stream_late_data" -> (q107 _),
    "q101_stream_corpus_ingest" -> (q101 _),
    "q78_stream_to_kvstore" -> (q78 _),
    "q60_stream_tumbling" -> (q60 _),
    "q61_stream_sliding" -> (q61 _),
    "q62_stream_session" -> (q62 _),
    "q63_stream_dedup" -> (q63 _),
    "q64_stream_stateful" -> (q64 _),
    "q85_stream_stream_join" -> (q85 _)
  )

  /** Streaming trending top-k: tumbling 6-hour windows aggregated IN the
    * stream (complete mode), then the serving-side rank over the
    * materialized state — the lambda-architecture split every trending
    * dashboard uses (streams aggregate, the serving layer ranks; ranking
    * inside the stream would need per-trigger re-sorts of all state).
    * Window starts align to the epoch in both engines (floor of epoch
    * seconds to 21600), and the rank breaks count-ties by event_type, so
    * the top-2 cut is deterministic. */
  private def q144(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val served = run(s, ss => stream(ss, dir)
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n")),
      "stream_trending", OutputMode.Complete())
    val w = Window.partitionBy("ws").orderBy(col("n").desc, col("event_type"))
    served.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 2)
      .orderBy("ws", "rk")
  }

  val oracles: Map[String, String] = Map(
    // batch-sequential last-writer-wins over ts-ordered batches equals
    // GLOBAL last-writer-wins per user (later batch always overrides),
    // so the oracle is one window; idempotent_ok is the in-query retry
    // proof emitted as a literal (q77/q116 invariant pattern)
    "q200_stream_merge_sink" ->
      """WITH e AS (SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
        |    event_id,
        |    CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |r AS (SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts_us DESC, event_id DESC) AS rk FROM e),
        |f AS (SELECT user_id, cents FROM r WHERE rk = 1 AND op = 'U')
        |SELECT CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  CAST(sum(('0x' || substring(md5(CAST(user_id AS VARCHAR) || '|' ||
        |    CAST(cents AS VARCHAR)), 1, 8))::BIGINT) AS BIGINT) AS checksum,
        |  TRUE AS idempotent_ok
        |FROM f""".stripMargin,
    "q196_stream_dedup_bounded" ->
      """WITH d AS (SELECT DISTINCT user_id, event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day FROM events)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_user_days
        |FROM d GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q188_stream_chained_agg" ->
      """WITH e AS (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS es,
        |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |b AS (SELECT event_type, es // 1800 AS b30,
        |    CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS cents
        |  FROM e GROUP BY 1, 2)
        |SELECT CAST(to_timestamp(((b30 * 1800) // 3600) * 3600) AS TIMESTAMP) AS hour,
        |  event_type,
        |  CAST(sum(n) AS BIGINT) AS n_events,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  CAST(count(*) AS BIGINT) AS n_buckets,
        |  CAST(max(n) AS BIGINT) AS max_bucket_n
        |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q144_stream_trending" ->
      """WITH a AS (SELECT CAST(to_timestamp((CAST(floor(epoch(ts)) AS BIGINT) // 21600) * 21600) AS TIMESTAMP) AS ws,
        |    event_type, CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT ws, event_type, n,
        |    CAST(row_number() OVER (PARTITION BY ws ORDER BY n DESC, event_type) AS BIGINT) AS rk
        |  FROM a)
        |SELECT ws, event_type, n, rk FROM r WHERE rk <= 2 ORDER BY ws, rk""".stripMargin,
    "q119_stream_static_join" ->
      """SELECT c_mktsegment AS segment, event_type,
        |  CAST(count(*) AS BIGINT) AS n, round(sum(value), 3) AS sum_value
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // replay of the engine's late-data rule: watermark after the even-id
    // batch is max(even ts) floored to ms minus 10 min; an odd-id (late)
    // row survives iff its hour-window end is strictly above that watermark
    "q107_stream_late_data" ->
      """WITH a AS (SELECT event_id, ts, event_type FROM events WHERE event_id % 2 = 0),
        |wm AS (SELECT date_trunc('millisecond', max(ts)) - INTERVAL 10 MINUTE AS w FROM a),
        |b AS (SELECT e.event_id, e.ts, e.event_type FROM events e, wm
        |      WHERE e.event_id % 2 = 1
        |        AND date_trunc('hour', e.ts) + INTERVAL 1 HOUR > wm.w),
        |u AS (SELECT * FROM a UNION ALL SELECT * FROM b)
        |SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
        |  CAST(sum(event_id) AS BIGINT) AS id_sum
        |FROM u GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q101_stream_corpus_ingest" ->
      """WITH f AS (SELECT source, md5(text) AS fp,
        |  CAST(len(list_filter(regexp_split_to_array(text,'\s+'), t -> t <> '')) AS BIGINT) AS nw
        | FROM documents
        | WHERE len(list_filter(regexp_split_to_array(text,'\s+'), t -> t <> '')) >= 5
        |   AND n_chars >= 100),
        |d AS (SELECT source, fp, min(nw) AS nw FROM f GROUP BY 1, 2)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(nw) AS BIGINT) AS sum_tokens
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    // the streamed-store invariant is oracle-computable: everything the
    // filter admits must land in the store exactly once (post-replay
    // counts equal pre-replay counts ⟺ the ledger no-opped the retry),
    // every stored value must hash-match its event, the key listing is
    // LEAST(10, total), and the batch/replay outcomes are structural
    "q78_stream_to_kvstore" ->
      """SELECT count(*) AS n_expected, count(*) AS n_stored,
        | count(*) AS n_hash_matched,
        | CAST(LEAST(10, count(*)) AS BIGINT) AS n_key_sample,
        | TRUE AS multi_batch, TRUE AS exactly_once
        |FROM events WHERE event_id % 20 = 0""".stripMargin,
    // q206: every streamed event must scan back hash-identical from the
    // appended LMDB envs; entry total is exact, multi-batch is structural.
    "q206_stream_to_lmdb" ->
      """SELECT count(*) AS n_expected, count(*) AS n_stored,
        | count(*) AS n_hash_matched, count(*) AS entries_stat,
        | TRUE AS multi_batch, TRUE AS exactly_once
        |FROM events WHERE event_id % 20 = 0""".stripMargin,
    "q85_stream_stream_join" ->
      """WITH c AS (SELECT user_id, ts AS c_ts FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, ts AS p_ts FROM events WHERE event_type = 'purchase'),
        |j AS (SELECT c.user_id, date_trunc('hour', c.c_ts) AS click_hour
        |      FROM c JOIN p ON c.user_id = p.user_id
        |       AND p.p_ts >= c.c_ts AND p.p_ts <= c.c_ts + INTERVAL 30 MINUTE)
        |SELECT click_hour, count(*) AS n_pairs, count(DISTINCT user_id) AS n_users
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    "q60_stream_tumbling" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
        | round(sum(value),3) AS sum_value
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q61_stream_sliding" ->
      """WITH h AS (SELECT date_trunc('hour', ts) AS hr, user_id FROM events),
        |w AS (SELECT hr AS w_start FROM h UNION SELECT hr - INTERVAL 1 HOUR FROM h)
        |SELECT w.w_start, count(*) AS n, count(DISTINCT user_id) AS n_users
        |FROM (SELECT DISTINCT w_start FROM w) w
        |JOIN h ON h.hr >= w.w_start AND h.hr < w.w_start + INTERVAL 2 HOUR
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q62_stream_session" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events),
        |x AS (SELECT user_id, ms - lag(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS d FROM e),
        |y AS (SELECT user_id, CASE WHEN d IS NULL OR d >= 1800000 THEN 1 ELSE 0 END AS is_new FROM x)
        |SELECT user_id, CAST(sum(is_new) AS BIGINT) AS n_sessions, count(*) AS n_events
        |FROM y GROUP BY 1 ORDER BY 1""".stripMargin,
    "q63_stream_dedup" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_unique_users
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q64_stream_stateful" ->
      """SELECT user_id, count(*) AS n_events, round(sum(value),3) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q173_stream_transform_state" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(max(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS max_cents
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q187_stream_mapstate" ->
      """SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM events GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin,
    "q186_stream_timers" ->
      """WITH c AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es
        |  FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es
        |  FROM events WHERE event_type = 'purchase'),
        |ab AS (SELECT c.user_id, c.es FROM c
        |  WHERE NOT EXISTS (SELECT 1 FROM p
        |    WHERE p.user_id = c.user_id AND p.es >= c.es AND p.es <= c.es + 1800))
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_abandoned,
        |  CAST(min(es) AS BIGINT) AS first_abandoned_es
        |FROM ab GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q185_stream_outer_join" ->
      """WITH c AS (SELECT user_id, ts AS c_ts FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id AS p_user, ts AS p_ts FROM events WHERE event_type = 'purchase'),
        |j AS (SELECT c.user_id, c.c_ts, p.p_ts
        |  FROM c LEFT JOIN p ON c.user_id = p.p_user
        |    AND p.p_ts >= c.c_ts AND p.p_ts <= c.c_ts + INTERVAL 30 MINUTE)
        |SELECT date_trunc('hour', c_ts) AS click_hour,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(p_ts) AS BIGINT) AS n_matched,
        |  CAST(count(*) - count(p_ts) AS BIGINT) AS n_unmatched,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM j GROUP BY click_hour ORDER BY click_hour""".stripMargin
  )
}
