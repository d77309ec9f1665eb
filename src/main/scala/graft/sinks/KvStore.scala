package graft.sinks

import java.io.{BufferedOutputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Sharded key→bytes store — the engine's re-expression of the reference's
  * LMDB sinks (SURVEY.md S8–S11; v2/lmdb_npy.py:10-57, lmdb_util.py:9-133).
  *
  * The reference routes every record through ONE writer process (its main
  * scalability wall — v2/nii_to_lmdb_paralel.py:298-305). Here each Spark
  * partition commits its own `shard-NNNNN.kv` independently (single writer
  * PER SHARD), so the sink scales with the cluster; a `_MANIFEST` commit
  * marker makes the job-level commit atomic-ish and readers ignore
  * uncommitted shards.
  *
  * All IO goes through the Hadoop FileSystem API, so a store path may be a
  * plain local path, `file:///…`, `hdfs://…`, or `s3a://…` — the 100 TB
  * sink story needs shards to land on cluster storage, not executor-local
  * disk. Task commit stays rename-based (write to an attempt-unique temp
  * name, rename into place), which is atomic on HDFS and posix local FS.
  *
  * Kept from the reference: batched flushes every `batchSize` puts
  * (txn batching, lmdb_util.py:126-128), refuse-nonempty-dir guard
  * (v2/lmdb_npy.py:32-33), and the sidecar meta line per record
  * `key.npy (H,W,C) dtype` (v2/lmdb_npy.py:47-48).
  *
  * Shard layout: sequential records [keyLen:int][key][valLen:int][val],
  * with a `shard-NNNNN.idx` sidecar of `key offset len` lines for point
  * lookups (S10) and key iteration (S11). Keys are validated ASCII without
  * whitespace/control chars — the idx sidecar is space-delimited and the
  * reference's LMDB keys are ASCII, so reject instead of silently mangling
  * ('?' substitution could collide two distinct keys).
  */
object KvStore {

  val DefaultBatchSize = 5000

  private def fsFor(path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(new Configuration()), p)
  }

  /** Keys must be printable ASCII with no spaces: the idx sidecar is
    * space-delimited, and non-ASCII would silently '?'-collide. */
  private[sinks] def validateKey(key: String): String = {
    require(key.nonEmpty, "empty key")
    require(key.forall(c => c > ' ' && c < 127),
      s"key must be printable ASCII without spaces/control chars: '$key'")
    key
  }

  final class ShardWriter(dirPath: String, shardId: Long, batchSize: Int = DefaultBatchSize) {
    private val (fs, dir) = fsFor(dirPath)
    private val dataPath = new Path(dir, f"shard-$shardId%05d.kv")
    private val idxPath = new Path(dir, f"shard-$shardId%05d.idx")
    private val metaPath = new Path(dir, f"shard-$shardId%05d.meta.txt")
    private val bloomPath = new Path(dir, f"shard-$shardId%05d.bloom")
    // write to a task-attempt temp name, rename on close: retried or
    // speculative task attempts never corrupt a committed shard
    private val tmpPath = new Path(dir,
      dataPath.getName + s".tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    private val out = new DataOutputStream(
      new BufferedOutputStream(fs.create(tmpPath, true), 1 << 20))
    private val idx = new StringBuilder
    private val meta = new StringBuilder
    private var offset = 0L
    private var pending = 0
    private var count = 0L

    private val keyHashes = new scala.collection.mutable.ArrayBuffer[Long]

    def put(key: String, value: Array[Byte], shape: scala.collection.Seq[Int], dtype: String): Unit = {
      val kb = validateKey(key).getBytes(StandardCharsets.US_ASCII)
      out.writeInt(kb.length); out.write(kb)
      out.writeInt(value.length); out.write(value)
      val recOff = offset + 8 + kb.length
      idx.append(key).append(' ').append(recOff).append(' ').append(value.length).append('\n')
      meta.append(key).append(".npy (").append(shape.mkString(",")).append(") ")
        .append(dtype).append('\n')
      keyHashes += KeyBloom.hashPair(kb)
      offset += 8 + kb.length + value.length
      pending += 1
      count += 1
      if (pending >= batchSize) { out.flush(); pending = 0 } // txn-batch analog
    }

    /** Task commit: flush data, write idx + meta + key-Bloom sidecars,
      * THEN rename the data file into its committed name — the rename is
      * the commit point, so a crash mid-close can never leave a
      * final-named `.kv` whose idx is missing (readers resolve records
      * through the idx; orphan sidecars without a `.kv` are inert —
      * `commit()` manifests only `.kv` files). */
    def close(): Long = {
      out.flush(); out.close()
      writeString(fs, idxPath, idx.toString)
      writeString(fs, metaPath, meta.toString)
      val bloom = KeyBloom.sized(keyHashes.length.toLong)
      keyHashes.foreach(bloom.addPair)
      val o = fs.create(bloomPath, true)
      try o.write(KeyBloom.serialize(bloom)) finally o.close()
      if (fs.exists(dataPath)) fs.delete(dataPath, false)
      require(fs.rename(tmpPath, dataPath), s"rename $tmpPath -> $dataPath failed")
      count
    }

    /** Task abort: close the stream and remove this attempt's tmp data
      * file — a losing speculative or failed attempt must not leak an
      * open fd or a `.tmp-` file into the store directory forever. Only
      * the attempt-UNIQUE tmp is touched: the committed-name sidecars may
      * belong to a concurrently committing winner (any retry that does
      * commit overwrites them wholesale in close()). */
    def abort(): Unit = {
      try out.close() catch { case _: java.io.IOException => }
      try if (fs.exists(tmpPath)) fs.delete(tmpPath, false)
      catch { case _: java.io.IOException => }
      ()
    }
  }

  private def writeString(fs: FileSystem, p: Path, s: String): Unit = {
    val o = fs.create(p, true)
    try o.write(s.getBytes(StandardCharsets.UTF_8)) finally o.close()
  }

  private def readBytes(fs: FileSystem, p: Path): Array[Byte] = {
    val in = fs.open(p)
    try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n > 0) { bos.write(buf, 0, n); n = in.read(buf) }
      bos.toByteArray
    } finally in.close()
  }

  private def readString(fs: FileSystem, p: Path): String =
    new String(readBytes(fs, p), StandardCharsets.UTF_8)

  // Bloom sidecars cache keyed by (path, mtime, len) — one getFileStatus
  // RPC per get instead of a full sidecar read, and a store rewritten at
  // the same path gets a fresh entry (stale bitmaps would manufacture the
  // false negatives the Bloom contract forbids).
  private val bloomCache =
    new java.util.concurrent.ConcurrentHashMap[String, Option[KeyBloom.Bloom]]()

  private def shardBloom(fs: FileSystem, shard: Path): Option[KeyBloom.Bloom] = {
    val bloomPath = new Path(shard.getParent, shard.getName.stripSuffix(".kv") + ".bloom")
    val st = try fs.getFileStatus(bloomPath)
    catch { case _: java.io.FileNotFoundException => null }
    if (st == null) None // pre-Bloom store: caller must probe the idx
    else bloomCache.computeIfAbsent(
      s"$bloomPath|${st.getModificationTime}|${st.getLen}",
      _ => KeyBloom.deserialize(readBytes(fs, bloomPath)))
  }

  /** Write a UTF-8 text sidecar (e.g. a run-level `dataset_meta.txt`) into
    * the store dir through the same FS abstraction as the shards. */
  def writeText(storePath: String, name: String, content: String): Unit = {
    val (fs, dir) = fsFor(storePath)
    writeString(fs, new Path(dir, name), content)
  }

  /** Read a text sidecar back. */
  def readText(storePath: String, name: String): String = {
    val (fs, dir) = fsFor(storePath)
    readString(fs, new Path(dir, name))
  }

  /** Create an empty store dir; refuses non-empty target like the reference. */
  def create(path: String): Unit = {
    val (fs, dir) = fsFor(path)
    if (fs.exists(dir) && fs.listStatus(dir).nonEmpty)
      throw new IllegalStateException(s"KvStore target not empty: $path")
    fs.mkdirs(dir)
  }

  /** Create an empty COMMITTED store (zero shards, empty manifest) so a
    * purely append-based flow — e.g. a streaming foreachBatch sink — can
    * start from batch 0 (the LmdbStore.create symmetry). */
  def createCommitted(path: String): Unit = {
    create(path)
    commitManifest(path, Nil, Nil)
  }

  /** Manifest commit: tmp + atomic overwrite-rename (FileContext, so the
    * HDFS/local rename really replaces), shard list in NUMERIC order and
    * ledger lines in one atomic unit — a reader mid-commit sees the
    * complete old manifest or the complete new one, never a truncation. */
  private def commitManifest(path: String, shards: Seq[String],
      ledger: Seq[String]): Unit = {
    val (_, dir) = fsFor(path)
    val sorted = shards.sortBy(_.stripPrefix("shard-").stripSuffix(".kv").toLong)
    val tmp = new Path(dir, "_MANIFEST.tmp-" +
      java.util.UUID.randomUUID().toString.take(8))
    val fs2 = tmp.getFileSystem(new Configuration())
    writeString(fs2, tmp, (ledger ++ sorted).mkString("", "\n", "\n"))
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(dir.toUri, new Configuration())
    fc.rename(tmp, new Path(dir, "_MANIFEST"),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Job commit (library path). For a LEGACY store (create() +
    * ShardWriter, no manifest yet): manifest = every `.kv` currently in
    * the dir, NUMERIC shard order (lexicographic flips at shard 100000).
    * For a MANIFEST-BEARING store the contract is stricter: any existing
    * `#batch` ledger lines are carried over (erasing them would re-open
    * already-committed batch ids to replay), and unmanifested `.kv`
    * files are treated as the residue of a crashed append attempt and
    * swept FIRST — adoption would double-count a batch whose replay
    * later no-ops (this includes a FIRST appendBatch crash, where the
    * manifest exists via createCommitted with zero ledger lines). Add
    * data to a manifest-bearing store through append()/appendBatch(),
    * never by dropping bare shards next to it. */
  def commit(path: String): Unit = {
    val (fs, dir) = fsFor(path)
    // Sweep whenever a manifest EXISTS, not only when it already carries
    // ledger lines: a ledger-managed store whose very first appendBatch
    // crashed has a manifest (createCommitted) with zero `#batch` lines,
    // and without the sweep the directory listing below would adopt the
    // crashed attempt's orphan `.kv` files — double-counting the batch
    // when its replay later no-ops. The legacy create()+ShardWriter flow
    // has no manifest before first commit, so it stays unswept.
    val hasManifest = fs.exists(new Path(dir, "_MANIFEST"))
    val prevLedger =
      if (hasManifest) manifestLines(path).filter(_.startsWith("#")) else Nil
    if (hasManifest) sweepUncommitted(path)
    val shards = fs.listStatus(dir)
      .map(_.getPath.getName).filter(_.matches("shard-\\d+\\.kv")).toSeq
    commitManifest(path, shards, prevLedger)
  }

  /** Distributed write: one shard per partition of `df(key, value, shape,
    * dtype)`, through the DataSource V2 sink ([[KvStoreSink]]) — the
    * `_MANIFEST` is assembled from the commit-coordinator-approved task
    * attempts, so aborted/speculative duplicates can never leak a shard
    * into the committed set. */
  def write(df: DataFrame, path: String, batchSize: Int = DefaultBatchSize): Unit =
    df.select("key", "value", "shape", "dtype")
      .write.format("kvstore")
      .option("path", path)
      .option("batchSize", batchSize)
      .mode("append")
      .save()

  /** Append `df` as new shards AFTER the committed max (requires an
    * existing manifest); goes through the same coordinator-gated DSv2
    * sink, whose job commit merges old shards + new shards + carried
    * ledger lines into one atomic manifest rename. */
  def append(df: DataFrame, path: String, batchSize: Int = DefaultBatchSize): Unit =
    appendInternal(df, path, batchSize, batchId = None)

  /** EXACTLY-ONCE batch append for at-least-once callers (a streaming
    * foreachBatch replays its batch after a failure): committed batch ids
    * ride IN the manifest (`#batch:<id>` ledger lines, so shard list and
    * ledger commit in one atomic rename), a replayed id is a no-op, and
    * files left by a crashed attempt (shards on disk but not in the
    * committed manifest, task-attempt `.tmp-*`) are swept before writing
    * — without the sweep an orphan `.kv` would be adopted by the library
    * path's next directory-listing commit and double-counted. Single
    * writer per store; batch ids are only unique within ONE streaming
    * checkpoint lineage (the LmdbStore.appendBatch contract).
    * Returns true iff this call committed the batch. */
  def appendBatch(df: DataFrame, path: String, batchId: Long,
      batchSize: Int = DefaultBatchSize): Boolean = {
    if (committedBatchIds(path).contains(batchId)) return false
    sweepUncommitted(path)
    appendInternal(df, path, batchSize, batchId = Some(batchId))
    true
  }

  private def appendInternal(df: DataFrame, path: String, batchSize: Int,
      batchId: Option[Long]): Unit = {
    val ids = committedShards(path)
      .map(_.getName.stripPrefix("shard-").stripSuffix(".kv").toLong)
    val base = if (ids.isEmpty) 0L else ids.max + 1
    df.select("key", "value", "shape", "dtype")
      .write.format("kvstore")
      .option("path", path)
      .option("batchSize", batchSize)
      .option("appendTo", "true")
      .option("baseShard", base)
      .options(batchId.map(id => Map("batchId" -> id.toString)).getOrElse(Map.empty))
      .mode("append")
      .save()
  }

  /** Batch ids this store has durably committed (ledger lines of the
    * manifest; empty for stores written by non-batch flows). */
  def committedBatchIds(path: String): Set[Long] =
    manifestLines(path).filter(_.startsWith("#batch:"))
      .map(_.stripPrefix("#batch:").toLong).toSet

  /** Uncommitted residue = shard files on disk but not in the manifest (a
    * crashed job's committed-named task output) and task-attempt
    * `.tmp-*` files. Orphan sidecars of an uncommitted `.kv` go with it.
    *
    * Every swept path is LOGGED (and returned, for the spec surface):
    * from the store's own metadata, crash residue and a contract
    * violation (bare ShardWriter output dropped next to a
    * manifest-bearing store) are indistinguishable — so the deletion
    * must at minimum be observable, never silent (round-10 ADVICE). */
  private[graft] def sweepUncommitted(path: String): Seq[String] = {
    val (fs, dir) = fsFor(path)
    val committed = committedShards(path).map(_.getName).toSet
    val swept = Seq.newBuilder[String]
    fs.listStatus(dir).map(_.getPath).foreach { p =>
      val n = p.getName
      val stem = n.replaceAll("\\.(kv|idx|meta\\.txt|bloom)$", "")
      val orphan = n.matches("shard-\\d+\\.(kv|idx|meta\\.txt|bloom)") &&
        !committed(stem + ".kv")
      if (n.contains(".tmp-") || orphan) {
        fs.delete(p, true)
        swept += p.toString
        System.err.println(s"[kvstore] swept uncommitted residue: $p")
      }
    }
    swept.result()
  }

  private[graft] def manifestLines(path: String): Seq[String] = {
    val (fs, dir) = fsFor(path)
    val manifest = new Path(dir, "_MANIFEST")
    require(fs.exists(manifest), s"no _MANIFEST in $path (uncommitted store)")
    readString(fs, manifest).split('\n').iterator.filter(_.nonEmpty).toSeq
  }

  private def committedShards(path: String): Seq[Path] = {
    val (_, dir) = fsFor(path)
    // only shard lines name files; `#`-prefixed lines are the batch
    // ledger, invisible to shard walks by construction of the filter
    manifestLines(path).filter(_.matches("shard-\\d+\\.kv"))
      .map(n => new Path(dir, n))
  }

  private[sinks] def mergeCommit(path: String, newShards: Seq[String],
      appendMode: Boolean, batchId: Option[Long]): Unit = {
    val (prevShards, prevLedger) =
      if (appendMode) {
        val lines = manifestLines(path)
        (lines.filter(_.matches("shard-\\d+\\.kv")), lines.filter(_.startsWith("#")))
      } else (Nil, Nil)
    val ledger = (prevLedger ++ batchId.map(id => s"#batch:$id")).distinct
    commitManifest(path, prevShards ++ newShards, ledger)
  }

  private def loadIndex(fs: FileSystem, shard: Path): Seq[(String, Long, Int)] = {
    val idx = new Path(shard.getParent, shard.getName.stripSuffix(".kv") + ".idx")
    readString(fs, idx).split('\n').iterator.filter(_.nonEmpty).map { line =>
      val p = line.split(' ')
      (p(0), p(1).toLong, p(2).toInt)
    }.toSeq
  }

  /** S10: point lookup across shards. Each shard's `.bloom` sidecar is
    * consulted first (when present) so shards that cannot hold the key
    * skip their idx load entirely — K bitmap tests + ~1 idx read across
    * K shards instead of K idx reads. */
  def get(path: String, key: String): Option[Array[Byte]] = {
    val (fs, _) = fsFor(path)
    val kb = key.getBytes(StandardCharsets.US_ASCII)
    committedShards(path).iterator.flatMap { shard =>
      if (!shardBloom(fs, shard).forall(_.mightContain(kb))) None
      else loadIndex(fs, shard).collectFirst { case (k, off, len) if k == key =>
        val in = fs.open(shard)
        try {
          val buf = new Array[Byte](len)
          in.readFully(off, buf, 0, len)
          buf
        } finally in.close()
      }
    }.nextOption()
  }

  /** S11: sorted key iterator with optional regex filter and limit. */
  def listKeys(path: String, regex: Option[String] = None, limit: Int = Int.MaxValue): Seq[String] = {
    val (fs, _) = fsFor(path)
    val rx = regex.map(_.r)
    committedShards(path).flatMap(loadIndex(fs, _)).map(_._1)
      .filter(k => rx.forall(_.findFirstIn(k).isDefined))
      .sorted.take(limit)
  }

  /** Scan the store back as a DataFrame (key, value) — shards in parallel. */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val shardPaths = committedShards(path).map(_.toString)
    spark.sparkContext.parallelize(shardPaths, math.max(shardPaths.size, 1))
      .flatMap { sp =>
        val (fs, shard) = fsFor(sp)
        val in = fs.open(shard)
        try loadIndex(fs, shard).map { case (k, off, len) =>
          val buf = new Array[Byte](len)
          in.readFully(off, buf, 0, len)
          (k, buf)
        } finally in.close()
      }.toDF("key", "value")
  }
}
