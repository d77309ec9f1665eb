package graft.sinks

import java.io.{BufferedOutputStream, DataOutputStream, File, FileOutputStream, RandomAccessFile}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

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
  * Kept from the reference: batched flushes every `batchSize` puts
  * (txn batching, lmdb_util.py:126-128), refuse-nonempty-dir guard
  * (v2/lmdb_npy.py:32-33), and the sidecar meta line per record
  * `key.npy (H,W,C) dtype` (v2/lmdb_npy.py:47-48).
  *
  * Shard layout: sequential records [keyLen:int][key][valLen:int][val],
  * with a `shard-NNNNN.idx` sidecar of `key offset len` lines for point
  * lookups (S10) and key iteration (S11).
  */
object KvStore {

  val DefaultBatchSize = 5000

  final class ShardWriter(dir: File, shardId: Int, batchSize: Int = DefaultBatchSize) {
    private val dataFile = new File(dir, f"shard-$shardId%05d.kv")
    private val idxFile = new File(dir, f"shard-$shardId%05d.idx")
    private val metaFile = new File(dir, f"shard-$shardId%05d.meta.txt")
    // write to a task-attempt temp name, atomic-rename on close: retried or
    // speculative task attempts never corrupt a committed shard
    private val tmpFile = new File(dir,
      dataFile.getName + s".tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    private val out = new DataOutputStream(
      new BufferedOutputStream(new FileOutputStream(tmpFile), 1 << 20))
    private val idx = new StringBuilder
    private val meta = new StringBuilder
    private var offset = 0L
    private var pending = 0
    private var count = 0L

    def put(key: String, value: Array[Byte], shape: scala.collection.Seq[Int], dtype: String): Unit = {
      val kb = key.getBytes(StandardCharsets.US_ASCII)
      out.writeInt(kb.length); out.write(kb)
      out.writeInt(value.length); out.write(value)
      val recOff = offset + 8 + kb.length
      idx.append(key).append(' ').append(recOff).append(' ').append(value.length).append('\n')
      meta.append(key).append(".npy (").append(shape.mkString(",")).append(") ")
        .append(dtype).append('\n')
      offset += 8 + kb.length + value.length
      pending += 1
      count += 1
      if (pending >= batchSize) { out.flush(); pending = 0 } // txn-batch analog
    }

    /** Task commit: flush data, atomic-rename into place, write idx + meta
      * sidecars (data lands before the index that points into it). */
    def close(): Long = {
      out.flush(); out.close()
      java.nio.file.Files.move(tmpFile.toPath, dataFile.toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      java.nio.file.Files.writeString(idxFile.toPath, idx.toString)
      java.nio.file.Files.writeString(metaFile.toPath, meta.toString)
      count
    }
  }

  /** Create an empty store dir; refuses non-empty target like the reference. */
  def create(path: String): File = {
    val dir = new File(path)
    if (dir.exists && dir.listFiles() != null && dir.listFiles().nonEmpty)
      throw new IllegalStateException(s"KvStore target not empty: $path")
    dir.mkdirs()
    dir
  }

  /** Job commit: write the manifest naming every committed shard. */
  def commit(path: String): Unit = {
    val shards = new File(path).listFiles()
      .filter(_.getName.matches("shard-\\d+\\.kv")).map(_.getName).sorted
    java.nio.file.Files.writeString(
      new File(path, "_MANIFEST").toPath, shards.mkString("", "\n", "\n"))
  }

  /** Distributed write: one shard per partition of `df(key, value, shape, dtype)`. */
  def write(df: DataFrame, path: String, batchSize: Int = DefaultBatchSize): Unit = {
    create(path)
    df.foreachPartition { rows: Iterator[Row] =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var w: ShardWriter = null
      rows.foreach { r =>
        if (w == null) w = new ShardWriter(new File(path), pid, batchSize)
        w.put(r.getAs[String]("key"), r.getAs[Array[Byte]]("value"),
          r.getAs[scala.collection.Seq[Int]]("shape"), r.getAs[String]("dtype"))
      }
      if (w != null) w.close()
      ()
    }
    commit(path)
  }

  private def committedShards(path: String): Seq[File] = {
    val manifest = new File(path, "_MANIFEST")
    require(manifest.exists, s"no _MANIFEST in $path (uncommitted store)")
    java.nio.file.Files.readAllLines(manifest.toPath).toArray(Array.empty[String])
      .filter(_.nonEmpty).map(n => new File(path, n)).toSeq
  }

  private def loadIndex(shard: File): Seq[(String, Long, Int)] = {
    val idx = new File(shard.getParentFile, shard.getName.stripSuffix(".kv") + ".idx")
    java.nio.file.Files.readAllLines(idx.toPath).toArray(Array.empty[String])
      .filter(_.nonEmpty).map { line =>
        val p = line.split(' ')
        (p(0), p(1).toLong, p(2).toInt)
      }.toSeq
  }

  /** S10: point lookup across shards. */
  def get(path: String, key: String): Option[Array[Byte]] = {
    committedShards(path).iterator.flatMap { shard =>
      loadIndex(shard).collectFirst { case (k, off, len) if k == key =>
        val raf = new RandomAccessFile(shard, "r")
        try {
          raf.seek(off)
          val buf = new Array[Byte](len)
          raf.readFully(buf)
          buf
        } finally raf.close()
      }
    }.nextOption()
  }

  /** S11: sorted key iterator with optional regex filter and limit. */
  def listKeys(path: String, regex: Option[String] = None, limit: Int = Int.MaxValue): Seq[String] = {
    val rx = regex.map(_.r)
    committedShards(path).flatMap(loadIndex).map(_._1)
      .filter(k => rx.forall(_.findFirstIn(k).isDefined))
      .sorted.take(limit)
  }

  /** Scan the store back as a DataFrame (key, value) — shards in parallel. */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val shardPaths = committedShards(path).map(_.getAbsolutePath)
    spark.sparkContext.parallelize(shardPaths, math.max(shardPaths.size, 1))
      .flatMap { sp =>
        val shard = new File(sp)
        val raf = new RandomAccessFile(shard, "r")
        try loadIndex(shard).map { case (k, off, len) =>
          raf.seek(off)
          val buf = new Array[Byte](len)
          raf.readFully(buf)
          (k, buf)
        } finally raf.close()
      }.toDF("key", "value")
  }
}
