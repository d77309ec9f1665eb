package graft.sinks

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** KvStore as a DataSource V2 `BatchWrite` (SURVEY.md S8 as a real sink,
  * not `foreachPartition` library code).
  *
  * What the V2 wiring buys over the library path:
  *  - the job-level `_MANIFEST` is assembled from the WriterCommitMessages
  *    of exactly the task attempts Spark's OutputCommitCoordinator
  *    committed — an aborted or speculative-duplicate attempt can never
  *    leak a shard into the manifest (the library path listed the
  *    directory instead);
  *  - `abort()` cleans up both task- and job-level leftovers;
  *  - the sink composes with everything that emits a DataFrame:
  *    `df.write.format("kvstore").option("path", dir).mode("append").save()`.
  *
  * Shard naming, record framing, idx/meta sidecars, batched flushes and
  * the refuse-nonempty guard are shared with [[KvStore]] (one ShardWriter
  * per task), so stores written through either path read back identically.
  */
class KvStoreSink extends TableProvider with DataSourceRegister {
  override def shortName(): String = "kvstore"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KvStoreSink.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new KvSinkTable(
      Option(opts.get("path")).getOrElse(
        throw new IllegalArgumentException("kvstore sink requires option(\"path\", ...)")),
      opts.getOrDefault("batchSize", KvStore.DefaultBatchSize.toString).toInt,
      opts.getOrDefault("appendTo", "false").toBoolean,
      opts.getOrDefault("baseShard", "0").toLong,
      Option(opts.get("batchId")).map(_.toLong))
  }
}

object KvStoreSink {
  val schema: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("value", BinaryType, nullable = false),
    StructField("shape", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("dtype", StringType, nullable = false)))
}

private[sinks] class KvSinkTable(path: String, batchSize: Int,
    appendMode: Boolean, baseShard: Long, batchId: Option[Long])
    extends Table with SupportsWrite {
  override def name(): String = s"kvstore:$path"
  override def schema(): StructType = KvStoreSink.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = new WriteBuilder {
    private val s = info.schema()
    private def idx(n: String): Int = {
      val i = s.fieldIndex(n)
      i
    }
    override def build(): Write = new Write {
      override def toBatch: BatchWrite =
        new KvBatchWrite(path, batchSize, appendMode, baseShard, batchId,
          idx("key"), idx("value"), idx("shape"), idx("dtype"))
    }
  }
}

private[sinks] case class KvShardCommit(shardName: String, count: Long)
    extends WriterCommitMessage

private[sinks] class KvBatchWrite(path: String, batchSize: Int,
    appendMode: Boolean, baseShard: Long, batchId: Option[Long],
    keyIdx: Int, valIdx: Int, shapeIdx: Int, dtypeIdx: Int) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    if (appendMode) KvStore.manifestLines(path) // require a committed store
    else KvStore.create(path) // driver-side: refuse a non-empty target up front
    new KvWriterFactory(path, batchSize, baseShard, keyIdx, valIdx, shapeIdx, dtypeIdx)
  }

  override def useCommitCoordinator(): Boolean = true

  /** Job commit: manifest = exactly the coordinator-committed shards (in
    * append mode merged with the prior manifest's shards + carried ledger
    * lines, plus this batch's `#batch:<id>` if any), committed in one
    * atomic rename. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val shards = messages.collect { case KvShardCommit(n, c) if c > 0 => n }.toSeq
    KvStore.mergeCommit(path, shards, appendMode, batchId)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(new Configuration())
    messages.collect { case KvShardCommit(n, _) => n }.foreach { n =>
      Seq(n, n.stripSuffix(".kv") + ".idx", n.stripSuffix(".kv") + ".meta.txt",
        n.stripSuffix(".kv") + ".bloom")
        .foreach(f => fs.delete(new Path(p, f), false))
    }
  }
}

private[sinks] class KvWriterFactory(path: String, batchSize: Int, baseShard: Long,
    keyIdx: Int, valIdx: Int, shapeIdx: Int, dtypeIdx: Int) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new KvDataWriter(path, baseShard + partitionId, batchSize, keyIdx, valIdx, shapeIdx, dtypeIdx)
}

private[sinks] class KvDataWriter(path: String, shardId: Long, batchSize: Int,
    keyIdx: Int, valIdx: Int, shapeIdx: Int, dtypeIdx: Int)
    extends DataWriter[InternalRow] {

  private var writer: KvStore.ShardWriter = _
  private var count = 0L

  override def write(row: InternalRow): Unit = {
    if (writer == null) writer = new KvStore.ShardWriter(path, shardId, batchSize)
    writer.put(
      row.getUTF8String(keyIdx).toString,
      row.getBinary(valIdx),
      row.getArray(shapeIdx).toIntArray().toIndexedSeq,
      row.getUTF8String(dtypeIdx).toString)
    count += 1
  }

  override def commit(): WriterCommitMessage = {
    if (writer != null) writer.close()
    KvShardCommit(f"shard-$shardId%05d.kv", count)
  }

  // abort: close the stream and delete this attempt's tmp-named data file
  // (the commit point is the tmp→final rename inside ShardWriter.close(),
  // so an aborted attempt has nothing under the committed name to remove)
  override def abort(): Unit = if (writer != null) writer.abort()

  override def close(): Unit = ()
}
