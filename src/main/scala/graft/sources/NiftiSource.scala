package graft.sources

import java.util.concurrent.atomic.AtomicLong

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** NIfTI DataSource V2 (SURVEY.md S4/S5 as a real source, not library
  * functions over binaryFile).
  *
  * Two modes, selected with `.option("mode", ...)`:
  *
  *  - `headers` (default): metadata-only rows. Each task reads the 352-byte
  *    NIfTI header per file — never the pixel payload — so split planning
  *    over a 100 TB corpus of 2 GB volumes moves kilobytes, not the corpus
  *    (the reference's header-only pass, v2/nii_to_lmdb.py:67-71).
  *  - `slices`: one row per oriented 2D slice. Predicates on `orient` and
  *    `idx` are pushed into the scan, and the `pixels` column is pruned —
  *    a query for one axial plane of an uncompressed float32 volume seeks
  *    and reads exactly that plane (the reference's lazy dataobj read,
  *    v2/nii_to_lmdb_paralel.py:97-112); a metadata-only projection reads
  *    only the header.
  *
  * Files are listed recursively under the load path and name-filtered by
  * `pathPattern` (default `.*\.nii(\.gz)?$`). All file IO goes through the
  * Hadoop FileSystem API, so file://, hdfs:// and s3a:// paths all work.
  * Gzip members can't be seeked into, so a pixel read of a .nii.gz falls
  * back to one full-file read (header reads still stop at 352 bytes of
  * DECOMPRESSED output via the bounded gunzip).
  *
  * `NiftiSource.bytesRead` counts payload bytes fetched (test hook for the
  * bytes-read ≪ file-size assertions).
  */
class NiftiSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "nifti"
  override def supportsExternalMetadata(): Boolean = false

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    NiftiSource.schemaFor(options.getOrDefault("mode", "headers"))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new NiftiTable(
      Option(opts.get("path")).getOrElse(
        throw new IllegalArgumentException("nifti source requires a load path")),
      opts.getOrDefault("mode", "headers"),
      opts.getOrDefault("pathPattern", ".*\\.nii(\\.gz)?$"),
      opts.getBoolean("ignoreCorrupt", false),
      NiftiSource.optionFilters(opts))
  }
}

object NiftiSource {
  private[sources] val log = org.slf4j.LoggerFactory.getLogger(classOf[NiftiSource])

  /** Payload bytes fetched across all scans in this JVM (test hook). */
  val bytesRead = new AtomicLong(0L)

  /** Minimum planes per slice-mode task; small planes pack more per task
    * up to [[TargetTaskBytes]]. 64 axial planes of the reference's
    * (960, 840, 640) volume ≈ 200 MB of pixel work — a few seconds of
    * degrade per task, enough to amortize scheduling, small enough that a
    * single volume still fans out 30+ ways (the reference's per-slice job
    * granularity, batched). */
  val PlanesPerTask = 64

  /** Pixel bytes a slice-mode task aims to own (the
    * spark.sql.files.maxPartitionBytes analog for plane ranges). */
  val TargetTaskBytes: Long = 192L << 20

  val headersSchema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("file_size", LongType, nullable = false),
    StructField("shape", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("zooms", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("datatype", IntegerType, nullable = false),
    StructField("vox_offset", LongType, nullable = false)))

  val slicesSchema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("base", StringType, nullable = false),
    StructField("orient", StringType, nullable = false),
    StructField("idx", IntegerType, nullable = false),
    StructField("h", IntegerType, nullable = false),
    StructField("w", IntegerType, nullable = false),
    StructField("pixels", ArrayType(FloatType, containsNull = false), nullable = false)))

  val volumesSchema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("file_size", LongType, nullable = false),
    StructField("shape", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("zooms", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("datatype", IntegerType, nullable = false),
    StructField("pixels", ArrayType(FloatType, containsNull = false), nullable = false)))

  def schemaFor(mode: String): StructType = mode match {
    case "headers" => headersSchema
    case "slices"  => slicesSchema
    case "volumes" => volumesSchema
    case m => throw new IllegalArgumentException(s"nifti mode must be headers|slices|volumes, got $m")
  }

  /** Option-declared scan narrowing (`orient`, `idxMin`, `idxMax`): the
    * same predicates pushFilters accepts, but seeded from reader options.
    * Catalyst's V2 pushdown rule only runs on BATCH plans — a STREAMING
    * query's `.filter(orient === ...)` stays a post-scan filter — so these
    * options are how a streaming ingest (or any caller that wants the
    * narrowing guaranteed rather than optimizer-dependent) pins it. */
  def optionFilters(opts: CaseInsensitiveStringMap): Array[Filter] = {
    val fs = ArrayBuffer.empty[Filter]
    Option(opts.get("orient")).foreach { v =>
      val parts = v.split(',').map(_.trim).filter(_.nonEmpty)
      parts.foreach { o => require(Nifti.Orientations.contains(o),
        s"unknown orient option value: $o") }
      fs += (if (parts.length == 1) EqualTo("orient", parts.head)
             else In("orient", parts.toArray[Any]))
    }
    Option(opts.get("idxMin")).foreach(v => fs += GreaterThanOrEqual("idx", v.toInt))
    Option(opts.get("idxMax")).foreach(v => fs += LessThanOrEqual("idx", v.toInt))
    fs.toArray
  }
}

private[sources] class NiftiTable(root: String, mode: String, pathPattern: String,
    ignoreCorrupt: Boolean, optionFilters: Array[Filter] = Array.empty)
    extends Table with SupportsRead {
  override def name(): String = s"nifti($mode):$root"
  override def schema(): StructType = NiftiSource.schemaFor(mode)
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new NiftiScanBuilder(root, mode, pathPattern, ignoreCorrupt,
      Option(options.get("maxFilesPerTrigger")).map(_.toInt), optionFilters)
}

private[sources] class NiftiScanBuilder(root: String, mode: String, pathPattern: String,
    ignoreCorrupt: Boolean, maxFilesPerTrigger: Option[Int] = None,
    optionFilters: Array[Filter] = Array.empty)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = optionFilters
  private var required: StructType = NiftiSource.schemaFor(mode)

  /** Accept orient/idx predicates as scan-narrowing hints; every filter is
    * also returned for Spark to re-evaluate, so partially-handled
    * conjunctions stay correct. Option-declared filters (orient/idxMin/
    * idxMax reader options) are ALWAYS retained — they are the caller's
    * scan definition, not optimizer hints. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    if (mode == "slices") pushed = optionFilters ++ filters.filter {
      case EqualTo("orient", _: String) | In("orient", _) => true
      case EqualTo("idx", _) | In("idx", _) => true
      case GreaterThan("idx", _) | GreaterThanOrEqual("idx", _) => true
      case LessThan("idx", _) | LessThanOrEqual("idx", _) => true
      case _ => false
    }
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new NiftiScan(root, mode, pathPattern, pushed, required, ignoreCorrupt,
      maxFilesPerTrigger)
}

private[sources] class NiftiScan(root: String, mode: String, pathPattern: String,
    pushed: Array[Filter], required: StructType, ignoreCorrupt: Boolean,
    maxFilesPerTrigger: Option[Int] = None)
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new NiftiMicroBatchStream(root, mode, pathPattern, pushed, required,
      ignoreCorrupt, maxFilesPerTrigger)
  override def description(): String =
    s"NiftiScan(mode=$mode, root=$root, pushed=${pushed.mkString(",")}, " +
      s"columns=${required.fieldNames.mkString(",")})"

  override def planInputPartitions(): Array[InputPartition] =
    NiftiPlanner.plan(NiftiPlanner.listSorted(root, pathPattern),
      mode, pushed, required, ignoreCorrupt)

  override def createReaderFactory(): PartitionReaderFactory =
    new NiftiReaderFactory(mode, pushed, required, ignoreCorrupt)
}

/** File listing + partition planning, shared by the batch scan and the
  * micro-batch stream (which plans exactly the NEW files of each batch
  * through the same path, so streaming inherits the plane-range fan-out,
  * the pushdown narrowing and the documented fallbacks unchanged). */
private[sources] object NiftiPlanner {

  def listSorted(root: String, pathPattern: String): Seq[String] = {
    val p = new Path(root)
    val fs = p.getFileSystem(new Configuration())
    val files = ArrayBuffer.empty[String]
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.matches(pathPattern)) files += f.getPath.toString
    }
    files.sorted.toSeq // deterministic partition planning
  }

  def plan(sorted: Seq[String], mode: String, pushed: Array[Filter],
      required: StructType, ignoreCorrupt: Boolean): Array[InputPartition] = {
    // headers: bin-pack many files per task (each costs one 352-byte read);
    // volumes: one file per task (a whole decoded volume is the row);
    // slices: PLANE-RANGE partitions planned from each file's 352-byte
    // header (the parquet-footer analog) — a single huge volume fans out
    // across the cluster per-plane, the reference's own per-slice job
    // granularity (v2/nii_to_lmdb_paralel.py:318-339), instead of one
    // 2 GB file = one task. gzip members can't seek, and exotic dtypes
    // fall back to a whole-volume decode — both keep the legacy one-file
    // partition so the fallback decodes each volume once, not per range.
    // range-split only when the payload is actually read: a metadata-only
    // projection (pixels pruned) costs one 352-byte header per FILE, and
    // per-range header re-reads would multiply that by the orientation
    // count for zero payload parallelism gain
    if (mode == "slices" && required.fieldNames.contains("pixels")) {
      // Planning header reads run on a bounded driver-side pool (the
      // parquet footer-read pool analog): 100k clinical files at ~5 ms per
      // header would otherwise serialize into minutes of planning.
      // Excluded from bytesRead: the counter exists to prove PIXEL-read
      // discipline (NiftiScaleSpec pins the reader's own 352-byte header
      // granularity separately). Results are consumed in `sorted` order,
      // so the plan stays deterministic.
      val headers: Seq[(String, Option[Nifti.Header])] = fetchHeaders(sorted, ignoreCorrupt)
      val legacy = ArrayBuffer.empty[InputPartition]
      val ranges = ArrayBuffer.empty[(NiftiSliceRange, Long)] // with pixel bytes
      for ((f, hOpt) <- headers; h <- hOpt) {
        val rangeable = !NiftiIo.isGzipName(new Path(f)) && Nifti.bytesPerVoxel(h.datatype) > 0
        if (!rangeable) legacy += NiftiInputPartition(Array(f))
        else {
          for (o <- Nifti.Orientations if NiftiFilters.orientAllowed(pushed, o)) {
            val idxs = (0 until Nifti.sliceCount(h.dims, o))
              .filter(i => NiftiFilters.idxAllowed(pushed, i))
            // planes per task scale inversely with plane size (clinical
            // 192² planes would otherwise make ~150 KB tasks), capped at
            // PlanesPerTask so huge volumes still fan out wide
            val planeBytes = o match {
              case "sagittal" => h.dims(2).toLong * h.dims(0) * math.max(1, Nifti.bytesPerVoxel(h.datatype))
              case _ => h.dims(0).toLong * h.dims(1) * math.max(1, Nifti.bytesPerVoxel(h.datatype))
            }
            val perTask = math.max(NiftiSource.PlanesPerTask,
              math.min(4096, (NiftiSource.TargetTaskBytes / math.max(1L, planeBytes)).toInt))
            idxs.grouped(perTask).foreach { g =>
              ranges += ((NiftiSliceRange(f, o, g.toArray), planeBytes * g.length))
            }
          }
        }
      }
      (legacy ++ packRanges(ranges.toSeq)).toArray
    } else {
      val groups =
        if (mode == "headers") sorted.grouped(128).map(_.toArray).toArray
        else sorted.map(Array(_)).toArray
      groups.map(g => NiftiInputPartition(g): InputPartition)
    }
  }

  /** Parallel planning-time header fetch, `sorted` order preserved. A
    * corrupt file yields None under ignoreCorrupt, else rethrows. */
  private def fetchHeaders(sorted: Seq[String], ignoreCorrupt: Boolean)
      : Seq[(String, Option[Nifti.Header])] = {
    if (sorted.isEmpty) return Nil
    // daemon threads: a failed plan must never block JVM exit on queued
    // header reads
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(32, sorted.size),
      (r: Runnable) => { val t = new Thread(r, "nifti-header-fetch"); t.setDaemon(true); t })
    try {
      val futures = sorted.map { f =>
        f -> pool.submit(new java.util.concurrent.Callable[Either[Exception, Nifti.Header]] {
          override def call(): Either[Exception, Nifti.Header] =
            try {
              val (fs2, path, len) = NiftiIo.open(f)
              Right(Nifti.parseHeader(NiftiIo.readPrefix(fs2, path,
                if (NiftiIo.isGzipName(path)) 4096 else 352, len, count = false)))
            } catch { case e: Exception => Left(e) }
        })
      }
      futures.map { case (f, fut) =>
        fut.get() match {
          case Right(h) => (f, Some(h))
          case Left(e) if ignoreCorrupt =>
            NiftiSource.log.warn(s"nifti: skipping corrupt file $f: ${e.getMessage}")
            (f, None)
          case Left(e) =>
            // drop the still-queued reads — without this, planning a 100k-
            // file corpus would keep burning driver I/O after the scan
            // already failed on an earlier corrupt file
            pool.shutdownNow()
            throw e
        }
      }
    } finally pool.shutdown()
  }

  /** Pack plane ranges across files into partitions. Single huge volumes
    * keep their near-[[NiftiSource.TargetTaskBytes]] one-range tasks; a
    * corpus of SMALL volumes coalesces (1000 clinical volumes × 3 orients
    * would otherwise be 3000 ~8 MB tasks) — budget is the lesser of the
    * target task size and an even split across 2× the scheduler's
    * parallelism, so small corpora still fan out to every core. */
  private def packRanges(ranges: Seq[(NiftiSliceRange, Long)]): Seq[InputPartition] = {
    if (ranges.isEmpty) return Nil
    val total = ranges.iterator.map(_._2).sum
    val parallelism = org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.defaultParallelism).getOrElse(32)
    val budget = math.max(1L, math.min(NiftiSource.TargetTaskBytes,
      total / math.max(1, 2 * parallelism)))
    val out = ArrayBuffer.empty[InputPartition]
    val cur = ArrayBuffer.empty[NiftiSliceRange]
    var curBytes = 0L
    for ((r, b) <- ranges) {
      if (cur.nonEmpty && curBytes + b > budget) {
        out += NiftiInputPartition(cur.map(_.path).distinct.toArray, cur.toArray)
        cur.clear(); curBytes = 0L
      }
      cur += r; curBytes += b
    }
    if (cur.nonEmpty) out += NiftiInputPartition(cur.map(_.path).distinct.toArray, cur.toArray)
    out.toSeq
  }
}

private[sources] case class NiftiInputPartition(paths: Array[String],
    ranges: Array[NiftiSliceRange] = null) extends InputPartition

/** One task's share of a file's oriented planes (see planInputPartitions). */
private[sources] case class NiftiSliceRange(path: String, orient: String, idxs: Array[Int])

/** orient/idx pushdown predicate evaluation, shared by the partition
  * planner and the slice reader (identical semantics in both places — the
  * reader re-checks so a legacy whole-file partition honors filters too). */
private[sources] object NiftiFilters {
  def orientAllowed(pushed: Array[Filter], o: String): Boolean = pushed.forall {
    case EqualTo("orient", v: String) => o == v
    case In("orient", vs) => vs.exists(_ == o)
    case _ => true
  }
  def idxAllowed(pushed: Array[Filter], i: Int): Boolean = pushed.forall {
    case EqualTo("idx", v: Number) => i == v.intValue()
    case In("idx", vs) => vs.exists { case n: Number => n.intValue() == i; case _ => false }
    case GreaterThan("idx", v: Number) => i > v.intValue()
    case GreaterThanOrEqual("idx", v: Number) => i >= v.intValue()
    case LessThan("idx", v: Number) => i < v.intValue()
    case LessThanOrEqual("idx", v: Number) => i <= v.intValue()
    case _ => true
  }
}

private[sources] class NiftiReaderFactory(mode: String, pushed: Array[Filter],
    required: StructType, ignoreCorrupt: Boolean) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val part = partition.asInstanceOf[NiftiInputPartition]
    mode match {
      case "headers" => new NiftiHeaderReader(part.paths, required, ignoreCorrupt)
      case "slices"  => new NiftiSliceReader(part.paths, part.ranges, pushed, required, ignoreCorrupt)
      case _         => new NiftiVolumeReader(part.paths, required, ignoreCorrupt)
    }
  }
}

/** Shared FS helpers: bounded reads with byte accounting. */
private[sources] object NiftiIo {
  def open(pathStr: String): (FileSystem, Path, Long) = {
    val path = new Path(pathStr)
    val fs = path.getFileSystem(new Configuration())
    (fs, path, fs.getFileStatus(path).getLen)
  }

  /** Read `n` bytes at offset 0 (or fewer if the file is shorter).
    * `count = false` for PLANNING reads (partition planning parses headers
    * like parquet footers) — the bytesRead counter is spec observability
    * for payload-read discipline, not total-I/O accounting. */
  def readPrefix(fs: FileSystem, path: Path, n: Int, fileLen: Long,
      count: Boolean = true): Array[Byte] = {
    val len = math.min(n.toLong, fileLen).toInt
    val buf = new Array[Byte](len)
    val in = fs.open(path)
    try in.readFully(0L, buf, 0, len) finally in.close()
    if (count) NiftiSource.bytesRead.addAndGet(len)
    buf
  }

  def readAll(fs: FileSystem, path: Path, fileLen: Long): Array[Byte] = {
    require(fileLen <= Int.MaxValue, s"file too large to buffer: $fileLen")
    val buf = new Array[Byte](fileLen.toInt)
    val in = fs.open(path)
    try in.readFully(0L, buf, 0, buf.length) finally in.close()
    NiftiSource.bytesRead.addAndGet(buf.length)
    buf
  }

  def isGzipName(p: Path): Boolean = p.getName.endsWith(".gz")

  /** Stream-decompress a gzip member forward, collecting the raw bytes of
    * the requested z-planes (sorted ascending), then STOP — only the
    * compressed prefix up to the last needed plane is fetched from the
    * filesystem. Returns plane-index → raw plane bytes. */
  def readGzipPlanes(fs: FileSystem, path: Path, h: Nifti.Header,
      planesSorted: Seq[Int]): Map[Int, Array[Byte]] = {
    val d0 = h.dims(0); val d1 = h.dims(1)
    val planeBytes = d0 * d1 * Nifti.bytesPerVoxel(h.datatype)
    val in = fs.open(path)
    try {
      val gz = new java.util.zip.GZIPInputStream(in, 1 << 16)
      def skipFully(n: Long): Unit = {
        var left = n
        val scratch = new Array[Byte](1 << 16)
        while (left > 0) {
          val r = gz.read(scratch, 0, math.min(left, scratch.length.toLong).toInt)
          require(r > 0, s"gzip member ended ${left} bytes early in $path")
          left -= r
        }
      }
      def readFully(buf: Array[Byte]): Unit = {
        var off = 0
        while (off < buf.length) {
          val r = gz.read(buf, off, buf.length - off)
          require(r > 0, s"gzip member ended ${buf.length - off} bytes early in $path")
          off += r
        }
      }
      skipFully(h.voxOffset.toLong)
      var cur = 0
      val out = Map.newBuilder[Int, Array[Byte]]
      planesSorted.foreach { p =>
        skipFully((p - cur).toLong * planeBytes)
        val buf = new Array[Byte](planeBytes)
        readFully(buf)
        out += p -> buf
        cur = p + 1
      }
      NiftiSource.bytesRead.addAndGet(in.getPos) // compressed bytes consumed
      out.result()
    } finally in.close()
  }

  /** Parse the header reading at most 352 raw bytes (uncompressed file) or
    * 352 decompressed bytes (gzip member, bounded stream). */
  def headerOf(fs: FileSystem, path: Path, fileLen: Long): Nifti.Header = {
    if (isGzipName(path)) {
      // gzip: the first deflate blocks of the member are enough to yield
      // 352 plaintext bytes; 4 KiB of compressed input is ample.
      val raw = readPrefix(fs, path, 4096, fileLen)
      Nifti.parseHeader(raw)
    } else {
      Nifti.parseHeader(readPrefix(fs, path, 352, fileLen))
    }
  }
}

private[sources] class NiftiHeaderReader(files: Array[String], required: StructType,
    ignoreCorrupt: Boolean) extends PartitionReader[InternalRow] {
  private var i = 0
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (i < files.length) {
      val f = files(i)
      i += 1
      try {
        val (fs, path, len) = NiftiIo.open(f)
        val h = NiftiIo.headerOf(fs, path, len)
        val full = Map[String, Any](
          "path" -> UTF8String.fromString(f),
          "file_size" -> len,
          "shape" -> ArrayData.toArrayData(h.dims),
          "zooms" -> ArrayData.toArrayData(h.zooms),
          "datatype" -> h.datatype,
          "vox_offset" -> h.voxOffset.toLong)
        current = new GenericInternalRow(required.fieldNames.map(full(_): Any))
        return true
      } catch {
        case e: Exception if ignoreCorrupt =>
          NiftiSource.log.warn(s"nifti: skipping corrupt file $f: ${e.getMessage}")
      }
    }
    false
  }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}

/** One row per file with the fully decoded volume (S1+S3 eager scan).
  * When `pixels` is not projected this degrades to a header-only read, so
  * a shape/zoom census over a 100 TB corpus stays a metadata pass. */
private[sources] class NiftiVolumeReader(files: Array[String], required: StructType,
    ignoreCorrupt: Boolean) extends PartitionReader[InternalRow] {
  private val needPixels = required.fieldNames.contains("pixels")
  private var i = 0
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (i < files.length) {
      val f = files(i)
      i += 1
      try {
        val (fs, path, len) = NiftiIo.open(f)
        val (h, px) =
          if (needPixels) {
            val (hh, vol) = Nifti.readVolume(NiftiIo.readAll(fs, path, len))
            (hh, ArrayData.toArrayData(vol))
          } else (NiftiIo.headerOf(fs, path, len), null)
        val full = Map[String, Any](
          "path" -> UTF8String.fromString(f),
          "file_size" -> len,
          "shape" -> ArrayData.toArrayData(h.dims),
          "zooms" -> ArrayData.toArrayData(h.zooms),
          "datatype" -> h.datatype,
          "pixels" -> px)
        current = new GenericInternalRow(required.fieldNames.map(full(_): Any))
        return true
      } catch {
        case e: Exception if ignoreCorrupt =>
          NiftiSource.log.warn(s"nifti: skipping corrupt file $f: ${e.getMessage}")
      }
    }
    false
  }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}

/** Slice rows, STREAMED one plane at a time. Two partition shapes:
  *  - plane-range partitions (seekable files; `ranges != null`): the task
  *    reads only its assigned (orient, idx) planes via seek — resident
  *    state is ONE plane buffer, never a file's worth of rows;
  *  - legacy whole-file partitions (gzip / exotic dtypes): the documented
  *    fallbacks (gz forward-stream, eager volume decode for non-fixed-
  *    width dtypes) — rows still EMIT one at a time, so only the fallback
  *    volume buffer itself is resident, never the output rows.
  * Honors pushed orient/idx filters and prunes the pixel decode when
  * `pixels` is not required. */
private[sources] class NiftiSliceReader(files: Array[String], ranges: Array[NiftiSliceRange],
    pushed: Array[Filter], required: StructType, ignoreCorrupt: Boolean)
    extends PartitionReader[InternalRow] {

  private val needPixels = required.fieldNames.contains("pixels")
  private var current: InternalRow = _
  // the stream backing the in-flight range iterator, closed on task end or
  // early abort (limit pushdown) via close()
  private var openIn: org.apache.hadoop.fs.FSDataInputStream = null

  private def row(pathStr: String, base: String, o: String, i: Int,
      px: Array[Float], sh: Int, sw: Int): InternalRow = {
    val full = Map[String, Any](
      "path" -> UTF8String.fromString(pathStr),
      "base" -> UTF8String.fromString(base),
      "orient" -> UTF8String.fromString(o),
      "idx" -> i,
      "h" -> sh,
      "w" -> sw,
      "pixels" -> (if (px == null) null else ArrayData.toArrayData(px)))
    new GenericInternalRow(required.fieldNames.map(full(_): Any))
  }

  /** Plane-range mode: seek-read each assigned plane on demand. */
  private def rangeRows(r: NiftiSliceRange): Iterator[InternalRow] = {
    val (fs, path, len) = NiftiIo.open(r.path)
    val h = NiftiIo.headerOf(fs, path, len)
    val base = path.getName.replaceAll("\\.nii(\\.gz)?$", "")
    if (!needPixels)
      r.idxs.iterator.map(i => row(r.path, base, r.orient, i,
        null, heightOf(h.dims, r.orient), widthOf(h.dims, r.orient)))
    else {
      val in = fs.open(path)
      openIn = in
      var emitted = 0
      new Iterator[InternalRow] {
        override def hasNext: Boolean = {
          val more = emitted < r.idxs.length
          if (!more && openIn == in) { in.close(); openIn = null }
          more
        }
        override def next(): InternalRow = {
          val i = r.idxs(emitted)
          emitted += 1
          val (px, sh, sw) = readSliceSeek(in, h, r.orient, i)
          row(r.path, base, r.orient, i, px, sh, sw)
        }
      }
    }
  }

  /** Legacy whole-file mode (gzip / exotic dtypes / planner fallback). */
  private def fileRows(pathStr: String): Iterator[InternalRow] = {
    val (fs, path, len) = NiftiIo.open(pathStr)
    val h = NiftiIo.headerOf(fs, path, len)
    val base = path.getName.replaceAll("\\.nii(\\.gz)?$", "")
    val wanted = Nifti.Orientations.filter(NiftiFilters.orientAllowed(pushed, _)).map { o =>
      o -> (0 until Nifti.sliceCount(h.dims, o)).filter(NiftiFilters.idxAllowed(pushed, _))
    }.filter(_._2.nonEmpty)
    if (wanted.isEmpty) return Iterator.empty

    // any fixed-width dtype is lazily readable (scl applied per element in
    // the decode step) — int16+scl clinical corpora keep the pushdown win;
    // only exotic dtypes (RGB, complex) fall back to the eager volume read
    val lazyReadable = Nifti.bytesPerVoxel(h.datatype) > 0
    val isGz = NiftiIo.isGzipName(path)
    val seekable = !isGz && lazyReadable && needPixels
    // gzip can't seek, but it CAN stream: when only z-plane orientations
    // (axial/coronal both read plane z=i) are requested, decompress
    // forward to each needed plane and stop — the compressed prefix is all
    // that's fetched, not the whole member
    val gzStreamable = isGz && lazyReadable && needPixels &&
      wanted.forall { case (o, _) => o == "axial" || o == "coronal" }

    // one decoded volume shared by every emitted slice of this file
    lazy val volume: (Nifti.Header, Array[Float]) =
      Nifti.readVolume(NiftiIo.readAll(fs, path, len))
    lazy val planes: Map[Int, Array[Byte]] =
      if (gzStreamable)
        NiftiIo.readGzipPlanes(fs, path, h,
          wanted.flatMap(_._2).distinct.sorted)
      else Map.empty

    val in = if (seekable) { openIn = fs.open(path); openIn } else null
    val pairs = wanted.iterator.flatMap { case (o, idxs) => idxs.iterator.map(o -> _) }
    val it = pairs.map { case (o, i) =>
      val (px, sh, sw) =
        if (!needPixels) (null: Array[Float], heightOf(h.dims, o), widthOf(h.dims, o))
        else if (seekable) readSliceSeek(in, h, o, i)
        else if (gzStreamable) decodePlane(planes(i), h, o)
        else { val (hh, vol) = volume; Nifti.sliceOf(vol, hh.dims, o, i) }
      row(pathStr, base, o, i, px, sh, sw)
    }
    if (in == null) it
    else new Iterator[InternalRow] {
      override def hasNext: Boolean = {
        val more = it.hasNext
        if (!more && openIn == in) { in.close(); openIn = null }
        more
      }
      override def next(): InternalRow = it.next()
    }
  }

  /** Decode one raw z-plane (Fortran x-fastest) into an oriented 2D slice —
    * dtype-generic with per-element scl scaling. */
  private def decodePlane(buf: Array[Byte], h: Nifti.Header, orient: String)
      : (Array[Float], Int, Int) = {
    val d0 = h.dims(0); val d1 = h.dims(1)
    val bpv = Nifti.bytesPerVoxel(h.datatype)
    val scaled = h.sclSlope != 0f && (h.sclSlope != 1f || h.sclInter != 0f)
    val bb = java.nio.ByteBuffer.wrap(buf).order(
      if (h.littleEndian) java.nio.ByteOrder.LITTLE_ENDIAN else java.nio.ByteOrder.BIG_ENDIAN)
    @inline def v(off: Int): Float = {
      val x = Nifti.voxelAt(bb, off, h.datatype)
      if (scaled) x * h.sclSlope + h.sclInter else x
    }
    if (orient == "axial") {
      val out = new Array[Float](d0 * d1)
      var a = 0
      while (a < d0) { var b = 0; while (b < d1) { out(a * d1 + b) = v((a + b * d0) * bpv); b += 1 }; a += 1 }
      (out, d0, d1)
    } else {
      val out = new Array[Float](d1 * d0)
      var a = 0
      while (a < d1) { var b = 0; while (b < d0) { out(a * d0 + b) = v((b + a * d0) * bpv); b += 1 }; a += 1 }
      (out, d1, d0)
    }
  }

  private def heightOf(dims: Array[Int], o: String): Int = o match {
    case "axial" => dims(0); case "coronal" => dims(1); case _ => dims(2)
  }
  private def widthOf(dims: Array[Int], o: String): Int = o match {
    case "axial" => dims(1); case _ => dims(0)
  }

  /** Seek-read exactly the bytes of one oriented slice (uncompressed, any
    * fixed-width dtype): axial/coronal are one contiguous plane; sagittal
    * is d2 strided rows of d0 voxels. Offsets stay in Long throughout;
    * scl scaling applied per element. */
  private def readSliceSeek(in: org.apache.hadoop.fs.FSDataInputStream,
      h: Nifti.Header, orient: String, i: Int): (Array[Float], Int, Int) = {
    val d0 = h.dims(0); val d1 = h.dims(1); val d2 = h.dims(2)
    val off = h.voxOffset.toLong
    val bpv = Nifti.bytesPerVoxel(h.datatype)
    val scaled = h.sclSlope != 0f && (h.sclSlope != 1f || h.sclInter != 0f)
    @inline def v(bb: java.nio.ByteBuffer, o: Int): Float = {
      val x = Nifti.voxelAt(bb, o, h.datatype)
      if (scaled) x * h.sclSlope + h.sclInter else x
    }
    orient match {
      case "axial" | "coronal" =>
        val planeBytes = d0.toLong * d1 * bpv
        require(planeBytes <= Int.MaxValue, "plane too large")
        val buf = new Array[Byte](planeBytes.toInt)
        in.readFully(off + i * planeBytes, buf, 0, buf.length)
        NiftiSource.bytesRead.addAndGet(buf.length)
        val bb = java.nio.ByteBuffer.wrap(buf).order(
          if (h.littleEndian) java.nio.ByteOrder.LITTLE_ENDIAN else java.nio.ByteOrder.BIG_ENDIAN)
        if (orient == "axial") {
          val out = new Array[Float](d0 * d1)
          var a = 0
          while (a < d0) { var b = 0; while (b < d1) { out(a * d1 + b) = v(bb, (a + b * d0) * bpv); b += 1 }; a += 1 }
          (out, d0, d1)
        } else {
          val out = new Array[Float](d1 * d0)
          var a = 0
          while (a < d1) { var b = 0; while (b < d0) { out(a * d0 + b) = v(bb, (b + a * d0) * bpv); b += 1 }; a += 1 }
          (out, d1, d0)
        }
      case "sagittal" =>
        val out = new Array[Float](d2 * d0)
        val row = new Array[Byte](d0 * bpv)
        var a = 0
        while (a < d2) {
          val pos = off + (i.toLong * d0 + a.toLong * d0 * d1) * bpv
          in.readFully(pos, row, 0, row.length)
          NiftiSource.bytesRead.addAndGet(row.length)
          val bb = java.nio.ByteBuffer.wrap(row).order(
            if (h.littleEndian) java.nio.ByteOrder.LITTLE_ENDIAN else java.nio.ByteOrder.BIG_ENDIAN)
          var b = 0
          while (b < d0) { out(a * d0 + b) = v(bb, b * bpv); b += 1 }
          a += 1
        }
        (out, d2, d0)
    }
  }

  // one sub-iterator per range/file; corrupt files skip their remainder
  // (ignoreCorrupt) exactly like the pre-streaming reader did per file
  private val sources: Iterator[() => Iterator[InternalRow]] =
    if (ranges != null) ranges.iterator.map(r => () => rangeRows(r))
    else files.iterator.map(f => () => fileRows(f))
  private var inner: Iterator[InternalRow] = Iterator.empty

  override def next(): Boolean = {
    while (true) {
      try {
        if (inner.hasNext) { current = inner.next(); return true }
      } catch {
        case e: Exception if ignoreCorrupt =>
          NiftiSource.log.warn(s"nifti: skipping corrupt slice source: ${e.getMessage}")
          inner = Iterator.empty
          if (openIn != null) { openIn.close(); openIn = null }
      }
      if (!sources.hasNext) return false
      try inner = sources.next()()
      catch {
        case e: Exception if ignoreCorrupt =>
          NiftiSource.log.warn(s"nifti: skipping corrupt file: ${e.getMessage}")
          inner = Iterator.empty
      }
    }
    false
  }
  override def get(): InternalRow = current
  override def close(): Unit =
    if (openIn != null) { openIn.close(); openIn = null }
}
