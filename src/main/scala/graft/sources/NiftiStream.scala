package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{
  CompositeReadLimit, MicroBatchStream, Offset, ReadAllAvailable, ReadLimit,
  ReadMaxFiles, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

/** Micro-batch streaming over the NIfTI source (SURVEY.md §2.11 meets
  * S1–S5): `spark.readStream.format("nifti")` incrementally processes scan
  * volumes as they LAND in a directory — the production shape of a
  * continuously-built training set (the reference reprocesses the whole
  * input dir per run, `v2/nii_to_lmdb_paralel.py:318-339`; at 100 TB a
  * re-scan per new scan session is the first thing to go).
  *
  * Offsets are the set of files this query has admitted, serialized as a
  * sorted JSON array — restart-safe (the checkpointed offset replays
  * exactly the files of an uncommitted batch, and files admitted before
  * the failure are never re-read). Each batch plans ONLY its new files,
  * through the same [[NiftiPlanner]] as the batch scan, so streaming
  * inherits the plane-range fan-out (one arriving 2 GB volume still
  * spreads across the cluster), the orient/idx pushdown and the
  * gzip/exotic-dtype fallbacks unchanged.
  *
  * Assumptions, same as Spark's own file stream source: files are
  * IMMUTABLE once visible (land them with an atomic rename) and are never
  * deleted while a query that hasn't admitted them runs. `
  * maxFilesPerTrigger` bounds admission per batch; Trigger.AvailableNow
  * snapshots the listing at start and drains exactly that set in
  * maxFilesPerTrigger-sized batches.
  *
  * The offset grows with the corpus (one path per admitted file). That is
  * the same contract as FileStreamSource's seen-files log, kept textual
  * here for restart debuggability; a compacted form (path-hash Bloom +
  * high-watermark) drops in behind [[NiftiStreamOffset]] without touching
  * query checkpoints' semantics if offset size ever matters before file
  * count does.
  */
private[sources] class NiftiMicroBatchStream(root: String, mode: String,
    pathPattern: String, pushed: Array[Filter], required: StructType,
    ignoreCorrupt: Boolean, maxFilesPerTrigger: Option[Int])
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  // Trigger.AvailableNow: the end of the drain is the listing AT PREPARE
  // time — files landing mid-drain belong to the next query start.
  @volatile private var availableNowSnapshot: Option[Seq[String]] = None

  private def visibleNow(): Seq[String] =
    availableNowSnapshot.getOrElse(NiftiPlanner.listSorted(root, pathPattern))

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowSnapshot = Some(NiftiPlanner.listSorted(root, pathPattern))

  override def initialOffset(): Offset = NiftiStreamOffset(Nil)

  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(n => ReadLimit.maxFiles(n): ReadLimit)
      .getOrElse(ReadLimit.allAvailable())

  /** New files since `start`, capped by the read limit, in lexicographic
    * order (deterministic admission: a capped batch takes the SMALLEST
    * pending paths, so two runs over the same landing order admit
    * identically).
    *
    * Under ignoreCorrupt, a file must pass a 352-byte header probe BEFORE
    * admission: once admitted, a file is in the offset forever, so a
    * TRANSIENT read failure at planning time (NFS hiccup, still-uploading
    * file on a non-atomic-rename FS) that the planner then "skipped as
    * corrupt" would be permanent silent data loss. Un-probeable files stay
    * PENDING and are re-probed each trigger — transient errors heal into a
    * later batch, truly corrupt files cost one bounded header read per
    * trigger (and keep logging) until removed. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val seen = NiftiStreamOffset.of(start).files.toSet
    val fresh0 = visibleNow().filterNot(seen)
    def cap(l: ReadLimit): Int = l match {
      case f: ReadMaxFiles => f.maxFiles()
      case c: CompositeReadLimit => c.getReadLimits.map(cap).min
      case _: ReadAllAvailable => Int.MaxValue
      case _ => Int.MaxValue // rows/bytes limits are not meaningful pre-scan here
    }
    // probe LAZILY after the cap ordering so a capped trigger pays
    // cap + failures probes, not one per pending backlog file (a 100k-file
    // backlog at maxFilesPerTrigger=100 would otherwise re-probe the whole
    // backlog every trigger); admission order is unchanged — the smallest
    // pending READABLE paths win
    val admitted =
      (if (!ignoreCorrupt) fresh0.iterator
       else fresh0.iterator.filter { f =>
         try {
           val (fs, path, len) = NiftiIo.open(f)
           NiftiIo.headerOf(fs, path, len)
           true
         } catch {
           case e: Exception =>
             NiftiSource.log.warn(
               s"nifti stream: deferring unreadable file $f: ${e.getMessage}")
             false
         }
       }).take(cap(limit)).toSeq
    NiftiStreamOffset((seen ++ admitted).toSeq.sorted)
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is the admission-control entry point")

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val before = NiftiStreamOffset.of(start).files.toSet
    val batch = NiftiStreamOffset.of(end).files.filterNot(before)
    NiftiPlanner.plan(batch, mode, pushed, required, ignoreCorrupt)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new NiftiReaderFactory(mode, pushed, required, ignoreCorrupt)

  override def deserializeOffset(json: String): Offset = NiftiStreamOffset.fromJson(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def toString: String = s"NiftiMicroBatchStream(mode=$mode, root=$root)"
}

/** The admitted-file set, as a sorted JSON string array. */
private[sources] case class NiftiStreamOffset(files: Seq[String]) extends Offset {
  override def json(): String =
    NiftiStreamOffset.mapper.writeValueAsString(files.toArray)
}

private[sources] object NiftiStreamOffset {
  private val mapper = new ObjectMapper()
  def fromJson(json: String): NiftiStreamOffset =
    NiftiStreamOffset(mapper.readValue(json, classOf[Array[String]]).toSeq)
  def of(o: Offset): NiftiStreamOffset = o match {
    case n: NiftiStreamOffset => n
    case other => fromJson(other.json())
  }
}
