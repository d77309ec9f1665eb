package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Nifti

/** The continuous-dataset-build loop, composed end-to-end: a HEADERS-mode
  * NIfTI stream watches the landing dir (352 bytes per new file — the
  * watch itself never touches payloads), and each micro-batch runs the
  * batch pipeline (slices → split plan → v2 degrade → tile → dark filter)
  * over exactly its NEW volumes and appends to one genuine-LMDB store.
  *
  * The invariant that makes incremental == rebuild: every kernel is
  * per-slice seeded (K13) and the split is a per-sliceId hash cut, so the
  * records a volume produces are independent of which batch it arrived in.
  * The spec proves it byte-for-byte: two landing waves through the stream,
  * then one batch run over all volumes, and the stores must agree on the
  * exact key set and value bytes.
  */
class StreamingVolumePipelineSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dims = Array(16, 14, 6)

  private def land(dir: String, sk: Int): Unit = {
    val vol = Array.tabulate(dims.product)(i => ((sk * 97 + i * 11) % 256).toFloat)
    val bytes = Nifti.encode(vol, dims, Array(0.2, 0.2, 0.2))
    val tmp = Paths.get(dir, f".vol$sk%03d.tmp")
    Files.write(tmp, bytes)
    Files.move(tmp, Paths.get(dir, f"vol$sk%03d.nii"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    ()
  }


  test("streamed incremental build is byte-identical to a batch rebuild") {
    val landing = Files.createTempDirectory("vol_landing_").toString
    val streamStore = Scratch.fresh("stream_store_")
    new java.io.File(streamStore).delete()

    (0 until 2).foreach(land(landing, _))
    val q = MriPipeline.streamIngest(spark, landing, streamStore, crop = 8, step = 4)
    try {
      q.processAllAvailable()
      land(landing, 2) // third volume lands mid-stream
      q.processAllAvailable()
    } finally q.stop()
    assert(sinks.LmdbStore.committedBatchIds(streamStore).size >= 2,
      s"expected two incremental waves in the ledger: " +
        sinks.LmdbStore.committedBatchIds(streamStore))

    // batch rebuild over the full landing dir
    val batchStore = Scratch.fresh("batch_store_")
    new java.io.File(batchStore).delete()
    sinks.LmdbStore.create(batchStore)
    val sl = MriPipeline.slices(spark, landing)
    val rec = MriPipeline.degradeToRecords(sl, MriPipeline.planSplit(sl),
      "3tFlash", crop = 8, step = 4)
    sinks.LmdbStore.append(rec.toDF().select(col("key"), col("value")), batchStore)

    def digest(store: String): Map[String, String] =
      sinks.LmdbStore.read(spark, store)
        .select(col("key").cast("string"), md5(col("value")).as("h"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap

    val streamed = digest(streamStore)
    val batch = digest(batchStore)
    assert(streamed.nonEmpty, "pipeline produced no records")
    assert(streamed.keySet == batch.keySet,
      s"key sets differ: only-streamed=${(streamed.keySet -- batch.keySet).take(3)} " +
        s"only-batch=${(batch.keySet -- streamed.keySet).take(3)}")
    assert(streamed == batch, "value bytes differ between incremental and rebuild")

    // every shard of the incrementally-built store stays a valid LMDB env
    val audits = sinks.LmdbStore.auditAll(streamStore)
    assert(audits.nonEmpty)
    assert(audits.map(_._2.entries).sum == streamed.size)
  }

  test("restart resumes the ingest without re-appending (default in-store checkpoint)") {
    // the landing dir deliberately contains a SPACE: Hadoop path strings
    // are unencoded, so this pins the foreachBatch path handling that a
    // java.net.URI parse would crash on
    val landing = Files.createTempDirectory("vol landing ").toString
    val store = Scratch.fresh("ingest_ckpt_store_")
    new java.io.File(store).delete()
    // no explicit checkpoint: the default lives inside the store, so a
    // restarted query CONTINUES the store's batch-id lineage — a fresh
    // checkpoint per run would restart ids at 0 and the ledger would
    // silently no-op every new batch as a replay
    def start() = MriPipeline.streamIngest(spark, landing, store,
      crop = 8, step = 4)

    land(landing, 0)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    val after1 = sinks.LmdbStore.read(spark, store).count()
    assert(after1 > 0)

    land(landing, 1)
    val q2 = start() // restart from the offset log
    try q2.processAllAvailable() finally q2.stop()

    val rows = sinks.LmdbStore.read(spark, store)
      .select(col("key").cast("string")).collect().map(_.getString(0)).toSeq
    assert(rows.size == rows.distinct.size, "restart must not re-append keys")
    // both volumes' records present, each exactly once: vol000 keys from
    // the pre-restart run, vol001 only after
    assert(rows.exists(_.contains("vol000")) && rows.exists(_.contains("vol001")))
    assert(rows.count(_.contains("vol000")).toLong == after1)
  }

  test("appendBatch is exactly-once: replays no-op, crashed-attempt orphans are swept") {
    import spark.implicits._
    val store = Scratch.fresh("batch_once_")
    new java.io.File(store).delete()
    sinks.LmdbStore.create(store)
    def df(tag: String) = Seq(
      (s"$tag/a", s"$tag-va".getBytes), (s"$tag/b", s"$tag-vb".getBytes)
    ).toDF("key", "value")

    assert(sinks.LmdbStore.appendBatch(df("b0"), store, 0L))
    // at-least-once replay of batch 0 (foreachBatch retry): must be a no-op
    assert(!sinks.LmdbStore.appendBatch(df("b0"), store, 0L))
    assert(sinks.LmdbStore.committedBatchIds(store) == Set(0L))

    // crashed attempt: shards on disk, manifest never rewritten — the next
    // commit must not adopt them (pre-ledger behavior re-listed every
    // shard-* dir, double-counting the replayed keys)
    val root = new java.io.File(store)
    val committed = root.listFiles().filter(_.getName.matches("shard-\\d+")).map(_.getName)
    val orphan = new java.io.File(root, f"shard-${committed.map(_.stripPrefix("shard-").toInt).max + 1}%05d")
    val src = new java.io.File(root, committed.head)
    orphan.mkdirs()
    Files.copy(src.toPath.resolve(sinks.Lmdb.DataFileName),
      orphan.toPath.resolve(sinks.Lmdb.DataFileName))
    // and a crashed TASK's pre-rename tmp dir — must also be swept, or a
    // 24/7 ingest leaks one partial env per crashed attempt
    val tmpOrphan = new java.io.File(root, "shard-00099.tmp-deadbeef")
    tmpOrphan.mkdirs()
    Files.copy(src.toPath.resolve(sinks.Lmdb.DataFileName),
      tmpOrphan.toPath.resolve(sinks.Lmdb.DataFileName))
    // ...including one that died MID-write, leaving an inner tmp file the
    // old named-files-only delete missed (round-7 advice: dir.delete()
    // failed silently on the non-empty dir and the residue leaked forever)
    Files.write(tmpOrphan.toPath.resolve(sinks.Lmdb.DataFileName + ".tmp-50b"),
      Array[Byte](1, 2, 3))

    assert(sinks.LmdbStore.appendBatch(df("b1"), store, 1L))
    assert(!tmpOrphan.exists(), "crashed-task tmp dir must be swept")
    // the orphan was swept before the write (its NAME may be legitimately
    // reused by the new batch's shards) — the content proves it: without
    // the sweep the orphan's b0 replay keys would be double-counted
    val keys = sinks.LmdbStore.read(spark, store)
      .select("key").as[String].collect().sorted.toSeq
    assert(keys == Seq("b0/a", "b0/b", "b1/a", "b1/b"),
      s"exactly the two committed batches, no orphan adoption: $keys")
    assert(sinks.LmdbStore.committedBatchIds(store) == Set(0L, 1L))

    // ledger lines are invisible to the shard walk: audit + point lookup
    assert(sinks.LmdbStore.auditAll(store).map(_._2.entries).sum == 4)
    assert(sinks.LmdbStore.get(store, "b1/a").map(new String(_)).contains("b1-va"))
  }
}
