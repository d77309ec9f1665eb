package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Nifti

/** Micro-batch streaming over the NIfTI DSv2 source: incremental admission
  * of newly-landed volumes, per-trigger file caps, batch/stream row parity,
  * checkpoint restart without re-reads, and Trigger.AvailableNow drains. */
class NiftiStreamingSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dims = Array(10, 8, 6)
  private val slicesPerVol = // axial d2 + coronal d2 + sagittal d1
    Nifti.Orientations.map(Nifti.sliceCount(dims, _)).sum

  private def mkVolume(seed: Int): Array[Float] =
    Array.tabulate(dims.product)(i => ((seed * 31 + i * 7) % 997).toFloat / 10f)

  /** Atomic landing, as the source contract requires: write to a tmp name,
    * rename into the watched dir. */
  private def land(dir: String, name: String, seed: Int): Unit = {
    val bytes = Nifti.encode(mkVolume(seed), dims, Array(0.5, 0.5, 0.5))
    val tmp = Paths.get(dir, s".$name.tmp")
    Files.write(tmp, bytes)
    Files.move(tmp, Paths.get(dir, name),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  test("incremental admission: new files picked up, old never re-read") {
    val dir = Files.createTempDirectory("nifti_stream_").toString
    land(dir, "vol00.nii", 0)
    land(dir, "vol01.nii", 1)
    val q = spark.readStream.format("nifti").option("mode", "slices")
      .load(dir)
      .groupBy("base").agg(count(lit(1)).as("n"), sum("idx").as("sum_idx"))
      .writeStream.format("memory").queryName("nifti_inc")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val r1 = spark.table("nifti_inc").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(r1 == Map("vol00" -> slicesPerVol.toLong, "vol01" -> slicesPerVol.toLong))

      land(dir, "vol02.nii", 2)
      q.processAllAvailable()
      val r2 = spark.table("nifti_inc").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(r2.keySet == Set("vol00", "vol01", "vol02"))
      assert(r2.values.forall(_ == slicesPerVol.toLong))
    } finally q.stop()
  }

  test("maxFilesPerTrigger bounds admission per batch; parity with batch read") {
    val dir = Files.createTempDirectory("nifti_stream_cap_").toString
    (0 until 3).foreach(v => land(dir, f"vol$v%02d.nii", v))
    val q = spark.readStream.format("nifti").option("mode", "slices")
      .option("maxFilesPerTrigger", "1")
      .load(dir)
      .groupBy("base", "orient").agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("nifti_cap")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      // 3 files at 1/trigger: at least 3 data-carrying micro-batches ran
      val withRows = q.recentProgress.count(_.numInputRows > 0)
      assert(withRows >= 3, s"expected >=3 data batches, saw $withRows")
      val streamed = spark.table("nifti_cap").collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val batch = spark.read.format("nifti").option("mode", "slices").load(dir)
        .groupBy("base", "orient").agg(count(lit(1)).as("n")).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(streamed == batch)
    } finally q.stop()
  }

  test("checkpoint restart: admitted files replay from the offset log, no duplicates") {
    val dir = Files.createTempDirectory("nifti_stream_ckpt_").toString
    val ckpt = Files.createTempDirectory("nifti_stream_ckpt_log_").toString
    val out = Files.createTempDirectory("nifti_stream_out_").toString
    def start() = spark.readStream.format("nifti").option("mode", "slices")
      .load(dir)
      .select("path", "base", "orient", "idx")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()

    land(dir, "vol00.nii", 0)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()

    land(dir, "vol01.nii", 1)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val rows = spark.read.parquet(out)
    assert(rows.count() == 2L * slicesPerVol)
    // exactly once per (base, orient, idx) — a restart re-reading vol00
    // would double its rows
    assert(rows.groupBy("base", "orient", "idx").count()
      .filter(col("count") > 1).count() == 0)
  }

  test("Trigger.AvailableNow drains the start-time snapshot and stops") {
    val dir = Files.createTempDirectory("nifti_stream_now_").toString
    (0 until 4).foreach(v => land(dir, f"vol$v%02d.nii", v))
    val q = spark.readStream.format("nifti").option("mode", "slices")
      .option("maxFilesPerTrigger", "2")
      .load(dir)
      .groupBy("orient").agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("nifti_now")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(!q.isActive, "AvailableNow query should terminate on its own")
    val got = spark.table("nifti_now").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expect = Nifti.Orientations.map(o =>
      o -> 4L * Nifti.sliceCount(dims, o)).toMap
    assert(got == expect)
  }

  test("option-declared narrowing reaches the streaming scan; .filter stays post-scan") {
    // Catalyst's V2 pushdown rule only rewrites BATCH plans, so a streaming
    // .filter(orient === ...) runs AFTER the scan (measured: all 20 planes
    // admitted as input rows). The orient/idxMin/idxMax reader options are
    // the guaranteed narrowing path — the scan plans only matching planes.
    val dir = Files.createTempDirectory("nifti_stream_push_").toString
    land(dir, "vol00.nii", 0)
    val q = spark.readStream.format("nifti").option("mode", "slices")
      .option("orient", "axial")
      .load(dir)
      .groupBy("orient").agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("nifti_push")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("nifti_push").collect()
      assert(rows.map(r => r.getString(0) -> r.getLong(1)).toMap ==
        Map("axial" -> Nifti.sliceCount(dims, "axial").toLong))
      // the scan itself admitted only the axial planes (a post-scan filter
      // would still read all 20)
      val inputRows = q.recentProgress.map(_.numInputRows).sum
      assert(inputRows == Nifti.sliceCount(dims, "axial").toLong,
        s"expected option-narrowed scan to admit only axial planes, read $inputRows")
    } finally q.stop()
  }

  test("a corrupt file landing mid-stream does not kill a 24/7 ingest (ignoreCorrupt)") {
    val dir = Files.createTempDirectory("nifti_stream_corrupt_").toString
    land(dir, "vol00.nii", 0)
    val q = spark.readStream.format("nifti").option("mode", "slices")
      .option("ignoreCorrupt", "true")
      .load(dir)
      .groupBy("base").agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("nifti_corrupt")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      // a truncated scan file lands next to a good one
      Files.write(Paths.get(dir, "vol_bad.nii"), Array.fill[Byte](100)(7))
      land(dir, "vol02.nii", 2)
      q.processAllAvailable()
      assert(q.isActive, "ignoreCorrupt stream must survive a bad file")
      val got = spark.table("nifti_corrupt").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == Map("vol00" -> slicesPerVol.toLong, "vol02" -> slicesPerVol.toLong),
        s"good volumes processed, corrupt skipped: $got")
    } finally q.stop()
  }

  test("orient/idx options narrow the BATCH scan identically") {
    val dir = Files.createTempDirectory("nifti_opt_batch_").toString
    land(dir, "vol00.nii", 0)
    val df = spark.read.format("nifti").option("mode", "slices")
      .option("orient", "sagittal").option("idxMin", "2").option("idxMax", "5")
      .load(dir)
    val idxs = df.select("idx").collect().map(_.getInt(0)).sorted
    assert(idxs.toSeq == Seq(2, 3, 4, 5))
    assert(df.select("orient").distinct().collect().map(_.getString(0)).toSeq ==
      Seq("sagittal"))
  }
}
