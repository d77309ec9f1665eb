package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Npy
import graft.sinks.KvStore
import graft.sources.Nifti

/** End-to-end library test through REAL files: NIfTI volumes on disk →
  * typed pipeline → sharded store → point lookups (the "switch from the
  * reference to this library" user journey). */
class MriPipelineSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("files → slices → split → degrade → store → lookup") {
    // write 3 synthetic NIfTI files (one gzipped) to a temp dir
    val inDir = java.nio.file.Files.createTempDirectory("mri_in_").toFile
    val dims = Array(20, 18, 4)
    (0 until 3).foreach { v =>
      val vol = Array.tabulate(dims.product) { i =>
        val x = i % 20; val y = (i / 20) % 18
        if (math.hypot(x - 10, y - 9) < 6) 200f + (i % 30) else (i % 12).toFloat
      }
      val bytes = Nifti.encode(vol, dims, Array(0.5, 0.5, 0.5))
      if (v == 2) {
        val bos = new java.io.ByteArrayOutputStream()
        val g = new java.util.zip.GZIPOutputStream(bos)
        g.write(bytes); g.close()
        java.nio.file.Files.write(new java.io.File(inDir, s"vol$v.nii.gz").toPath, bos.toByteArray)
      } else {
        java.nio.file.Files.write(new java.io.File(inDir, s"vol$v.nii").toPath, bytes)
      }
    }

    val sl = MriPipeline.slices(spark, inDir.getAbsolutePath)
    val expectedSlices = 3 * (4 + 4 + 18) // axial d2 + coronal d2 + sagittal d1
    assert(sl.count() == expectedSlices)

    val plan = MriPipeline.planSplit(sl, seed = 42)
    assert(plan.count() == expectedSlices)
    assert(plan.select("split").distinct().count() >= 2)

    // metadata-only planning (352-byte header reads) must produce the
    // IDENTICAL label set without touching a pixel
    graft.sources.NiftiSource.bytesRead.set(0L)
    val metaPlan = MriPipeline.planSplitFromHeaders(spark, inDir.getAbsolutePath, seed = 42)
      .collect().map(l => l.sliceId -> l.split).toMap
    val headerBytes = graft.sources.NiftiSource.bytesRead.get()
    val decodedPlan = plan.collect().map(l => l.sliceId -> l.split).toMap
    assert(metaPlan == decodedPlan, "header-planned split must match decoded-slice split")
    assert(headerBytes < 3L * 4096, s"planning read $headerBytes bytes — not metadata-only")

    val rec = MriPipeline.degradeToRecords(sl, plan, "3tFlash", crop = 8, step = 4, seed = 7)
    val recs = rec.cache()
    val n = recs.count()
    assert(n > 0 && n % 2 == 0, s"HR/LR records must pair up, got $n")

    // HR/LR key parity (J5): equal counts per tier
    val stats = MriPipeline.runStats(recs).collect()
    val byTier = stats.groupBy(_.getAs[String]("tier")).view.mapValues(_.map(_.getAs[Long]("n_patches")).sum)
    assert(byTier("HR") == byTier("LRx2"), s"tier parity: $byTier")

    val store = java.nio.file.Files.createTempDirectory("mri_store_").toString
    new java.io.File(store).delete()
    MriPipeline.writeStore(recs, store, meta = Seq(
      "preset" -> "3tFlash", "crop_hr" -> "8", "step_hr" -> "4",
      "scales" -> "[2]", "split_unit" -> "slice",
      "normalize_percentiles" -> "(0.5, 99.5)", "split_ratio" -> "(0.95, 0.03, 0.02)"))

    // run-level manifest (S13): dataset_meta.txt is written next to the
    // shards and reads back as typed rows
    val metaMap = MriPipeline.readRunMeta(spark, store)
      .collect().map(m => m.key -> m.value).toMap
    assert(metaMap("preset") == "3tFlash" && metaMap("crop_hr") == "8")
    assert(metaMap("split_unit") == "slice" && metaMap.size == 7)
    assert(KvStore.readText(store, "dataset_meta.txt").contains("split_ratio: (0.95, 0.03, 0.02)"))

    // point lookup returns a decodable patch of the right shape
    val keys = KvStore.listKeys(store, Some("/HR/"), 5)
    assert(keys.nonEmpty)
    val (patch, shape) = Npy.decode(KvStore.get(store, keys.head).get)
    assert(shape == Seq(8, 8, 1) || shape == Seq(8, 8))
    assert(patch.length == 64)
    // determinism: re-running the degrade yields byte-identical records
    val rec2 = MriPipeline.degradeToRecords(sl, plan, "3tFlash", crop = 8, step = 4, seed = 7)
    val h1 = recs.toDF().selectExpr("md5(value) h").orderBy("h").collect().map(_.getString(0)).toSeq
    val h2 = rec2.toDF().selectExpr("md5(value) h").orderBy("h").collect().map(_.getString(0)).toSeq
    assert(h1 == h2, "K13 retry-stability: identical seeds must give identical bytes")

    // seedMode=run (v2-serial semantics) differs from per-slice seeding
    val runMode = MriPipeline.degradeToRecords(sl, plan, "3tFlash", crop = 8, step = 4,
      seed = 7, seedMode = "run")
    val h3 = runMode.toDF().selectExpr("md5(value) h").orderBy("h").collect().map(_.getString(0)).toSeq
    assert(h3 != h1, "run-mode seeding must differ from slice-mode")

    // naive LR sampler (C5): same record count, no physics
    val naive = MriPipeline.degradeToRecords(sl, plan, "3tFlash", crop = 8, step = 4,
      seed = 7, lrMode = "naive")
    assert(naive.count() == n, "naive LR mode must produce the same HR/LR pairing")

    // format="lmdb": the same records land as byte-genuine LMDB envs — a
    // stock liblmdb consumer's view (key -> npy bytes) matches the KvStore
    val lmdbStore = java.nio.file.Files.createTempDirectory("mri_lmdb_").toString
    new java.io.File(lmdbStore).delete()
    MriPipeline.writeStore(recs, lmdbStore, meta = Seq("preset" -> "3tFlash"),
      format = "lmdb")
    graft.sinks.LmdbStore.auditAll(lmdbStore) // every page structurally valid
    val viaLmdb = graft.sinks.LmdbStore.get(lmdbStore, keys.head).get
    assert(java.util.Arrays.equals(viaLmdb, KvStore.get(store, keys.head).get),
      "lmdb and kvstore forms must hold identical bytes per key")
    assert(MriPipeline.readRunMeta(spark, lmdbStore).count() == 1)
    recs.unpersist()
  }

  test("planSplitNumpyParity reproduces the reference's exact membership (numpy goldens)") {
    // Universe: 5 volumes, shapes (4+j, 5+j, 6+j), all three orientations —
    // n = 115 ids in the reference's enumeration order. Goldens below are a
    // numpy-1.26.4 replay of plan_slice_split (v2/nii_to_lmdb.py:47-113)
    // with split_ratio=(0.8, 0.1, 0.1): the full val and test member sets
    // per seed (train is the complement, so this pins every id's label).
    val volumes = (0 until 5).map(j => (s"v$j", (4 + j, 5 + j, 6 + j)))
    val ids = MriPipeline.referenceSliceIds(volumes)
    assert(ids.length == 115)
    assert(ids.take(2) == Seq("v0__axial__slice_000", "v0__axial__slice_001"))

    val goldens: Map[Long, (Set[String], Set[String])] = Map(
      0L -> (Set("v0__coronal__slice_001", "v0__sagittal__slice_002",
        "v1__sagittal__slice_000", "v2__axial__slice_001", "v2__coronal__slice_003",
        "v2__sagittal__slice_005", "v3__coronal__slice_004", "v3__coronal__slice_007",
        "v3__coronal__slice_008", "v4__coronal__slice_006", "v4__coronal__slice_007"),
        Set("v1__coronal__slice_005", "v1__sagittal__slice_002", "v2__axial__slice_004",
          "v2__sagittal__slice_001", "v2__sagittal__slice_003", "v2__sagittal__slice_006",
          "v3__axial__slice_003", "v3__coronal__slice_000", "v3__sagittal__slice_000",
          "v3__sagittal__slice_001", "v4__axial__slice_009", "v4__sagittal__slice_008")),
      7L -> (Set("v0__axial__slice_005", "v0__sagittal__slice_003",
        "v1__axial__slice_001", "v1__sagittal__slice_000", "v1__sagittal__slice_002",
        "v1__sagittal__slice_003", "v2__axial__slice_001", "v3__coronal__slice_002",
        "v3__coronal__slice_003", "v4__axial__slice_007", "v4__axial__slice_008"),
        Set("v0__coronal__slice_005", "v1__axial__slice_004", "v1__coronal__slice_001",
          "v2__axial__slice_004", "v2__axial__slice_006", "v2__coronal__slice_007",
          "v3__axial__slice_000", "v3__axial__slice_006", "v3__coronal__slice_000",
          "v4__axial__slice_001", "v4__axial__slice_009", "v4__coronal__slice_002")),
      123L -> (Set("v0__coronal__slice_000", "v0__coronal__slice_002",
        "v0__sagittal__slice_000", "v1__coronal__slice_003", "v1__sagittal__slice_002",
        "v2__axial__slice_007", "v2__coronal__slice_000", "v3__axial__slice_001",
        "v3__axial__slice_002", "v3__coronal__slice_006", "v4__axial__slice_002"),
        Set("v0__axial__slice_005", "v0__sagittal__slice_004", "v1__axial__slice_005",
          "v1__coronal__slice_001", "v1__sagittal__slice_004", "v2__coronal__slice_001",
          "v2__coronal__slice_004", "v3__coronal__slice_004", "v3__coronal__slice_007",
          "v3__coronal__slice_008", "v4__axial__slice_000", "v4__axial__slice_005")),
      999L -> (Set("v0__axial__slice_004", "v0__coronal__slice_000",
        "v0__sagittal__slice_002", "v0__sagittal__slice_004", "v1__axial__slice_004",
        "v2__coronal__slice_000", "v2__sagittal__slice_003", "v3__axial__slice_007",
        "v3__sagittal__slice_001", "v3__sagittal__slice_007", "v4__coronal__slice_005"),
        Set("v0__axial__slice_000", "v0__coronal__slice_005", "v0__sagittal__slice_001",
          "v1__coronal__slice_004", "v2__axial__slice_007", "v3__sagittal__slice_002",
          "v4__axial__slice_005", "v4__axial__slice_009", "v4__coronal__slice_003",
          "v4__sagittal__slice_000", "v4__sagittal__slice_004", "v4__sagittal__slice_007")))

    goldens.foreach { case (seed, (expVal, expTest)) =>
      val got = MriPipeline.planSplitNumpyParity(spark, ids, seed,
        trainRatio = 0.8, valRatio = 0.1).collect()
      assert(got.length == 115, s"seed $seed: one label per id")
      val byLabel = got.groupBy(_.split).view.mapValues(_.map(_.sliceId).toSet).toMap
      assert(byLabel("val") == expVal, s"seed $seed: val membership")
      assert(byLabel("test") == expTest, s"seed $seed: test membership")
      assert(byLabel("train") == ids.toSet -- expVal -- expTest,
        s"seed $seed: train is the complement")
      // int-floored reference cuts: n_tr = int(115*0.8) = 92, n_va = 11
      assert(byLabel("train").size == 92 && expVal.size == 11 && expTest.size == 12)
      // determinism: a second planning pass is bitwise-identical
      val again = MriPipeline.planSplitNumpyParity(spark, ids, seed,
        trainRatio = 0.8, valRatio = 0.1).collect()
      assert(got.map(l => (l.sliceId, l.split)).toMap ==
        again.map(l => (l.sliceId, l.split)).toMap, s"seed $seed: retry-stable")
    }
  }

  test("slicesLazy matches the eager path (ids, shapes, pixels within sketch tolerance)") {
    // mixed fixture: two seekable .nii (the plane-range streaming path)
    // plus one .nii.gz (exercises the documented legacy whole-file
    // fallback THROUGH slicesLazy)
    val inDir = java.nio.file.Files.createTempDirectory("mri_lazy_").toFile
    val dims = Array(20, 18, 4)
    (0 until 3).foreach { v =>
      val vol = Array.tabulate(dims.product) { i =>
        val x = i % 20; val y = (i / 20) % 18
        if (math.hypot(x - 10, y - 9) < 6) 200f + ((i * 7 + v) % 30) else ((i + v) % 12).toFloat
      }
      val bytes = Nifti.encode(vol, dims, Array(0.5, 0.5, 0.5))
      if (v == 2) {
        val bos = new java.io.ByteArrayOutputStream()
        val g = new java.util.zip.GZIPOutputStream(bos)
        g.write(bytes); g.close()
        java.nio.file.Files.write(new java.io.File(inDir, s"vol$v.nii.gz").toPath, bos.toByteArray)
      } else {
        java.nio.file.Files.write(new java.io.File(inDir, s"vol$v.nii").toPath, bytes)
      }
    }
    def keyed(rows: Array[model.Slice]): Map[String, model.Slice] =
      rows.map(s => s.sliceId -> s).toMap
    val eager = keyed(MriPipeline.slices(spark, inDir.getAbsolutePath).collect())
    val lazy_ = keyed(MriPipeline.slicesLazy(spark, inDir.getAbsolutePath).collect())
    assert(lazy_.keySet == eager.keySet)
    assert(eager.size == 3 * (4 + 4 + 18))
    lazy_.foreach { case (id, sl) =>
      val es = eager(id)
      assert(sl.h == es.h && sl.w == es.w, s"$id shape")
      assert(sl.pixels.forall(v => v >= 0f && v <= 1f), s"$id range")
      // clip points come from a Greenwald-Khanna sample (no interpolation)
      // vs the eager path's interpolated exact percentile — on this value
      // distribution (range ~230, neighbor gaps ≤ ~2) the cut drift bounds
      // the per-pixel difference well under 0.03
      var i = 0
      while (i < sl.pixels.length) {
        assert(math.abs(sl.pixels(i) - es.pixels(i)) <= 0.03f,
          s"$id pixel $i: ${sl.pixels(i)} vs ${es.pixels(i)}")
        i += 1
      }
    }
  }

  test("slicesLazy ids stay distinct and batch-identical past 1000 planes; NaN voxels don't poison the sketch") {
    // (2, 2, 1050): 1050 axial planes of 4 voxels — tiny bytes, but idx
    // reaches 4 digits, where lpad-style padding TRUNCATES ('1009'→'100')
    // and collides ids; %03d is min-width and must not. A few NaN voxels
    // exercise the nanPercentile-parity skip in the clip-point sketch.
    val inDir = java.nio.file.Files.createTempDirectory("mri_lazy_big_").toFile
    val dims = Array(2, 2, 1050)
    val vol = Array.tabulate(dims.product)(i =>
      if (i % 97 == 0) Float.NaN else (i % 251).toFloat)
    java.nio.file.Files.write(new java.io.File(inDir, "volx.nii").toPath,
      Nifti.encode(vol, dims, Array(0.5, 0.5, 0.5)))
    val lzy = MriPipeline.slicesLazy(spark, inDir.getAbsolutePath,
      orients = Seq("axial")).collect()
    assert(lzy.length == 1050)
    val ids = lzy.map(_.sliceId)
    assert(ids.distinct.length == 1050, "sliceIds must not collide past idx 999")
    val eagerIds = MriPipeline.slices(spark, inDir.getAbsolutePath,
      orients = Seq("axial")).collect().map(_.sliceId)
    assert(ids.sorted.toSeq == eagerIds.sorted.toSeq,
      "lazy and batch paths must agree on the id scheme")
    // the NaN voxels must not poison the normalization: all non-NaN
    // outputs stay in [0, 1]
    assert(lzy.flatMap(_.pixels).filterNot(_.isNaN).forall(v => v >= 0f && v <= 1f))
  }
}
