package graft

import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Nifti, NiftiSource}

/** DataSource V2 NIfTI scans: header-only byte accounting, orient/idx
  * pushdown parity with the eager decode path, pixels-column pruning,
  * and the gzip full-read fallback. */
class NiftiSourceSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dims = Array(10, 8, 6)

  private def mkVolume(seed: Int): Array[Float] =
    Array.tabulate(dims.product)(i => ((seed * 31 + i * 7) % 997).toFloat / 10f)

  private def pixelsOf(r: Row): Seq[Float] =
    r.getAs[scala.collection.Seq[Float]]("pixels").toSeq

  /** Writes n uncompressed volumes (+ one gzipped); returns
    * (dir, plainFileLen, gzDiskLen). */
  private def writeFixtures(n: Int): (String, Long, Long) = {
    val dir = Files.createTempDirectory("nifti_dsv2_").toString
    (0 until n).foreach { v =>
      val bytes = Nifti.encode(mkVolume(v), dims, Array(0.5, 0.5, 0.5))
      Files.write(Paths.get(dir, f"vol$v%02d.nii"), bytes)
    }
    val gzBytes = {
      val raw = Nifti.encode(mkVolume(99), dims, Array(0.5, 0.5, 0.5))
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new GZIPOutputStream(bos)
      gz.write(raw); gz.close()
      bos.toByteArray
    }
    Files.write(Paths.get(dir, "vol99.nii.gz"), gzBytes)
    (dir, 352L + dims.product * 4, gzBytes.length.toLong)
  }

  test("header scan reads ~352 bytes per plain file, never the payload") {
    val (dir, plainLen, gzLen) = writeFixtures(4)
    NiftiSource.bytesRead.set(0L)
    // no orderBy here: a global sort adds a range-partitioning sampling
    // pass that would run the scan (and its reads) twice
    val rows = Nifti.headers(spark, dir).collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getAs[scala.collection.Seq[Int]]("shape").toSeq == dims.toSeq))
    assert(rows.forall(_.getAs[Int]("datatype") == 16))
    val read = NiftiSource.bytesRead.get()
    // exactly 352/plain file + a bounded prefix of the gzip member —
    // the payload (4 × plainLen) is never touched
    assert(read == 4 * 352 + math.min(4096L, gzLen), s"header scan read $read bytes")
    assert(read < 4 * plainLen, s"header scan read $read of ${4 * plainLen + gzLen}")
  }

  test("orient/idx pushdown: plan shows pushed filters, bytes stay bounded, values match eager decode") {
    val (dir, _, gzLen) = writeFixtures(3)
    val df = Nifti.rawSlices(spark, dir)
      .filter(col("orient") === "axial" && col("idx") === 3)
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("NiftiScan"), s"expected custom scan:\n$plan")
    assert(plan.contains("pushed=") && plan.contains("orient"),
      s"expected pushed orient filter:\n$plan")

    NiftiSource.bytesRead.set(0L)
    val got = df.collect() // driver-side checks below; orderBy would re-scan
    val read = NiftiSource.bytesRead.get()
    assert(got.length == 4) // 3 plain + 1 gz
    // plain: header + ONE plane each; gz: bounded header prefix + full read
    val bound = 3 * (352L + dims(0) * dims(1) * 4) + math.min(4096L, gzLen) + gzLen
    assert(read <= bound, s"pushed slice scan read $read > $bound bytes")

    got.filter(!_.getAs[String]("path").endsWith(".gz")).foreach { r =>
      val v = r.getAs[String]("base").stripPrefix("vol").toInt
      val (px, h, w) = Nifti.sliceOf(mkVolume(v), dims, "axial", 3)
      assert(r.getAs[Int]("h") == h && r.getAs[Int]("w") == w)
      assert(pixelsOf(r) == px.toSeq)
    }
    // the gzip fallback row must agree with the eager path too
    got.filter(_.getAs[String]("path").endsWith(".gz")).foreach { r =>
      val (px, _, _) = Nifti.sliceOf(mkVolume(99), dims, "axial", 3)
      assert(pixelsOf(r) == px.toSeq)
    }
  }

  test("sagittal seek read matches eager decode") {
    val (dir, _, _) = writeFixtures(2)
    val got = Nifti.rawSlices(spark, dir)
      .filter(col("orient") === "sagittal" && col("idx") === 5)
      .filter(!col("path").endsWith(".gz"))
      .orderBy("base").collect()
    assert(got.length == 2)
    got.foreach { r =>
      val v = r.getAs[String]("base").stripPrefix("vol").toInt
      val (px, h, w) = Nifti.sliceOf(mkVolume(v), dims, "sagittal", 5)
      assert(r.getAs[Int]("h") == h && r.getAs[Int]("w") == w)
      assert(pixelsOf(r) == px.toSeq)
    }
  }

  test("pixels pruning: metadata projection reads only headers") {
    val (dir, _, gzLen) = writeFixtures(4)
    NiftiSource.bytesRead.set(0L)
    val n = Nifti.rawSlices(spark, dir)
      .filter(!col("path").endsWith(".gz"))
      .select("base", "orient", "idx", "h", "w")
      .count()
    // 4 plain files × (axial 6 + coronal 6 + sagittal 8) slices; the gz file
    // is filtered AFTER the scan but contributes only its header prefix —
    // pixels is pruned for every file, so no payload is fetched.
    assert(n == 4 * (6 + 6 + 8))
    val read = NiftiSource.bytesRead.get()
    assert(read <= 4 * 352 + math.min(4096L, gzLen), s"pruned scan read $read bytes")
  }

  test("gzip slice pushdown streams only the compressed prefix and matches eager decode") {
    val dir = Files.createTempDirectory("nifti_gz_").toString
    val big = Array(48, 40, 32) // 245 KiB payload — larger than the 64 KiB gzip read-ahead
    val rnd = new scala.util.Random(42) // incompressible payload, or the whole member fits one read
    val vol = Array.fill(big.product)(rnd.nextFloat() * 100f)
    val raw = Nifti.encode(vol, big, Array(1.0, 1.0, 1.0))
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new GZIPOutputStream(bos)
    gz.write(raw); gz.close()
    Files.write(Paths.get(dir, "big.nii.gz"), bos.toByteArray)
    val gzLen = bos.toByteArray.length.toLong

    NiftiSource.bytesRead.set(0L)
    val got = Nifti.rawSlices(spark, dir)
      .filter(col("orient") === "axial" && col("idx") === 2)
      .collect()
    val read = NiftiSource.bytesRead.get()
    assert(got.length == 1)
    val (px, h, w) = Nifti.sliceOf(vol, big, "axial", 2)
    assert(got(0).getAs[Int]("h") == h && got(0).getAs[Int]("w") == w)
    assert(pixelsOf(got(0)) == px.toSeq)
    // header prefix (≤4096) + streamed compressed prefix ≪ full member
    assert(read < gzLen / 2 + 4096, s"gz pushed slice read $read of $gzLen")

    // coronal rides the same z-plane stream; sagittal falls back to full read
    val cor = Nifti.rawSlices(spark, dir)
      .filter(col("orient") === "coronal" && col("idx") === 2).collect()
    val (cpx, chh, cww) = Nifti.sliceOf(vol, big, "coronal", 2)
    assert(cor.length == 1 && cor(0).getAs[Int]("h") == chh && cor(0).getAs[Int]("w") == cww)
    assert(pixelsOf(cor(0)) == cpx.toSeq)
    val sag = Nifti.rawSlices(spark, dir)
      .filter(col("orient") === "sagittal" && col("idx") === 7).collect()
    val (spx, shh, sww) = Nifti.sliceOf(vol, big, "sagittal", 7)
    assert(sag.length == 1 && sag(0).getAs[Int]("h") == shh && sag(0).getAs[Int]("w") == sww)
    assert(pixelsOf(sag(0)) == spx.toSeq)
  }

  test("volumes mode decodes full pixels; shape-only projection reads headers only") {
    val (dir, _, gzLen) = writeFixtures(2)
    val vols = Nifti.volumes(spark, dir).collect()
    assert(vols.length == 3)
    vols.filter(!_.getAs[String]("path").endsWith(".gz")).foreach { r =>
      val v = r.getAs[String]("path").split('/').last.stripPrefix("vol").take(2).toInt
      assert(r.getAs[scala.collection.Seq[Float]]("pixels").toSeq == mkVolume(v).toSeq)
    }
    NiftiSource.bytesRead.set(0L)
    val n = spark.read.format("nifti").option("mode", "volumes").load(dir)
      .select("path", "shape", "zooms").count()
    assert(n == 3)
    val read = NiftiSource.bytesRead.get()
    assert(read <= 2 * 352 + math.min(4096L, gzLen), s"pruned volume scan read $read bytes")
  }

  test("ignoreCorrupt skips unreadable files; default mode fails the scan") {
    val (dir, _, _) = writeFixtures(2)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "junk.nii"),
      Array.fill[Byte](100)(0x42))
    val strict = spark.read.format("nifti").option("mode", "headers").load(dir)
    intercept[org.apache.spark.SparkException](strict.count())
    val lenient = spark.read.format("nifti").option("mode", "headers")
      .option("ignoreCorrupt", "true").load(dir)
    assert(lenient.count() == 3) // 2 plain + 1 gz, junk skipped
    val lenientSlices = spark.read.format("nifti").option("mode", "slices")
      .option("ignoreCorrupt", "true").load(dir)
      .filter(col("orient") === "axial")
    assert(lenientSlices.count() == 3 * 6)
  }

  test("int16+scl volumes keep the lazy pushdown: bounded bytes, scl applied, parity with eager decode") {
    // the most common clinical NIfTI encoding: int16 raw values with
    // scl_slope/inter in the header (reference reads these lazily through
    // the nibabel proxy, v2/nii_to_lmdb_paralel.py:97-112)
    val dir = Files.createTempDirectory("nifti_i16_").toString
    val raw16 = Array.tabulate(dims.product)(i => ((i * 7) % 997 - 498).toFloat)
    val bytes = Nifti.encode(raw16, dims, Array(1.0, 1.0, 1.0),
      datatype = 4, sclSlope = 2.5f, sclInter = 10f)
    Files.write(Paths.get(dir, "i16.nii"), bytes)
    val gzBytes = {
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new GZIPOutputStream(bos)
      gz.write(bytes); gz.close()
      bos.toByteArray
    }
    Files.write(Paths.get(dir, "i16gz.nii.gz"), gzBytes)

    // eager decode (applies scl) is the ground truth for both lazy paths
    val (eh, evol) = Nifti.readVolume(bytes)
    assert(eh.datatype == 4 && eh.sclSlope == 2.5f)
    assert(evol(5) == raw16(5) * 2.5f + 10f)

    NiftiSource.bytesRead.set(0L)
    val got = Nifti.rawSlices(spark, dir)
      .filter(col("orient") === "axial" && col("idx") === 3)
      .collect()
    val read = NiftiSource.bytesRead.get()
    assert(got.length == 2)
    val (px, h, w) = Nifti.sliceOf(evol, dims, "axial", 3)
    got.foreach { r =>
      assert(r.getAs[Int]("h") == h && r.getAs[Int]("w") == w)
      assert(pixelsOf(r) == px.toSeq)
    }
    // plain: header + ONE int16 plane (2 bytes/voxel, half the float32
    // plane); gz: header prefix + streamed compressed prefix ≤ full member
    val bound = (352L + dims(0) * dims(1) * 2) + math.min(4096L, gzBytes.length.toLong) + gzBytes.length
    assert(read <= bound, s"int16 pushed scan read $read > $bound bytes")

    // the slice-level lazy reader agrees too (gzip container, sagittal stride)
    val (lpx, lh, lw) = Nifti.readSliceLazy(gzBytes, "sagittal", 5)
    val (spx, sh2, sw2) = Nifti.sliceOf(evol, dims, "sagittal", 5)
    assert(lh == sh2 && lw == sw2 && lpx.toSeq == spx.toSeq)

    // uint8 roundtrip through the same dtype-generic encoder/decoder
    val raw8 = Array.tabulate(dims.product)(i => (i % 256).toFloat)
    val b8 = Nifti.encode(raw8, dims, Array(1.0, 1.0, 1.0), datatype = 2)
    val (h8, v8) = Nifti.readVolume(b8)
    assert(h8.datatype == 2 && v8.toSeq == raw8.toSeq)
    val (l8, _, _) = Nifti.readSliceLazy(b8, "coronal", 2)
    assert(l8.toSeq == Nifti.sliceOf(raw8, dims, "coronal", 2)._1.toSeq)
  }

  test("slice counts per orientation match sliceCount, unfiltered scan is complete") {
    val (dir, _, _) = writeFixtures(1)
    val counts = Nifti.rawSlices(spark, dir)
      .groupBy("orient").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[String]("orient") -> r.getAs[Long]("n")).toMap
    // 2 files (1 plain + 1 gz), same dims
    assert(counts == Map("axial" -> 12L, "coronal" -> 12L, "sagittal" -> 16L))
  }

  test("small-volume corpus coalesces plane ranges across files; scan stays complete") {
    // 30 small volumes would be 90 per-(file, orient) tasks unpacked; the
    // range packer coalesces them toward 2× the scheduler parallelism
    // while a per-range budget floor keeps every core busy
    val dir = Files.createTempDirectory("nifti_pack_").toString
    (0 until 30).foreach { v =>
      val bytes = Nifti.encode(mkVolume(v), dims, Array(0.5, 0.5, 0.5))
      Files.write(Paths.get(dir, f"vol$v%02d.nii"), bytes)
    }
    val df = spark.read.format("nifti").option("mode", "slices").load(dir)
    val nParts = df.rdd.getNumPartitions
    val par = spark.sparkContext.defaultParallelism
    assert(nParts <= 2 * par + 1, s"expected packed partitions, got $nParts")
    assert(nParts >= math.min(par, 30), s"packing must not collapse parallelism: $nParts")
    // completeness + per-slice integrity survive multi-file tasks
    assert(df.count() == 30L * (6 + 6 + 8))
    val some = df.filter(col("base") === "vol17" && col("orient") === "coronal" && col("idx") === 3)
      .collect()
    assert(some.length == 1)
    val expected = Nifti.sliceOf(mkVolume(17), dims, "coronal", 3)._1
    assert(pixelsOf(some.head) == expected.toSeq)
  }
}
