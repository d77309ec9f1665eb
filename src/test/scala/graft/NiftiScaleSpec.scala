package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.Tag
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Nifti, NiftiSource}

object SlowTag extends Tag("graft.Slow")

/** The reference's ACTUAL unit of work is a (960, 840, 640) 0.2 mm FLASH
  * volume (show_images.py:21-23, BASELINE.md) — 2.06 GB of float32. This
  * spec drives one volume of exactly that shape through the production
  * metadata-first path (header scan → planSplitFromHeaders → pushed-down
  * lazy slice reads) with byte accounting, proving the engine never falls
  * back to an eager whole-volume read at reference scale:
  * the whole planning pass costs 352 header bytes, and each slice fetch
  * costs one plane (axial/coronal) or d2 strided rows (sagittal) — ~3 MB
  * against the 2.06 GB payload.
  */
class NiftiScaleSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dims = Array(960, 840, 640)
  private val bpv = 4L
  private val payload = dims(0).toLong * dims(1) * dims(2) * bpv // 2,064,384,000

  /** Deterministic voxel value from the absolute (Fortran-order) index —
    * recomputable at any (x, y, z) without holding the volume. */
  private def voxel(i: Long): Float =
    ((i * 2654435761L) & 0xffffL).toFloat / 65536f

  /** Stream the reference-shaped volume to disk without ever materializing
    * it: header bytes come from the library's own encoder (tiny volume),
    * with the three dim shorts patched to the target shape, so the fixture
    * can't drift from the writer the round-trip tests pin. */
  private def writeBigVolume(dir: String): String = {
    val tiny = Nifti.encode(new Array[Float](8), Array(2, 2, 2), Array(0.2, 0.2, 0.2))
    val header = java.util.Arrays.copyOfRange(tiny, 0, 352)
    val hb = ByteBuffer.wrap(header).order(ByteOrder.LITTLE_ENDIAN)
    hb.putShort(42, dims(0).toShort)
    hb.putShort(44, dims(1).toShort)
    hb.putShort(46, dims(2).toShort)
    val path = Paths.get(dir, "flash200um.nii")
    val out = new java.io.BufferedOutputStream(
      Files.newOutputStream(path), 1 << 20)
    out.write(header)
    val chunk = ByteBuffer.allocate((1 << 16) * 4).order(ByteOrder.LITTLE_ENDIAN)
    val total = dims(0).toLong * dims(1) * dims(2)
    var i = 0L
    while (i < total) {
      chunk.clear()
      val n = math.min(1L << 16, total - i).toInt
      var j = 0
      while (j < n) { chunk.putFloat(voxel(i + j)); j += 1 }
      out.write(chunk.array(), 0, n * 4)
      i += n
    }
    out.close()
    path.toString
  }

  test("reference-shaped volume: header-only planning + lazy slice reads, no eager fallback", SlowTag) {
    val dir = Files.createTempDirectory("nifti_big_").toString
    val path = writeBigVolume(dir)
    assert(Files.size(Paths.get(path)) == 352L + payload)

    // 1. header scan: the entire metadata pass costs exactly 352 bytes
    NiftiSource.bytesRead.set(0L)
    val hdr = Nifti.headers(spark, dir).collect()
    assert(hdr.length == 1)
    assert(hdr.head.getAs[scala.collection.Seq[Int]]("shape").toSeq == dims.toSeq)
    assert(hdr.head.getAs[Int]("datatype") == 16)
    assert(NiftiSource.bytesRead.get() == 352L,
      s"header scan read ${NiftiSource.bytesRead.get()} bytes")

    // 2. split planning from headers only: axial 640 + coronal 640 +
    //    sagittal 840 = 2120 slice ids, still zero payload bytes
    NiftiSource.bytesRead.set(0L)
    val labels = MriPipeline.planSplitFromHeaders(spark, dir).collect()
    assert(labels.length == 2 * dims(2) + dims(1))
    assert(labels.map(_.split).toSet.subsetOf(Set("train", "val", "test")))
    assert(NiftiSource.bytesRead.get() == 352L,
      s"split plan read ${NiftiSource.bytesRead.get()} bytes")

    // 3. pushed-down axial slice: one 3.2 MB plane from the 2.06 GB file,
    //    values matching the generator at recomputed offsets
    val z = 320
    NiftiSource.bytesRead.set(0L)
    val ax = Nifti.rawSlices(spark, dir)
      .filter(col("orient") === "axial" && col("idx") === z)
      .collect()
    val axRead = NiftiSource.bytesRead.get()
    val plane = dims(0).toLong * dims(1) * bpv
    assert(ax.length == 1)
    assert(axRead <= 352L + plane && axRead < payload / 100,
      s"axial slice read $axRead bytes — eager fallback?")
    val px = ax.head.getAs[scala.collection.Seq[Float]]("pixels")
    assert(ax.head.getAs[Int]("h") == dims(0) && ax.head.getAs[Int]("w") == dims(1))
    // axial M[a,b] = vol[a, b, z]; Fortran index = a + b*d0 + z*d0*d1
    for ((a, b) <- Seq((0, 0), (1, 0), (0, 1), (959, 839), (480, 420))) {
      val want = voxel(a.toLong + b.toLong * dims(0) + z.toLong * dims(0) * dims(1))
      assert(px(a * dims(1) + b) == want, s"axial voxel ($a,$b)")
    }

    // 4. sagittal slice (strided rows reaching the far end of the 2 GB
    //    payload — Long offsets throughout): d2 rows of d0 voxels
    val y = 400
    NiftiSource.bytesRead.set(0L)
    val sg = Nifti.rawSlices(spark, dir)
      .filter(col("orient") === "sagittal" && col("idx") === y)
      .collect()
    val sgRead = NiftiSource.bytesRead.get()
    val rows = dims(2).toLong * dims(0) * bpv
    assert(sg.length == 1)
    assert(sgRead <= 352L + rows && sgRead < payload / 100,
      s"sagittal slice read $sgRead bytes — eager fallback?")
    val spx = sg.head.getAs[scala.collection.Seq[Float]]("pixels")
    assert(sg.head.getAs[Int]("h") == dims(2) && sg.head.getAs[Int]("w") == dims(0))
    // sagittal M[a,b] = vol[b, y, a]; the a = 639 row sits ~2.0 GB in
    for ((a, b) <- Seq((0, 0), (639, 0), (639, 959), (320, 480))) {
      val want = voxel(b.toLong + y.toLong * dims(0) + a.toLong * dims(0) * dims(1))
      assert(spx(a * dims(0) + b) == want, s"sagittal voxel ($a,$b)")
    }

    // cleanup: 2 GB temp files should not outlive the test
    Files.deleteIfExists(Paths.get(path))
    Files.deleteIfExists(Paths.get(dir))
    ()
  }
}
