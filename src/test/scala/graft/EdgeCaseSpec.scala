package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Fft, Npy}
import graft.sinks.KvStore

class EdgeCaseSpec extends AnyFunSuite {

  test("float16 special values roundtrip: NaN, infinities, zero, subnormals") {
    assert(Npy.halfToFloat(Npy.floatToHalf(Float.NaN)).isNaN)
    assert(Npy.halfToFloat(Npy.floatToHalf(Float.PositiveInfinity)) == Float.PositiveInfinity)
    assert(Npy.halfToFloat(Npy.floatToHalf(Float.NegativeInfinity)) == Float.NegativeInfinity)
    assert(Npy.halfToFloat(Npy.floatToHalf(0f)) == 0f)
    assert(Npy.halfToFloat(Npy.floatToHalf(-0f)) == -0f)
    assert(Npy.halfToFloat(Npy.floatToHalf(65504f)) == 65504f) // f16 max
    assert(Npy.halfToFloat(Npy.floatToHalf(1e10f)) == Float.PositiveInfinity) // overflow
    val sub = Npy.halfToFloat(Npy.floatToHalf(3.0e-5f)) // subnormal range
    assert(math.abs(sub - 3.0e-5f) < 3.0e-7f)
    assert(Npy.halfToFloat(Npy.floatToHalf(1e-10f)) == 0f) // underflow to zero
  }

  test("big-endian NIfTI decodes: header byte-swap detected, payload ordered correctly") {
    import java.nio.{ByteBuffer, ByteOrder}
    val dims = Array(3, 2, 2)
    val vol = Array.tabulate(dims.product)(i => (i * 1.5f) - 4f)
    val bb = ByteBuffer.allocate(352 + vol.length * 4).order(ByteOrder.BIG_ENDIAN)
    bb.putInt(0, 348)
    bb.putShort(40, 3.toShort)
    bb.putShort(42, dims(0).toShort); bb.putShort(44, dims(1).toShort); bb.putShort(46, dims(2).toShort)
    bb.putShort(70, 16.toShort) // FLOAT32
    bb.putFloat(80, 1f); bb.putFloat(84, 1f); bb.putFloat(88, 1f)
    bb.putFloat(108, 352f) // vox_offset
    bb.putFloat(112, 1f); bb.putFloat(116, 0f) // scl slope/inter
    bb.position(352)
    vol.foreach(bb.putFloat)
    val bytes = bb.array()
    val h = graft.sources.Nifti.parseHeader(bytes)
    assert(!h.littleEndian && h.dims.toSeq == dims.toSeq && h.datatype == 16)
    val (_, decoded) = graft.sources.Nifti.readVolume(bytes)
    assert(decoded.toSeq == vol.toSeq)
    // lazy slice path honors the byte order too
    val (px, sh, sw) = graft.sources.Nifti.readSliceLazy(bytes, "axial", 1)
    val (expPx, eh, ew) = graft.sources.Nifti.sliceOf(vol, dims, "axial", 1)
    assert(sh == eh && sw == ew && px.toSeq == expPx.toSeq)
  }

  test("npy 1D and 3D shapes roundtrip") {
    val (d1, s1) = Npy.decode(Npy.encode(Array(1f, 2f, 3f), Seq(3)))
    assert(s1 == Seq(3) && d1.toSeq == Seq(1f, 2f, 3f))
    val (d3, s3) = Npy.decode(Npy.encode(Array.tabulate(24)(_.toFloat), Seq(2, 3, 4)))
    assert(s3 == Seq(2, 3, 4) && d3.length == 24)
    intercept[IllegalArgumentException](Npy.encode(Array(1f), Seq(2)))
    intercept[IllegalArgumentException](Npy.decode("garbage-bytes!".getBytes))
  }

  test("fft chirp cache: concurrent threads, repeated lengths, and cache-bound eviction") {
    // hammer the cached Bluestein path from many threads at the same lengths
    val ref = {
      val re = Array.tabulate(21)(i => math.sin(i * 0.7)); val im = new Array[Double](21)
      Fft.forward(re, im); (re.toSeq, im.toSeq)
    }
    val threads = (0 until 8).map { _ =>
      new Thread(() => {
        for (_ <- 0 until 50; n <- Seq(21, 13, 100, 21)) {
          val re = Array.tabulate(n)(i => math.sin(i * 0.7)); val im = new Array[Double](n)
          Fft.forward(re, im)
          if (n == 21) {
            assert(re.toSeq == ref._1 && im.toSeq == ref._2, "cached path must be bit-stable")
          }
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    // exceed the 64-length cache bound; results must stay correct after eviction
    for (n <- 65 to 135) {
      val re = Array.tabulate(n)(_.toDouble); val im = new Array[Double](n)
      Fft.forward(re, im)
      // X_0 = sum of inputs
      assert(math.abs(re(0) - (0 until n).sum.toDouble) < 1e-6, s"n=$n")
    }
  }

  test("kv store: multiple shards, overlapping keys resolve, empty store behavior") {
    val tmp = java.nio.file.Files.createTempDirectory("kvedge_").toString
    new java.io.File(tmp).delete()
    KvStore.create(tmp)
    val w0 = new KvStore.ShardWriter(tmp, 0)
    val w1 = new KvStore.ShardWriter(tmp, 1)
    w0.put("k0", Array[Byte](1), Seq(1), "float32")
    w1.put("k1", Array[Byte](2, 2), Seq(2), "float32")
    w0.close(); w1.close()
    KvStore.commit(tmp)
    assert(KvStore.get(tmp, "k0").get.toSeq == Seq[Byte](1))
    assert(KvStore.get(tmp, "k1").get.toSeq == Seq[Byte](2, 2))
    assert(KvStore.listKeys(tmp) == Seq("k0", "k1"))
    // uncommitted store (no manifest) refuses reads
    val raw = java.nio.file.Files.createTempDirectory("kvedge2_").toString
    new java.io.File(raw).delete()
    KvStore.create(raw)
    intercept[IllegalArgumentException](KvStore.listKeys(raw))
  }

  test("round-8 text helpers are schema-stable on empty input") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    import graft.operators.TextOps
    // line dedup: empty boiler set, empty rollup — no crash, zero rows
    val noLines = Seq.empty[(Long, String, String)].toDF("doc_id", "source", "line")
    assert(TextOps.lineDedupStats(noLines, 2).collect().isEmpty)
    // calibration: no bins, no totals — zero rows
    val noScores = Seq.empty[(Long, Long)].toDF("conf", "p")
    assert(TextOps.calibrationEce(noScores).collect().isEmpty)
    // vocab growth: empty corpus short-circuits (the maxId read would
    // otherwise NPE) with the full 6-column schema intact
    val noDocs = Seq.empty[(Long, Seq[String])].toDF("doc_id", "w")
    val vg = TextOps.vocabGrowth(noDocs)
    assert(vg.columns.toSeq ==
      Seq("k", "cut", "docs_cum", "tokens_cum", "vocab_cum", "new_words"))
    assert(vg.collect().isEmpty)
    // SNM and PassJoin: empty candidate spaces, zero rows
    val noDocs2 = Seq.empty[(Long, String)].toDF("doc_id", "t")
    assert(TextOps.sortedNeighborhoodPairs(noDocs2, 5, 2).collect().isEmpty)
    assert(TextOps.passJoinPairs(noDocs2, 2).collect().isEmpty)
  }
}
