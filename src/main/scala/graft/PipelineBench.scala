package graft

import org.apache.spark.sql.SparkSession

import graft.functions.{Degrade, Image, Npy, Rng}
import graft.sources.Nifti

/** Throughput benchmark for the flagship MRI pipeline (the reference's
  * actual workload shape): NIfTI decode → per-volume robust normalize →
  * oriented slices → v2 degrade (FFT lowpass + motion + bias + 32-coil chi
  * noise + prescan + realign) → tile → dark filter → .npy encode.
  *
  * The reference parallelizes per-slice across min(cpu−1, 32) processes
  * (BASELINE.md); here each slice is one task row on local[N] executor
  * threads. Usage: runMain graft.PipelineBench [nVols d0 d1 d2]
  * Prints one JSON line: slices/sec, voxels/sec, patch counts.
  */
object PipelineBench {
  def main(args: Array[String]): Unit = {
    val nVols = if (args.length > 0) args(0).toInt else 4
    val d0 = if (args.length > 1) args(1).toInt else 192
    val d1 = if (args.length > 2) args(2).toInt else 160
    val d2 = if (args.length > 3) args(3).toInt else 16
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")

    val dims = Array(d0, d1, d2)
    val volBytes = (0 until nVols).map { v =>
      val vol = Array.tabulate(dims.product) { i =>
        val x = i % d0; val y = (i / d0) % d1
        val r = math.hypot(x - d0 / 2.0, y - d1 / 2.0)
        if (r < math.min(d0, d1) / 3.0) (180 + (i * 7 + v) % 60).toFloat
        else ((i * 13 + v) % 25).toFloat
      }
      (f"vol$v%03d", Nifti.encode(vol, dims, Array(0.2, 0.2, 0.2)))
    }

    val t0 = System.nanoTime()
    val stats = spark.sparkContext.parallelize(volBytes, nVols)
      .flatMap { case (base, bytes) =>
        val (h, vol) = Nifti.readVolume(bytes)
        val (norm, _, _) = Image.robustPercentileNormalize(vol, 0.5, 99.5)
        Nifti.Orientations.iterator.flatMap { o =>
          (0 until Nifti.sliceCount(h.dims, o)).iterator.map { i =>
            (base, o, i, h.dims.clone())
          }
        }.map { case (b, o, i, dd) => (b, o, i, norm, dd) }
      }
      .repartition(cpus.toInt * 2) // one slice ≈ one task unit, like the reference's per-slice jobs
      .map { case (base, o, i, norm, dd) =>
        val (px, sh, sw) = Nifti.sliceOf(norm, dd, o, i)
        val seed = Rng.sliceSeed(base, o, i, 123)
        val r = Degrade.degradePreset(px, sh, sw, "3tFlash", seed)
        val (hs, ws) = Image.makeCropSpaces(sh, sw, 64, 32, 8)
        var nHr = 0L; var nDark = 0L; var bytesOut = 0L
        for (y <- hs; x <- ws) {
          val patch = Image.extractPatch(px, sh, sw, y, x, 64)
          if (Image.patchIsDark(patch)) nDark += 1
          else {
            nHr += 1
            bytesOut += Npy.encode(patch, Seq(64, 64)).length
          }
        }
        bytesOut += Npy.encode(r.lr, Seq(r.lrH, r.lrW)).length
        (1L, nHr, nDark, bytesOut)
      }
      .reduce((a, b) => (a._1 + b._1, a._2 + b._2, a._3 + b._3, a._4 + b._4))
    val secs = (System.nanoTime() - t0) / 1e9

    val (nSlices, nHr, nDark, outBytes) = stats
    val voxels = nVols.toLong * dims.product
    println(f"""{"metric":"mri_pipeline","n_vols":$nVols,"dims":[$d0,$d1,$d2],""" +
      f""""n_slices":$nSlices,"n_hr_patches":$nHr,"n_dark":$nDark,""" +
      f""""out_mb":${outBytes / 1e6}%.1f,"secs":$secs%.2f,""" +
      f""""slices_per_sec":${nSlices / secs}%.1f,"mvoxels_per_sec":${voxels / secs / 1e6}%.1f}""")
    spark.stop()
  }
}
