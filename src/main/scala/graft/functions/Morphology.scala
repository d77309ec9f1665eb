package graft.functions

/** K21: 3D binary morphology (6-connected structuring element) and the
  * brain/noise mask construction of the SNR estimator
  * (reference v2/estimate_snr.py:44-68). */
object Morphology {

  /** One 6-connected dilation pass over a (d0,d1,d2) Fortran-ordered mask. */
  private def dilateOnce(m: Array[Boolean], d0: Int, d1: Int, d2: Int): Array[Boolean] = {
    val out = new Array[Boolean](m.length)
    var z = 0
    while (z < d2) {
      var y = 0
      while (y < d1) {
        var x = 0
        while (x < d0) {
          val i = x + y * d0 + z * d0 * d1
          val v = m(i) ||
            (x > 0 && m(i - 1)) || (x < d0 - 1 && m(i + 1)) ||
            (y > 0 && m(i - d0)) || (y < d1 - 1 && m(i + d0)) ||
            (z > 0 && m(i - d0 * d1)) || (z < d2 - 1 && m(i + d0 * d1))
          out(i) = v
          x += 1
        }
        y += 1
      }
      z += 1
    }
    out
  }

  /** Erosion = complement-dilate-complement (border voxels erode, matching
    * scipy's zero-padded boundary). */
  private def erodeOnce(m: Array[Boolean], d0: Int, d1: Int, d2: Int): Array[Boolean] = {
    val out = new Array[Boolean](m.length)
    var z = 0
    while (z < d2) {
      var y = 0
      while (y < d1) {
        var x = 0
        while (x < d0) {
          val i = x + y * d0 + z * d0 * d1
          val v = m(i) &&
            (x == 0 || m(i - 1)) && (x == d0 - 1 || m(i + 1)) &&
            (y == 0 || m(i - d0)) && (y == d1 - 1 || m(i + d0)) &&
            (z == 0 || m(i - d0 * d1)) && (z == d2 - 1 || m(i + d0 * d1))
          // scipy erodes at the border (border_value=0):
          out(i) = v && x > 0 && x < d0 - 1 && y > 0 && y < d1 - 1 && z > 0 && z < d2 - 1
          x += 1
        }
        y += 1
      }
      z += 1
    }
    out
  }

  def dilate(m: Array[Boolean], dims: Array[Int], iterations: Int): Array[Boolean] = {
    var cur = m
    for (_ <- 0 until iterations) cur = dilateOnce(cur, dims(0), dims(1), dims(2))
    cur
  }

  def erode(m: Array[Boolean], dims: Array[Int], iterations: Int): Array[Boolean] = {
    var cur = m
    for (_ <- 0 until iterations) cur = erodeOnce(cur, dims(0), dims(1), dims(2))
    cur
  }

  /** Brain/noise masks: Otsu → dilate(1)/erode(2); noise = below-p5 ∧
    * ¬dilate(brain, 2); with the reference's fallbacks. */
  def makeMasks(vol: Array[Float], dims: Array[Int]): (Array[Boolean], Array[Boolean]) = {
    val thr = Image.otsuThreshold(vol, 256, (0.5, 99.5))
    var brain = vol.map(_ > thr)
    brain = erode(dilate(brain, dims, 1), dims, 2)
    val brainDil = dilate(brain, dims, 2)
    val p5 = Image.nanPercentile(vol, 5.0)
    var noise = vol.indices.map(i => vol(i) < p5 && !brainDil(i)).toArray
    if (!brain.exists(identity)) {
      val p70 = Image.nanPercentile(vol, 70.0)
      brain = vol.map(_ > p70)
    }
    if (!noise.exists(identity)) noise = vol.map(_ < p5)
    (brain, noise)
  }

  /** K25 SNR normalizations (reference compute_snr_flash7t,
    * v2/estimate_snr.py:197-288): normalize a measured SNR to a target
    * voxel volume (SNR ∝ voxel volume) and divide out the FLASH/SPGR
    * sequence signal factor so field strengths compare fairly. */
  def normalizeSnr(snr: Double, zoomsMm: Array[Double],
      targetVoxelMm3: Double = 0.008, // 0.2mm isotropic
      tr: Double = Degrade.FlashTrS, te: Double = Degrade.FlashTeS,
      faDeg: Double = Degrade.FlashFaDeg,
      t1: Double = 1.2, t2s: Double = 0.03): Map[String, Double] = {
    val voxVol = zoomsMm(0) * zoomsMm(1) * zoomsMm(2)
    val snrPerVox = snr / (voxVol / targetVoxelMm3)
    val seqFactor = Image.spgrSignal(1.0, t1, t2s, tr, te, faDeg)
    Map(
      "voxel_volume_mm3" -> voxVol,
      "snr_per_target_voxel" -> snrPerVox,
      "flash_seq_factor" -> seqFactor,
      "snr_seq_normalized" -> snrPerVox / math.max(seqFactor, 1e-8))
  }

  /** K25 core: full-volume SNR estimate — masks → background σ → ROI SNR
    * (reference compute_snr_volume_7t, v2/estimate_snr.py:120-180). */
  def estimateSnr(vol: Array[Float], dims: Array[Int], mode: String, nc: Int)
      : Map[String, Double] = {
    val (brain, noise) = makeMasks(vol, dims)
    val air = vol.indices.collect { case i if noise(i) => vol(i) }.toArray
    val roi = vol.indices.collect { case i if brain(i) => vol(i) }.toArray
    val nAir = air.length
    val airMean = if (nAir > 0) air.map(_.toDouble).sum / nAir else 0.0
    val stdAir =
      if (nAir > 1) math.sqrt(air.map(v => (v - airMean) * (v - airMean)).sum / (nAir - 1))
      else 0.0
    val (sigma, k) = Image.sigmaFromBackgroundStd(stdAir, mode, nc)
    Image.snrFromRoi(roi, sigma, k) ++ Map(
      "sigma" -> sigma, "k" -> k.toDouble,
      "n_brain" -> roi.length.toDouble, "n_noise" -> nAir.toDouble)
  }
}
