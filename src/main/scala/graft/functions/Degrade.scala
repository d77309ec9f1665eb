package graft.functions

/** Composite 7T→lower-field degradation pipelines (SURVEY.md §2.4, C1–C4).
  *
  * v1: reference transform_lower_tesla.py:334-509 (`funcao_degradacao`) —
  *     keep_size option, snr_7t default 40, account_voxel_size default true,
  *     no prescan/realign.
  * v2: reference v2/degradation_function_v2.py:330-455 — downsample always,
  *     SNR anchored at the empirical 153.03, FLASH constants, prescan β=0.8
  *     with blur 0.12, 2-step robust intensity re-align.
  *
  * RNG sub-streams per stage: motion=seed, bias=seed+1, noise=seed+2
  * (reference v2/degradation_function_v2.py:417-434). The default draw
  * source is the engine's SplitMix64 stream (statistically equivalent,
  * cheapest per draw); `Params.numpyParity = true` swaps in [[NumpyRng]],
  * whose `default_rng(seed)` streams are bitwise-identical to NumPy's —
  * the kernels already consume draws in the reference's order (motion:
  * dy, dx uniforms then H row-phase normals; bias: H·W normals; noise:
  * real array then imaginary array), so parity mode reproduces the
  * reference's exact draw sequence.
  */
object Degrade {

  val Snr7tEmpirical = 153.03
  val FlashTrS = 40e-3
  val FlashTeS = 14.2e-3
  val FlashFaDeg = 20.0

  final case class Params(
      fatorReducao: Int = 2,
      keepSize: Boolean = false,
      cropFactors: Option[(Double, Double)] = None,
      windowType: String = "hamming",
      alvoCampo: String = "3T",
      alphaSnr: Double = 1.0,
      snr7tEstimate: Double = Snr7tEmpirical,
      snrTarget: Option[Double] = None,
      accountVoxelSize: Boolean = false,
      noiseModel: String = "chi",
      noiseSigma: Option[Double] = None,
      nc: Int = 32,
      motionMaxShift: Double = 0.5,
      motionLineJitter: Double = 0.02,
      biasStrength: Double = 0.06,
      biasScaleRel: Double = 0.15,
      tr: Double = FlashTrS,
      te: Double = FlashTeS,
      faDeg: Double = FlashFaDeg,
      v2: Boolean = true,
      coilSigmaRel: Double = 0.75,
      coilRadius: Double = 1.12,
      prescanBeta: Double = 0.8,
      prescanBlurRel: Double = 0.12,
      numpyParity: Boolean = false)

  /** v1 presets — reference transform_lower_tesla.py:515-608. */
  val presetsV1: Map[String, Params] = Map(
    "3T_T1W" -> Params(fatorReducao = 2, alvoCampo = "3T", nc = 32,
      snrTarget = Some(20.0), snr7tEstimate = 40.0, accountVoxelSize = true,
      biasStrength = 0.08, biasScaleRel = 0.15, motionMaxShift = 0.5,
      motionLineJitter = 0.02, v2 = false, coilSigmaRel = 0.6, coilRadius = 1.2),
    "15T_T1W" -> Params(fatorReducao = 3, alvoCampo = "1.5T", nc = 24,
      snrTarget = Some(12.0), snr7tEstimate = 40.0, accountVoxelSize = true,
      biasStrength = 0.12, biasScaleRel = 0.18, motionMaxShift = 0.6,
      motionLineJitter = 0.03, v2 = false, coilSigmaRel = 0.6, coilRadius = 1.2),
    "3T_T2STAR" -> Params(fatorReducao = 2, alvoCampo = "3T", nc = 32,
      snrTarget = Some(15.0), snr7tEstimate = 40.0, accountVoxelSize = true,
      biasStrength = 0.10, biasScaleRel = 0.15, motionMaxShift = 0.7,
      motionLineJitter = 0.05, te = 20e-3, v2 = false, coilSigmaRel = 0.6, coilRadius = 1.2),
    "3T_fMRI" -> Params(fatorReducao = 4, alvoCampo = "3T", nc = 32,
      snrTarget = Some(10.0), snr7tEstimate = 40.0, accountVoxelSize = true,
      biasStrength = 0.10, biasScaleRel = 0.18, motionMaxShift = 0.8,
      motionLineJitter = 0.08, v2 = false, coilSigmaRel = 0.6, coilRadius = 1.2))

  /** v2 presets — reference v2/degradation_function_v2.py:461-497. */
  val presetsV2: Map[String, Params] = Map(
    "3tFlash" -> Params(fatorReducao = 2, alvoCampo = "3T", nc = 32,
      biasStrength = 0.08, biasScaleRel = 0.15, motionMaxShift = 0.5,
      motionLineJitter = 0.02, v2 = true),
    "1.5Flash" -> Params(fatorReducao = 3, alvoCampo = "1.5T", nc = 32,
      biasStrength = 0.12, biasScaleRel = 0.18, motionMaxShift = 0.6,
      motionLineJitter = 0.03, v2 = true))

  def preset(name: String): Params =
    presetsV2.getOrElse(name,
      presetsV1.getOrElse(name,
        throw new IllegalArgumentException(
          s"unknown preset $name; options: ${(presetsV2.keys ++ presetsV1.keys).mkString(", ")}")))

  final case class Result(hr: Array[Float], lr: Array[Float], lrH: Int, lrW: Int,
      meta: Map[String, String])

  /** C1/C3 composite pipeline: k-space lowpass → motion → bias → noise
    * (+ v2 prescan & realign inside the chi branch). */
  def degrade(img: Array[Float], h: Int, w: Int, p: Params, seed: Long): Result = {
    require(p.fatorReducao == 2 || p.fatorReducao == 3 || p.fatorReducao == 4,
      "fator_reducao must be 2, 3 or 4")
    val b0 = Image.parseFieldStrength(p.alvoCampo)

    // v1 and v2 disagree on voxel-factor semantics (and v1 has a keep_size
    // branch that v2 dropped):
    //  v1 keep_size  → crop defaults (0.7, 0.7), voxel_factor forced 1.0
    //                  (transform_lower_tesla.py:434-437)
    //  v1 downsample → crop defaults 1/f, voxel_factor LINEAR fator_reducao
    //                  (transform_lower_tesla.py:439-442)
    //  v2            → voxel_factor fator² (area), or 1/(fy·fx) with explicit
    //                  crops (v2/degradation_function_v2.py:408-413)
    val (cf, voxelFactor) =
      if (!p.v2 && p.keepSize)
        (p.cropFactors.getOrElse((0.7, 0.7)), 1.0)
      else if (p.v2) p.cropFactors match {
        case None =>
          val f = 1.0 / p.fatorReducao
          ((f, f), p.fatorReducao.toDouble * p.fatorReducao)
        case Some((fy, fx)) => ((fy, fx), 1.0 / math.max(1e-6, fy * fx))
      } else {
        val f = 1.0 / p.fatorReducao
        (p.cropFactors.getOrElse((f, f)), p.fatorReducao.toDouble)
      }

    val (res, rh, rw) = Image.kspaceLowpass(img, h, w, cf._1, cf._2, p.windowType,
      keepSize = !p.v2 && p.keepSize)

    // Stage sub-streams: default_rng(seed) / (seed+1) / (seed+2), reference
    // v2/degradation_function_v2.py:430-446. Parity mode draws the exact
    // NumPy streams; the default draws the engine's SplitMix64 ones.
    def stageRng(s: Long): DrawSource =
      if (p.numpyParity) NumpyRng.defaultRng(s) else new Rng(s)

    val art0 = Image.applyMotion(res, rh, rw, p.motionMaxShift, p.motionLineJitter,
      stageRng(seed))
    val art = Image.applyBiasField(art0, rh, rw, p.biasStrength, p.biasScaleRel,
      stageRng(seed + 1))

    var mean = 0.0
    var i = 0
    while (i < art.length) { mean += art(i); i += 1 }
    mean /= math.max(art.length, 1)

    val snrTarget = p.noiseSigma match {
      case Some(_) => 0.0
      case None =>
        val base = p.snrTarget.getOrElse(
          Image.snrTargetFromField(p.snr7tEstimate, b0, p.alphaSnr,
            if (p.accountVoxelSize) voxelFactor else 1.0))
        math.max(1.0, base)
    }
    val sigmaFloor = if (p.v2) 1e-8 else 1e-6
    val rngNoise = stageRng(seed + 2)

    val noisy: Array[Float] = p.noiseModel.toLowerCase match {
      case "rician" =>
        val sigma = p.noiseSigma.getOrElse(math.max(sigmaFloor, mean / snrTarget))
        Image.addRicianNoise(art, sigma, rngNoise)
      case "chi" =>
        val nc = math.max(1, p.nc)
        val coils = Image.synthCoilSensitivities(rh, rw, nc, p.coilSigmaRel, p.coilRadius)
        val sigma = p.noiseSigma.getOrElse(
          math.max(sigmaFloor, mean / (snrTarget * math.sqrt(nc.toDouble))))
        var out = Image.addChiNoiseRss(art, rh, rw, coils, nc, sigma, rngNoise)
        if (p.v2 && p.prescanBeta > 0) {
          out = Image.prescanNormalize(out, rh, rw, coils, nc, p.prescanBeta, p.prescanBlurRel)
          out = Image.realignIntensity(out, art)
        }
        out
      case other => throw new IllegalArgumentException(s"noise_model must be rician|chi, got $other")
    }

    Result(img, noisy, rh, rw, Map(
      "alvo_campo" -> p.alvoCampo,
      "B0_target_T" -> b0.toString,
      "fator_reducao" -> p.fatorReducao.toString,
      "crop_fy" -> cf._1.toString, "crop_fx" -> cf._2.toString,
      "window_type" -> p.windowType,
      "noise_model" -> p.noiseModel, "Nc" -> p.nc.toString,
      "voxel_factor" -> voxelFactor.toString,
      "snr_target" -> snrTarget.toString,
      "seed" -> seed.toString,
      "v2" -> p.v2.toString))
  }

  /** C2/C4 preset dispatch with overrides applied by the caller. */
  def degradePreset(img: Array[Float], h: Int, w: Int, presetName: String, seed: Long): Result =
    degrade(img, h, w, preset(presetName), seed)
}
