package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Degrade, Rng}

class DegradeSpec extends AnyFunSuite {

  private def slice(h: Int, w: Int): Array[Float] =
    Array.tabulate(h * w) { i =>
      val y = i / w; val x = i % w
      val cy = h / 2.0; val cx = w / 2.0
      val d = math.sqrt((y - cy) * (y - cy) + (x - cx) * (x - cx))
      if (d < math.min(h, w) / 3.0) 1.0f else 0.05f
    }

  test("v2 3tFlash: shapes halve, deterministic under same seed") {
    val img = slice(24, 20)
    val r1 = Degrade.degradePreset(img, 24, 20, "3tFlash", seed = 7)
    val r2 = Degrade.degradePreset(img, 24, 20, "3tFlash", seed = 7)
    assert(r1.lrH == 12 && r1.lrW == 10)
    assert(r1.lr.toSeq == r2.lr.toSeq, "same seed must give identical bytes (K13 retry-stability)")
    val r3 = Degrade.degradePreset(img, 24, 20, "3tFlash", seed = 8)
    assert(r1.lr.toSeq != r3.lr.toSeq, "different seed must differ")
  }

  test("1.5Flash: factor 3 downsample, more degradation than 3T") {
    val img = slice(24, 24)
    val r = Degrade.degradePreset(img, 24, 24, "1.5Flash", seed = 1)
    assert(r.lrH == 8 && r.lrW == 8)
    assert(r.meta("B0_target_T") == "1.5")
    assert(r.meta("voxel_factor").toDouble == 9.0)
  }

  test("v1 presets run with their documented parameterization") {
    val img = slice(20, 20)
    for ((name, p) <- Degrade.presetsV1) {
      val r = Degrade.degrade(img, 20, 20, p, seed = 3)
      assert(r.lrH == 20 / p.fatorReducao, s"$name height")
      assert(r.lr.forall(v => !v.isNaN), s"$name NaN")
    }
  }

  test("v1 voxel factor is linear, keep_size keeps shape with (0.7,0.7) crop and voxel_factor 1") {
    val img = slice(20, 20)
    // v1 downsample: voxel_factor = fator_reducao (linear), NOT fator²
    // (transform_lower_tesla.py:442)
    val down = Degrade.degrade(img, 20, 20,
      Degrade.Params(fatorReducao = 2, v2 = false, accountVoxelSize = true,
        snrTarget = None, snr7tEstimate = 40.0), seed = 5)
    assert(down.meta("voxel_factor").toDouble == 2.0)
    assert(down.lrH == 10 && down.lrW == 10)
    // v1 keep_size: shape preserved, crop defaults (0.7,0.7), voxel_factor 1
    // even with account_voxel_size=true (transform_lower_tesla.py:434-437)
    val kept = Degrade.degrade(img, 20, 20,
      Degrade.Params(fatorReducao = 2, v2 = false, keepSize = true,
        accountVoxelSize = true, snrTarget = None, snr7tEstimate = 40.0), seed = 5)
    assert(kept.lrH == 20 && kept.lrW == 20)
    assert(kept.meta("voxel_factor").toDouble == 1.0)
    assert(kept.meta("crop_fy").toDouble == 0.7 && kept.meta("crop_fx").toDouble == 0.7)
  }

  test("snr target: v2 computes from empirical 153.03 when unset") {
    val img = slice(16, 16)
    val r = Degrade.degradePreset(img, 16, 16, "3tFlash", seed = 2)
    // 153.03 * (3/7)^1 * 1.0 (accountVoxelSize=false in v2)
    assert(math.abs(r.meta("snr_target").toDouble - 153.03 * 3.0 / 7.0) < 1e-9)
  }

  test("rician vs chi noise models both produce finite positive output") {
    val img = slice(16, 16)
    val pR = Degrade.preset("3tFlash").copy(noiseModel = "rician")
    val rR = Degrade.degrade(img, 16, 16, pR, seed = 5)
    assert(rR.lr.forall(v => v >= 0 && !v.isNaN && !v.isInfinite))
    val rC = Degrade.degradePreset(img, 16, 16, "3tFlash", seed = 5)
    assert(rC.lr.forall(v => v >= 0 && !v.isNaN && !v.isInfinite))
  }

  test("lower snr target → larger deviation from the noise-free render") {
    val img = slice(32, 32)
    def render(snr: Option[Double], sigma: Option[Double]) = Degrade.degrade(img, 32, 32,
      Degrade.preset("3tFlash").copy(snrTarget = snr, noiseSigma = sigma,
        motionMaxShift = 0.0, motionLineJitter = 0.0, biasStrength = 0.0,
        prescanBeta = 0.0), seed = 11).lr
    val clean = render(None, Some(0.0))
    val quiet = render(Some(500.0), None)
    val noisy = render(Some(2.0), None)
    def mse(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum / a.length
    assert(mse(noisy, clean) > 5 * mse(quiet, clean),
      s"noisy=${mse(noisy, clean)} quiet=${mse(quiet, clean)}")
  }

  test("invalid factor and unknown preset rejected") {
    val img = slice(8, 8)
    intercept[IllegalArgumentException] {
      Degrade.degrade(img, 8, 8, Degrade.preset("3tFlash").copy(fatorReducao = 5), 1)
    }
    intercept[IllegalArgumentException](Degrade.preset("nope"))
  }

  test("parity mode: stochastic kernels match a numpy replay of the reference's math") {
    // End-to-end draw-ORDER + math parity, one level above NumpyRngSpec's
    // stream goldens: each golden below is a pure-numpy (1.26.4) replay of
    // the reference kernel (v2/degradation_function_v2.py — _apply_motion
    // 113-133, _apply_bias_field 136-157, rician/chi 237-260) on a fixed
    // 24×20 image, drawing from np.random.default_rng(seed). The engine
    // runs the SAME kernels with NumpyRng.defaultRng(seed): if any kernel
    // consumed one draw out of order, or uniform/normal scaling diverged,
    // outputs differ at O(draw scale), far above the tolerance. Residual
    // diffs are float32-vs-double accumulation + FFT rounding (engine
    // computes in double, reference in float32/complex64) — observed
    // ≤ 4e-6 per pixel; asserted at 10×.
    import graft.functions.{Image, NumpyRng}
    val h = 24; val w = 20; val nc = 4
    val img = Array.tabulate(h * w) { i =>
      val y = i / w; val x = i % w; (((y * 31 + x * 17) % 97) / 96.0).toFloat
    }
    val coils = Array.tabulate(nc * h * w) { i =>
      val k = i / (h * w); val r = i % (h * w); val y = r / w; val x = r % w
      (0.5 + ((k * 53 + y * 19 + x * 7) % 83) / 82.0).toFloat
    }
    val pix = Seq(0, 37, 123, 210, 333, 404, 444, 479)
    // (kernel, seed, float64 sum over the float32 output, 8 sampled pixels)
    val goldens = Seq(
      ("motion", 7L, 241.785677, Seq(0.2315757, 0.2821231, 0.3990538, 1.0637189, 0.2977206, 0.4745535, 0.6117927, 0.6912349)),
      ("bias", 7L, 239.590003, Seq(0.0000000, 0.3004039, 0.4445007, 0.9556718, 0.3963057, 0.0940606, 0.7381740, 0.6805535)),
      ("rician", 7L, 239.748231, Seq(0.0121968, 0.3463706, 0.3483708, 0.9577773, 0.4119185, 0.1067785, 0.8161449, 0.6716754)),
      ("chi", 7L, 499.090962, Seq(0.0859821, 0.6887617, 0.9648118, 1.7269944, 0.7948050, 0.2575842, 1.3144377, 1.5233616)),
      ("motion", 123L, 242.076482, Seq(0.0776604, 0.3919943, 0.2991762, 0.6779804, 0.2815751, 0.2068145, 1.0992986, 0.5470434)),
      ("bias", 123L, 241.262366, Seq(0.0000000, 0.3068201, 0.4529577, 0.9721693, 0.3972382, 0.0937139, 0.7383966, 0.6894408)),
      ("rician", 123L, 243.259225, Seq(0.0724063, 0.3944252, 0.4700924, 1.0900149, 0.4376028, 0.0937375, 0.6650867, 0.6677791)),
      ("chi", 123L, 500.835290, Seq(0.0826353, 0.7254400, 1.0153754, 1.7618113, 0.8719116, 0.2203045, 1.2643108, 1.5639954)))
    goldens.foreach { case (kernel, seed, expSum, expPix) =>
      val rng = NumpyRng.defaultRng(seed)
      val out = kernel match {
        case "motion" => Image.applyMotion(img, h, w, 0.5, 0.02, rng)
        case "bias"   => Image.applyBiasField(img, h, w, 0.04, 0.15, rng)
        case "rician" => Image.addRicianNoise(img, 0.05, rng)
        case "chi"    => Image.addChiNoiseRss(img, h, w, coils, nc, 0.03, rng)
      }
      assert(out.length == h * w, s"$kernel/$seed shape")
      val sum = out.foldLeft(0.0)(_ + _)
      assert(math.abs(sum - expSum) < 2e-3, s"$kernel/$seed sum: $sum vs $expSum")
      pix.zip(expPix).foreach { case (i, e) =>
        assert(math.abs(out(i) - e) < 4e-5,
          s"$kernel/$seed pixel $i: ${out(i)} vs $e")
      }
    }
  }

  test("rng: deterministic, seeded-shuffle stable") {
    val a = new Rng(42).normalArray(8)
    val b = new Rng(42).normalArray(8)
    assert(a.toSeq == b.toSeq)
    val s1 = new Rng(12345).shuffledIndices(10).toSeq
    val s2 = new Rng(12345).shuffledIndices(10).toSeq
    assert(s1 == s2 && s1 != (0 until 10))
    assert(Rng.sliceSeed("vol", "axial", 3, 123) == Rng.sliceSeed("vol", "axial", 3, 123))
    assert(Rng.sliceSeed("vol", "axial", 3, 123) != Rng.sliceSeed("vol", "axial", 4, 123))
    assert(Rng.sliceSeed("vol", "axial", 3, 123) >= 0)
  }
}
