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
