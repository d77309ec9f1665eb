package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Morphology

class MorphologySpec extends AnyFunSuite {
  private val dims = Array(5, 5, 5)
  private def idx(x: Int, y: Int, z: Int) = x + y * 5 + z * 25

  test("dilate grows a point by 6-connectivity; erode shrinks it back") {
    val m = new Array[Boolean](125)
    m(idx(2, 2, 2)) = true
    val d = Morphology.dilate(m, dims, 1)
    assert(d.count(identity) == 7) // center + 6 face neighbors
    assert(d(idx(3, 2, 2)) && d(idx(2, 1, 2)) && d(idx(2, 2, 3)))
    assert(!d(idx(3, 3, 2))) // no diagonal growth
    val e = Morphology.erode(d, dims, 1)
    assert(e.count(identity) == 1 && e(idx(2, 2, 2)))
  }

  test("erode removes border voxels (zero-padded boundary)") {
    val full = Array.fill(125)(true)
    val e = Morphology.erode(full, dims, 1)
    assert(e.count(identity) == 27) // only the 3×3×3 interior survives
    assert(e(idx(2, 2, 2)) && !e(idx(0, 2, 2)))
  }

  test("normalizeSnr: voxel-volume and FLASH sequence-factor normalization") {
    val r = Morphology.normalizeSnr(153.03, Array(0.2, 0.2, 0.2))
    assert(math.abs(r("voxel_volume_mm3") - 0.008) < 1e-12)
    // target voxel equals actual voxel → snr unchanged by the voxel term
    assert(math.abs(r("snr_per_target_voxel") - 153.03) < 1e-9)
    assert(r("flash_seq_factor") > 0 && r("flash_seq_factor") < 1)
    assert(r("snr_seq_normalized") > 153.03) // dividing by a factor < 1
    // doubling linear resolution (0.4mm) → 8x voxel volume → 8x snr ratio
    val big = Morphology.normalizeSnr(153.03, Array(0.4, 0.4, 0.4))
    assert(math.abs(big("snr_per_target_voxel") * 8 - r("snr_per_target_voxel")) < 1e-6)
  }

  test("estimateSnr separates bright sphere from air and recovers sigma ~1") {
    val d = Array(16, 16, 10)
    val rng = new graft.functions.Rng(7)
    val vol = Array.tabulate(d.product) { i =>
      val x = i % 16; val y = (i / 16) % 16
      val r = math.sqrt((x - 8) * (x - 8) + (y - 8) * (y - 8))
      (if (r < 5) 100f else 2f) + rng.nextGaussian().toFloat
    }
    val est = Morphology.estimateSnr(vol, d, "rician", 1)
    assert(est("n_brain") > 100 && est("n_noise") > 50)
    assert(est("sigma") > 0.4 && est("sigma") < 3.0, s"sigma=${est("sigma")}")
    assert(est("snr_corrected_m2") > 10, s"snr=${est("snr_corrected_m2")}")
  }
}
