package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Image, Npy, Rng}
import graft.sources.Nifti

class ImageSpec extends AnyFunSuite {

  test("nanPercentile matches numpy linear interpolation") {
    val x = Array(3.0f, 1.0f, 4.0f, 1.5f, 9.0f, 2.6f)
    assert(math.abs(Image.nanPercentile(x, 0.5) - 1.0125) < 1e-6)
    assert(math.abs(Image.nanPercentile(x, 25) - 1.774999976158142) < 1e-6)
    assert(math.abs(Image.nanPercentile(x, 50) - 2.799999952316284) < 1e-6)
    assert(math.abs(Image.nanPercentile(x, 99.5) - 8.874999999999998) < 1e-6)
    assert(math.abs(Image.nanPercentile(x :+ Float.NaN, 50) - 2.799999952316284) < 1e-6)
  }

  test("hamming window matches numpy") {
    val w = Image.window1d(5, "hamming")
    val exp = Seq(0.08, 0.54, 1.0, 0.54, 0.08)
    w.zip(exp).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12) }
    assert(Image.window1d(1, "hann").toSeq == Seq(1.0))
    assert(Image.window2d(4, 4, "none").isEmpty)
  }

  test("robust percentile normalize clips to [0,1] with degenerate guard") {
    val (out, vmin, vmax) = Image.robustPercentileNormalize(
      Array(0f, 1f, 2f, 3f, 100f), 0.0, 100.0)
    assert(vmin == 0.0 && vmax == 100.0)
    assert(out.forall(v => v >= 0f && v <= 1f))
    val (flat, fmin, fmax) = Image.robustPercentileNormalize(Array(5f, 5f, 5f), 1, 99)
    assert(fmax == fmin + 1e-8)
    assert(flat.forall(_ == 0f))
  }

  test("kspace lowpass shapes: downsample vs keep_size") {
    val img = Array.tabulate(24 * 20)(i => (i % 17).toFloat)
    val (lr, lh, lw) = Image.kspaceLowpass(img, 24, 20, 0.5, 0.5, "hamming", keepSize = false)
    assert(lh == 12 && lw == 10 && lr.length == 120)
    val (lp, kh, kw) = Image.kspaceLowpass(img, 24, 20, 0.5, 0.5, "hamming", keepSize = true)
    assert(kh == 24 && kw == 20 && lp.length == 480)
    // kh floor: f small → max(2, ..)
    val (_, mh, mw) = Image.kspaceLowpass(img, 24, 20, 0.01, 0.01, "none", keepSize = false)
    assert(mh == 2 && mw == 2)
  }

  test("kspace lowpass with f=1, no window is ~identity (|ifft(fft)|)") {
    val img = Array.tabulate(6 * 8)(i => (1 + i % 5).toFloat)
    val (out, h, w) = Image.kspaceLowpass(img, 6, 8, 1.0, 1.0, "none", keepSize = false)
    assert(h == 6 && w == 8)
    img.zip(out).foreach { case (a, b) => assert(math.abs(a - b) < 1e-4) }
  }

  test("fourier subpixel shift: integer shift ~ circular roll") {
    val img = new Array[Float](8 * 8)
    img(3 * 8 + 4) = 1f
    val out = Image.fourierShiftSubpixel(img, 8, 8, 1.0, 0.0)
    // peak should move from (3,4) to (4,4)
    val peak = out.zipWithIndex.maxBy(_._1)._2
    assert(peak == 4 * 8 + 4)
  }

  test("gaussian blur: impulse response symmetric, mass-preserving") {
    val img = new Array[Float](11 * 11)
    img(5 * 11 + 5) = 1f
    val out = Image.gaussianBlur(img, 11, 11, 1.5)
    assert(math.abs(out.map(_.toDouble).sum - 1.0) < 1e-4)
    assert(math.abs(out(5 * 11 + 4) - out(5 * 11 + 6)) < 1e-7)
    assert(math.abs(out(4 * 11 + 5) - out(6 * 11 + 5)) < 1e-7)
    assert(out(5 * 11 + 5) > out(5 * 11 + 4))
  }

  test("coil sensitivities: RSS mean ~ 1 after normalization") {
    val c = Image.synthCoilSensitivities(16, 16, 8, 0.6, 1.2)
    var acc = 0.0
    for (p <- 0 until 256) {
      var ss = 0.0
      for (k <- 0 until 8) { val v = c(k * 256 + p); ss += v * v }
      acc += math.sqrt(ss)
    }
    assert(math.abs(acc / 256 - 1.0) < 0.01)
  }

  test("rician noise at sigma=0 is identity; noise raises variance") {
    val img = Array.fill(100)(5f)
    val same = Image.addRicianNoise(img, 0.0, new Rng(1))
    assert(same.forall(v => math.abs(v - 5f) < 1e-6))
    val noisy = Image.addRicianNoise(img, 0.5, new Rng(1))
    val mean = noisy.map(_.toDouble).sum / 100
    val varr = noisy.map(v => (v - mean) * (v - mean)).sum / 99
    assert(varr > 0.05)
  }

  test("dark patch predicate: reference thresholds") {
    val dark = Array.fill(100)(0.01f)
    val bright = Array.fill(100)(0.5f)
    assert(Image.patchIsDark(dark))
    assert(!Image.patchIsDark(bright))
    // exactly at percentage boundary: frac == 0.7 is NOT > 0.7 → kept
    val mixed = Array.fill(70)(0.01f) ++ Array.fill(30)(0.5f)
    assert(!Image.patchIsDark(mixed))
    val mixed71 = Array.fill(71)(0.01f) ++ Array.fill(29)(0.5f)
    assert(Image.patchIsDark(mixed71))
    // NaN-aware: NaNs excluded from the denominator
    val withNan = Array.fill(60)(0.01f) ++ Array.fill(20)(Float.NaN) ++ Array.fill(20)(0.5f)
    assert(Image.patchIsDark(withNan)) // 60/80 = 0.75 > 0.7
    assert(Image.patchIsDark(Array.fill(4)(Float.NaN))) // all-NaN → dark
  }

  test("makeCropSpaces replicates reference tail-crop rule") {
    // h=10, crop=4, step=3 → base [0,3,6], last+crop=10, tail=0 → no extra
    val (hs1, _) = Image.makeCropSpaces(10, 10, 4, 3, 0)
    assert(hs1.toSeq == Seq(0, 3, 6))
    // h=12, crop=4, step=3 → base [0,3,6], 12-(6+4)=2 > thresh 0 → append 8
    val (hs2, _) = Image.makeCropSpaces(12, 12, 4, 3, 0)
    assert(hs2.toSeq == Seq(0, 3, 6, 8))
    // thresh large enough suppresses tail
    val (hs3, _) = Image.makeCropSpaces(12, 12, 4, 3, 2)
    assert(hs3.toSeq == Seq(0, 3, 6))
    // degenerate: crop > h → single origin window
    val (hs4, _) = Image.makeCropSpaces(3, 3, 8, 4, 0)
    assert(hs4.toSeq == Seq(0))
  }

  test("extractPatch edge-pads partial windows") {
    val img = Array.tabulate(4 * 4)(_.toFloat)
    val p = Image.extractPatch(img, 4, 4, 2, 2, 4)
    assert(p.length == 16)
    assert(p(0) == img(2 * 4 + 2))
    assert(p(15) == img(3 * 4 + 3)) // bottom-right edge replicated
  }

  test("centerCropPad matches _fit semantics") {
    val a = Array.tabulate(6 * 6)(_.toFloat)
    val cropped = Image.centerCropPad(a, 6, 6, 4, 4)
    assert(cropped.length == 16)
    assert(cropped(0) == a(1 * 6 + 1)) // center crop starts at (1,1)
    val padded = Image.centerCropPad(a, 6, 6, 8, 8)
    assert(padded.length == 64)
    assert(padded(1 * 8 + 1) == a(0)) // pad 1 on each side
    assert(padded(0) == a(0))         // edge-replicated corner
  }

  test("otsu threshold separates a bimodal distribution") {
    val xs = Array.tabulate(1000)(i => if (i < 500) 10f + (i % 5) else 100f + (i % 5))
    val t = Image.otsuThreshold(xs)
    // argmax may land at the upper edge of the low mode; what matters is the
    // classes split cleanly: ≥80% of the low mode below, all high mode above
    assert(t > 12 && t < 100, s"threshold $t")
    val below = xs.count(_ < t)
    assert(below >= 400 && below <= 500, s"split $below")
  }

  test("sigma from background std: rician closed form and chi gamma ratio") {
    val (sR, kR) = Image.sigmaFromBackgroundStd(1.0, "rician", 1)
    assert(kR == 2)
    assert(math.abs(sR - 1.0 / math.sqrt((4.0 - math.Pi) / 2.0)) < 1e-12)
    val (sC, kC) = Image.sigmaFromBackgroundStd(1.0, "chi", 32)
    assert(kC == 64)
    // for large k, var/σ² → 1/2, so σ ≈ std·√2
    assert(sC > 1.2 && sC < 1.6)
    // gamma ratio sanity: Γ(1.5)/Γ(1) = √π/2
    assert(math.abs(Image.gammaRatio(1.5, 1.0) - math.sqrt(math.Pi) / 2) < 1e-12)
  }

  test("snrFromRoi: corrected second-moment formula") {
    val vals = Array.fill(1000)(10f)
    val r = Image.snrFromRoi(vals, sigma = 1.0, k = 2)
    assert(math.abs(r("snr_corrected_m2") - math.sqrt(98.0)) < 1e-3)
  }

  test("spgr signal and T-map scaling") {
    val s = Image.spgrSignal(1.0, 1.2, 0.03, 40e-3, 14.2e-3, 20.0)
    assert(s > 0 && s < 1)
    assert(Image.tMapScale(3.0) == ((0.80, 1.40)))
    assert(Image.tMapScale(1.5) == ((0.70, 1.80)))
    val (s1, s2) = Image.tMapScale(5.0)
    assert(s1 > 0.70 && s1 < 0.80 && s2 > 1.40 && s2 < 1.80)
  }

  test("field parser matches reference leniency") {
    assert(Image.parseFieldStrength("3T") == 3.0)
    assert(Image.parseFieldStrength("1.5") == 1.5)
    assert(Image.parseFieldStrength("1,5t") == 1.5)
    assert(Image.parseFieldStrength("garbage") == 3.0)
  }

  test("rot90 matches np.rot90 semantics") {
    val a = Array(1f, 2f, 3f, 4f, 5f, 6f) // 2x3
    val (r, h, w) = Image.rot90(a, 2, 3)
    assert(h == 3 && w == 2)
    assert(r.toSeq == Seq(3f, 6f, 2f, 5f, 1f, 4f))
  }

  test("resizeArea box-averages integer factors") {
    val a = Array(1f, 2f, 3f, 4f) // 2x2
    val r = Image.resizeArea(a, 2, 2, 1, 1)
    assert(r.toSeq == Seq(2.5f))
  }

  test("resizeArea handles non-integer ratios with fractional-area weights (cv2 INTER_AREA)") {
    // 3x3 ramp 0..8 → 2x2, scale 1.5: each output pixel averages a 1.5×1.5
    // source window with partial rows/cols weighted by overlap. Golden
    // values derived by hand (= cv2 INTER_AREA): [4/3, 8/3; 16/3, 20/3].
    val a = Array.tabulate(9)(_.toFloat)
    val r = Image.resizeArea(a, 3, 3, 2, 2)
    val exp = Seq(4.0 / 3, 8.0 / 3, 16.0 / 3, 20.0 / 3)
    r.toSeq.zip(exp).foreach { case (g, e) => assert(math.abs(g - e) < 1e-6, s"$g vs $e") }
  }

  test("resizeBilinear matches cv2 INTER_LINEAR half-pixel mapping (2x2 → 3x3)") {
    val a = Array(0f, 1f, 2f, 3f)
    val r = Image.resizeBilinear(a, 2, 2, 3, 3)
    val exp = Seq(0f, 0.5f, 1f, 1f, 1.5f, 2f, 2f, 2.5f, 3f)
    r.toSeq.zip(exp).foreach { case (g, e) => assert(math.abs(g - e) < 1e-6f, s"$g vs $e") }
    // INTER_AREA upscale falls back to bilinear, like cv2
    assert(Image.resizeArea(a, 2, 2, 3, 3).toSeq == r.toSeq)
  }

  test("resizeBicubic preserves constants and reproduces linear ramps in the interior") {
    val const = Array.fill(36)(7.25f)
    assert(Image.resizeBicubic(const, 6, 6, 9, 7).forall(v => math.abs(v - 7.25f) < 1e-5f))
    // horizontal ramp a(y,x)=x upscaled 8→16: the a=−0.75 kernel's first
    // moment at t=0.25 is 0.296875 (not t — only a=−0.5 Catmull-Rom
    // reproduces linear), so interior columns land at
    // floor(fx) + m(frac): m(0.25)=0.296875, m(0.75)=0.703125 — these are
    // cv2 INTER_CUBIC's exact values.
    val ramp = Array.tabulate(8 * 8)(i => (i % 8).toFloat)
    val up = Image.resizeBicubic(ramp, 8, 8, 8, 16)
    for (x <- 3 until 13) {
      val fx = (x + 0.5) * 0.5 - 0.5
      val exp = math.floor(fx) + (if (fx - math.floor(fx) == 0.25) 0.296875 else 0.703125)
      assert(math.abs(up(4 * 16 + x) - exp) < 1e-5, s"col $x: ${up(4 * 16 + x)} vs $exp")
    }
    // dispatcher parity
    assert(Image.resize(ramp, 8, 8, 4, 4, "cubic").toSeq ==
      Image.resizeBicubic(ramp, 8, 8, 4, 4).toSeq)
  }

  test("npy roundtrip + golden bytes match np.save") {
    val data = Array(1.5f, -2.25f, 3.0f, 0.0f, 4.5f, -1.0f)
    val enc = Npy.encode(data, Seq(2, 3))
    val goldenHex = "934e554d5059010076007b276465736372273a20273c6634272c2027666f727472616e5f6f72646572273a2046616c73652c20277368617065273a2028322c2033292c207d202020202020202020202020202020202020202020202020202020202020202020202020202020202020202020202020202020202020202020200a0000c03f000010c0000040400000000000009040000080bf"
    assert(enc.map("%02x".format(_)).mkString == goldenHex)
    val (dec, shape) = Npy.decode(enc)
    assert(shape == Seq(2, 3) && dec.toSeq == data.toSeq)
    // float16 roundtrip within half precision
    val encH = Npy.encode(data, Seq(6), "float16")
    val (decH, _) = Npy.decode(encH)
    data.zip(decH).foreach { case (a, b) => assert(math.abs(a - b) <= math.abs(a) * 1e-3 + 1e-3) }
  }

  test("nifti roundtrip: encode → header scan + volume + slices") {
    val dims = Array(4, 3, 2)
    val vol = Array.tabulate(24)(_.toFloat)
    val bytes = Nifti.encode(vol, dims, Array(0.2, 0.2, 0.2))
    val h = Nifti.parseHeader(bytes)
    assert(h.dims.toSeq == dims.toSeq && h.datatype == 16)
    assert(math.abs(h.zooms(0) - 0.2) < 1e-6)
    val (h2, vol2) = Nifti.readVolume(bytes)
    assert(h2.voxOffset == 352)
    assert(vol2.toSeq == vol.toSeq)
    // axial slice 1: M[a,b] = vol[a + b*4 + 1*12]
    val (ax, ah, aw) = Nifti.sliceOf(vol2, dims, "axial", 1)
    assert(ah == 4 && aw == 3)
    assert(ax(0) == vol(12) && ax(1) == vol(12 + 4))
    // sagittal count = d1 = 3
    assert(Nifti.sliceCount(dims, "sagittal") == 3)
    assert(Nifti.sliceCount(dims, "axial") == 2)
  }

  test("normalization kernels match numpy goldens on a 200-element NaN-bearing array") {
    val x = Array.tabulate(200)(i => (((i * 7919) % 1000) - 100).toFloat)
    x(17) = Float.NaN; x(91) = Float.NaN
    // np.nanpercentile(x, [2, 98]) on the same values
    assert(math.abs(Image.nanPercentile(x, 2.0) - (-88.18)) < 1e-4)
    assert(math.abs(Image.nanPercentile(x, 98.0) - 875.1800000000001) < 1e-4)
    val (y, lo, hi) = Image.robustPercentileNormalize(x, 2.0, 98.0)
    assert(math.abs(lo - (-88.18)) < 1e-4 && math.abs(hi - 875.18) < 1e-3)
    assert(y(0) == 0.0f)
    assert(math.abs(y(3) - 0.7735218405723572) < 1e-6)
    assert(math.abs(y(199) - 0.9022380113601685) < 1e-6)
    val clean = y.indices.filter(i => i != 17 && i != 91).map(y(_).toDouble)
    assert(math.abs(clean.sum / clean.size - 0.500707745552063) < 1e-6)
    val u8 = Image.normalizeUint8(x, 1.0, 99.0)
    assert(u8(0) == 0 && u8(3) == 196 && u8(199) == 228)
  }

  test("otsu matches the numpy-computed golden on a deterministic bimodal array") {
    val z = Array.tabulate(500)(i => if (i < 300) 10f + (i % 5) else 90f + (i % 7))
    assert(math.abs(Image.otsuThreshold(z) - 13.86328125) < 1e-6)
  }

  test("png encode/decode roundtrip preserves gray samples exactly") {
    val px = Array.tabulate(6 * 5)(i => (i * 9) % 256)
    val bytes = graft.sinks.Png.encodeGray8(px, 6, 5)
    assert(bytes.take(8).map(_ & 0xff).toSeq ==
      Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)) // PNG magic
    val (back, h, w) = graft.sinks.Png.decodeGray(bytes)
    assert(h == 6 && w == 5 && back.toSeq == px.toSeq)
    // clamping
    val clamped = graft.sinks.Png.encodeGray8(Array(-5, 300, 42), 1, 3)
    assert(graft.sinks.Png.decodeGray(clamped)._1.toSeq == Seq(0, 255, 42))
  }

  test("nifti lazy slice decode matches eager path, plain and gzipped") {
    val dims = Array(5, 4, 3)
    val vol = Array.tabulate(60)(i => (i * 1.5f) - 7f)
    val plain = Nifti.encode(vol, dims, Array(1, 1, 1))
    val gz = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(plain); g.close()
      bos.toByteArray
    }
    val (_, eager) = Nifti.readVolume(plain)
    for (raw <- Seq(plain, gz); o <- Nifti.Orientations;
         i <- 0 until Nifti.sliceCount(dims, o)) {
      val (exp, eh, ew) = Nifti.sliceOf(eager, dims, o, i)
      val (got, gh, gw) = Nifti.readSliceLazy(raw, o, i)
      assert(gh == eh && gw == ew, s"$o/$i shape")
      assert(got.toSeq == exp.toSeq, s"$o/$i pixels (gz=${raw eq gz})")
    }
  }
}
