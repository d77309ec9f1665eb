package graft.functions

/** Per-slice numeric kernels over row-major Array[Float] images — the
  * engine's re-expression of the reference's scalar-function library
  * (SURVEY.md §2.3, K1–K29). Float32 storage, double compute, matching the
  * reference's float32 pins.
  */
object Image {

  // ------------------------------------------------------------ percentiles

  /** NumPy-style linear-interpolation percentile, NaN-skipping (matches
    * np.nanpercentile — reference v2/patch_utils.py:28-30). */
  def nanPercentile(xs: Array[Float], p: Double): Double = {
    val clean = xs.filter(v => !v.isNaN)
    if (clean.isEmpty) return Double.NaN
    percentileSorted(clean.sorted, p)
  }

  def percentileSorted(sorted: Array[Float], p: Double): Double = {
    val n = sorted.length
    if (n == 1) return sorted(0).toDouble
    val pos = p / 100.0 * (n - 1)
    val lo = math.floor(pos).toInt
    val hi = math.min(lo + 1, n - 1)
    val frac = pos - lo
    sorted(lo) + (sorted(hi) - sorted(lo)) * frac
  }

  def median(xs: Array[Float]): Double = nanPercentile(xs, 50.0)

  // ---------------------------------------------------------- normalization

  /** K2: robust percentile normalize to 0..1 with the degenerate-range guard
    * (reference v2/patch_utils.py:25-34). Returns (out, vmin, vmax). */
  def robustPercentileNormalize(vol: Array[Float], pmin: Double, pmax: Double)
      : (Array[Float], Double, Double) = {
    val vmin = nanPercentile(vol, pmin)
    val vmax = nanPercentile(vol, pmax)
    val (out, lo, hi) = normalizeWithCuts(vol, vmin, vmax)
    (out, lo, hi)
  }

  /** The clip-and-scale core of K2 with the clip points supplied by the
    * caller — the per-row form for pipelines that compute a volume's
    * (vmin, vmax) once in a distributed pass and then normalize each
    * lazily-read slice against the broadcast cuts
    * ([[graft.MriPipeline.slicesLazy]]), mirroring how the reference
    * precomputes `vol_norm[base]` and hands (vmin, vmax) to every slice
    * job (v2/nii_to_lmdb_paralel.py:248-257, 317-330). */
  def normalizeWithCuts(xs: Array[Float], vminIn: Double, vmaxIn: Double)
      : (Array[Float], Double, Double) = {
    val vmin = vminIn
    var vmax = vmaxIn
    if (vmax <= vmin + 1e-8) vmax = vmin + 1e-8
    val den = (vmax - vmin).toFloat
    val lo = vmin.toFloat
    val out = new Array[Float](xs.length)
    var i = 0
    while (i < xs.length) {
      val v = (xs(i) - lo) / den
      out(i) = if (v < 0f) 0f else if (v > 1f) 1f else v
      i += 1
    }
    (out, vmin, vmax)
  }

  /** K1: min-max normalize to 0..255 (reference slice_generator.py:72-73). */
  def minMaxNormalize255(xs: Array[Float]): Array[Float] = {
    var mn = Float.MaxValue; var mx = Float.MinValue
    var i = 0
    while (i < xs.length) { val v = xs(i); if (v < mn) mn = v; if (v > mx) mx = v; i += 1 }
    val den = if (mx - mn == 0f) 1f else mx - mn
    xs.map(v => (v - mn) / den * 255f)
  }

  /** K1/uint8 display variant with percentile window (reference
    * transform_lower_tesla.py:20-29): clip 0..1 then scale to 0..255 ints. */
  def normalizeUint8(xs: Array[Float], pmin: Double, pmax: Double): Array[Int] = {
    val vmin = nanPercentile(xs, pmin)
    var vmax = nanPercentile(xs, pmax)
    if (vmax <= vmin + 1e-8) vmax = vmin + 1e-8
    xs.map { v =>
      val y = (v - vmin) / (vmax - vmin)
      val c = if (y < 0) 0.0 else if (y > 1) 1.0 else y
      (c * 255.0).toInt
    }
  }

  // ---------------------------------------------------------------- windows

  /** K3: 1D cosine window; numpy np.hamming / np.hanning conventions
    * (symmetric, denominator n-1; n==1 → [1]). */
  def window1d(n: Int, kind: String): Array[Double] = {
    require(kind == "hamming" || kind == "hann", s"window must be hamming|hann, got $kind")
    if (n == 1) return Array(1.0)
    val (a0, a1) = if (kind == "hamming") (0.54, 0.46) else (0.5, 0.5)
    Array.tabulate(n)(i => a0 - a1 * math.cos(2.0 * math.Pi * i / (n - 1)))
  }

  /** K3: separable 2D window (outer product); "none" → None.
    * Reference transform_lower_tesla.py:35-49. */
  def window2d(h: Int, w: Int, kind: String): Option[Array[Double]] = {
    val k = Option(kind).getOrElse("none").toLowerCase
    if (k == "none") None
    else {
      val wy = window1d(h, k); val wx = window1d(w, k)
      val out = new Array[Double](h * w)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { out(y * w + x) = wy(y) * wx(x); x += 1 }
        y += 1
      }
      Some(out)
    }
  }

  // ---------------------------------------------------------------- k-space

  /** K4: k-space low-pass / physical downsample (reference
    * transform_lower_tesla.py:51-89; v2 crop-only variant
    * v2/degradation_function_v2.py:66-93).
    * Returns (pixels, outH, outW): (kh, kw) when keepSize=false, (h, w) when
    * keepSize=true.
    */
  def kspaceLowpass(img: Array[Float], h: Int, w: Int, fy: Double, fx: Double,
      windowType: String, keepSize: Boolean): (Array[Float], Int, Int) = {
    val re = new Array[Double](h * w)
    val im = new Array[Double](h * w)
    var i = 0
    while (i < img.length) { re(i) = img(i); i += 1 }
    Fft.fft2Ortho(re, im, h, w)
    val kRe = Fft.fftshift2(re, h, w)
    val kIm = Fft.fftshift2(im, h, w)

    val kh = math.max(2, (h * fy).toInt)
    val kw = math.max(2, (w * fx).toInt)
    val cy = h / 2; val cx = w / 2
    val y0 = cy - kh / 2; val x0 = cx - kw / 2

    val cRe = new Array[Double](kh * kw)
    val cIm = new Array[Double](kh * kw)
    var y = 0
    while (y < kh) {
      var x = 0
      while (x < kw) {
        cRe(y * kw + x) = kRe((y0 + y) * w + (x0 + x))
        cIm(y * kw + x) = kIm((y0 + y) * w + (x0 + x))
        x += 1
      }
      y += 1
    }
    window2d(kh, kw, windowType).foreach { win =>
      var j = 0
      while (j < win.length) { cRe(j) *= win(j); cIm(j) *= win(j); j += 1 }
    }

    if (keepSize) {
      val eRe = new Array[Double](h * w); val eIm = new Array[Double](h * w)
      y = 0
      while (y < kh) {
        var x = 0
        while (x < kw) {
          eRe((y0 + y) * w + (x0 + x)) = cRe(y * kw + x)
          eIm((y0 + y) * w + (x0 + x)) = cIm(y * kw + x)
          x += 1
        }
        y += 1
      }
      val sRe = Fft.ifftshift2(eRe, h, w)
      val sIm = Fft.ifftshift2(eIm, h, w)
      Fft.ifft2Ortho(sRe, sIm, h, w)
      (magnitude(sRe, sIm), h, w)
    } else {
      val sRe = Fft.ifftshift2(cRe, kh, kw)
      val sIm = Fft.ifftshift2(cIm, kh, kw)
      Fft.ifft2Ortho(sRe, sIm, kh, kw)
      (magnitude(sRe, sIm), kh, kw)
    }
  }

  private def magnitude(re: Array[Double], im: Array[Double]): Array[Float] = {
    val out = new Array[Float](re.length)
    var i = 0
    while (i < re.length) { out(i) = math.sqrt(re(i) * re(i) + im(i) * im(i)).toFloat; i += 1 }
    out
  }

  /** K5: Fourier sub-pixel shift (reference transform_lower_tesla.py:95-108). */
  def fourierShiftSubpixel(img: Array[Float], h: Int, w: Int, dy: Double, dx: Double): Array[Float] = {
    val re = new Array[Double](h * w); val im = new Array[Double](h * w)
    var i = 0
    while (i < img.length) { re(i) = img(i); i += 1 }
    Fft.fft2Ortho(re, im, h, w)
    val kRe = Fft.fftshift2(re, h, w)
    val kIm = Fft.fftshift2(im, h, w)
    val ky = shiftedFreq(h); val kx = shiftedFreq(w)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val ang = -2.0 * math.Pi * (ky(y) * dy + kx(x) * dx)
        val pr = math.cos(ang); val pi = math.sin(ang)
        val idx = y * w + x
        val r = kRe(idx) * pr - kIm(idx) * pi
        kIm(idx) = kRe(idx) * pi + kIm(idx) * pr
        kRe(idx) = r
        x += 1
      }
      y += 1
    }
    val sRe = Fft.ifftshift2(kRe, h, w)
    val sIm = Fft.ifftshift2(kIm, h, w)
    Fft.ifft2Ortho(sRe, sIm, h, w)
    magnitude(sRe, sIm)
  }

  private def shiftedFreq(n: Int): Array[Double] = {
    val f = Fft.fftfreq(n)
    val out = new Array[Double](n)
    val s = n / 2
    var i = 0
    while (i < n) { out((i + s) % n) = f(i); i += 1 }
    out
  }

  /** K6: motion artifact — seeded rigid sub-pixel shift + per-k-space-row
    * phase jitter (reference transform_lower_tesla.py:110-141). */
  def applyMotion(img: Array[Float], h: Int, w: Int, maxShift: Double,
      lineJitter: Double, rng: DrawSource): Array[Float] = {
    var out = img
    if (maxShift > 0) {
      val dy = rng.uniform(-maxShift, maxShift)
      val dx = rng.uniform(-maxShift, maxShift)
      out = fourierShiftSubpixel(out, h, w, dy, dx)
    }
    if (lineJitter > 0) {
      val re = new Array[Double](h * w); val im = new Array[Double](h * w)
      var i = 0
      while (i < out.length) { re(i) = out(i); i += 1 }
      Fft.fft2Ortho(re, im, h, w)
      val kRe = Fft.fftshift2(re, h, w)
      val kIm = Fft.fftshift2(im, h, w)
      var y = 0
      while (y < h) {
        val ph = rng.normal(0.0, lineJitter)
        val pr = math.cos(ph); val pi = math.sin(ph)
        var x = 0
        while (x < w) {
          val idx = y * w + x
          val r = kRe(idx) * pr - kIm(idx) * pi
          kIm(idx) = kRe(idx) * pi + kIm(idx) * pr
          kRe(idx) = r
          x += 1
        }
        y += 1
      }
      val sRe = Fft.ifftshift2(kRe, h, w)
      val sIm = Fft.ifftshift2(kIm, h, w)
      Fft.ifft2Ortho(sRe, sIm, h, w)
      out = magnitude(sRe, sIm)
    }
    out
  }

  // -------------------------------------------------------- gaussian filter

  /** Separable gaussian blur, scipy.ndimage.gaussian_filter semantics:
    * truncate=4.0, radius = int(truncate*sigma + 0.5), 'reflect' boundary. */
  def gaussianBlur(img: Array[Float], h: Int, w: Int, sigma: Double): Array[Float] = {
    if (sigma <= 0) return img.clone()
    val radius = (4.0 * sigma + 0.5).toInt
    val kernel = new Array[Double](2 * radius + 1)
    var s = 0.0
    var i = -radius
    while (i <= radius) {
      val v = math.exp(-(i.toDouble * i) / (2.0 * sigma * sigma))
      kernel(i + radius) = v; s += v; i += 1
    }
    i = 0
    while (i < kernel.length) { kernel(i) /= s; i += 1 }

    def reflect(idx: Int, n: Int): Int = {
      // scipy 'reflect': (d c b a | a b c d | d c b a)
      var k = idx
      val period = 2 * n
      k = ((k % period) + period) % period
      if (k >= n) period - 1 - k else k
    }

    val tmp = new Array[Float](h * w)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var acc = 0.0
        var t = -radius
        while (t <= radius) {
          acc += kernel(t + radius) * img(y * w + reflect(x + t, w))
          t += 1
        }
        tmp(y * w + x) = acc.toFloat
        x += 1
      }
      y += 1
    }
    val out = new Array[Float](h * w)
    y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var acc = 0.0
        var t = -radius
        while (t <= radius) {
          acc += kernel(t + radius) * tmp(reflect(y + t, h) * w + x)
          t += 1
        }
        out(y * w + x) = acc.toFloat
        x += 1
      }
      y += 1
    }
    out
  }

  /** K7: multiplicative bias field (reference transform_lower_tesla.py:143-166). */
  def applyBiasField(img: Array[Float], h: Int, w: Int, strength: Double,
      scaleRel: Double, rng: DrawSource): Array[Float] = {
    if (strength <= 0) return img.clone()
    val sigma = math.max(4, (math.min(h, w) * scaleRel).toInt)
    val noise = rng.normalArray(h * w)
    var field = gaussianBlur(noise, h, w, sigma)
    var mn = Float.MaxValue; var mx = Float.MinValue
    var i = 0
    while (i < field.length) { val v = field(i); if (v < mn) mn = v; if (v > mx) mx = v; i += 1 }
    var den = mx - mn
    if (den <= 0) den = 1f
    val out = new Array[Float](h * w)
    i = 0
    while (i < field.length) {
      val f01 = (field(i) - mn) / den
      val f = (1.0 - strength / 2.0) + strength * f01
      out(i) = (img(i) * f).toFloat
      i += 1
    }
    out
  }

  // --------------------------------------------------------------- MR noise

  /** K8: synthetic coil sensitivity magnitudes, (Nc, H, W) flattened,
    * RSS-normalized to mean ≈ 1 (reference transform_lower_tesla.py:172-199;
    * v2 radius 1.12, sigmaRel 0.75 — v2/degradation_function_v2.py:162-184). */
  private val coilCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int, Double, Double), Array[Float]]()

  /** Memoized: the maps are deterministic in (h, w, Nc, σ, r) and identical
    * for every slice of a volume — at flagship LR size (480×420×32 coils
    * ≈ 26 MB of floats) recomputing per slice would dominate the noise
    * stage. Bounded cache; entries are read-only. */
  def synthCoilSensitivities(h: Int, w: Int, nc: Int, sigmaRel: Double,
      radius: Double): Array[Float] = {
    val key = (h, w, nc, sigmaRel, radius)
    val cached = coilCache.get(key)
    if (cached != null) return cached
    val computed = computeCoilSensitivities(h, w, nc, sigmaRel, radius)
    if (coilCache.size > 16) coilCache.clear()
    coilCache.putIfAbsent(key, computed)
    computed
  }

  private def computeCoilSensitivities(h: Int, w: Int, nc: Int, sigmaRel: Double,
      radius: Double): Array[Float] = {
    val ys = Array.tabulate(h)(i => if (h == 1) -1.0 else -1.0 + 2.0 * i / (h - 1))
    val xs = Array.tabulate(w)(i => if (w == 1) -1.0 else -1.0 + 2.0 * i / (w - 1))
    val c = new Array[Float](nc * h * w)
    var k = 0
    while (k < nc) {
      val theta = 2.0 * math.Pi * k / nc
      val cx = radius * math.cos(theta)
      val cy = radius * math.sin(theta)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val d2 = (xs(x) - cx) * (xs(x) - cx) + (ys(y) - cy) * (ys(y) - cy)
          c(k * h * w + y * w + x) = math.exp(-d2 / (2.0 * sigmaRel * sigmaRel)).toFloat
          x += 1
        }
        y += 1
      }
      k += 1
    }
    // normalize: C / (mean(sqrt(sum_k C² + 1e-8)) + 1e-8)
    var meanNorm = 0.0
    var p = 0
    while (p < h * w) {
      var ss = 0.0
      k = 0
      while (k < nc) { val v = c(k * h * w + p); ss += v * v; k += 1 }
      meanNorm += math.sqrt(ss + 1e-8)
      p += 1
    }
    meanNorm = meanNorm / (h * w) + 1e-8
    var i = 0
    while (i < c.length) { c(i) = (c(i) / meanNorm).toFloat; i += 1 }
    c
  }

  /** K11: prescan normalize — divide RSS by the blurred receive envelope
    * (reference v2/degradation_function_v2.py:28-41). */
  def prescanNormalize(rss: Array[Float], h: Int, w: Int, coils: Array[Float],
      nc: Int, beta: Double, blurSigmaRel: Double): Array[Float] = {
    var env = new Array[Float](h * w)
    var p = 0
    while (p < h * w) {
      var ss = 0.0
      var k = 0
      while (k < nc) { val v = coils(k * h * w + p); ss += v * v; k += 1 }
      env(p) = math.sqrt(ss).toFloat
      p += 1
    }
    if (blurSigmaRel > 0) {
      val sigma = math.max(1, (math.min(h, w) * blurSigmaRel).toInt)
      env = gaussianBlur(env, h, w, sigma)
    }
    var mean = 0.0
    var i = 0
    while (i < env.length) { mean += env(i); i += 1 }
    mean = mean / env.length + 1e-8
    val out = new Array[Float](h * w)
    i = 0
    while (i < env.length) {
      val e = math.max(math.pow(env(i) / mean, beta), 1e-6)
      out(i) = (rss(i) / e).toFloat
      i += 1
    }
    out
  }

  /** K24: SNR target from field strength and voxel factor
    * (reference v2/degradation_function_v2.py:186-198). */
  def snrTargetFromField(snr7t: Double, b0: Double, alpha: Double, voxelFactor: Double): Double =
    snr7t * math.pow(b0 / 7.0, alpha) * math.max(1e-6, voxelFactor)

  /** K9: Rician noise (reference transform_lower_tesla.py:237-246). */
  def addRicianNoise(img: Array[Float], sigma: Double, rng: DrawSource): Array[Float] = {
    val n = img.length
    val nr = rng.normalArray(n, 0.0, sigma)
    val ni = rng.normalArray(n, 0.0, sigma)
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      val a = img(i) + nr(i)
      out(i) = math.sqrt(a * a + ni(i) * ni(i).toDouble).toFloat
      i += 1
    }
    out
  }

  /** K10: multi-coil chi noise + RSS combine
    * (reference transform_lower_tesla.py:248-268). Draw order: all real
    * noise (coil-major), then all imaginary — matching the reference's two
    * array-shaped draws. */
  def addChiNoiseRss(img: Array[Float], h: Int, w: Int, coils: Array[Float],
      nc: Int, sigma: Double, rng: DrawSource): Array[Float] = {
    val hw = h * w
    val nr = rng.normalArray(nc * hw, 0.0, sigma)
    val ni = rng.normalArray(nc * hw, 0.0, sigma)
    val out = new Array[Float](hw)
    var p = 0
    while (p < hw) {
      var ss = 0.0
      var k = 0
      while (k < nc) {
        val s = img(p) * coils(k * hw + p) + nr(k * hw + p)
        val q = ni(k * hw + p)
        ss += s * s + q * q
        k += 1
      }
      out(p) = math.sqrt(ss).toFloat
      p += 1
    }
    out
  }

  /** K12: robust 2-step intensity re-align over the ref>p60 mask
    * (reference v2/degradation_function_v2.py:264-283). Mutates `out`. */
  def realignIntensity(out: Array[Float], ref: Array[Float]): Array[Float] = {
    val thr = math.max(nanPercentile(ref, 60.0), 1e-6)
    val maskIdx = ref.indices.filter(i => ref(i) > thr).toArray
    if (maskIdx.isEmpty) return out
    val refM = maskIdx.map(ref)
    val outM = maskIdx.map(out)
    val s1raw = (median(refM) + 1e-8) / (median(outM) + 1e-8)
    val s1 = math.min(math.max(s1raw, 0.85), 1.15)
    var i = 0
    while (i < out.length) { out(i) = (out(i) * s1).toFloat; i += 1 }
    val outM2 = maskIdx.map(out)
    val s2raw = (nanPercentile(refM, 98.0) + 1e-8) / (nanPercentile(outM2, 98.0) + 1e-8)
    val s2 = math.min(math.max(s2raw, 0.85), 1.10)
    i = 0
    while (i < out.length) { out(i) = (out(i) * s2).toFloat; i += 1 }
    out
  }

  // ------------------------------------------------------ SPGR signal model

  /** K14: SPGR/FLASH signal (reference transform_lower_tesla.py:277-305). */
  def spgrSignal(pd: Double, t1: Double, t2s: Double, tr: Double, te: Double,
      faDeg: Double, b1: Double = 1.0): Double = {
    val fa = faDeg * math.Pi / 180.0 * b1
    val e1 = math.exp(-tr / (t1 + 1e-8))
    pd * math.sin(fa) * (1.0 - e1) / (1.0 - e1 * math.cos(fa) + 1e-8) *
      math.exp(-te / (t2s + 1e-8))
  }

  /** K15: T1/T2* field-strength rescale factors
    * (reference transform_lower_tesla.py:307-328). Returns (sT1, sT2s). */
  def tMapScale(b0: Double): (Double, Double) =
    if (math.abs(b0 - 3.0) < 0.25) (0.80, 1.40)
    else if (math.abs(b0 - 1.5) < 0.25) (0.70, 1.80)
    else {
      val frac = (7.0 - b0) / (7.0 - 1.5)
      (0.70 + 0.10 * (1 - frac), 1.80 - 0.40 * (1 - frac))
    }

  /** K27: lenient field-string parser, default 3.0
    * (reference transform_lower_tesla.py:390-395). */
  def parseFieldStrength(s: String): Double = {
    val cleaned = Option(s).getOrElse("").toLowerCase.replace("t", "").replace(",", ".")
    try cleaned.toDouble catch { case _: NumberFormatException => 3.0 }
  }

  // -------------------------------------------------------- geometry / crop

  /** K16: center-crop then edge-pad to (h, w) — the `_fit` helper
    * (reference transform_lower_tesla.py:400-410). */
  def centerCropPad(a: Array[Float], ah: Int, aw: Int, h: Int, w: Int): Array[Float] = {
    if (ah == h && aw == w) return a.clone()
    val sy0 = math.max(0, (ah - h) / 2); val sx0 = math.max(0, (aw - w) / 2)
    val ch = math.min(ah - sy0, h); val cw = math.min(aw - sx0, w)
    val cropped = new Array[Float](ch * cw)
    var y = 0
    while (y < ch) {
      System.arraycopy(a, (sy0 + y) * aw + sx0, cropped, y * cw, cw)
      y += 1
    }
    edgePadTo(cropped, ch, cw, h, w)
  }

  /** K17: np.pad(..., mode='edge') to target shape, centered padding. */
  def edgePadTo(a: Array[Float], ah: Int, aw: Int, h: Int, w: Int): Array[Float] = {
    if (ah == h && aw == w) return a
    val py = h - ah; val px = w - aw
    val py0 = py / 2; val px0 = px / 2
    val out = new Array[Float](h * w)
    var y = 0
    while (y < h) {
      val sy = math.min(math.max(y - py0, 0), ah - 1)
      var x = 0
      while (x < w) {
        val sx = math.min(math.max(x - px0, 0), aw - 1)
        out(y * w + x) = a(sy * aw + sx)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Edge-pad bottom/right only (the tiling partial-patch pad — reference
    * v2/nii_to_lmdb.py:247-250 pads after cropping at grid positions). */
  def edgePadBottomRight(a: Array[Float], ah: Int, aw: Int, h: Int, w: Int): Array[Float] = {
    if (ah == h && aw == w) return a
    val out = new Array[Float](h * w)
    var y = 0
    while (y < h) {
      val sy = math.min(y, ah - 1)
      var x = 0
      while (x < w) {
        out(y * w + x) = a(sy * aw + math.min(x, aw - 1))
        x += 1
      }
      y += 1
    }
    out
  }

  /** G2: tiling grid with the tail-crop rule
    * (reference v2/patch_utils.py:36-46). */
  def makeCropSpaces(h: Int, w: Int, crop: Int, step: Int, threshSize: Int)
      : (Array[Int], Array[Int]) = {
    def axis(n: Int): Array[Int] = {
      val base = Range(0, math.max(1, n - crop + 1), step).toArray
      if (n - (base.last + crop) > threshSize) base :+ (n - crop) else base
    }
    (axis(h), axis(w))
  }

  /** Extract patch at (y0, x0) size crop×crop, edge-padding if the slice is
    * smaller than the window. */
  def extractPatch(a: Array[Float], h: Int, w: Int, y0: Int, x0: Int, crop: Int): Array[Float] = {
    val ch = math.min(crop, h - y0); val cw = math.min(crop, w - x0)
    val out = new Array[Float](ch * cw)
    var y = 0
    while (y < ch) {
      System.arraycopy(a, (y0 + y) * w + x0, out, y * cw, cw)
      y += 1
    }
    if (ch == crop && cw == crop) out else edgePadBottomRight(out, ch, cw, crop, crop)
  }

  /** K19: rot90 (counter-clockwise, like np.rot90 k=1). */
  def rot90(a: Array[Float], h: Int, w: Int): (Array[Float], Int, Int) = {
    val out = new Array[Float](h * w)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        out((w - 1 - x) * h + y) = a(y * w + x)
        x += 1
      }
      y += 1
    }
    (out, w, h)
  }

  /** K18: area (box) resize — the naive-LR sampler (reference
    * create_sample.py:74, cv2 INTER_AREA semantics). Integer downscale
    * factors take the exact box-average fast path; arbitrary ratios use
    * fractional-area weighting (each output pixel averages its source
    * window [y·sy,(y+1)·sy)×[x·sx,(x+1)·sx) with partial rows/columns
    * weighted by their overlap); upscale falls back to bilinear, as cv2
    * INTER_AREA does. */
  def resizeArea(a: Array[Float], h: Int, w: Int, oh: Int, ow: Int): Array[Float] = {
    if (h % oh == 0 && w % ow == 0) {
      val fy = h / oh; val fx = w / ow
      val out = new Array[Float](oh * ow)
      var y = 0
      while (y < oh) {
        var x = 0
        while (x < ow) {
          var acc = 0.0
          var dy = 0
          while (dy < fy) {
            var dx = 0
            while (dx < fx) { acc += a((y * fy + dy) * w + (x * fx + dx)); dx += 1 }
            dy += 1
          }
          out(y * ow + x) = (acc / (fy * fx)).toFloat
          x += 1
        }
        y += 1
      }
      out
    } else if (oh <= h && ow <= w) {
      val sy = h.toDouble / oh; val sx = w.toDouble / ow
      val out = new Array[Float](oh * ow)
      var y = 0
      while (y < oh) {
        val y0 = y * sy; val y1 = (y + 1) * sy
        val iy0 = math.floor(y0).toInt
        val iy1 = math.min(math.ceil(y1).toInt, h)
        var x = 0
        while (x < ow) {
          val x0 = x * sx; val x1 = (x + 1) * sx
          val ix0 = math.floor(x0).toInt
          val ix1 = math.min(math.ceil(x1).toInt, w)
          var acc = 0.0; var wsum = 0.0
          var iy = iy0
          while (iy < iy1) {
            val wy = math.min(iy + 1.0, y1) - math.max(iy.toDouble, y0)
            var ix = ix0
            while (ix < ix1) {
              val wx = math.min(ix + 1.0, x1) - math.max(ix.toDouble, x0)
              acc += a(iy * w + ix) * wy * wx
              wsum += wy * wx
              ix += 1
            }
            iy += 1
          }
          out(y * ow + x) = (acc / wsum).toFloat
          x += 1
        }
        y += 1
      }
      out
    } else resizeBilinear(a, h, w, oh, ow)
  }

  /** K18: bilinear resize with cv2 INTER_LINEAR's half-pixel center mapping
    * src = (dst + 0.5)·scale − 0.5, edge-clamped. */
  def resizeBilinear(a: Array[Float], h: Int, w: Int, oh: Int, ow: Int): Array[Float] = {
    val sy = h.toDouble / oh; val sx = w.toDouble / ow
    val out = new Array[Float](oh * ow)
    var y = 0
    while (y < oh) {
      val fy = math.max(0.0, math.min((y + 0.5) * sy - 0.5, h - 1.0))
      val y0 = math.min(fy.toInt, h - 1); val y1 = math.min(y0 + 1, h - 1)
      val ty = fy - y0
      var x = 0
      while (x < ow) {
        val fx = math.max(0.0, math.min((x + 0.5) * sx - 0.5, w - 1.0))
        val x0 = math.min(fx.toInt, w - 1); val x1 = math.min(x0 + 1, w - 1)
        val tx = fx - x0
        val top = a(y0 * w + x0) * (1 - tx) + a(y0 * w + x1) * tx
        val bot = a(y1 * w + x0) * (1 - tx) + a(y1 * w + x1) * tx
        out(y * ow + x) = (top * (1 - ty) + bot * ty).toFloat
        x += 1
      }
      y += 1
    }
    out
  }

  /** Bicubic kernel, cv2's a = −0.75 (Keys 1981 with cv2's constant). */
  @inline private def cubicW(t: Double): Double = {
    val at = math.abs(t)
    val a = -0.75
    if (at <= 1.0) ((a + 2.0) * at - (a + 3.0)) * at * at + 1.0
    else if (at < 2.0) (((at - 5.0) * at + 8.0) * at - 4.0) * a
    else 0.0
  }

  /** K18: bicubic resize (cv2 INTER_CUBIC: 4×4 neighborhood, a = −0.75,
    * half-pixel mapping, replicated borders) — the viz-path interpolator
    * (reference v2/viz_lmdb_pair.py:42-60). */
  def resizeBicubic(a: Array[Float], h: Int, w: Int, oh: Int, ow: Int): Array[Float] = {
    val sy = h.toDouble / oh; val sx = w.toDouble / ow
    val out = new Array[Float](oh * ow)
    @inline def clampY(i: Int) = if (i < 0) 0 else if (i >= h) h - 1 else i
    @inline def clampX(i: Int) = if (i < 0) 0 else if (i >= w) w - 1 else i
    var y = 0
    while (y < oh) {
      val fy = (y + 0.5) * sy - 0.5
      val iy = math.floor(fy).toInt
      val ty = fy - iy
      var x = 0
      while (x < ow) {
        val fx = (x + 0.5) * sx - 0.5
        val ix = math.floor(fx).toInt
        val tx = fx - ix
        var acc = 0.0
        var dy = -1
        while (dy <= 2) {
          val wy = cubicW(dy - ty)
          if (wy != 0.0) {
            val row = clampY(iy + dy) * w
            var dx = -1
            while (dx <= 2) {
              val wx = cubicW(dx - tx)
              if (wx != 0.0) acc += a(row + clampX(ix + dx)) * wy * wx
              dx += 1
            }
          }
          dy += 1
        }
        out(y * ow + x) = acc.toFloat
        x += 1
      }
      y += 1
    }
    out
  }

  /** K18 dispatcher matching cv2.resize's interpolation names. */
  def resize(a: Array[Float], h: Int, w: Int, oh: Int, ow: Int,
      method: String = "area"): Array[Float] = method match {
    case "area"    => resizeArea(a, h, w, oh, ow)
    case "linear"  => resizeBilinear(a, h, w, oh, ow)
    case "cubic"   => resizeBicubic(a, h, w, oh, ow)
    case m => throw new IllegalArgumentException(s"resize method must be area|linear|cubic, got $m")
  }

  // ----------------------------------------------------------- dark filters

  /** P2/P3: fraction of (finite) pixels below threshold — the dark-patch
    * predicate core (reference filters.py:4-10; v2/patch_utils.py:58-99). */
  def darkFraction(patch: Array[Float], thr: Double, ignoreNan: Boolean): Double = {
    var dark = 0L; var total = 0L
    var i = 0
    while (i < patch.length) {
      val v = patch(i)
      if (!ignoreNan || !v.isNaN) {
        val c = if (v < 0f) 0f else if (v > 1f) 1f else v
        if (c < thr) dark += 1
        total += 1
      }
      i += 1
    }
    if (total == 0) 1.0 else dark.toDouble / total
  }

  def patchIsDark(patch: Array[Float], thr: Double = 20.0 / 255.0,
      percentage: Double = 0.7, ignoreNan: Boolean = true, border: Int = 0,
      h: Int = -1, w: Int = -1): Boolean = {
    var p = patch
    if (border > 0) {
      require(h > 0 && w > 0, "border crop needs h/w")
      if (h - 2 * border <= 0 || w - 2 * border <= 0) return true
      val nh = h - 2 * border; val nw = w - 2 * border
      val cut = new Array[Float](nh * nw)
      var y = 0
      while (y < nh) {
        System.arraycopy(patch, (y + border) * w + border, cut, y * nw, nw)
        y += 1
      }
      p = cut
    }
    darkFraction(p, thr, ignoreNan) > percentage
  }

  // ------------------------------------------------------------------- Otsu

  /** K20: Otsu threshold with percentile clipping; returns the bin center
    * (reference v2/estimate_snr.py:23-42). */
  def otsuThreshold(xs: Array[Float], bins: Int = 256,
      clipPcts: (Double, Double) = (0.5, 99.5)): Double = {
    val lo = nanPercentile(xs, clipPcts._1)
    var hi = nanPercentile(xs, clipPcts._2)
    if (hi <= lo) hi = lo + 1e-6
    val hist = new Array[Double](bins)
    val width = (hi - lo) / bins
    var i = 0
    while (i < xs.length) {
      val v = math.min(math.max(xs(i).toDouble, lo), hi)
      var b = ((v - lo) / width).toInt
      if (b >= bins) b = bins - 1
      hist(b) += 1
      i += 1
    }
    val total = math.max(xs.length.toDouble, 1.0)
    var cdf = 0.0; var mu = 0.0
    var muT = 0.0
    i = 0
    while (i < bins) {
      muT += hist(i) / total * (lo + width * (i + 0.5))
      i += 1
    }
    var best = Double.NegativeInfinity
    var bestBin = 0
    i = 0
    while (i < bins) {
      val p = hist(i) / total
      cdf += p
      mu += p * (lo + width * (i + 0.5))
      val denom = cdf * (1.0 - cdf) + 1e-12
      val sigmaB2 = (muT * cdf - mu) * (muT * cdf - mu) / denom
      if (sigmaB2 > best) { best = sigmaB2; bestBin = i }
      i += 1
    }
    lo + width * (bestBin + 0.5)
  }

  // ------------------------------------------------------------ SNR algebra

  /** K22: σ of the underlying gaussian from background (air) magnitude std.
    * Rician → Rayleigh (k=2); Chi-RSS → k=2Nc with the Γ-ratio moment
    * (reference v2/estimate_snr.py:74-95). Returns (sigma, k). */
  def sigmaFromBackgroundStd(stdAir: Double, mode: String, nc: Int): (Double, Int) =
    mode.toLowerCase match {
      case "rician" =>
        (stdAir / math.sqrt((4.0 - math.Pi) / 2.0), 2)
      case "chi" | "rss" | "multi" =>
        val k = 2 * math.max(1, nc)
        val muOverSigma = math.sqrt(2.0) * gammaRatio((k + 1) / 2.0, k / 2.0)
        val varOverSigma2 = math.max(k - muOverSigma * muOverSigma, 1e-6)
        (stdAir / math.sqrt(varOverSigma2), k)
      case other => throw new IllegalArgumentException(s"mode must be rician|chi, got $other")
    }

  /** Γ(a)/Γ(b) via log-gamma (Lanczos) — stable for moderate k. */
  def gammaRatio(a: Double, b: Double): Double = math.exp(logGamma(a) - logGamma(b))

  /** Lanczos log-gamma (g=7, n=9 coefficients — standard public constants). */
  def logGamma(x: Double): Double = {
    val g = 7.0
    val c = Array(
      0.99999999999980993, 676.5203681218851, -1259.1392167224028,
      771.32342877765313, -176.61502916214059, 12.507343278686905,
      -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)
    if (x < 0.5)
      math.log(math.Pi / math.sin(math.Pi * x)) - logGamma(1.0 - x)
    else {
      val xx = x - 1.0
      var a = c(0)
      val t = xx + g + 0.5
      var i = 1
      while (i < 9) { a += c(i) / (xx + i); i += 1 }
      0.5 * math.log(2.0 * math.Pi) + (xx + 0.5) * math.log(t) - t + math.log(a)
    }
  }

  /** K23: naive + second-moment-corrected SNR over an ROI
    * (reference v2/estimate_snr.py:97-116). */
  def snrFromRoi(vals: Array[Float], sigma: Double, k: Int): Map[String, Double] = {
    val n = vals.length
    var s = 0.0; var s2 = 0.0
    var i = 0
    while (i < n) { s += vals(i); s2 += vals(i).toDouble * vals(i); i += 1 }
    val mean = s / n
    val m2 = s2 / n
    var varAcc = 0.0
    i = 0
    while (i < n) { val d = vals(i) - mean; varAcc += d * d; i += 1 }
    val std = math.sqrt(varAcc / math.max(n - 1, 1))
    val snrCorr = math.sqrt(math.max(m2 / (sigma * sigma + 1e-12) - k, 0.0))
    Map(
      "snr_naive_mean_over_std" -> mean / (std + 1e-12),
      "snr_corrected_m2" -> snrCorr,
      "mean_signal" -> mean,
      "std_signal" -> std,
      "mean_square_signal" -> m2)
  }
}
