package graft.functions

/** Complex FFT for arbitrary lengths: iterative radix-2 Cooley–Tukey for
  * powers of two, Bluestein's chirp-z algorithm otherwise (reference images
  * are arbitrary H×W — see /root/reference/transform_lower_tesla.py:64).
  *
  * Normalization matches `scipy.fft.fft2(..., norm="ortho")`: forward and
  * inverse are each scaled by 1/√N per axis.
  */
object Fft {

  /** Unnormalized in-place forward (e^-i) or backward (e^+i, no 1/n) DFT
    * for power-of-two n. */
  private def fftPow2(re: Array[Double], im: Array[Double], invert: Boolean): Unit = {
    val n = re.length
    var i = 1
    var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = (if (invert) 2.0 else -2.0) * math.Pi / len
      val wr = math.cos(ang)
      val wi = math.sin(ang)
      var blk = 0
      while (blk < n) {
        var cr = 1.0
        var ci = 0.0
        var k = 0
        val half = len >> 1
        while (k < half) {
          val ur = re(blk + k); val ui = im(blk + k)
          val vr0 = re(blk + k + half); val vi0 = im(blk + k + half)
          val vr = vr0 * cr - vi0 * ci
          val vi = vr0 * ci + vi0 * cr
          re(blk + k) = ur + vr; im(blk + k) = ui + vi
          re(blk + k + half) = ur - vr; im(blk + k + half) = ui - vi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr
          cr = ncr
          k += 1
        }
        blk += len
      }
      len <<= 1
    }
  }

  private def nextPow2(n: Int): Int = {
    var m = 1
    while (m < n) m <<= 1
    m
  }

  /** Cached per-length Bluestein tables: the chirp and the FFT of the b
    * sequence depend only on n, and the flagship pipeline calls the same
    * lengths for every slice of a volume — recomputing them dominated the
    * kernel cost. Thread-local (kernels run inside executor task threads). */
  private final class ChirpTables(val n: Int) {
    val m: Int = nextPow2(2 * n - 1)
    val cosT = new Array[Double](n)
    val sinT = new Array[Double](n)
    val bfr = new Array[Double](m)
    val bfi = new Array[Double](m)
    // per-thread convolution scratch, reused across calls (tables are
    // ThreadLocal already): a fresh 2·m-double pair per call put the
    // Bluestein tier at ~57 MB of garbage per 960×840 fft2 — at 32
    // concurrent degrade tasks the young-gen churn was the memory-
    // bandwidth bottleneck, not the arithmetic. Reuse is bitwise
    // neutral: every slot is overwritten below n and zero-filled above.
    val ar = new Array[Double](m)
    val ai = new Array[Double](m)
    locally {
      var j = 0
      while (j < n) {
        // chirp w_j = e^{-i π j² / n}; j² mod 2n keeps the angle exact
        val sq = (j.toLong * j) % (2L * n)
        val ang = math.Pi * sq / n
        cosT(j) = math.cos(ang)
        sinT(j) = math.sin(ang)
        bfr(j) = cosT(j); bfi(j) = sinT(j)
        if (j > 0) { bfr(m - j) = cosT(j); bfi(m - j) = sinT(j) }
        j += 1
      }
      fftPow2(bfr, bfi, invert = false)
    }
  }

  private val chirpCache = new ThreadLocal[java.util.HashMap[Int, ChirpTables]] {
    override def initialValue() = new java.util.HashMap[Int, ChirpTables]()
  }

  private def chirpFor(n: Int): ChirpTables = {
    val cache = chirpCache.get()
    var t = cache.get(n)
    if (t == null) {
      t = new ChirpTables(n)
      if (cache.size > 64) cache.clear() // bound memory on pathological inputs
      cache.put(n, t)
    }
    t
  }

  /** Unnormalized forward DFT of arbitrary length via Bluestein. */
  private def bluestein(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    val t = chirpFor(n)
    val m = t.m
    val cosT = t.cosT; val sinT = t.sinT
    val ar = t.ar; val ai = t.ai
    java.util.Arrays.fill(ar, n, m, 0.0)
    java.util.Arrays.fill(ai, n, m, 0.0)
    var j = 0
    while (j < n) {
      // a_j = x_j * e^{-iπj²/n}
      ar(j) = re(j) * cosT(j) + im(j) * sinT(j)
      ai(j) = -re(j) * sinT(j) + im(j) * cosT(j)
      j += 1
    }
    fftPow2(ar, ai, invert = false)
    val br = t.bfr; val bi = t.bfi
    var k = 0
    while (k < m) {
      val r = ar(k) * br(k) - ai(k) * bi(k)
      ai(k) = ar(k) * bi(k) + ai(k) * br(k)
      ar(k) = r
      k += 1
    }
    fftPow2(ar, ai, invert = true)
    val inv = 1.0 / m
    k = 0
    while (k < n) {
      // X_k = e^{-iπk²/n} * conv_k / m
      val cr = ar(k) * inv; val ci = ai(k) * inv
      re(k) = cr * cosT(k) + ci * sinT(k)
      im(k) = -cr * sinT(k) + ci * cosT(k)
      k += 1
    }
  }

  /** Unnormalized forward DFT, any n. */
  def forward(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    if (n <= 1) return
    if ((n & (n - 1)) == 0) fftPow2(re, im, invert = false) else bluestein(re, im)
  }

  /** Unnormalized backward DFT (e^{+i}, no 1/n), any n — via conjugation. */
  def backward(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    if (n <= 1) return
    var i = 0
    while (i < n) { im(i) = -im(i); i += 1 }
    forward(re, im)
    i = 0
    while (i < n) { im(i) = -im(i); i += 1 }
  }

  /** 2D ortho-normalized forward FFT, in place over row-major h×w arrays. */
  def fft2Ortho(re: Array[Double], im: Array[Double], h: Int, w: Int): Unit =
    fft2(re, im, h, w, inverse = false)

  /** 2D ortho-normalized inverse FFT. */
  def ifft2Ortho(re: Array[Double], im: Array[Double], h: Int, w: Int): Unit =
    fft2(re, im, h, w, inverse = true)

  private def fft2(re: Array[Double], im: Array[Double], h: Int, w: Int, inverse: Boolean): Unit = {
    val rowRe = new Array[Double](w); val rowIm = new Array[Double](w)
    var y = 0
    while (y < h) {
      System.arraycopy(re, y * w, rowRe, 0, w)
      System.arraycopy(im, y * w, rowIm, 0, w)
      if (inverse) backward(rowRe, rowIm) else forward(rowRe, rowIm)
      System.arraycopy(rowRe, 0, re, y * w, w)
      System.arraycopy(rowIm, 0, im, y * w, w)
      y += 1
    }
    val colRe = new Array[Double](h); val colIm = new Array[Double](h)
    var x = 0
    while (x < w) {
      var yy = 0
      while (yy < h) { colRe(yy) = re(yy * w + x); colIm(yy) = im(yy * w + x); yy += 1 }
      if (inverse) backward(colRe, colIm) else forward(colRe, colIm)
      yy = 0
      while (yy < h) { re(yy * w + x) = colRe(yy); im(yy * w + x) = colIm(yy); yy += 1 }
      x += 1
    }
    val scale = 1.0 / math.sqrt(h.toDouble * w.toDouble)
    var i = 0
    val n = h * w
    while (i < n) { re(i) *= scale; im(i) *= scale; i += 1 }
  }

  /** fftshift along both axes (roll by floor(n/2)), out-of-place. */
  def fftshift2(a: Array[Double], h: Int, w: Int): Array[Double] = shift2(a, h, w, h / 2, w / 2)

  /** ifftshift along both axes (roll by ceil(n/2)). */
  def ifftshift2(a: Array[Double], h: Int, w: Int): Array[Double] =
    shift2(a, h, w, (h + 1) / 2, (w + 1) / 2)

  private def shift2(a: Array[Double], h: Int, w: Int, sy: Int, sx: Int): Array[Double] = {
    val out = new Array[Double](h * w)
    var y = 0
    while (y < h) {
      val ty = (y + sy) % h
      var x = 0
      while (x < w) {
        out(ty * w + (x + sx) % w) = a(y * w + x)
        x += 1
      }
      y += 1
    }
    out
  }

  /** np.fft.fftfreq(n): [0, 1, …, (n-1)/2, -(n/2), …, -1] / n. */
  def fftfreq(n: Int): Array[Double] = {
    val out = new Array[Double](n)
    val half = (n - 1) / 2
    var i = 0
    while (i <= half) { out(i) = i.toDouble / n; i += 1 }
    var v = -(n / 2)
    while (i < n) { out(i) = v.toDouble / n; v += 1; i += 1 }
    out
  }
}
