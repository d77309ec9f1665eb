package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Fft

class FftSpec extends AnyFunSuite {

  /** O(n²) direct DFT reference. */
  private def naiveDft(re: Array[Double], im: Array[Double], invert: Boolean)
      : (Array[Double], Array[Double]) = {
    val n = re.length
    val or = new Array[Double](n); val oi = new Array[Double](n)
    val sign = if (invert) 2.0 else -2.0
    for (k <- 0 until n; j <- 0 until n) {
      val ang = sign * math.Pi * k * j / n
      or(k) += re(j) * math.cos(ang) - im(j) * math.sin(ang)
      oi(k) += re(j) * math.sin(ang) + im(j) * math.cos(ang)
    }
    (or, oi)
  }

  private def rngData(n: Int, seed: Int): (Array[Double], Array[Double]) = {
    val r = new scala.util.Random(seed)
    (Array.fill(n)(r.nextDouble() * 4 - 2), Array.fill(n)(r.nextDouble() * 4 - 2))
  }

  test("forward matches naive DFT for pow2 and non-pow2 sizes") {
    for (n <- Seq(1, 2, 3, 4, 5, 6, 7, 8, 12, 16, 17, 25, 31, 64)) {
      val (re, im) = rngData(n, n)
      val (er, ei) = naiveDft(re, im, invert = false)
      val ar = re.clone(); val ai = im.clone()
      Fft.forward(ar, ai)
      for (i <- 0 until n) {
        assert(math.abs(ar(i) - er(i)) < 1e-9, s"n=$n re[$i]")
        assert(math.abs(ai(i) - ei(i)) < 1e-9, s"n=$n im[$i]")
      }
    }
  }

  test("backward matches naive inverse (unnormalized)") {
    for (n <- Seq(3, 5, 8, 12)) {
      val (re, im) = rngData(n, 100 + n)
      val (er, ei) = naiveDft(re, im, invert = true)
      val ar = re.clone(); val ai = im.clone()
      Fft.backward(ar, ai)
      for (i <- 0 until n) {
        assert(math.abs(ar(i) - er(i)) < 1e-9)
        assert(math.abs(ai(i) - ei(i)) < 1e-9)
      }
    }
  }

  test("2D ortho round trip is identity") {
    for ((h, w) <- Seq((3, 4), (5, 2), (8, 8), (7, 9))) {
      val (re, _) = rngData(h * w, h * 13 + w)
      val ar = re.clone(); val ai = new Array[Double](h * w)
      Fft.fft2Ortho(ar, ai, h, w)
      Fft.ifft2Ortho(ar, ai, h, w)
      for (i <- 0 until h * w) {
        assert(math.abs(ar(i) - re(i)) < 1e-10, s"($h,$w)[$i]")
        assert(math.abs(ai(i)) < 1e-10)
      }
    }
  }

  test("2D ortho preserves energy (Parseval)") {
    val (re, _) = rngData(35, 7)
    val ar = re.clone(); val ai = new Array[Double](35)
    Fft.fft2Ortho(ar, ai, 5, 7)
    val eIn = re.map(v => v * v).sum
    val eOut = (0 until 35).map(i => ar(i) * ar(i) + ai(i) * ai(i)).sum
    assert(math.abs(eIn - eOut) < 1e-9)
  }

  test("matches numpy golden: fftshift(fft2(arange(12).reshape(3,4), ortho))[1][2]") {
    val a = Array.tabulate(12)(_.toDouble)
    val ar = a.clone(); val ai = new Array[Double](12)
    Fft.fft2Ortho(ar, ai, 3, 4)
    val sr = Fft.fftshift2(ar, 3, 4)
    val si = Fft.fftshift2(ai, 3, 4)
    assert(math.abs(sr(1 * 4 + 2) - 19.052558883257653) < 1e-12)
    assert(math.abs(si(1 * 4 + 2)) < 1e-12)
  }

  test("fftfreq matches numpy for odd and even n") {
    assert(Fft.fftfreq(5).toSeq == Seq(0.0, 0.2, 0.4, -0.4, -0.2))
    val f6 = Fft.fftfreq(6)
    val exp6 = Seq(0.0, 1.0 / 6, 1.0 / 3, -0.5, -1.0 / 3, -1.0 / 6)
    f6.zip(exp6).foreach { case (a, b) => assert(math.abs(a - b) < 1e-15) }
  }

  test("fftshift/ifftshift are inverse for odd sizes") {
    val a = Array.tabulate(15)(_.toDouble)
    val s = Fft.ifftshift2(Fft.fftshift2(a, 3, 5), 3, 5)
    assert(s.toSeq == a.toSeq)
  }
}
