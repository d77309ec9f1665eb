package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Image

/** Property sweeps over the K18 resize family (seeded random shapes and
  * pixel data, same plain-loop style as TilingPropSpec). */
class ResizePropSpec extends AnyFunSuite {

  private val rand = new scala.util.Random(20260812L)

  private def randomImage(h: Int, w: Int): Array[Float] =
    Array.fill(h * w)(rand.nextFloat() * 510f - 255f)

  test("area/bilinear stay inside the input's [min,max]; all methods preserve constants") {
    for (_ <- 1 to 200) {
      val h = 2 + rand.nextInt(40); val w = 2 + rand.nextInt(40)
      val oh = 1 + rand.nextInt(40); val ow = 1 + rand.nextInt(40)
      val a = randomImage(h, w)
      val mn = a.min; val mx = a.max
      for (m <- Seq("area", "linear")) {
        val r = Image.resize(a, h, w, oh, ow, m)
        assert(r.length == oh * ow, s"$m ${h}x$w -> ${oh}x$ow length")
        // convex combinations of inputs — must stay inside the input range
        assert(r.forall(v => v >= mn - 1e-3f && v <= mx + 1e-3f),
          s"$m ${h}x$w -> ${oh}x$ow out of range")
      }
      val const = Array.fill(h * w)(42.5f)
      for (m <- Seq("area", "linear", "cubic")) {
        val r = Image.resize(const, h, w, oh, ow, m)
        assert(r.forall(v => math.abs(v - 42.5f) < 1e-4f), s"$m constant")
      }
    }
  }

  test("area downscale preserves the global mean when the grid divides evenly") {
    for (_ <- 1 to 200) {
      val oh = 1 + rand.nextInt(12); val ow = 1 + rand.nextInt(12)
      val fy = 1 + rand.nextInt(6); val fx = 1 + rand.nextInt(6)
      val h = oh * fy; val w = ow * fx
      val a = randomImage(h, w)
      val r = Image.resizeArea(a, h, w, oh, ow)
      val meanIn = a.map(_.toDouble).sum / a.length
      val meanOut = r.map(_.toDouble).sum / r.length
      assert(math.abs(meanIn - meanOut) < 1e-3, s"${h}x$w -> ${oh}x$ow mean drift")
    }
  }

  test("fractional area agrees with the integer fast path on divisible grids") {
    for (_ <- 1 to 100) {
      val oh = 1 + rand.nextInt(10); val ow = 1 + rand.nextInt(10)
      val fy = 2 + rand.nextInt(4); val fx = 2 + rand.nextInt(4)
      val h = oh * fy; val w = ow * fx
      val a = randomImage(h, w)
      // the fractional-weight path must reduce to the exact box average
      // when windows align: compare against a hand box-average
      val got = Image.resizeArea(a, h, w, oh, ow)
      for (_ <- 1 to 5) {
        val y = rand.nextInt(oh); val x = rand.nextInt(ow)
        var acc = 0.0
        for (dy <- 0 until fy; dx <- 0 until fx) acc += a((y * fy + dy) * w + (x * fx + dx))
        assert(math.abs(got(y * ow + x) - acc / (fy * fx)) < 1e-3f)
      }
    }
  }

  test("identity resize is exact for area and bilinear, near-exact for cubic") {
    for (_ <- 1 to 50) {
      val h = 2 + rand.nextInt(30); val w = 2 + rand.nextInt(30)
      val a = randomImage(h, w)
      assert(Image.resizeArea(a, h, w, h, w).toSeq == a.toSeq)
      assert(Image.resizeBilinear(a, h, w, h, w).toSeq == a.toSeq)
      val c = Image.resizeBicubic(a, h, w, h, w)
      // at integral sample points the cubic kernel is exactly interpolating
      // (w(0)=1, w(±1)=w(±2)=0) up to float accumulation order
      a.zip(c).foreach { case (x, y) => assert(math.abs(x - y) < 1e-3f) }
    }
  }
}
