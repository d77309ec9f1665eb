package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Image

/** Property-style tests over seeded random parameter sweeps (SURVEY.md §5.3).
  * (Plain loops rather than scalatestplus — the scalatest/scalacheck bridge
  * isn't in the offline dependency set.) */
class TilingPropSpec extends AnyFunSuite {

  private val rand = new scala.util.Random(20260812L)

  test("tiling grid: windows in bounds, increasing, tail rule holds, coverage when step<=crop") {
    for (_ <- 1 to 300) {
      val h = 8 + rand.nextInt(193)
      val w = 8 + rand.nextInt(193)
      val crop = math.min(2 + rand.nextInt(63), math.min(h, w))
      val st = math.max(1, math.min(1 + rand.nextInt(64), crop))
      val thresh = rand.nextInt(17)
      val (hs, ws) = Image.makeCropSpaces(h, w, crop, st, thresh)
      assert(hs.forall(y => y >= 0 && y + crop <= h), s"h=$h crop=$crop step=$st")
      assert(ws.forall(x => x >= 0 && x + crop <= w))
      assert(hs.zip(hs.tail).forall { case (a, b) => a < b })
      assert(h - (hs.last + crop) <= thresh, s"tail rule h=$h crop=$crop st=$st th=$thresh got ${hs.last}")
      assert(w - (ws.last + crop) <= thresh)
      val covered = new Array[Boolean](h)
      hs.foreach(y => (y until y + crop).foreach(covered(_) = true))
      assert(covered.count(!_) <= thresh)
    }
  }

  test("patch extraction is always crop×crop with edge padding") {
    for (_ <- 1 to 100) {
      val h = 8 + rand.nextInt(57)
      val w = 8 + rand.nextInt(57)
      val crop = math.min(2 + rand.nextInt(31), math.min(h, w))
      val img = Array.tabulate(h * w)(_.toFloat)
      val (hs, ws) = Image.makeCropSpaces(h, w, crop, math.max(1, crop / 2), 0)
      for (y <- hs; x <- ws) {
        val p = Image.extractPatch(img, h, w, y, x, crop)
        assert(p.length == crop * crop)
        assert(p(0) == img(y * w + x))
      }
    }
  }

  test("key normalization strips __HR/__LRxN and is idempotent") {
    val norm: String => String = _.replaceAll("__(HR|LRx\\d+)_(s\\d+)$", "__$2")
    for (_ <- 1 to 100) {
      val base = "b" + rand.alphanumeric.take(1 + rand.nextInt(12)).mkString
      val s = 1 + rand.nextInt(999)
      val scale = 2 + rand.nextInt(3)
      val hr = s"${base}__axial__slice_007__HR_s$s"
      val lr = s"${base}__axial__slice_007__LRx${scale}_s$s"
      assert(norm(hr) == s"${base}__axial__slice_007__s$s")
      assert(norm(hr) == norm(lr), "HR and LR keys must join after normalization")
      assert(norm(norm(hr)) == norm(hr), "idempotent")
    }
  }

  test("seeded split: exact partition, ratios within 1 of floor(n*r), deterministic") {
    for (_ <- 1 to 50) {
      val n = 10 + rand.nextInt(1991)
      val idx = new graft.functions.Rng(12345).shuffledIndices(n)
      val idx2 = new graft.functions.Rng(12345).shuffledIndices(n)
      assert(idx.toSeq == idx2.toSeq, "deterministic shuffle")
      val nTr = (n * 0.95).toInt
      val nVa = (n * 0.03).toInt
      val train = idx.take(nTr).toSet
      val va = idx.slice(nTr, nTr + nVa).toSet
      val te = idx.drop(nTr + nVa).toSet
      assert(train.size + va.size + te.size == n)
      assert(train.intersect(va).isEmpty && va.intersect(te).isEmpty && train.intersect(te).isEmpty)
      assert(math.abs(train.size - n * 0.95) <= 1)
    }
  }
}
