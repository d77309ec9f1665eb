package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.KeyBloom

/** Property-style coverage (seeded random sweeps, same idiom as
  * TilingPropSpec — the scalatest/scalacheck bridge isn't in the offline
  * dependency set) for the shared store-shard Bloom sidecar. The one
  * inviolable contract is ZERO false negatives — a false negative would
  * make a sharded-store point lookup silently miss committed data — plus
  * serialize/deserialize identity so the sidecar read back from disk
  * answers exactly like the one built in the writer. */
class KeyBloomPropSpec extends AnyFunSuite {

  private val rand = new scala.util.Random(20260814L)

  private def randKey(): Array[Byte] =
    Array.fill(1 + rand.nextInt(64))(rand.nextInt(256).toByte)

  test("no false negatives over random binary key sets") {
    for (_ <- 1 to 30) {
      val keys = Vector.fill(50 + rand.nextInt(300))(randKey())
      val b = KeyBloom.sized(keys.length.toLong)
      keys.foreach(k => b.addPair(KeyBloom.hashPair(k)))
      keys.foreach(k => assert(b.mightContain(k), s"false negative on ${k.toSeq}"))
    }
  }

  test("serialize/deserialize answers identically on hits and misses") {
    for (_ <- 1 to 20) {
      val in = Vector.fill(50 + rand.nextInt(200))(randKey())
      val probes = Vector.fill(150)(randKey())
      val b = KeyBloom.sized(in.length.toLong)
      in.foreach(k => b.addPair(KeyBloom.hashPair(k)))
      val back = KeyBloom.deserialize(KeyBloom.serialize(b)).get
      assert(back.m == b.m)
      (in ++ probes).foreach { k =>
        assert(back.mightContain(k) == b.mightContain(k))
      }
    }
  }

  test("false positive rate stays near the 1% design point") {
    val n = 20000
    val b = KeyBloom.sized(n.toLong)
    (0 until n).foreach { i =>
      b.addPair(KeyBloom.hashPair(f"present$i%08d".getBytes("US-ASCII")))
    }
    val fp = (0 until 20000).count { i =>
      b.mightContain(f"absent$i%08d-${rand.nextInt()}".getBytes("US-ASCII"))
    }
    // design fpp ~1% at 9.6 bits/key, k=7; allow 3x slack for hash variance
    assert(fp <= 600, s"fpp ${fp / 200.0}% far above the 1% design point")
  }

  test("deserialize rejects truncated and foreign bytes") {
    val b = KeyBloom.sized(100)
    val good = KeyBloom.serialize(b)
    assert(KeyBloom.deserialize(good).isDefined)
    assert(KeyBloom.deserialize(good.take(8)).isEmpty)
    assert(KeyBloom.deserialize(good.drop(1)).isEmpty)
    assert(KeyBloom.deserialize("not a bloom".getBytes("US-ASCII")).isEmpty)
  }
}
