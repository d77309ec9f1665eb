package graft.functions

import java.nio.{ByteBuffer, ByteOrder}
import java.util.Base64

/** Bitwise-parity reimplementation of the `np.random.default_rng` stack.
  *
  * The reference seeds every stochastic kernel from NumPy Generators
  * (v2/degradation_function_v2.py:367,430-446 `default_rng(seed)` /
  * `seed+1` / `seed+2`; v2/nii_to_lmdb.py:62,100 `rng.shuffle`;
  * v2/patch_utils.py:102-104). This module reproduces those draw streams
  * bit-for-bit on the JVM, closing the one remaining spec divergence the
  * engine carried since round 1 ("statistically, not bitwise, equivalent").
  *
  * Everything here derives from PUBLIC sources only:
  *  - SeedSequence: NumPy `numpy/random/bit_generator.pyx` (BSD-3), itself
  *    an adaptation of M.E. O'Neill's C++ seed_seq proposal.
  *  - PCG64: the published PCG family (O'Neill 2014, pcg-random.org) with
  *    NumPy's XSL-RR 128/64 output and seeding order
  *    (`numpy/random/src/pcg64/pcg64.{h,c}`).
  *  - standard_normal: the Marsaglia–Tsang ziggurat exactly as NumPy's
  *    `random_standard_normal` (numpy/random/src/distributions/
  *    distributions.c); the 256-entry ki/wi/fi tables carry NumPy's
  *    published `ziggurat_constants.h` values (BSD-3) — regenerating them
  *    from the textbook recursion lands within 1 ulp but NOT bit-identical,
  *    so the canonical constants are embedded verbatim (base64 of the
  *    little-endian words) and verified in NumpyRngSpec against
  *    numpy==1.26.4 streams (3M+ draws across seeds: every bit equal).
  *  - integers: Lemire's nearly-divisionless bounded sampling (Lemire,
  *    ACM TOMACS 2019) in NumPy's 32/64-bit arrangement.
  *  - shuffle: masked-rejection `random_interval` + Fisher–Yates, NumPy
  *    draw order (low-half-first buffered uint32 pulls).
  *  - NumpyLegacyRandomState: MT19937 with the legacy `RandomState.rand`
  *    53-bit assembly (estimate_snr.py:391 uses `RandomState(0).rand`).
  *
  * Caveat (documented, not hidden): the ziggurat wedge/tail accept tests
  * evaluate `exp`/`log1p`. JVM `Math` and the C libm NumPy links agree on
  * every draw the spec sweeps, and a ulp-level disagreement only flips a
  * decision when the two comparands land within 1 ulp of each other
  * (probability ~1e-16 per wedge trial); uniform/integer/shuffle streams
  * involve no libm at all and are exact by construction.
  */
object NumpySeedSequence {
  private[functions] final val InitA = 0x43b0d7e5
  private[functions] final val MultA = 0x931e8875
  private[functions] final val InitB = 0x8b51f9dd
  private[functions] final val MultB = 0x58f38ded
  private[functions] final val MixMultL = 0xca01f9dd
  private[functions] final val MixMultR = 0x4973f715
  private[functions] final val XShift = 16

  /** Non-negative integer -> little-endian 32-bit words (0 -> [0]). */
  private[functions] def toWords(n: BigInt): Array[Int] = {
    require(n >= 0, s"SeedSequence entropy must be non-negative, got $n")
    if (n == 0) Array(0)
    else {
      val out = Array.newBuilder[Int]
      var v = n
      while (v > 0) { out += (v & 0xffffffffL).toInt; v >>= 32 }
      out.result()
    }
  }
}

/** NumPy SeedSequence: pool-based entropy mixing. Matches
  * `np.random.SeedSequence(entropy, spawn_key=...)` bit-for-bit, including
  * the pad-entropy-to-pool-size rule that kicks in only when a spawn key
  * is present (bit_generator.pyx `get_assembled_entropy`). */
final class NumpySeedSequence(entropy: BigInt, spawnKey: Seq[BigInt] = Nil,
    poolSize: Int = 4) {
  import NumpySeedSequence._

  private val pool: Array[Int] = {
    var run = toWords(entropy)
    val sk = spawnKey.toArray.flatMap(toWords)
    if (sk.nonEmpty && run.length < poolSize)
      run = run ++ Array.fill(poolSize - run.length)(0)
    val asm = run ++ sk
    val mixer = new Array[Int](poolSize)
    var hashConst = InitA
    def hashmix(value: Int): Int = {
      var v = value ^ hashConst
      hashConst *= MultA
      v *= hashConst
      v ^ (v >>> XShift)
    }
    def mix(x: Int, y: Int): Int = {
      val r = x * MixMultL - y * MixMultR
      r ^ (r >>> XShift)
    }
    var i = 0
    while (i < mixer.length) {
      mixer(i) = hashmix(if (i < asm.length) asm(i) else 0)
      i += 1
    }
    var iSrc = 0
    while (iSrc < mixer.length) {
      var iDst = 0
      while (iDst < mixer.length) {
        if (iSrc != iDst) mixer(iDst) = mix(mixer(iDst), hashmix(mixer(iSrc)))
        iDst += 1
      }
      iSrc += 1
    }
    iSrc = mixer.length
    while (iSrc < asm.length) {
      var iDst = 0
      while (iDst < mixer.length) {
        mixer(iDst) = mix(mixer(iDst), hashmix(asm(iSrc)))
        iDst += 1
      }
      iSrc += 1
    }
    mixer
  }

  /** generate_state(n, np.uint64): 2n hashed uint32 words, lo | hi<<32. */
  def generateLongs(n: Int): Array[Long] = {
    val out = new Array[Long](n)
    var hashConst = InitB
    var srcIdx = 0
    var w = 0
    val words = new Array[Int](2 * n)
    while (w < 2 * n) {
      var v = pool(srcIdx % pool.length) ^ hashConst
      srcIdx += 1
      hashConst *= MultB
      v *= hashConst
      words(w) = v ^ (v >>> XShift)
      w += 1
    }
    var i = 0
    while (i < n) {
      out(i) = (words(2 * i) & 0xffffffffL) | (words(2 * i + 1).toLong << 32)
      i += 1
    }
    out
  }
}

/** PCG64 (XSL-RR 128/64) with NumPy's seeding order. 128-bit state held as
  * two unsigned longs; the LCG multiply uses `Math.multiplyHigh` plus the
  * signed->unsigned hi correction (JDK 17 has no unsignedMultiplyHigh). */
final class NumpyPcg64 private (
    private[functions] var stateHi: Long, private[functions] var stateLo: Long,
    private[functions] val incHi: Long, private[functions] val incLo: Long) {

  import NumpyPcg64._

  @inline private def step(): Unit = {
    // state = state * MULT + inc  (mod 2^128)
    val nl = stateLo * MultLo
    var nh = unsignedMulHi(stateLo, MultLo) + stateLo * MultHi + stateHi * MultLo
    val sl = nl + incLo
    if (java.lang.Long.compareUnsigned(sl, nl) < 0) nh += 1
    nh += incHi
    stateLo = sl
    stateHi = nh
  }

  /** One raw uint64 draw (step, then XSL-RR of the NEW state). */
  def nextUint64(): Long = {
    step()
    java.lang.Long.rotateRight(stateHi ^ stateLo, (stateHi >>> 58).toInt)
  }

  /** (stateHi, stateLo, incHi, incLo) — spec hook, mirrors
    * `bit_generator.state` in NumPy. */
  def stateParts: (Long, Long, Long, Long) = (stateHi, stateLo, incHi, incLo)
}

object NumpyPcg64 {
  /** PCG_DEFAULT_MULTIPLIER_128 (O'Neill): 0x2360ed051fc65da44385df649fccf645 */
  private final val MultHi = 0x2360ed051fc65da4L
  private final val MultLo = 0x4385df649fccf645L

  @inline private[functions] def unsignedMulHi(a: Long, b: Long): Long =
    Math.multiplyHigh(a, b) + ((a >> 63) & b) + ((b >> 63) & a)

  /** NumPy pcg64_set_seed: words[0:2] = initstate (hi, lo), words[2:4] =
    * initseq (hi, lo); inc = (initseq << 1) | 1; state = 0 -> step ->
    * += initstate -> step. */
  def seeded(seedSeq: NumpySeedSequence): NumpyPcg64 = {
    val w = seedSeq.generateLongs(4)
    val incLo = (w(3) << 1) | 1L
    val incHi = (w(2) << 1) | (w(3) >>> 63)
    val rng = new NumpyPcg64(0L, 0L, incHi, incLo)
    rng.step()
    val sl = rng.stateLo + w(1)
    if (java.lang.Long.compareUnsigned(sl, rng.stateLo) < 0) rng.stateHi += 1
    rng.stateLo = sl
    rng.stateHi += w(0)
    rng.step()
    rng
  }
}

/** The Generator layer over PCG64: doubles, ziggurat normals, Lemire
  * integers, masked-interval shuffle — NumPy draw order throughout. */
final class NumpyRng(private val bg: NumpyPcg64) extends DrawSource {
  import NumpyRng._

  private var hasUint32 = false
  private var bufferedUint32 = 0

  def nextUint64(): Long = {
    // NOTE: does NOT consume the buffered half — matches NumPy, where
    // next_uint64 and next_uint32 keep independent positions only through
    // the shared raw stream (pcg64_next32 buffers, pcg64_next64 does not).
    bg.nextUint64()
  }

  /** Buffered 32-bit pulls: low half first, then the stashed high half. */
  def nextUint32(): Int = {
    if (hasUint32) { hasUint32 = false; bufferedUint32 }
    else {
      val n = bg.nextUint64()
      hasUint32 = true
      bufferedUint32 = (n >>> 32).toInt
      n.toInt
    }
  }

  /** Uniform [0, 1): 53-bit mantissa, exactly NumPy's next_double. */
  def nextDouble(): Double = (nextUint64() >>> 11).toDouble * (1.0 / 9007199254740992.0)

  override def uniform(lo: Double, hi: Double): Double = lo + (hi - lo) * nextDouble()

  /** NumPy `random_standard_normal`: 256-layer ziggurat. */
  def standardNormal(): Double = {
    while (true) {
      var r = nextUint64()
      val idx = (r & 0xff).toInt
      r >>>= 8
      val sign = r & 1L
      val rabs = (r >>> 1) & 0x000fffffffffffffL
      var x = rabs.toDouble * Wi(idx)
      if (sign != 0L) x = -x
      if (rabs < Ki(idx)) return x
      if (idx == 0) {
        while (true) {
          val xx = -ZigInvR * Math.log1p(-nextDouble())
          val yy = -Math.log1p(-nextDouble())
          if (yy + yy > xx * xx)
            return if (((rabs >>> 8) & 1L) != 0L) -(ZigR + xx) else ZigR + xx
        }
      } else if ((Fi(idx - 1) - Fi(idx)) * nextDouble() + Fi(idx) < Math.exp(-0.5 * x * x)) {
        return x
      }
    }
    0.0 // unreachable
  }

  override def normal(mu: Double, sigma: Double): Double = mu + sigma * standardNormal()

  /** `rng.normal(mu, sigma, n).astype(np.float32)` — doubles drawn in C
    * order, cast at the end exactly like the reference kernels do. */
  override def normalArray(n: Int, mu: Double, sigma: Double): Array[Float] = {
    val out = new Array[Float](n)
    var i = 0
    while (i < n) { out(i) = (mu + sigma * standardNormal()).toFloat; i += 1 }
    out
  }

  def doubles(n: Int): Array[Double] = Array.fill(n)(nextDouble())

  /** NumPy `random_interval(max)`: smallest-mask rejection; 32-bit pulls
    * (buffered) when max fits in uint32. Used by shuffle. */
  def randomInterval(max: Long): Long = {
    if (max == 0L) return 0L
    var mask = max
    mask |= mask >>> 1; mask |= mask >>> 2; mask |= mask >>> 4
    mask |= mask >>> 8; mask |= mask >>> 16; mask |= mask >>> 32
    if (java.lang.Long.compareUnsigned(max, 0xffffffffL) <= 0) {
      while (true) {
        val v = (nextUint32().toLong & 0xffffffffL) & mask
        if (v <= max) return v
      }
    } else {
      while (true) {
        val v = nextUint64() & mask
        if (java.lang.Long.compareUnsigned(v, max) <= 0) return v
      }
    }
    0L // unreachable
  }

  /** `Generator.integers(low, high)` (half-open, int64 path): Lemire
    * nearly-divisionless rejection, NumPy's 32/64 split. */
  def integers(low: Long, high: Long): Long = {
    require(high > low, s"integers: empty range [$low, $high)")
    val rngIncl = high - low - 1 // fits: caller range is a signed-long span
    if (rngIncl == 0L) low
    else if (rngIncl == 0xffffffffL) low + (nextUint32().toLong & 0xffffffffL)
    else if (java.lang.Long.compareUnsigned(rngIncl, 0xffffffffL) < 0)
      low + lemire32(rngIncl.toInt)
    else if (rngIncl == -1L) low + nextUint64()
    else low + lemire64(rngIncl)
  }

  private def lemire32(rngIncl: Int): Long = {
    val rngExcl = (rngIncl.toLong & 0xffffffffL) + 1L
    var m = (nextUint32().toLong & 0xffffffffL) * rngExcl
    var leftover = m & 0xffffffffL
    if (leftover < rngExcl) {
      val threshold = (0x100000000L - rngExcl) % rngExcl
      while (leftover < threshold) {
        m = (nextUint32().toLong & 0xffffffffL) * rngExcl
        leftover = m & 0xffffffffL
      }
    }
    m >>> 32
  }

  private def lemire64(rngIncl: Long): Long = {
    val rngExcl = rngIncl + 1L // > 2^32, < 2^64 here
    // Track both halves of the 128-bit product, mirroring the C uint128.
    var hi = 0L
    var leftover = 0L
    def product(): Unit = {
      val draw = nextUint64()
      hi = NumpyPcg64.unsignedMulHi(draw, rngExcl)
      leftover = draw * rngExcl
    }
    product()
    if (java.lang.Long.compareUnsigned(leftover, rngExcl) < 0) {
      val threshold = java.lang.Long.remainderUnsigned(-rngExcl, rngExcl)
      while (java.lang.Long.compareUnsigned(leftover, threshold) < 0) product()
    }
    hi
  }

  /** Fisher–Yates with NumPy's `Generator.shuffle` draw order. */
  def shuffleInts(a: Array[Int]): Unit = {
    var i = a.length - 1
    while (i > 0) {
      val j = randomInterval(i.toLong).toInt
      val t = a(i); a(i) = a(j); a(j) = t
      i -= 1
    }
  }

  def shuffle[T](a: Array[T]): Unit = {
    var i = a.length - 1
    while (i > 0) {
      val j = randomInterval(i.toLong).toInt
      val t = a(i); a(i) = a(j); a(j) = t
      i -= 1
    }
  }

  /** `rng.permutation(n)`: shuffled arange. */
  def permutation(n: Int): Array[Int] = {
    val idx = Array.tabulate(n)(identity)
    shuffleInts(idx)
    idx
  }
}

/** Legacy `np.random.RandomState(seed)` (MT19937 + 53-bit rand assembly):
  * the reference's estimate_snr.py:391 self-test uses `RandomState(0).rand`.
  * Only the pieces that path needs (init_genrand seeding + random_sample). */
final class NumpyLegacyRandomState(seed: Long) {
  private val mt = new Array[Int](624)
  private var mti = 624
  locally {
    mt(0) = (seed & 0xffffffffL).toInt
    var i = 1
    while (i < 624) {
      mt(i) = 1812433253 * (mt(i - 1) ^ (mt(i - 1) >>> 30)) + i
      i += 1
    }
  }

  private def genrandInt32(): Int = {
    if (mti >= 624) {
      var i = 0
      while (i < 624) {
        val y = (mt(i) & 0x80000000) | (mt((i + 1) % 624) & 0x7fffffff)
        mt(i) = mt((i + 397) % 624) ^ (y >>> 1) ^ (if ((y & 1) != 0) 0x9908b0df else 0)
        i += 1
      }
      mti = 0
    }
    var y = mt(mti)
    mti += 1
    y ^= y >>> 11
    y ^= (y << 7) & 0x9d2c5680
    y ^= (y << 15) & 0xefc60000
    y ^ (y >>> 18)
  }

  /** `random_sample`: (a>>5)*2^26 + (b>>6), over 2^53. */
  def rand(): Double = {
    val a = (genrandInt32().toLong & 0xffffffffL) >>> 5
    val b = (genrandInt32().toLong & 0xffffffffL) >>> 6
    (a * 67108864.0 + b) / 9007199254740992.0
  }

  def randArray(n: Int): Array[Double] = Array.fill(n)(rand())
}

object NumpyRng {
  /** `np.random.default_rng(seed)`. */
  def defaultRng(seed: Long): NumpyRng =
    new NumpyRng(NumpyPcg64.seeded(new NumpySeedSequence(BigInt(seed))))

  def defaultRng(entropy: BigInt, spawnKey: Seq[BigInt]): NumpyRng =
    new NumpyRng(NumpyPcg64.seeded(new NumpySeedSequence(entropy, spawnKey)))

  private[functions] final val ZigR = 3.6541528853610088
  private[functions] final val ZigInvR = 0.27366123732975828

  private def longsFromB64(s: String): Array[Long] = {
    val bytes = Base64.getDecoder.decode(s)
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    Array.fill(bytes.length / 8)(buf.getLong())
  }

  private def doublesFromB64(s: String): Array[Double] =
    longsFromB64(s).map(java.lang.Double.longBitsToDouble)

  // NumPy ziggurat_constants.h values, embedded verbatim (see scaladoc).
  private[functions] val Ki: Array[Long] = longsFromB64(
"au8lgD3zDgAAAAAAAAAAAKjG+5i+CAwAQoG9+lSjDQDq7sF+9lEOAH730+lVsg4Aucp+gUvvDgCqRPoKRxkPABjL/2HtNw8A" +
    "XCVhlUZPDwCWoxvkpWEPAKSWU3V6cA8AmkQo7LJ8DwDTV2MM8YYPAN4lg1emjw8A2tBNxySXDwAJ9dsHqZ0PAHT6gfVgow8A" +
    "+Etb3m+oDwDcVNNg8awPAA+5GGf7sA8AxnRTjZ+0DwB3/mYj7LcPAA7loensug8A7QsEnau9DwBXbP9gMMAPAEiiNxCCwg8A" +
    "0VvieqbEDwAx7nqXosYPAKSWKKl6yA8Ahd5LXjLKDwAaIwLpzMsPAMQ5+BJNzQ8AmeyPTbXODwAwyR2/B9APAObE1k1G0Q8A" +
    "UPTiqHLSDwAeyfBPjtMPAHi0kJma1A8AUw+SuJjVDwDsmY7AidYPADLoyKlu1w8A6Ah7VEjYDwCMLK2LF9kPANKtpwfd2Q8A" +
    "jF4QcJnaDwAgLsBdTdsPAND8W1z52w8AfZq5653cDwCdchiBO90PAJAvNIjS3Q8AZJ82ZGPeDwBOUY1w7t4PAC60pgF03w8A" +
    "QO2ZZfTfDwDyJLzkb+APAFiiJcLm4A8ATLgoPFnhDwCZP7yMx+EPAKoc2+kx4g8AkRvahZjiDwCGQbWP++IPAEqNVTNb4w8A" +
    "KgDQmbfjDwB/rZ7pEOQPADR31EZn5A8AXAlM07rkDwAkldKuC+UPAHi8TvdZ5Q8AEhLkyKXlDwCJhhM+7+UPAHgQ2W825g8A" +
    "eNXGdXvmDwCqER5mvuYPAPL05VX/5g8AAqcAWT7nDwA5nj6Ce+cPAKJwcOO25w8AQ0J3jfDnDwCM8FOQKOgPADoXNfte6A8A" +
    "ZAiE3JPoDwC8zvBBx+gPAPZOfTj56A8AHZuHzCnpDwDqiNMJWekPAKKak/uG6Q8AZkhxrLPpDwDVtpQm3+kPAHzmq3MJ6g8A" +
    "pGbxnDLqDwAslTKrWuoPABp01aaB6g8A8Bzel6fqDwAg2fOFzOoPADzmZXjw6g8AE+wvdhPrDwBKKv6FNesPALRiMa5W6w8A" +
    "+oTi9HbrDwAUIOZflusPAHydz/S06w8A0En0uNLrDwA+Lm6x7+sPAOi9HuML7A8AFVqxUifsDwDTr50EQuwPAJbxKf1b7A8A" +
    "9O5sQHXsDwC0DFDSjewPABIfkbal7A8A/ifE8LzsDwAV+1SE0+wPALPIiHTp7A8At5F/xP7sDwAohTV3E+0PAANJhI8n7Q8A" +
    "TC8kEDvtDwBuWK37Te0PAN3DmFRg7Q8A6E9BHXLtDwCCqeRXg+0PAMgspAaU7Q8ABLeFK6TtDwC0anTIs+0PAFJmQd/C7Q8A" +
    "Um6kcdHtDwDTijyB3+0PAICZkA/t7Q8AFNQPHvrtDwDESxKuBu4PAAZa2cAS7g8A4AaQVx7uDwAkZUtzKe4PALzkChU07g8A" +
    "PJu4PT7uDwD0ginuR+4PAIawHSdR7g8AQX9A6VnuDwAutCg1Yu4PAPGXWAtq7g8Aegc+bHHuDwCCezJYeO4PALoGe89+7g8A" +
    "skpI0oTuDwBDY7Zgiu4PAFHIzHqP7g8A2iV+IJTuDwDqKahRmO4PAFxIEw6c7g8A9HNyVZ/uDwCuzGInou4PAKxCa4Ok7g8A" +
    "cS38aKbuDwD61m7Xp+4PAAr6BM6o7g8AOzPoS6nuDwAQZClQqe4PAF4HwNmo7g8AVHaJ56fuDwAkHUh4pu4PAIOeooqk7g8A" +
    "2uQiHaLuDwAkIDUun+4PAC6vJryb7g8A5PIkxZfuDwA6CjxHk+4PABZ1VUCO7g8Aepw2rojuDwD9PX+Ogu4PAIi4p9577g8A" +
    "/zf/m3TuDwBevanDbO4PAH4AnlJk7g8AiCijRVvuDwC2V06ZUe4PAM8GAEpH7g8AUCzhUzzuDwDYKuCyMO4PAAWCrWIk7g8A" +
    "Wjy4XhfuDwBHFCqiCe4PAMxJ4yf77Q8AbCF26uvtDwB+BCLk2+0PANM5zg7L7Q8A9CwEZLntDwDJOOncpu0PAI3pN3KT7Q8A" +
    "Nqg4HH/tDwArwLnSae0PAACuBo1T7Q8AIqTeQTztDwDYL2rnI+0PAETmL3MK7Q8ANP4H2u/sDwC4tw4Q1OwPALRulQi37A8A" +
    "wTAStpjsDwB4qQ0KeewPAP4xD/VX7A8AYsmGZjXsDwA1s7RMEewPANBvjpTr6w8AkragKcTrDwDcDO71musPAEKFyeFv6w8A" +
    "nh+t00LrDwBLLQuwE+sPAOkCGlni6g8AVyKZrq7qDwAm446NeOoPAOVz/c8/6g8A9tmNTATqDwA7Vi/WxekPAKRHqTuE6Q8A" +
    "KEcdRz/pDwDWxXa99ugPAOboxF2q6A8A6rF64FnoDwBAqZD2BOgPAMAzgkir5w8ApWofdUznDwACoioQ6OYPANirtqB95g8A" +
    "fjA4nwzmDwBC9zhzlOUPAIByl3AU5Q8AWPQ21IvkDwA3Hv2/+eMPAJyx7jVd4w8A/uQvErXiDwBXVZkDAOIPABSDeII84Q8A" +
    "sGfuxGjgDwCqcSuwgt8PAKr+fsWH3g8A/TvGCXXdDwATvynlRtwPAIICLvj42g8Adbqy4YXZDwAEz0jv5tcPAAtlva0T1g8A" +
    "EvDiSQHUDwCsx7SnodEPAJ4fdgTizg8AshFe2KjLDwAiLc1u0scPAO0iHi8rww8AOrjAgWW9DwA0VADEBrYPAHQoKlhArA8A" +
    "mEUBHpeeDwD8HaRI+okPACww8PfFZg8AShwzS1oaDwA=")

  private[functions] val Wi: Array[Double] = doublesFromB64(
"edkVeDtJzzzG9v3jC42LPLRbLDyvUJI8YTtEOLl8lTwMpy/o/AGYPLzQTC4MI5o892E4L00AnDx0cnRaL6ydPMPVTC1IMp88" +
    "rbuOJzJNoDxDXQI7BfWgPHc2QZemkqE89Rp6j6InojyA2GM4LrWiPPWRV8A/PKM8L7GiwZ69ozxVm/+N7zmkPKf+PTa7saQ8" +
    "dNMaYnUlpTyWzgengJWlPOp+2c8xAqY8PXyjYdJrpjxwBQCSotKmPKb4RtPaNqc8dyqzEK2YpzxD9UatRfinPHcKQ1PMVag8" +
    "mnZ7nmSxqDyYz06pLgupPOoeLIJHY6k8RsU4jsm5qTwsp6TczA6qPFnNd21nYqo8MBYQbq20qjycbBNtsQWrPCl6QoeEVas8" +
    "Op9Sjjakqzwygr8q1vGrPPNOWflwPqw8YTsypROKrDyLJnL+ydSsPEi3gA6fHq08EB/kKZ1nrTzDuCMAzq+tPFN28ak69608" +
    "/u3Stes9rjwAb3oz6YOuPM6C+b06ya48JmLwhOcNrzyI9thU9lGvPK7Xh55tla88rC76fVPYrzzsNELgVg2wPJqPOfVALrA8" +
    "/KUWnupOsDwQoHJbVm+wPAv0cZCGj7A8E2G8hH2vsDx/zEtmPc+wPGsIFkvI7rA87hWVMiAOsTy+DzEHRy2xPEGRjp8+TLE8" +
    "HiDEvwhrsTw02ngap4mxPIht7lEbqLE8yyr4+GbGsTwu1OCTi+SxPJ+gQJmKArI86cbEcmUgsjwfw+l9HT6yPPtrqQy0W7I8" +
    "f9MdZip5sjwb1xnHgZayPNouuGK7s7I8U7jhYtjQsjyOqcvo2e2yPNdIbg3BCrM8MLn04Y4nszyhXiZwRESzPNVSyrriYLM8" +
    "algFvmp9szxksrJv3ZmzPAM9uL87trM84B1WmIbSszyDWnLevu6zPHSe4HHlCrQ8XXSmLfsmtDykMDzoAEO0PF3HynP3XrQ8" +
    "NsNmnt96tDwvj0gyupa0PF1BAvaHsrQ83BGzrEnOtDwFpjgWAOq0PGJVXu+rBbU8WosK8k0htTxPZmrV5jy1PMiyG053WLU8" +
    "eF9VDgB0tTwUhQ7GgY+1PFkbJCP9qrU8PXN90XLGtTzTjC974+G1PDhen8hP/bU8wx+jYLgYtjyisKLoHTS2PAsmtwSBT7Y8" +
    "cpbJV+Jqtjw3MbGDQoa2PLGyUCmiobY8u0Oz6AG9tjxS0yhhYti2PFT4YTHE87Y862iL9ycPtzzGFGlRjiq3PNzucNz3Rbc8" +
    "H3PlNWVhtzxJ9O/61ny3PJO9ushNmLc8CRSLPMqztzz7ItvzTM+3POfec4zW6rc8H+qGpGcGuDx2hsjaACK4PBWfic6iPbg8" +
    "vfXRH05ZuDzFfnpvA3W4PC33R1/DkLg8Q8AFko6suDycDKGrZci4PCdqRFFJ5Lg8j7VzKToAuTxHgyjcOBy5PPwK7xJGOLk8" +
    "iqIDeWJUuTzu1XC7jnC5PDEqLonLjLk8v5k/kxmpuTws2dWMecW5PBF0byvs4bk8StL6JnL+uTySNvk5DBu6PFvIoiG7N7o8" +
    "iLsLnn9UujykqUpyWnG6PD0xoGRMjro8CPGfPlarujzO9VrNeMi6PDazi+G05bo8GqHDTwsDuzxbmJrwfCC7PAAM4KAKPrs8" +
    "Az3OQbVbuzwniT+5fXm7PDz35fFkl7s8biWF22u1uzyiwC5rk9O7PIOugZvc8bs8oBbsbEgQvDwtevDl1y68PBwNbhOMTbw8" +
    "BYfsCGZsvDwXpuvgZou8PKuiNr2Pqrw8kNY7x+HJvDw34GgwXum8PG6PizIGCb08IO83ENsovTxHxjMV3ki9PCPx55YQab08" +
    "pfvX9HOJvTxwbiCZCaq9PA5J/PjSyr08Ny5SldHrvTwc0kn7Bg2+PPZG6sR0Lr48iNHBmRxQvjwl/pcvAHK+PAq/KkshlL48" +
    "CG/3wIG2vjw6pxB2I9m+PKnsAWEI/L48IVPCijIfvzxtTbcPpEK/PGgBySBfZr88gpeJBGaKvzy/InEYu66/PIXnL9Jg0788" +
    "C/YYwVn4vzx1oNNH1A7APEfJjwKoIcA8qwKpg6k0wDzH9T5O2kfAPH6zrfY7W8A8aCanI9BuwDwXLmOPmILAPFSi6AiXlsA8" +
    "xMBxdc2qwDxI1O7RPb/APDA9qjTq08A8k2URz9TowDy2n6bv//3APEFwIARuE8E8NV27myEpwTxtCcRpHT/BPDsuYEhkVcE8" +
    "8+6dO/lrwTxhEtJ034LBPKzrTlYamsE8ji9/d62xwTyUpnGpnMnBPDmu5Pvr4cE8Adniwp/6wTyBzASdvBPCPO7Tb3pHLcI8" +
    "JJyspEVHwjzgWHbHvGHCPC5ZqPqyfMI8eA53zS6YwjxSCipTN7TCPJfbljHU0MI89XipsQ3uwjzurlbS7AvDPKOkaF57KsM8" +
    "oxKuBcRJwzxAqDN60mnDPApBVpKzisM8+oiucHWswzymBBezJ8/DPHX0YKrb8sM82uW5nKQXxDyUXlQVmD3EPBU6p0TOZMQ8" +
    "vEOcdWKNxDwnWmudc7fEPAKJzQ0l48Q8QazpU58QxTxCfjpSEUDFPBvkSqmxccU82Y1xi8ClxTz+0DokitzFPEwehs9pFsY8" +
    "6moAe85TxjzD5Z++QJXGPDLiCY1r28Y8NHpf8CgnxzxzBglWlXnHPIzO1vQt1Mc8NPIpBQM5yDwUfKq/D6vIPJZEb5TgLsk8" +
    "q1dAAe7LyTxad5R43I/KPLH9eDgfmMs8M60JgrQ7zTw=")

  private[functions] val Fi: Array[Double] = doublesFromB64(
"AAAAAAAA8D+H8HnJakTvPxWpbFtUt+4/d/An4BE/7j+V3gSnb9PtP/K8VwaScO0/3BmheEkU7T/rLaeoM73sP394qc5eauw/" +
    "6rru2Rwb7D+C3OFO687rP1L1jzplhes/EN00gjo+6z+i6Gw/KvnqPwQlevH+teo/4clQ1Yt06j8Pr/X9qjTqP9gfZe479uk/" +
    "gQYkjSK56T/BemFXRn3pP0d6G8KRQuk/T3ExvfEI6T+oCuZPVdDoPwLfukitmOg/rLw3/Oth6D9uz1YPBSzoP8viIEvt9uc/" +
    "WGicd5rC5z/VsKA8A4/nP1bYcAcfXOc/Em0/9OUp5z/ueuq6UPjmP4laY55Yx+Y/KjtRXveW5j8j45IqJ2fmPxgMVZjiN+Y/" +
    "ZSaAmCQJ5j9q/0pv6NrlP4lcyKwpreU/j41MJuR/5T9Gno3wE1PlP9VsZVq1JuU/Z7Yg6MT65D/ATklPP8/kP3hS3HIhpOQ/" +
    "ElDfX2h55D95NklKEU/kP+NfNYoZJeQ/gltYmX774z+jMa8QPtLjPw7NYqZVqeM/1QDaK8OA4z/pUPWLhFjjPzU6cMmXMOM/" +
    "7zhk/foI4z/uO+pVrOHiP0qV1xSquuI/Fc2TjvKT4j/tBAUphG3iP4TbkFpdR+I/8vcvqXwh4j8glpKp4PvhP2mZVP6H1uE/" +
    "EdE/V3Gx4T9QPJtwm4zhP9o5hhIFaOE/nKleEK1D4T84HzFIkh/hPxNZMqKz++A/oEJBEBDY4D+u2XCNprTgP4FdmR12keA/" +
    "NjzwzH1u4D8uP6avvEvgPyqCi+ExKeA/xMq4hdwG4D+hvXuMd8nfP8oAqaedhd8/83ovyylC3z+Vj35xGv/eP1QfvSBuvN4/" +
    "xcNOaiN63j+Fm1/qODjePwk6dket9t0/sVYLMn+13T8z3iZkrXTdP4AQAqE2NN0/bVuutBn03D9IqMBzVbTcP8fXALvodNw/" +
    "uCwdb9I13D8XamF8EffbP5FtcdakuNs/GxMHeIt62z/KMbNixDzbP1KFoZ5O/9o/nlpfOinC2j+A2KRKU4XaP03AIOrLSNo/" +
    "PoRGOZIM2j/fkx5epdDZP8bAGIQEldk/k5/g265Z2T8XyzObox7ZPxXxufzh49g/iJHeP2mp2D+2WqyoOG/YP9kNqn9PNdg/" +
    "Edm4Ea371z+wFPSvUMLXP+tSkq85idc/7bHHaWdQ1z9MYak72RfXP6pMEoaO39Y/Id6IrYan1j/iyyUawW/WPxXlezc9ONY/" +
    "yNKAdPoA1j9EwnZD+MnVP77u1hk2k9U/AAE9cLNc1T/tO1PCbybVP5Jtv45q8NQ/opwQV6O61D/Uaq2fGYXUP/4kw+/MT9Q/" +
    "GXo10bwa1D/b0o7Q6OXTP65D8XxQsdM/eRMIaPN80z+e0fkl0UjTPy/2Wk3pFNM/Zgchdzvh0j/dP5Y+x63SPx6xTUGMetI/" +
    "id4XH4pH0j+ezPd5wBTSPxaBGPYu4tE/UPDCOdWv0T/oVFTtsn3RP2fuNLvHS9E/IyTPTxMa0T/ECYdZlejQP9pCsohNt9A/" +
    "NkOQjzuG0D/Z6UIiX1XQP350x/a3JNA/xZPfiYvozz81MriMEIjPP9KY6Wz+J88/RJzJpFTIzj/dPCiyEmnOP4RxRRY4Cs4/" +
    "CpDHVcSrzT9PUbL4tk3NP8xvXooP8Mw/U99xmc2SzD9Hndi38DXMP6EYvnp42cs/qjGHemR9yz860cxStCHLPwcYV6Jnxso/" +
    "fiYZC35ryj89fi0y9xDKP1r+0r/Stsk/J3xqXxBdyT9p+nS/rwPJP1uBkpGwqsg/OJqBihJSyD91cR9i1fnHPyOjaNP4occ/" +
    "prV6nHxKxz8WR5Z+YPPGP1zyIT6knMY/nPGtokdGxj/5g/h2SvDFP2wd84ismsU/NWjIqW1FxT/BH+OtjfDEPy3O9WwMnMQ/" +
    "1XUDwulHxD+uMWmLJfTDP+7X6Kq/oMM/iKu0BbhNwz9lKnyEDvvCPxoHehPDqMI/t16DotVWwj80PBglRgXCP0J9dZIUtME/" +
    "Yy2o5UBjwT+5bqIdyxLBP7oJUj2zwsA/hb+4S/lywD8qfQZUnSPAPywia8s+qb8/HA5SKf8Lvz9LpZrye2++P4/odmG1070/" +
    "5ZG9uas4vT8KdDtJX568PxUQC2jQBLw/M+LyeP9ruz8z9srp7NO6P4Zi6jOZPLo/GVud3ASmuT+roKR1MBC5P1Iov50ce7g/" +
    "1u8+Acrmtz92EapaOVO3P0xKaXNrwLY/GE2FJGEutj+kZnRXG521P64r+gabDLU/EyIbQOF8tD+GmiYj7+2zP3A+2eTFX7M/" +
    "ETGbz2bSsj+RDd1E00WyP32Jl74MurE/nRfy0BQvsT8llhUs7aSwP5fkMJ6XG7A/NW5sKywmrz+BUbJH1RauP2Lxrf4uCa0/" +
    "LCooDz79qz9wXziQB/OqP2NVKfmQ6qk/q7VoKuDjqD8eJ693+96nP2TQmLPp26Y/1K3yPLLapT9dJxEOXdukP8vumM7y3aM/" +
    "l/Q96Hzioj+8ah+fBemhPxGAli6Y8aA/xKUY14H4nz91jILbGhKePxoJzYMZMJw/+OsiTp9Smj8KwQC20XmYP4K/C/TapZY/" +
    "ZLD78urWlD8TXquNOA2TPxIwYDQDSZE/Sd1yTyoVjz+sj08njaSLP3ikjQ0EQYg/4M8aQpbrhD+SL5UpkqWBPzdo7Phg4Xw/" +
    "XbgM2aiedj/9sbADH4pwP2ewwUOfX2U/D/e5tgWmVD8=")
}
