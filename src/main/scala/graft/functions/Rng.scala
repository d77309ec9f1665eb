package graft.functions

/** Common draw interface for the stochastic kernels: implemented by the
  * engine-native SplitMix64 [[Rng]] (default — cheapest per draw) and by
  * [[NumpyRng]] (bitwise `np.random.default_rng` parity, opt-in via
  * `Degrade.Params.numpyParity`). Kernels consume draws in the reference's
  * order, so swapping the source swaps the stream semantics wholesale. */
trait DrawSource {
  def uniform(lo: Double, hi: Double): Double
  def normal(mu: Double, sigma: Double): Double
  def normalArray(n: Int, mu: Double = 0.0, sigma: Double = 1.0): Array[Float]
}

/** Deterministic counter-based RNG (SplitMix64 core + Box–Muller gaussians).
  *
  * The reference draws from `np.random.default_rng(seed)` (PCG64). The
  * engine's DEFAULT stream is this SplitMix64 one — statistically, not
  * bitwise, equivalent, and cheaper per draw; exact NumPy draw streams are
  * available through [[NumpyRng]] (same [[DrawSource]] surface) when a user
  * needs outputs reproducible against the reference. What both sources
  * preserve is the reference's seeding discipline: per-slice seeds derived
  * from key hashes (K13, v2/nii_to_lmdb_paralel.py:134-135) so Spark task
  * retries are stable.
  */
final class Rng(seed: Long) extends DrawSource {
  private var state: Long = seed
  private var cachedGauss: Double = 0.0
  private var hasCached: Boolean = false

  /** SplitMix64 step. */
  def nextLong(): Long = {
    state += 0x9e3779b97f4a7c15L
    var z = state
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Uniform in [0, 1) with 53 bits. */
  def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16

  override def uniform(lo: Double, hi: Double): Double = lo + (hi - lo) * nextDouble()

  /** Standard normal via Box–Muller (cached pair). */
  def nextGaussian(): Double = {
    if (hasCached) { hasCached = false; cachedGauss }
    else {
      var u1 = nextDouble()
      while (u1 <= 0.0) u1 = nextDouble()
      val u2 = nextDouble()
      val r = math.sqrt(-2.0 * math.log(u1))
      val t = 2.0 * math.Pi * u2
      cachedGauss = r * math.sin(t)
      hasCached = true
      r * math.cos(t)
    }
  }

  override def normal(mu: Double, sigma: Double): Double = mu + sigma * nextGaussian()

  /** Fill a row-major array with N(mu, sigma) draws. */
  override def normalArray(n: Int, mu: Double, sigma: Double): Array[Float] = {
    val out = new Array[Float](n)
    var i = 0
    while (i < n) { out(i) = normal(mu, sigma).toFloat; i += 1 }
    out
  }

  /** Fisher–Yates shuffle of indices 0..n-1 (the W1/W3 seeded shuffle). */
  def shuffledIndices(n: Int): Array[Int] = {
    val idx = Array.tabulate(n)(identity)
    var i = n - 1
    while (i > 0) {
      val j = ((nextLong() >>> 1) % (i + 1)).toInt
      val t = idx(i); idx(i) = idx(j); idx(j) = t
      i -= 1
    }
    idx
  }
}

object Rng {
  /** K13 per-slice seed: xxhash-style mix of the slice identity with the run
    * seed, masked positive (reference: v2/nii_to_lmdb_paralel.py:134-135). */
  def sliceSeed(base: String, orient: String, idx: Int, runSeed: Long): Long = {
    val key = s"$base|$orient|$idx"
    var h = 1125899906842597L
    var i = 0
    while (i < key.length) { h = 31 * h + key.charAt(i); i += 1 }
    (h ^ runSeed) & 0x7fffffffL
  }
}
