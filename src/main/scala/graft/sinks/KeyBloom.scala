package graft.sinks

import java.io.File

/** Per-shard key Bloom sidecar shared by the sharded stores
  * ([[LmdbStore]]: `keys.bloom` inside the env dir, where liblmdb never
  * looks; [[KvStore]]: `shard-NNNNN.bloom` beside the idx). Point lookups
  * consult it before touching a shard: a K-shard store probe costs K tiny
  * bitmap tests + ~1 real shard read instead of K — the difference
  * between O(1) and O(shards) reads per lookup once a store has 1000
  * shards. ~9.6 bits/key + 7 probes ⇒ ~1 % false-positive rate; false
  * negatives are impossible, and a missing sidecar (pre-Bloom store)
  * degrades to an unconditional shard read, never a wrong answer. */
private[graft] object KeyBloom {
  val FileName = "keys.bloom"
  val Magic = 0x47424c4d // "GBLM"
  val K = 7

  /** (h1, h2|1) packed in one long — the writer buffers 8 bytes/key (the
    * same order of memory as the page ledger), never the keys. */
  def hashPair(key: Array[Byte]): Long = {
    val h1 = scala.util.hashing.MurmurHash3.bytesHash(key, 0x9747b28c)
    val h2 = scala.util.hashing.MurmurHash3.bytesHash(key, 0x5bd1e995) | 1
    (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
  }

  final class Bloom(val bits: Array[Long], val m: Int) {
    def addPair(pair: Long): Unit = {
      val h1 = (pair >>> 32).toInt; val h2 = pair.toInt
      var i = 0
      while (i < K) {
        val bit = java.lang.Integer.remainderUnsigned(h1 + i * h2, m)
        bits(bit >>> 6) |= 1L << (bit & 63)
        i += 1
      }
    }
    def mightContain(key: Array[Byte]): Boolean = {
      val pair = hashPair(key)
      val h1 = (pair >>> 32).toInt; val h2 = pair.toInt
      var i = 0
      while (i < K) {
        val bit = java.lang.Integer.remainderUnsigned(h1 + i * h2, m)
        if ((bits(bit >>> 6) & (1L << (bit & 63))) == 0) return false
        i += 1
      }
      true
    }
  }

  def sized(nKeys: Long): Bloom = {
    // ~9.6 bits/key, 64-bit aligned, floor 1024 bits
    val m = math.max(1024L, nKeys * 96 / 10 + 63 & ~63L).min(Int.MaxValue).toInt
    new Bloom(new Array[Long]((m + 63) / 64), m)
  }

  def serialize(b: Bloom): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(12 + b.bits.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(Magic); buf.putInt(b.m); buf.putInt(b.bits.length)
    b.bits.foreach(buf.putLong)
    buf.array()
  }

  /** None on foreign/corrupt bytes — caller must then probe the shard. */
  def deserialize(bytes: Array[Byte]): Option[Bloom] = {
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    if (buf.remaining() < 12 || buf.getInt() != Magic) return None
    val m = buf.getInt(); val n = buf.getInt()
    if (buf.remaining() != n * 8) return None
    val bits = new Array[Long](n)
    var i = 0
    while (i < n) { bits(i) = buf.getLong(); i += 1 }
    Some(new Bloom(bits, m))
  }

  def write(envDir: File, b: Bloom): Unit =
    java.nio.file.Files.write(new File(envDir, FileName).toPath, serialize(b))

  // committed shards are immutable, so sidecars cache for the process
  // lifetime (a few hundred KB per thousand-shard store). The cache key
  // carries the sidecar's (mtime, length): a store deleted and rewritten
  // at the same path gets a fresh entry instead of a stale bitmap whose
  // ~99% miss rate would manufacture false negatives — the one failure
  // the Bloom contract forbids.
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Option[Bloom]]()

  /** None when the sidecar is absent/foreign — caller must then probe. */
  def read(envDir: File): Option[Bloom] = {
    val f = new File(envDir, FileName)
    if (!f.isFile) return None
    val key = s"${f.getAbsolutePath}|${f.lastModified}|${f.length}"
    cache.computeIfAbsent(key, _ => readUncached(envDir))
  }

  private def readUncached(envDir: File): Option[Bloom] = {
    val f = new File(envDir, FileName)
    if (!f.isFile) return None
    deserialize(java.nio.file.Files.readAllBytes(f.toPath))
  }
}
