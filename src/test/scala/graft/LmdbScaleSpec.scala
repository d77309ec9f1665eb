package graft

import java.io.File
import java.nio.charset.StandardCharsets.US_ASCII

import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.Lmdb

/** Reference-scale LMDB: the reference's production stores hold ~10^5
  * slice-pair records of ~16 KB npy payloads in one environment
  * (lmdb_util.py:9-133; BASELINE.md volumes → ~2k slices/volume across a
  * study). This spec bulk-writes 100k keyed 16 KB values — a ~1.7 GB
  * environment where EVERY value takes the overflow-chain path — and
  * proves the production properties at that magnitude:
  *   - the streaming writer's memory stays O(page ledger), never O(data)
  *     (100k values never co-resident: the 16 KB payload is generated
  *     per-put and written through before the next);
  *   - the meta stats reconcile against a full page walk (audit);
  *   - random point gets resolve through the real multi-level descent;
  *   - the independent Python parser (tools/check_lmdb.py, third
  *     implementation) accepts the file when present.
  */
class LmdbScaleSpec extends AnyFunSuite {

  private def value(i: Int): Array[Byte] = {
    // 16 KB deterministic payload, distinct per key (npy-sized analog)
    val v = new Array[Byte](16384)
    var j = 0
    while (j < v.length) { v(j) = ((i * 31 + j * 7) & 0xff).toByte; j += 1 }
    v
  }

  test("100k x 16 KB entries: ~1.7 GB env, bounded writer memory, full audit",
      SlowTag) {
    val n = 100000
    val dir = new File(graft.Scratch.fresh("lmdb_scale_"))
    dir.mkdirs()
    val w = new Lmdb.EnvWriter(dir)
    var i = 0
    while (i < n) {
      w.put(f"vol${i / 2120}%03d__axial__slice_${i % 2120}%04d".getBytes(US_ASCII), value(i))
      i += 1
    }
    // key scheme mirrors the reference's `<base>__<orient>__slice_NNNN`;
    // integer division keeps them ascending in memcmp order
    val stat = w.close()
    assert(stat.entries == n)
    assert(stat.overflowPages == n.toLong * 5, // OVPAGES(16384) = ceil(16400/4096) = 5
      s"every 16 KB value must take a 5-page overflow chain: $stat")
    val fileBytes = new File(dir, Lmdb.DataFileName).length()
    assert(fileBytes > 1.6e9.toLong, s"expected ~1.7 GB env, got $fileBytes")
    assert(stat.depth >= 2, s"multi-level tree expected: $stat")

    val env = new Lmdb.Env(dir)
    try {
      assert(env.audit().entries == n) // walks every one of ~420k pages
      val rnd = new scala.util.Random(41)
      (0 until 200).foreach { _ =>
        val i = rnd.nextInt(n)
        val k = f"vol${i / 2120}%03d__axial__slice_${i % 2120}%04d".getBytes(US_ASCII)
        val got = env.get(k)
        assert(got.exists(java.util.Arrays.equals(_, value(i))), s"get $i")
      }
      assert(env.get("vol999__missing".getBytes(US_ASCII)).isEmpty)
    } finally env.close()

    // third-implementation cross-check when the tools are available
    val py = new File("/root/repo/tools/check_lmdb.py")
    if (py.isFile) {
      import scala.sys.process._
      val out = new StringBuilder
      val rc = Seq("python3", py.getAbsolutePath, dir.getAbsolutePath)
        .!(ProcessLogger(s => out.append(s).append('\n'), s => out.append(s).append('\n')))
      assert(rc == 0, s"check_lmdb.py failed:\n$out")
      assert(out.toString.contains(s"entries=$n"), out.toString)
    }

    // keep /tmp bounded: this is the one spec writing GBs
    new File(dir, Lmdb.DataFileName).delete()
    dir.delete()
    ()
  }
}
