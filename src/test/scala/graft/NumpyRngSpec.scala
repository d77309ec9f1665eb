package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{NumpyLegacyRandomState, NumpyPcg64, NumpyRng, NumpySeedSequence}

/** Bitwise parity with numpy==1.26.4 `default_rng` streams.
  *
  * Every expected value below was produced by NumPy itself (PCG64 seeding,
  * raw uint64 stream, 53-bit doubles, ziggurat standard normals — including
  * a 300k-draw XOR accumulator per seed that sweeps the wedge and tail
  * rejection paths — Lemire integers, masked-interval shuffles, and the
  * legacy MT19937 `RandomState.rand`). A mismatch in ANY bit of any draw
  * fails the XOR check, so this is a full-stream equality proof at spec
  * scale, not a spot check.
  */
class NumpyRngSpec extends AnyFunSuite {

  case class Golden(seed: BigInt, stateHi: Long, stateLo: Long, incHi: Long,
      incLo: Long, raw: Seq[Long], dbl: Seq[Long], nrmFirst: Seq[Long],
      nrmLast: Seq[Long], nrmXor: Long)

  val goldens: Seq[Golden] = Seq(
    Golden(BigInt("0"),
      0x1aa1b5345996452dL, 0x09585eb7a69561e3L, 0x418ddadb3af71a82L, 0x588133bc447873a9L,
      Seq(0xa30febcfd9c2825fL, 0x4510bdf882d9d721L, 0x0a7d3da94ecde8b8L, 0x043b27b61342f01dL, 0xd0327a782cde513bL, 0xe9aa5979a6401c4eL),
      Seq(0x3fe461fd79fb3850L, 0x3fd1442f7e20b674L, 0x3fa4fa7b529d9bd0L, 0x3f90ec9ed84d0bc0L, 0x3fea064f4f059bcaL, 0x3fed354b2f34c803L),
      Seq(0x3fc017ed89db8441L, 0xbfc0e8cfe9bd45ccL, 0x3fe47e57a468b06dL, 0x3fbadabbec84d4f0L, 0xbfe1243418e643edL, 0x3fd7245f95ced1e6L),
      Seq(0xc0007b5ed880802eL, 0xbfbbea4bce75be29L, 0xbfe7d8add859ca35L),
      0x7ecd5d04f2307c40L),
    Golden(BigInt("1"),
      0x9c5b484bfedb756cL, 0x2a6e7d6f320fbc7eL, 0x922af2da2645f895L, 0xa19857b95740937bL,
      Seq(0x8306bdf37922e4ffL, 0xf35196bbc152a866L, 0x24e7a4f608ec18cdL, 0xf2dab0aed2ac6fd2L, 0x4fd42fa03fcd72a9L, 0x6c5f1f45de787048L),
      Seq(0x3fe060d7be6f245cL, 0x3fee6a32d7782a55L, 0x3fc273d27b04760cL, 0x3fee5b5615da558dL, 0x3fd3f50be80ff35cL, 0x3fdb17c7d1779e1cL),
      Seq(0x3fd61e0d28bbb3a1L, 0x3fea4ab22204681fL, 0x3fd525e18ce5fc0aL, 0xbff4d9bb65b49607L, 0x3fecf8acddd349f3L, 0x3fdc9166a7847147L),
      Seq(0x3fc7c1bf4ad34674L, 0x3fd383d07614727aL, 0x3fe16c3d56b67b77L),
      0x00c33e383ccea697L),
    Golden(BigInt("42"),
      0xcea44f6798798f2aL, 0xacbc7c9d68860ac8L, 0xfa505436c9a8416eL, 0x66caf2e28d25abffL,
      Seq(0xc621fbcd16d92688L, 0x705a5661a791ffc1L, 0xdbcd12c26eda1624L, 0xb286b60e1600888dL, 0x181c01b5339381ebL, 0xf9c262ed86c7538cL),
      Seq(0x3fe8c43f79a2db24L, 0x3fdc16959869e47eL, 0x3feb79a2584ddb42L, 0x3fe650d6c1c2c011L, 0x3fb81c01b5339380L, 0x3fef384c5db0d8eaL),
      Seq(0x3fd3807c1104fc6bL, 0xbff0a3c65fca9a7eL, 0x3fe803b239e77350L, 0x3fee191b2d157f36L, 0xbfff3770ac89d08fL, 0xbff4d5ba2db7ebc8L),
      Seq(0xbfdca608b73bf126L, 0x3fcf28b1580f960eL, 0x3fdd1c17e4580aafL),
      0x81920d1f5a0b5d96L),
    Golden(BigInt("12345"),
      0x1905e0335aae9634L, 0x9199b0d09775add5L, 0xc9c7353e6e2b1f28L, 0x7d761f2d4027fae7L,
      Seq(0x3a32b18db2ffc19dL, 0x51171315c9e4c4deL, 0xcc2024823444efd9L, 0xad1f06aea486e910L, 0x641fc168fd0b7b0dL, 0x55334b27d6e48f43L),
      Seq(0x3fcd1958c6d97fe0L, 0x3fd445c4c5727930L, 0x3fe984049046889dL, 0x3fe5a3e0d5d490ddL, 0x3fd907f05a3f42deL, 0x3fd54cd2c9f5b922L),
      Seq(0xbff6c7fcc2ecc744L, 0x3ff4383b54eb0649L, 0xbfebdc76014d359eL, 0xbfd0964b5602ac3cL, 0xbfb349b2ef952a32L, 0xbfe7b553bada1ce9L),
      Seq(0xbfe1feb0b7168234L, 0xbfe2668afd4292acL, 0x3fee7e157ee2d55bL),
      0x806f094290a51677L),
    Golden(BigInt("987654321"),
      0x8f074ff6675ebf8aL, 0xc3b2f3f6dbe08e6dL, 0x4484dc3260af29a5L, 0xc75183525e39c617L,
      Seq(0x48db813fd011de6aL, 0x2bff7881c6ff06e5L, 0x32e9c50aebda7226L, 0x5c6187f940bd0e76L, 0x25b551dbd5087dedL, 0x4974e4a1f752fba0L),
      Seq(0x3fd236e04ff40476L, 0x3fc5ffbc40e37f80L, 0x3fc974e28575ed38L, 0x3fd71861fe502f42L, 0x3fc2daa8edea843cL, 0x3fd25d39287dd4beL),
      Seq(0x3fd8955754e145adL, 0x3fedb56c0c58c12aL, 0x3fe0b1741ce4fc67L, 0x3ff4d4d254d87d03L, 0xbfde0fa668c37d44L, 0xbfe0a83fc769e299L),
      Seq(0x3ff5a31225449a41L, 0x3fd707a36565b21aL, 0xc001a4582c62b74cL),
      0x8169900c5023c41dL),
    Golden(BigInt("9223372036854775808"),
      0x19f38fac928ef115L, 0xada495ade18f7415L, 0x71efe86c260ef309L, 0x545d80ba006e813bL,
      Seq(0xcfb443e389167cfdL, 0x98b11eb7647f71b8L, 0xde463a1436212dfdL, 0x6cd50b6497ce000bL, 0x3fdf17f01c7aa225L, 0x3a6ff4ba88b7980eL),
      Seq(0x3fe9f6887c7122cfL, 0x3fe31623d6ec8feeL, 0x3febc8c74286c425L, 0x3fdb3542d925f380L, 0x3fcfef8bf80e3d50L, 0x3fcd37fa5d445bccL),
      Seq(0x3ffa1221d57f8c23L, 0xbff81f01a8e17daaL, 0xc009212998d9674fL, 0x3fcc2ff37cf8a0e2L, 0x3febd519ad640061L, 0xbff430c08353cbeaL),
      Seq(0x3fc6c84aaba7761fL, 0x3fef2a7504a01899L, 0xbfc189c48a986773L),
      0x0117e517bab278f7L))

  test("PCG64 seeding matches bit_generator.state for every seed") {
    for (g <- goldens) {
      val bg = NumpyPcg64.seeded(new NumpySeedSequence(g.seed))
      assert(bg.stateParts === ((g.stateHi, g.stateLo, g.incHi, g.incLo)),
        s"seed ${g.seed}")
    }
  }

  test("raw uint64 stream matches random_raw") {
    for (g <- goldens) {
      val bg = NumpyPcg64.seeded(new NumpySeedSequence(g.seed))
      assert(g.raw.map(_ => bg.nextUint64()) === g.raw, s"seed ${g.seed}")
    }
  }

  test("doubles match Generator.random bit-for-bit") {
    for (g <- goldens) {
      val r = NumpyRng.defaultRng(g.seed, Nil)
      val got = Seq.fill(g.dbl.length)(java.lang.Double.doubleToRawLongBits(r.nextDouble()))
      assert(got === g.dbl, s"seed ${g.seed}")
    }
  }

  test("standard normals match over 300k draws per seed (XOR of all bits)") {
    for (g <- goldens) {
      val r = NumpyRng.defaultRng(g.seed, Nil)
      val n = 300000
      var xor = 0L
      val first = new Array[Long](g.nrmFirst.length)
      val last = new Array[Long](g.nrmLast.length)
      var i = 0
      while (i < n) {
        val bits = java.lang.Double.doubleToRawLongBits(r.standardNormal())
        if (i < first.length) first(i) = bits
        if (i >= n - last.length) last(i - (n - last.length)) = bits
        xor ^= bits
        i += 1
      }
      assert(first.toSeq === g.nrmFirst, s"seed ${g.seed} first draws")
      assert(last.toSeq === g.nrmLast, s"seed ${g.seed} last draws")
      assert(xor === g.nrmXor, s"seed ${g.seed} 300k-draw XOR")
    }
  }

  test("uniform(low, high) matches") {
    val r = NumpyRng.defaultRng(7L)
    val got = Seq.fill(6)(java.lang.Double.doubleToRawLongBits(r.uniform(-0.5, 0.5)))
    assert(got === Seq(0x3fc00320d4f8f2a4L, 0x3fd96bf36f2bc99aL, 0x3fd1a4d597e502beL, 0xbfd19634950aa578L, 0xbfc99426b378e458L, 0x3fd7e84cb5d23e88L))
  }

  test("normal(0, 0.02, n).astype(float32) matches the reference cast chain") {
    val r = NumpyRng.defaultRng(9L)
    val got = r.normalArray(5, 0.0, 0.02).toSeq.map(java.lang.Float.floatToRawIntBits)
    assert(got === Seq(0xbc83896c, 0x3b9f2774, 0xbd07b015, 0x3c56fe11, 0x3cbb57e5))
  }

  test("motion-stage draw sequence (dy, dx uniforms then row phases)") {
    // Exactly the reference order: v2/degradation_function_v2.py:123-129.
    val r = NumpyRng.defaultRng(1234L)
    val dy = java.lang.Double.doubleToRawLongBits(r.uniform(-0.5, 0.5))
    val dx = java.lang.Double.doubleToRawLongBits(r.uniform(-0.5, 0.5))
    val ph = r.normalArray(4, 0.0, 0.02).toSeq.map(java.lang.Float.floatToRawIntBits)
    assert(dy === 0x3fde823fbcfeadaeL)
    assert(dx === 0xbfbeab7e08031658L)
    assert(ph === Seq(0x3c72c677, 0x3b480a81, 0x3c8d840b, 0x3d6ea41e))
  }

  test("Generator.shuffle matches (masked-interval rejection, buffered u32)") {
    val r1 = NumpyRng.defaultRng(12345L)
    val a = Array.tabulate(12)(identity)
    r1.shuffleInts(a)
    assert(a.toSeq === Seq(7, 10, 1, 4, 3, 8, 11, 6, 0, 2, 9, 5))
    val r2 = NumpyRng.defaultRng(12345L)
    val b = Array.tabulate(1000)(identity)
    r2.shuffleInts(b)
    assert(b.take(20).toSeq === Seq(279, 568, 569, 583, 55, 795, 669, 361, 136, 475, 751, 473, 726, 763, 514, 300, 393, 316, 973, 306))
    val cks = b.zipWithIndex.map { case (v, i) => i.toLong * v }.sum % (1L << 31)
    assert(cks === 251934116L)
  }

  test("Generator.integers matches (Lemire 32- and 64-bit paths)") {
    val r1 = NumpyRng.defaultRng(5L)
    assert(Seq.fill(8)(r1.integers(-20L, 1000L)) === Seq(664L, 801L, 3L, 804L, 458L, 505L, 622L, 271L))
    val r2 = NumpyRng.defaultRng(5L)
    assert(Seq.fill(6)(r2.integers(0L, 1L << 45)) === Seq(28323522401655L, 28426889371833L, 18131406286592L, 10055742100522L, 1897517899608L, 13488593348836L))
  }

  test("legacy RandomState(0).rand matches (MT19937)") {
    val rs = new NumpyLegacyRandomState(0L)
    val got = Seq.fill(6)(java.lang.Double.doubleToRawLongBits(rs.rand()))
    assert(got === Seq(0x3fe18fe1565f12a8L, 0x3fe6e2d4cf608733L, 0x3fe349d66b6e894bL, 0x3fe16faedb6395f5L, 0x3fdb1d2904fd0ef6L, 0x3fe4ab2a21899b5bL))
  }

  test("SeedSequence spawn keys and >64-bit entropy") {
    val s1 = new NumpySeedSequence(BigInt(42), Seq(BigInt(1)))
    assert(s1.generateLongs(4).toSeq === Seq(0x01dcb763f3e63cbaL, 0x6aee7dd615de6f6eL, 0x3e2df752dbd3217fL, 0x29d15a391cf7e717L))
    val s2 = new NumpySeedSequence(BigInt(2).pow(80) + 12345)
    assert(s2.generateLongs(4).toSeq === Seq(0x6b5aa60a8962b4d1L, 0x95a01231b901c040L, 0x8493b1b3a03348a0L, 0xdc634cb2947d74dcL))
  }

  test("permutation is shuffle of arange") {
    val r1 = NumpyRng.defaultRng(12345L)
    assert(r1.permutation(12).toSeq === Seq(7, 10, 1, 4, 3, 8, 11, 6, 0, 2, 9, 5))
  }
}
