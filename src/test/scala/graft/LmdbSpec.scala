package graft

import java.io.File
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.US_ASCII

import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.Lmdb

/** Byte-level conformance of the LMDB writer/reader pair against the
  * PUBLIC liblmdb format (lmdb.h / mdb.c layout; reference usage:
  * lmdb_util.py:9-133, v2/lmdb_npy.py:10-57). The reader never trusts the
  * writer: it parses only documented offsets, and `audit()` re-walks every
  * page. The layout test pins the absolute byte offsets a stock liblmdb
  * mmap would dereference, so a drift in either half fails loudly.
  */
class LmdbSpec extends AnyFunSuite {

  private def freshDir(): File = {
    val d = new File(graft.Scratch.fresh("lmdb_"))
    d.mkdirs(); d
  }

  private def kv(k: String, v: String): (Array[Byte], Array[Byte]) =
    (k.getBytes(US_ASCII), v.getBytes(US_ASCII))

  private def rawPage(dir: File, pgno: Long): ByteBuffer = {
    val raf = new java.io.RandomAccessFile(new File(dir, Lmdb.DataFileName), "r")
    try {
      val buf = new Array[Byte](Lmdb.PageSize)
      raf.seek(pgno * Lmdb.PageSize); raf.readFully(buf)
      ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
    } finally raf.close()
  }

  test("meta page byte layout matches liblmdb struct offsets") {
    val dir = freshDir()
    val stat = Lmdb.write(dir, Iterator(kv("alpha", "1"), kv("beta", "22"), kv("gamma", "333")))
    assert(stat.entries == 3 && stat.depth == 1 && stat.leafPages == 1)

    // page 1 carries txnid 1 (mdb_env_write_meta targets page txnid & 1)
    val m = rawPage(dir, 1L)
    assert(m.getLong(0) == 1L, "mp_pgno")
    assert((m.getShort(10) & Lmdb.PMeta) != 0, "mp_flags P_META")
    val b = Lmdb.PageHdrSz
    assert(m.getInt(b) == Lmdb.Magic, "mm_magic at page offset 16")
    assert(m.getInt(b + 4) == Lmdb.DataVersion, "mm_version at 20")
    assert(m.getLong(b + 8) == 0L, "mm_address (no MDB_FIXEDMAP)")
    assert(m.getLong(b + 16) >= (1L << 20), "mm_mapsize >= liblmdb default 1 MiB")
    assert(m.getInt(b + 24) == 4096, "free-DB md_pad aliases env page size")
    assert(m.getShort(b + 28) == 0x08, "free-DB md_flags = MDB_INTEGERKEY")
    assert(m.getLong(b + 64) == -1L, "free-DB md_root = P_INVALID")
    assert(m.getShort(b + 78) == 1, "main md_depth")
    assert(m.getLong(b + 88) == 1L, "main md_leaf_pages")
    assert(m.getLong(b + 104) == 3L, "main md_entries")
    assert(m.getLong(b + 112) == 2L, "main md_root = first data page")
    assert(m.getLong(b + 120) == 2L, "mm_last_pg")
    assert(m.getLong(b + 128) == 1L, "mm_txnid")

    // page 0 keeps the env-init meta: txnid 0, empty main DB
    val m0 = rawPage(dir, 0L)
    assert(m0.getInt(b) == Lmdb.Magic && m0.getLong(b + 128) == 0L)
    assert(m0.getLong(b + 112) == -1L, "init meta main root = P_INVALID")

    // leaf page 2: header + sorted nodes, node bodies packed from the top
    val leaf = rawPage(dir, 2L)
    assert(leaf.getLong(0) == 2L && (leaf.getShort(10) & Lmdb.PLeaf) != 0)
    val lower = leaf.getShort(12) & 0xffff
    val upper = leaf.getShort(14) & 0xffff
    assert(lower == Lmdb.PageHdrSz + 2 * 3 && upper <= Lmdb.PageSize)
    val off0 = leaf.getShort(Lmdb.PageHdrSz) & 0xffff
    assert((leaf.getShort(off0 + 6) & 0xffff) == "alpha".length, "node0 mn_ksize")
    val k0 = new Array[Byte](5); System.arraycopy(leaf.array(), off0 + 8, k0, 0, 5)
    assert(new String(k0, US_ASCII) == "alpha", "node0 key bytes at header+8")
    assert((leaf.getShort(off0) & 0xffff) == 1, "node0 mn_lo = value size 1")
  }

  test("roundtrip, point gets and memcmp-ordered iteration") {
    val dir = freshDir()
    val rnd = new scala.util.Random(7)
    val entries = (0 until 500).map { i =>
      val k = f"k${rnd.nextInt(1000000)}%07d_$i"
      val v = Array.fill(rnd.nextInt(120) + 1)(rnd.nextInt(256).toByte)
      (k.getBytes(US_ASCII), v)
    }
    Lmdb.write(dir, entries.iterator)
    val env = new Lmdb.Env(dir)
    try {
      assert(env.stat.entries == 500)
      val sorted = entries.sortWith((a, b) => Lmdb.cmpKeys(a._1, b._1) < 0)
      val walked = env.iterator.toVector
      assert(walked.map(e => new String(e._1, US_ASCII)) ==
        sorted.map(e => new String(e._1, US_ASCII)), "iteration order")
      walked.zip(sorted).foreach { case ((_, v), (_, ev)) =>
        assert(java.util.Arrays.equals(v, ev))
      }
      sorted.take(50).foreach { case (k, v) =>
        assert(env.get(k).exists(java.util.Arrays.equals(_, v)))
      }
      assert(env.get("zzz_missing".getBytes(US_ASCII)).isEmpty)
      assert(env.get("a".getBytes(US_ASCII)).isEmpty)
      env.audit()
    } finally env.close()
  }

  test("nodemax boundary: 2040 stays inline, 2041 goes to overflow") {
    // me_nodemax = (4096-16)/2 = 2040; leaf node = 8 + klen + dlen
    assert(Lmdb.NodeMax == 2040)
    val dir = freshDir()
    val kIn = "inline-".padTo(12, 'x') // klen 12 → max inline dlen = 2020
    val kBig = "ovflow-".padTo(12, 'y')
    val inline = Array.fill(2020)(3.toByte)
    val big = Array.fill(2021)(4.toByte)
    val stat = Lmdb.write(dir,
      Iterator((kIn.getBytes(US_ASCII), inline), (kBig.getBytes(US_ASCII), big)))
    assert(stat.overflowPages == 1, "2021-byte value -> one overflow page")
    val env = new Lmdb.Env(dir)
    try {
      assert(env.get(kIn.getBytes(US_ASCII)).exists(java.util.Arrays.equals(_, inline)))
      assert(env.get(kBig.getBytes(US_ASCII)).exists(java.util.Arrays.equals(_, big)))
      env.audit()
    } finally env.close()
  }

  test("multi-page overflow chains roundtrip byte-exact") {
    val dir = freshDir()
    val rnd = new scala.util.Random(11)
    val sizes = Seq(2100, 4080, 4081, 40000, 100000)
    val entries = sizes.zipWithIndex.map { case (n, i) =>
      val v = Array.fill(n)(rnd.nextInt(256).toByte)
      (f"big$i%03d".getBytes(US_ASCII), v)
    }
    val stat = Lmdb.write(dir, entries.iterator)
    // OVPAGES = ceil((16+size)/4096)
    val expect = sizes.map(n => (16 + n + 4095) / 4096).sum
    assert(stat.overflowPages == expect, s"overflow pages: ${stat.overflowPages} vs $expect")
    val env = new Lmdb.Env(dir)
    try {
      entries.foreach { case (k, v) =>
        assert(env.get(k).exists(java.util.Arrays.equals(_, v)))
      }
      env.audit()
    } finally env.close()
  }

  test("20k entries build a multi-level tree; every page audits clean") {
    val dir = freshDir()
    val entries = (0 until 20000).map { i =>
      (f"key$i%08d".getBytes(US_ASCII), f"value-for-$i%08d".getBytes(US_ASCII))
    }
    val stat = Lmdb.write(dir, entries.iterator)
    assert(stat.depth >= 2 && stat.branchPages >= 1, s"expected a branch level: $stat")
    val env = new Lmdb.Env(dir)
    try {
      assert(env.audit().entries == 20000)
      assert(env.iterator.size == 20000)
      val rnd = new scala.util.Random(3)
      (0 until 300).foreach { _ =>
        val i = rnd.nextInt(20000)
        assert(env.get(f"key$i%08d".getBytes(US_ASCII))
          .exists(v => new String(v, US_ASCII) == f"value-for-$i%08d"))
      }
      assert(env.get("key99999999".getBytes(US_ASCII)).isEmpty)
    } finally env.close()
  }

  test("depth >= 3: branch-of-branches descent resolves every key") {
    // 60-byte keys -> ~60 leaf entries/page, ~59 branch children/page:
    // 40k entries => ~670 leaves => ~12 L1 branches => root, depth 3+
    val dir = freshDir()
    val pad = "p" * 40
    val entries = (0 until 40000).map { i =>
      (f"$pad-key$i%08d".getBytes(US_ASCII), f"v$i%08d".getBytes(US_ASCII))
    }
    val stat = Lmdb.write(dir, entries.iterator)
    assert(stat.depth >= 3, s"expected depth >= 3, got $stat")
    val env = new Lmdb.Env(dir)
    try {
      env.audit()
      assert(env.iterator.size == 40000)
      val rnd = new scala.util.Random(9)
      (0 until 500).foreach { _ =>
        val i = rnd.nextInt(40000)
        assert(env.get(f"$pad-key$i%08d".getBytes(US_ASCII))
          .exists(v => new String(v, US_ASCII) == f"v$i%08d"))
      }
      // probes that fall between existing keys at every branch level
      (0 until 200).foreach { _ =>
        val i = rnd.nextInt(40000)
        assert(env.get(f"$pad-key$i%08dx".getBytes(US_ASCII)).isEmpty)
      }
    } finally env.close()
  }

  test("fuzz: random binary keys and mixed inline/overflow sizes roundtrip") {
    val rnd = new scala.util.Random(20260813)
    (0 until 5).foreach { round =>
      val dir = freshDir()
      val n = 50 + rnd.nextInt(400)
      // random binary keys (incl. 0x00/0xff bytes), random sizes straddling
      // the 2040 nodemax on both sides
      val keys = scala.collection.mutable.LinkedHashSet[Vector[Byte]]()
      while (keys.size < n) {
        val len = 1 + rnd.nextInt(60)
        keys += Vector.fill(len)(rnd.nextInt(256).toByte)
      }
      val entries = keys.toVector.map { k =>
        val sz = rnd.nextInt(3) match {
          case 0 => rnd.nextInt(100) // small inline
          case 1 => 1900 + rnd.nextInt(300) // straddles nodemax
          case _ => 4000 + rnd.nextInt(9000) // multi-page overflow
        }
        (k.toArray, Array.fill(sz)(rnd.nextInt(256).toByte))
      }
      Lmdb.write(dir, entries.iterator)
      val env = new Lmdb.Env(dir)
      try {
        env.audit()
        val sorted = entries.sortWith((a, b) => Lmdb.cmpKeys(a._1, b._1) < 0)
        val walked = env.iterator.toVector
        assert(walked.length == sorted.length, s"round $round size")
        walked.zip(sorted).foreach { case ((k, v), (ek, ev)) =>
          assert(java.util.Arrays.equals(k, ek), s"round $round key order")
          assert(java.util.Arrays.equals(v, ev), s"round $round value")
        }
        entries.take(30).foreach { case (k, v) =>
          assert(env.get(k).exists(java.util.Arrays.equals(_, v)))
        }
      } finally env.close()
    }
  }

  test("empty environment: P_INVALID root, zero stats, empty iteration") {
    val dir = freshDir()
    val stat = Lmdb.write(dir, Iterator.empty)
    assert(stat.root == Lmdb.PInvalid && stat.entries == 0 && stat.depth == 0)
    val env = new Lmdb.Env(dir)
    try {
      assert(env.get("any".getBytes(US_ASCII)).isEmpty)
      assert(env.iterator.isEmpty)
      env.audit()
    } finally env.close()
  }

  test("writer rejects out-of-order, duplicate, oversize and empty keys") {
    val dir = freshDir()
    val w = new Lmdb.EnvWriter(dir)
    w.put("b".getBytes(US_ASCII), Array[Byte](1))
    intercept[IllegalArgumentException](w.put("a".getBytes(US_ASCII), Array[Byte](1)))
    intercept[IllegalArgumentException](w.put("b".getBytes(US_ASCII), Array[Byte](1)))
    intercept[IllegalArgumentException](w.put(Array.fill(512)('k'.toByte), Array[Byte](1)))
    intercept[IllegalArgumentException](w.put(Array.emptyByteArray, Array[Byte](1)))
    w.close()
  }

  test("stock-shaped envs (scattered pages, freelist, stale metas, 4K/8K pages) read clean") {
    // liblmdb itself is not installable here (zero egress); the fixture
    // writer (tools/make_lmdb_fixture.py) is an INDEPENDENT generator that
    // emulates the states a stock writer leaves after three COW write
    // txns: scattered live pages interleaved with stale tree bytes, a
    // populated FREE DB, txnid 3 with a stale-but-valid second meta, real
    // keys in branch node 0, and the OS-page-size variants our bulk
    // writer never emits. The reader must get/iterate/audit all of it.
    import scala.sys.process._
    for ((psize, seed) <- Seq((4096, 1234), (8192, 99), (16384, 7))) {
      val dir = freshDir()
      val out = new StringBuilder
      val rc = Seq("python3", "/root/repo/tools/make_lmdb_fixture.py",
        dir.getAbsolutePath, psize.toString, seed.toString)
        .!(ProcessLogger(s => out.append(s).append('\n'), s => out.append(s).append('\n')))
      assert(rc == 0, s"fixture generation failed:\n$out")
      // parse the manifest without a JSON lib: {"key": "md5hex", ...}
      val manifest = new String(java.nio.file.Files.readAllBytes(
        new File(dir, "fixture.json").toPath), US_ASCII)
      val entryRe = """"([^"]+)":\s*"([a-f0-9]{32})"""".r
      val expected = entryRe.findAllMatchIn(
        manifest.substring(manifest.indexOf("\"entries\""))).map(m =>
        m.group(1) -> m.group(2)).toMap
      val deleted = {
        val tail = manifest.substring(manifest.indexOf("\"deleted\""))
        """"([^"]+)"""".r.findAllMatchIn(tail.stripPrefix("\"deleted\""))
          .map(_.group(1)).filterNot(_ == "deleted").toSeq
      }
      assert(expected.size == 140, s"manifest parse drift: ${expected.size}")

      val env = new Lmdb.Env(dir)
      try {
        assert(env.psize == psize)
        assert(env.stat.entries == expected.size)
        // the live meta is txnid 256 → slot 1; parseMeta also validated
        // the STALE slot-0 meta (txnid 255) en route — ids straddle 0x100
        // so the free DB's INTEGERKEY order diverges from memcmp
        // full iteration: every live key present, every value md5-exact,
        // memcmp-ordered
        val got = env.iterator.map { case (k, v) =>
          (new String(k, US_ASCII),
            java.security.MessageDigest.getInstance("MD5").digest(v)
              .map(b => f"${b & 0xff}%02x").mkString)
        }.toSeq
        assert(got.map(_._1) == got.map(_._1).sorted)
        assert(got.toMap == expected, "iterated content != fixture manifest")
        // point gets: live keys resolve through scattered/reused pages
        expected.keysIterator.take(40).foreach { k =>
          val v = env.get(k.getBytes(US_ASCII))
          assert(v.isDefined, s"missing live key $k")
        }
        // deleted keys are gone (their old leaf bytes may still sit in
        // stale pages — the descent must not find them)
        deleted.take(20).foreach { k =>
          assert(env.get(k.getBytes(US_ASCII)).isEmpty, s"resurrected key $k")
        }
        // reachability audit: main + free DB, counts vs meta
        env.auditTree()
        assert(env.freeStat.entries > 0, "fixture must carry a populated free DB")
      } finally env.close()
    }
  }

  test("auditTree accepts this module's own bulk envs too") {
    val dir = freshDir()
    val entries = (0 until 5000).map(i => kv(f"key$i%08d", s"value-$i" * 7))
    Lmdb.write(dir, entries.iterator)
    val env = new Lmdb.Env(dir)
    try {
      val s = env.auditTree()
      assert(s.entries == 5000)
      assert(s == env.audit()) // both audits agree on a bulk env
    } finally env.close()
  }

  test("cmpKeys is memcmp: unsigned bytes, shorter-prefix-first") {
    assert(Lmdb.cmpKeys(Array[Byte](1), Array[Byte](2)) < 0)
    assert(Lmdb.cmpKeys(Array[Byte](-1), Array[Byte](1)) > 0, "0xff > 0x01 unsigned")
    assert(Lmdb.cmpKeys("ab".getBytes(US_ASCII), "abc".getBytes(US_ASCII)) < 0)
    assert(Lmdb.cmpKeys("abc".getBytes(US_ASCII), "abc".getBytes(US_ASCII)) == 0)
  }

  test("LmdbStore: sharded Spark write -> manifest, scan-back, gets, audit") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    val root = graft.Scratch.fresh("lmdbstore_")
    val df = (0 until 1000).map { i =>
      (f"rec$i%06d", Array.fill(50 + i % 200)((i % 251).toByte))
    }.toDF("key", "value").repartition(3)
    graft.sinks.LmdbStore.write(df, root)

    val manifest = new String(java.nio.file.Files.readAllBytes(
      new File(root, "_MANIFEST").toPath), US_ASCII)
    assert(manifest.linesIterator.forall(_.matches("shard-\\d+")))

    val audits = graft.sinks.LmdbStore.auditAll(root)
    assert(audits.map(_._2.entries).sum == 1000)
    audits.foreach { case (name, _) =>
      // every shard is a genuine env: stock-layout meta page readable
      val m = rawPage(new File(root, name), 1L)
      assert(m.getInt(Lmdb.PageHdrSz) == Lmdb.Magic)
    }

    val back = graft.sinks.LmdbStore.read(spark, root)
      .select("key", "value").as[(String, Array[Byte])].collect().toMap
    assert(back.size == 1000)
    assert(back(f"rec${77}%06d").length == 50 + 77 % 200)
    assert(graft.sinks.LmdbStore.get(root, "rec000500").exists(_.length == 50 + 500 % 200))
    assert(graft.sinks.LmdbStore.get(root, "missing-key").isEmpty)

    // refuse-nonempty guard (lmdb_util.py:15-17)
    intercept[IllegalArgumentException](graft.sinks.LmdbStore.write(df, root))

    // incremental ingest: new batch lands as additional envs; point gets
    // prefer the newest shard, so a re-ingested key supersedes its old value
    val batch2 = (Seq(("rec000500", Array[Byte](9, 9, 9))) ++
      (1000 until 1200).map(i => (f"rec$i%06d", Array.fill(10)(i.toByte))))
      .toDF("key", "value").repartition(2)
    graft.sinks.LmdbStore.append(batch2, root)
    val manifest2 = new String(java.nio.file.Files.readAllBytes(
      new File(root, "_MANIFEST").toPath), US_ASCII)
    assert(manifest2.linesIterator.size > manifest.linesIterator.size,
      "append must add shards to the manifest")
    assert(graft.sinks.LmdbStore.auditAll(root).map(_._2.entries).sum == 1201)
    assert(graft.sinks.LmdbStore.get(root, "rec001100").exists(_.length == 10))
    assert(graft.sinks.LmdbStore.get(root, "rec000500")
      .exists(v => v.length == 3 && v(0) == 9), "newest batch must win")
    assert(graft.sinks.LmdbStore.get(root, "rec000501").exists(_.length == 50 + 501 % 200),
      "keys only in the old batch still resolve")
  }

  test("Bloom sidecars: zero false negatives, misses skip tree descents") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    val root = graft.Scratch.fresh("lmdbbloom_")
    val df = (0 until 2000).map(i => (f"k$i%06d", Array.fill(20)(i.toByte)))
      .toDF("key", "value").repartition(5)
    graft.sinks.LmdbStore.write(df, root)

    // every shard carries a sidecar
    val shardDirs = new File(root).listFiles().filter(_.getName.matches("shard-\\d+"))
    assert(shardDirs.nonEmpty &&
      shardDirs.forall(d => new File(d, graft.sinks.KeyBloom.FileName).isFile))

    // no false negatives: every present key resolves
    (0 until 2000 by 7).foreach { i =>
      assert(graft.sinks.LmdbStore.get(root, f"k$i%06d").isDefined, s"k$i")
    }
    // misses: K bitmap tests, ~0 descents (1% fpp per shard => expected
    // ~0.05 descents/lookup over 5 shards; 200 lookups => ~10, assert <= 60)
    graft.sinks.LmdbStore.treeProbes.set(0L)
    (0 until 200).foreach { i =>
      assert(graft.sinks.LmdbStore.get(root, f"missing$i%06d").isEmpty)
    }
    val probes = graft.sinks.LmdbStore.treeProbes.get()
    assert(probes <= 60, s"Bloom should skip nearly all descents, got $probes/1000")

    // a shard with its sidecar stripped before first read degrades to
    // unconditional descent, never a wrong answer (fresh store: the bloom
    // cache keys by path, so strip from a new store)
    val root2 = graft.Scratch.fresh("lmdbbloom2_")
    graft.sinks.LmdbStore.write(df, root2)
    new File(root2).listFiles().filter(_.getName.matches("shard-\\d+"))
      .foreach(d => new File(d, graft.sinks.KeyBloom.FileName).delete())
    assert(graft.sinks.LmdbStore.get(root2, "k000042").isDefined)
    assert(graft.sinks.LmdbStore.get(root2, "absent").isEmpty)

    // a store deleted and REWRITTEN at the same path must serve the new
    // keys: the sidecar cache keys on (path, mtime, length), so a stale
    // bitmap can never manufacture false negatives for the new contents
    val rewriteRoot = graft.Scratch.fresh("lmdbrw_")
    val oldDf = (0 until 50).map(i => (f"old$i%06d", Array[Byte](1)))
      .toDF("key", "value").repartition(1)
    graft.sinks.LmdbStore.write(oldDf, rewriteRoot)
    assert(graft.sinks.LmdbStore.get(rewriteRoot, "old000007").isDefined) // caches bloom
    def rmrf(f: File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmrf)); f.delete(); ()
    }
    rmrf(new File(rewriteRoot))
    Thread.sleep(1100) // distinct mtime second even on coarse filesystems
    val newDf = (0 until 50).map(i => (f"new$i%06d", Array[Byte](2)))
      .toDF("key", "value").repartition(1)
    graft.sinks.LmdbStore.write(newDf, rewriteRoot)
    assert(graft.sinks.LmdbStore.get(rewriteRoot, "new000007").isDefined,
      "rewritten store must serve new keys, not a stale cached bloom")
    assert(graft.sinks.LmdbStore.get(rewriteRoot, "old000007").isEmpty)

    // the KvStore shares the sidecar scheme: shard-NNNNN.bloom beside the
    // idx, gets stay exact, stripped sidecars degrade to idx loads
    val kvRoot = graft.Scratch.fresh("kvbloom_")
    new File(kvRoot).delete()
    graft.sinks.KvStore.write(df.selectExpr("key", "value",
      "array(1) AS shape", "'bytes' AS dtype"), kvRoot)
    assert(new File(kvRoot).listFiles().count(_.getName.endsWith(".bloom")) ==
      new File(kvRoot).listFiles().count(_.getName.endsWith(".kv")))
    assert(graft.sinks.KvStore.get(kvRoot, "k000042").exists(_.length == 20))
    assert(graft.sinks.KvStore.get(kvRoot, "absent").isEmpty)
    new File(kvRoot).listFiles().filter(_.getName.endsWith(".bloom")).foreach(_.delete())
    assert(graft.sinks.KvStore.get(kvRoot, "k001999").isDefined)
  }
}
