package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, File}
import java.nio.charset.StandardCharsets.US_ASCII

import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.Tar

/** Conformance of the ustar shard writer/reader (sinks/Tar.scala) against
  * the PUBLIC POSIX.1-1988 layout — including extraction by the SYSTEM
  * `tar` binary, an actual stock consumer (skipped only if the binary is
  * absent). Reference context: the LMDB store's sequential-read
  * counterpart for webdataset-style training loaders.
  */
class TarSpec extends AnyFunSuite {

  private def tarBytes(entries: (String, Array[Byte])*): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val w = new Tar.TarWriter(bos)
    entries.foreach { case (n, d) => w.add(n, d) }
    w.close()
    bos.toByteArray
  }

  test("header block: field offsets, octal encodings, checksum") {
    // first 512 bytes of a one-member archive ARE the member's header
    val h = tarBytes(("sample000.txt", new Array[Byte](1234))).take(512)
    assert(h.length == 512)
    assert(new String(h, 0, 13, US_ASCII) == "sample000.txt")
    assert(h(13) == 0, "name NUL-terminated")
    assert(new String(h, 100, 7, US_ASCII) == "0000644", "mode octal")
    assert(new String(h, 124, 11, US_ASCII) == "00000002322", "size 1234 = octal 2322")
    assert(h(156) == '0'.toByte, "typeflag regular")
    assert(new String(h, 257, 5, US_ASCII) == "ustar" && h(262) == 0, "POSIX magic")
    assert(h(263) == '0'.toByte && h(264) == '0'.toByte, "version 00")
    // checksum: recompute with chksum field as spaces
    val copy = h.clone()
    java.util.Arrays.fill(copy, 148, 156, ' '.toByte)
    val sum = copy.map(_ & 0xff).sum.toLong
    assert(java.lang.Long.parseLong(new String(h, 148, 6, US_ASCII), 8) == sum)
    assert(h(154) == 0 && h(155) == ' '.toByte, "chksum NUL+space tail")
  }

  test("roundtrip with padding boundaries 0/1/511/512/513 and EOT blocks") {
    val rnd = new scala.util.Random(5)
    val sizes = Seq(0, 1, 511, 512, 513, 10000)
    val entries = sizes.zipWithIndex.map { case (n, i) =>
      (f"e$i%03d.bin", Array.fill(n)(rnd.nextInt(256).toByte))
    }
    val bytes = tarBytes(entries: _*)
    // closed-form size: sum(512 + ceil(size/512)*512) + 1024
    val expect = sizes.map(n => 512 + ((n + 511) / 512) * 512).sum + 1024
    assert(bytes.length == expect, s"${bytes.length} vs $expect")
    assert(bytes.takeRight(1024).forall(_ == 0), "two zero EOT blocks")
    val back = Tar.entries(new ByteArrayInputStream(bytes)).toVector
    assert(back.map(_._1) == entries.map(_._1))
    back.zip(entries).foreach { case ((_, got), (_, want)) =>
      assert(java.util.Arrays.equals(got, want))
    }
  }

  test("reader rejects corrupted checksum and bad magic") {
    val bytes = tarBytes(("a.txt", "hello".getBytes(US_ASCII)))
    val bad = bytes.clone()
    bad(0) = 'z'.toByte // name changes, checksum now wrong
    intercept[IllegalArgumentException](
      Tar.entries(new ByteArrayInputStream(bad)).toVector)
    val badMagic = bytes.clone()
    badMagic(257) = 'x'.toByte
    intercept[IllegalArgumentException](
      Tar.entries(new ByteArrayInputStream(badMagic)).toVector)
  }

  test("system tar binary lists and extracts our shards byte-exact") {
    val tarBin = Seq("/usr/bin/tar", "/bin/tar").find(new File(_).canExecute)
    assume(tarBin.isDefined, "no system tar binary available")
    val dir = new File(graft.Scratch.fresh("tarx_")); dir.mkdirs()
    val payload = Array.tabulate(2000)(i => (i * 7 % 251).toByte)
    val f = new File(dir, "t.tar")
    val out = new java.io.FileOutputStream(f)
    val w = new Tar.TarWriter(out)
    w.add("s0001.bin", payload)
    w.add("s0001.txt", "hello world".getBytes(US_ASCII))
    w.close(); out.close()

    import scala.sys.process._
    val listing = Seq(tarBin.get, "-tf", f.getAbsolutePath).!!.trim.split('\n')
    assert(listing.toSeq == Seq("s0001.bin", "s0001.txt"), "stock tar listing")
    val extracted = new ByteArrayOutputStream()
    val rc = (Seq(tarBin.get, "-xOf", f.getAbsolutePath, "s0001.bin") #> extracted).!
    assert(rc == 0, "stock tar extract rc")
    assert(java.util.Arrays.equals(extracted.toByteArray, payload),
      "stock tar extracts byte-identical payload")
  }

  test("system tar produces archives our strict reader accepts") {
    val tarBin = Seq("/usr/bin/tar", "/bin/tar").find(new File(_).canExecute)
    assume(tarBin.isDefined, "no system tar binary available")
    val dir = new File(graft.Scratch.fresh("tarr_")); dir.mkdirs()
    java.nio.file.Files.write(new File(dir, "x.txt").toPath, "abc".getBytes(US_ASCII))
    java.nio.file.Files.write(new File(dir, "y.bin").toPath,
      Array.tabulate(700)(_.toByte))
    import scala.sys.process._
    val f = new File(dir, "sys.tar")
    // POSIX format explicitly (GNU tar's default may be gnu-format)
    val rc = Seq(tarBin.get, "--format=ustar", "-cf", f.getAbsolutePath,
      "-C", dir.getAbsolutePath, "x.txt", "y.bin").!
    assert(rc == 0)
    val in = new java.io.FileInputStream(f)
    val back = try Tar.entries(in).toVector finally in.close()
    assert(back.map(_._1).toSet == Set("x.txt", "y.bin"))
    assert(new String(back.find(_._1 == "x.txt").get._2, US_ASCII) == "abc")
    assert(back.find(_._1 == "y.bin").get._2.length == 700)
  }

  test("foreign archive with directories: only regular members yielded, paths joined") {
    val tarBin = Seq("/usr/bin/tar", "/bin/tar").find(new File(_).canExecute)
    assume(tarBin.isDefined, "no system tar binary available")
    val dir = new File(graft.Scratch.fresh("tard_")); dir.mkdirs()
    val sub = new File(dir, "nested/deeper"); sub.mkdirs()
    java.nio.file.Files.write(new File(sub, "leaf.txt").toPath, "deep".getBytes(US_ASCII))
    java.nio.file.Files.write(new File(dir, "top.txt").toPath, "top".getBytes(US_ASCII))
    import scala.sys.process._
    val f = new File(dir, "dirs.tar")
    val rc = Seq(tarBin.get, "--format=ustar", "-cf", f.getAbsolutePath,
      "-C", dir.getAbsolutePath, "nested", "top.txt").!
    assert(rc == 0)
    val in = new java.io.FileInputStream(f)
    val back = try Tar.entries(in).toVector finally in.close()
    // directory members (typeflag '5') are consumed, not yielded
    assert(back.map(_._1).toSet == Set("nested/deeper/leaf.txt", "top.txt"),
      s"got ${back.map(_._1)}")
    assert(new String(back.find(_._1.endsWith("leaf.txt")).get._2, US_ASCII) == "deep")
  }

  test("sharded Spark write: manifest, contiguous samples, parallel read") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    val root = graft.Scratch.fresh("tarshards_")
    val df = (0 until 300).flatMap { i =>
      Seq((f"s$i%06d", "bin", Array.fill(100 + i % 50)((i % 251).toByte)),
        (f"s$i%06d", "txt", s"doc $i".getBytes(US_ASCII)))
    }.toDF("key", "ext", "value").repartition(3)
    Tar.writeShards(df, root)

    val sizes = Tar.shardSizes(root)
    assert(sizes.nonEmpty && sizes.forall(_._2 % 512 == 0))

    // webdataset contract: both members of a sample are adjacent in-shard
    sizes.foreach { case (name, _) =>
      val in = new java.io.FileInputStream(new File(root, name))
      val names = try Tar.entries(in).map(_._1).toVector finally in.close()
      names.grouped(2).foreach { pair =>
        assert(pair.map(_.takeWhile(_ != '.')).distinct.size == 1,
          s"sample members not contiguous: $pair")
      }
    }

    val back = Tar.readShards(spark, root)
    assert(back.count() == 600)
    assert(back.where("name = 's000007.txt'")
      .as[(String, String, Array[Byte])].collect()
      .exists(r => new String(r._3, US_ASCII) == "doc 7"))

    // indexed random access: every shard carries a .tar.idx sidecar, get()
    // seeks straight to the member and re-validates its header
    assert(new File(root).listFiles().count(_.getName.endsWith(".tar.idx")) ==
      Tar.shardSizes(root).size)
    assert(Tar.get(root, "s000123.txt")
      .exists(v => new String(v, US_ASCII) == "doc 123"))
    assert(Tar.get(root, "s000123.bin").exists(_.length == 100 + 123 % 50))
    assert(Tar.get(root, "nope.txt").isEmpty)

    // a tampered index offset must throw (header re-validation), never
    // silently return wrong bytes
    val idxFile = new File(root).listFiles().find(_.getName.endsWith(".tar.idx")).get
    val lines = new String(java.nio.file.Files.readAllBytes(idxFile.toPath), US_ASCII)
      .linesIterator.toVector
    val parts = lines.head.split(' ')
    val tampered = (s"${parts(0)} ${parts(1).toLong + 512} ${parts(2)}" +: lines.tail)
      .mkString("", "\n", "\n")
    java.nio.file.Files.write(idxFile.toPath, tampered.getBytes(US_ASCII))
    intercept[Exception](Tar.get(root, parts(0)))

    // shards without an index fall back to a sequential scan
    new File(root).listFiles().filter(_.getName.endsWith(".tar.idx")).foreach(_.delete())
    assert(Tar.get(root, "s000042.txt")
      .exists(v => new String(v, US_ASCII) == "doc 42"))

    // spaces in member names would corrupt the space-delimited idx: reject
    val badRoot = graft.Scratch.fresh("tarbad_")
    new File(badRoot).delete()
    val bad = Seq(("has space", "txt", "x".getBytes(US_ASCII))).toDF("key", "ext", "value")
    intercept[org.apache.spark.SparkException](Tar.writeShards(bad, badRoot))

    // a 100-byte name fills its field exactly (no NUL terminator) and
    // still roundtrips through both our reader and the field-bounded parse
    val longName = ("n" * 96) + ".bin"
    val lt = tarBytes((longName, Array[Byte](7, 8, 9)))
    val backLong = Tar.entries(new java.io.ByteArrayInputStream(lt)).toVector
    assert(backLong.map(_._1) == Vector(longName))
    intercept[IllegalArgumentException](tarBytes((("n" * 101), Array[Byte](1))))
  }
}
