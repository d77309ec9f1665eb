package graft.sinks

import java.io.{File, InputStream, OutputStream}
import java.nio.charset.StandardCharsets.US_ASCII

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** WebDataset-style tar shards — the de-facto container for large-scale
  * multimodal training corpora (one tar per shard, each sample a run of
  * consecutive members sharing a basename: `000123.img`, `000123.txt`,
  * `000123.json`; loaders stream shards sequentially, so 100 TB reads are
  * pure sequential I/O with no per-sample seeks).
  *
  * Format — PUBLIC POSIX.1-1988 ustar, writable/readable by any stock
  * `tar`: 512-byte header blocks (name[100] mode[8] uid[8] gid[8]
  * size[12-octal] mtime[12-octal] chksum[8] typeflag[1] linkname[100]
  * magic[6]="ustar\0" version[2]="00" uname[32] gname[32] devmajor[8]
  * devminor[8] prefix[155]), member data zero-padded to the next 512
  * boundary, archive terminated by two zero blocks. The checksum field is
  * the simple sum of the header bytes with chksum itself read as 8 spaces,
  * stored as 6 octal digits + NUL + space.
  *
  * Headers are written fully deterministically (mode 0644, uid=gid=0,
  * mtime=0, empty uname/gname) so identical inputs give byte-identical
  * shards — retries and re-runs are content-addressable, and the shard
  * size is a closed-form function of the member sizes:
  * `sum(512 + ceil(size/512)*512) + 1024` — which is what the q204 oracle
  * replays in SQL.
  *
  * The reference stores its training pairs in LMDB (lmdb_util.py:9-133);
  * tar shards are the sequential-read counterpart a webdataset-style
  * trainer consumes — both sinks share the per-partition single-writer
  * scale story.
  */
object Tar {

  val BlockSize = 512

  private def octal(v: Long, width: Int): Array[Byte] = {
    // width-1 octal digits, zero-padded, NUL terminator (ustar numeric)
    val s = java.lang.Long.toOctalString(v)
    require(s.length <= width - 1, s"value $v overflows $width-byte octal field")
    val b = (("0" * (width - 1 - s.length)) + s).getBytes(US_ASCII) // NUL-terminated below
    java.util.Arrays.copyOf(b, width)
  }

  /** One deterministic ustar header block for a regular file. */
  private[sinks] def header(name: String, size: Long): Array[Byte] = {
    val nb = name.getBytes(US_ASCII)
    require(nb.length <= 100, s"member name over 100 bytes: $name")
    require(name.forall(c => c >= ' ' && c < 127), s"non-ASCII member name: $name")
    val h = new Array[Byte](BlockSize)
    System.arraycopy(nb, 0, h, 0, nb.length)
    System.arraycopy(octal(420, 8), 0, h, 100, 8) // mode 0644
    System.arraycopy(octal(0, 8), 0, h, 108, 8) // uid
    System.arraycopy(octal(0, 8), 0, h, 116, 8) // gid
    System.arraycopy(octal(size, 12), 0, h, 124, 12)
    System.arraycopy(octal(0, 12), 0, h, 136, 12) // mtime 0: deterministic
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum as spaces first
    h(156) = '0' // typeflag: regular file
    // POSIX magic "ustar" NUL + version "00"
    System.arraycopy("ustar".getBytes(US_ASCII), 0, h, 257, 5)
    h(262) = 0
    h(263) = '0'; h(264) = '0'

    var sum = 0L
    var i = 0
    while (i < BlockSize) { sum += h(i) & 0xff; i += 1 }
    // 6 octal digits + NUL + space (the historical chksum encoding)
    val cs = java.lang.Long.toOctalString(sum)
    val padded = ("0" * (6 - cs.length)) + cs
    System.arraycopy(padded.getBytes(US_ASCII), 0, h, 148, 6)
    h(154) = 0
    h(155) = ' '.toByte
    h
  }

  final class TarWriter(out: OutputStream) {
    private var closed = false
    private var bytes = 0L

    /** Returns the member's HEADER offset in the archive — the seek target
      * for indexed random access (member data begins 512 bytes later). */
    def add(name: String, data: Array[Byte]): Long = {
      require(!closed, "writer closed")
      val at = bytes
      out.write(header(name, data.length.toLong))
      out.write(data)
      val pad = (BlockSize - data.length % BlockSize) % BlockSize
      if (pad > 0) out.write(new Array[Byte](pad))
      bytes += BlockSize + data.length + pad
      at
    }

    /** Two zero end-of-archive blocks; returns total archive bytes. */
    def close(): Long = {
      require(!closed, "writer closed")
      closed = true
      out.write(new Array[Byte](2 * BlockSize))
      out.flush()
      bytes + 2 * BlockSize
    }
  }

  /** Strict sequential reader: validates magic and checksum per member. */
  def entries(in: InputStream): Iterator[(String, Array[Byte])] =
    new Iterator[(String, Array[Byte])] {
      private var nextEntry: (String, Array[Byte]) = null
      private var done = false

      private def readFully(buf: Array[Byte]): Boolean = {
        var off = 0
        while (off < buf.length) {
          val n = in.read(buf, off, buf.length - off)
          if (n < 0) return false
          off += n
        }
        true
      }

      private def advance(): Unit = {
        nextEntry = null
        // loop (not recurse: a directory-heavy foreign archive could have
        // unbounded runs of skipped members) until a regular member or EOF
        while (nextEntry == null && !done) {
          val h = new Array[Byte](BlockSize)
          if (!readFully(h) || h.forall(_ == 0)) { done = true }
          else {
            val magic = new String(h, 257, 5, US_ASCII)
            require(magic == "ustar", s"bad ustar magic '$magic'")
            val stored = java.lang.Long.parseLong(
              new String(h, 148, 6, US_ASCII).trim, 8)
            java.util.Arrays.fill(h, 148, 156, ' '.toByte)
            var sum = 0L
            var i = 0
            while (i < BlockSize) { sum += h(i) & 0xff; i += 1 }
            require(sum == stored, s"checksum $sum != stored $stored")
            var nameLen = 0
            while (nameLen < 100 && h(nameLen) != 0) nameLen += 1
            var name = new String(h, 0, nameLen, US_ASCII)
            // ustar prefix field (offset 345, 155 B): long paths from
            // foreign archives split as prefix + "/" + name
            var preLen = 0
            while (preLen < 155 && h(345 + preLen) != 0) preLen += 1
            if (preLen > 0) name = new String(h, 345, preLen, US_ASCII) + "/" + name
            val size = java.lang.Long.parseLong(
              new String(h, 124, 11, US_ASCII).trim, 8)
            require(size <= Int.MaxValue, s"member too large: $size")
            val data = new Array[Byte](size.toInt)
            require(readFully(data), "truncated member data")
            val pad = ((BlockSize - size % BlockSize) % BlockSize).toInt
            if (pad > 0) require(readFully(new Array[Byte](pad)), "truncated padding")
            // yield only REGULAR members (typeflag '0'/NUL). Foreign
            // archives carry directories ('5'), links, PAX metadata
            // ('x'/'g') — their payloads were consumed above but they are
            // not data members and must not pollute webdataset samples.
            val typeflag = h(156)
            if (typeflag == '0'.toByte || typeflag == 0.toByte) nextEntry = (name, data)
          }
        }
      }

      advance()
      override def hasNext: Boolean = nextEntry != null
      override def next(): (String, Array[Byte]) = {
        val e = nextEntry
        advance()
        e
      }
    }

  /** Distributed write: df(key: String, ext: String, value: binary) → one
    * `shard-NNNNN.tar` per partition + `_MANIFEST`. The sink enforces the
    * webdataset grouping contract itself: rows are hash-partitioned on
    * `key` (a sample's members can never straddle two shards, whatever the
    * caller's partitioning) and sorted by (key, ext) within each shard so
    * every sample's members are CONTIGUOUS. */
  def writeShards(df: DataFrame, path: String, numShards: Int = 0): Unit = {
    val root = new File(path)
    require(!root.exists() || root.listFiles().forall(_.getName.startsWith(".")),
      s"tar shard target not empty: $path")
    root.mkdirs()
    val keyed = df.select(
      col("key").cast("string"), col("ext").cast("string"), col("value"))
    (if (numShards > 0) keyed.repartition(numShards, col("key"))
     else keyed.repartition(col("key")))
      .sortWithinPartitions("key", "ext")
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val shard = new File(root, f"shard-$pid%05d.tar")
        val tmp = new File(root, shard.getName + ".tmp-" +
          java.util.UUID.randomUUID().toString.take(8))
        val out = new java.io.BufferedOutputStream(
          new java.io.FileOutputStream(tmp), 1 << 20)
        val w = new TarWriter(out)
        // member index sidecar (`<shard>.tar.idx`, the webdataset-ecosystem
        // pattern): `name offset size` per member, offset = header block —
        // random access into a sequential container without re-scanning it
        val idx = new StringBuilder
        var n = 0L
        rows.foreach { r =>
          // null would string-concat to the member name "null.<ext>" and
          // silently collide samples — fail fast like the sibling sinks
          require(r.getString(0) != null && r.getString(1) != null,
            "null sample key/ext")
          val name = r.getString(0) + "." + r.getString(1)
          // the idx sidecar is space-delimited: a space in a member name
          // would silently corrupt it, so reject like KvStore.validateKey
          require(name.nonEmpty && name.forall(c => c > ' ' && c < 127),
            s"member name must be printable ASCII without spaces: '$name'")
          val data = r.getAs[Array[Byte]](2)
          val at = w.add(name, data)
          idx.append(name).append(' ').append(at).append(' ')
            .append(data.length).append('\n')
          n += 1
        }
        w.close()
        out.close()
        if (n == 0) tmp.delete()
        else {
          val tmpIdx = new File(tmp.getPath + ".idx")
          java.nio.file.Files.write(tmpIdx.toPath, idx.toString.getBytes(US_ASCII))
          if (tmp.renameTo(shard)) {
            require(tmpIdx.renameTo(new File(shard.getPath + ".idx")),
              s"rename ${tmpIdx.getName} failed")
          } else {
            require(shard.isFile, s"rename $tmp -> $shard failed")
            tmp.delete(); tmpIdx.delete() // a committed retry got there first
          }
        }
        ()
      }
    val shards = Option(root.listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(_.matches("shard-\\d+\\.tar"))
      // numeric, not lexicographic (see LmdbStore: shard 100000 vs 99999)
      .sortBy(_.stripPrefix("shard-").stripSuffix(".tar").toLong)
    val tmpManifest = new File(root, "_MANIFEST.tmp-" +
      java.util.UUID.randomUUID().toString.take(8))
    java.nio.file.Files.write(tmpManifest.toPath,
      shards.mkString("", "\n", "\n").getBytes(US_ASCII))
    java.nio.file.Files.move(tmpManifest.toPath, new File(root, "_MANIFEST").toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  private def committedShards(path: String): Seq[File] = {
    val manifest = new File(path, "_MANIFEST")
    require(manifest.exists(), s"no _MANIFEST in $path (uncommitted store)")
    new String(java.nio.file.Files.readAllBytes(manifest.toPath), US_ASCII)
      .split('\n').iterator.filter(_.nonEmpty).map(new File(path, _)).toSeq
  }

  /** Scan committed shards back as (shard, name, value) — shards in
    * parallel, rows STREAMED (one member in memory per task, never a whole
    * shard: at 100 TB a shard is GBs). The stream closes at task
    * completion, covering early task abort as well as exhaustion. */
  def readShards(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val files = committedShards(path).map(_.getAbsolutePath)
    spark.sparkContext.parallelize(files, math.max(files.size, 1))
      .flatMap { f =>
        val in = new java.io.BufferedInputStream(
          new java.io.FileInputStream(f), 1 << 20)
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => in.close()))
        entries(in).map { case (n, v) => (new File(f).getName, n, v) }
      }.toDF("shard", "name", "value")
  }

  /** Committed shard sizes (name → bytes) for the size-arithmetic oracle. */
  def shardSizes(path: String): Seq[(String, Long)] =
    committedShards(path).map(f => (f.getName, f.length()))

  /** Indexed random access: resolve a member via the `.tar.idx` sidecars
    * (one seek + one header validation + one data read), falling back to a
    * sequential scan for shards without an index. The header at the
    * indexed offset must re-validate — name, checksum and size — so a
    * stale or corrupt index can never return wrong bytes. */
  def get(path: String, member: String): Option[Array[Byte]] = {
    committedShards(path).iterator.flatMap { shard =>
      val idxFile = new File(shard.getPath + ".idx")
      if (idxFile.isFile) {
        new String(java.nio.file.Files.readAllBytes(idxFile.toPath), US_ASCII)
          .linesIterator
          .map(_.split(' '))
          .collectFirst { case Array(n, off, sz) if n == member =>
            val raf = new java.io.RandomAccessFile(shard, "r")
            try {
              raf.seek(off.toLong)
              val wanted = sz.toInt
              val block = new Array[Byte](BlockSize + wanted)
              raf.readFully(block)
              val one = entries(new java.io.ByteArrayInputStream(
                block ++ new Array[Byte](2 * BlockSize))).next()
              require(one._1 == member && one._2.length == wanted,
                s"index points at '${one._1}'(${one._2.length}) not '$member'($wanted)")
              one._2
            } finally raf.close()
          }
      } else {
        val in = new java.io.BufferedInputStream(
          new java.io.FileInputStream(shard), 1 << 20)
        try entries(in).collectFirst { case (n, d) if n == member => d }
        finally in.close()
      }
    }.nextOption()
  }
}
