package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{Degrade, Image, Npy, Rng}
import graft.sinks.KvStore
import graft.sources.Nifti

/** End-to-end pipeline queries: the reference's flagship dataflow (scan →
  * slice → split → degrade → tile → filter → sink) assembled from the
  * engine's pieces, self-contained over synthetic NIfTI volumes.
  */
object PipelineOps {

  /** Build n deterministic NIfTI volumes (in-memory bytes, S3 fixtures). */
  private def synthVolumes(n: Int): Seq[(String, Array[Byte])] =
    (0 until n).map { v =>
      val dims = Array(16, 14, 6)
      val vol = Array.tabulate(dims.product) { i =>
        val x = i % 16; val y = (i / 16) % 14
        val r = math.sqrt((x - 8) * (x - 8) + (y - 7) * (y - 7))
        if (r < 5 + v % 3) (200 + (i * 7 + v * 31) % 56).toFloat
        else (((i * 13 + v * 17) % 20)).toFloat
      }
      (f"vol$v%03d", Nifti.encode(vol, dims, Array(0.2, 0.2, 0.2)))
    }

  /** The flagship pipeline (§3.1 restated Spark-first): NIfTI decode → G1
    * oriented slices with per-volume K2 normalize → W1 seeded split (zero
    * data read — hash-cut over xxhash64 of the slice id) → C3 degrade → G2 tile
    * → P3 dark filter → A1 per-split counters. */
  def flagship(s: SparkSession, nVolumes: Int = 6): DataFrame = {
    import s.implicits._
    val vols = s.sparkContext.parallelize(synthVolumes(nVolumes), math.min(nVolumes, 8))

    val slices = vols.flatMap { case (base, bytes) =>
      val (h, vol) = Nifti.readVolume(bytes)
      val (norm, _, _) = Image.robustPercentileNormalize(vol, 0.5, 99.5)
      Nifti.Orientations.flatMap { o =>
        (0 until Nifti.sliceCount(h.dims, o)).map { i =>
          val (px, sh, sw) = Nifti.sliceOf(norm, h.dims, o, i)
          (f"${base}__${o}__slice_$i%03d", base, o, i, sh, sw, px)
        }
      }
    }.toDF("slice_id", "base", "orient", "idx", "h", "w", "pixels")

    // W1: metadata-only split plan — deterministic hash-cut (bucket < 950 ⇒
    // train, < 980 ⇒ val, else test). No global rank: a rank-based split
    // needs a single-partition Window over every slice id, which is the
    // scale bottleneck the reference's metadata planner avoided; a hash-cut
    // is per-row, ratios hold in expectation, and retries are stable.
    val split = slices.select("slice_id").distinct()
      .withColumn("b", pmod(xxhash64(col("slice_id"), lit(42)), lit(1000L)))
      .withColumn("split",
        when(col("b") < 950, "train").when(col("b") < 980, "val").otherwise("test"))
      .select("slice_id", "split")

    val labeled = slices.join(broadcast(split), Seq("slice_id"))

    val patched = labeled
      .select(col("slice_id"), col("split"), col("h"), col("w"), col("pixels"))
      .as[(String, String, Int, Int, Array[Float])]
      .map { case (sliceId, splitLbl, h, w, px) =>
        val seed = Rng.sliceSeed(sliceId, "", 0, 123)
        val r = Degrade.degradePreset(px, h, w, "3tFlash", seed)
        val (hs, ws) = Image.makeCropSpaces(h, w, 8, 4, 2)
        var nHr = 0L; var nDark = 0L
        for (y <- hs; x <- ws) {
          nHr += 1
          if (Image.patchIsDark(Image.extractPatch(px, h, w, y, x, 8))) nDark += 1
        }
        val (lhs, lws) = Image.makeCropSpaces(r.lrH, r.lrW, 4, 2, 1)
        (splitLbl, 1L, nHr, nDark, lhs.length.toLong * lws.length)
      }
      .toDF("split", "n_slices", "n_hr", "n_dark", "n_lr")

    // QC counters ride the SAME pass via observe() — at 100 TB a separate
    // "count the drops" job re-reads the corpus; observed metrics are
    // collected by the running aggregation for free (ObserveSpec asserts
    // they match the result exactly).
    patched
      .observe("flagship_qc",
        count(lit(1)).as("n_slice_rows"),
        sum("n_hr").as("n_hr_total"),
        sum("n_dark").as("n_dark_total"))
      .groupBy("split")
      .agg(sum("n_slices").as("n_slices"), sum("n_hr").as("n_hr_patches"),
        sum("n_dark").as("n_dark_discarded"), sum("n_lr").as("n_lr_patches"))
      .orderBy("split")
  }

  /** S8–S11 KV sink roundtrip: degrade patches → .npy encode → sharded
    * store write (batched commits, manifest) → point lookup + regex key
    * listing + full scan-back; verifies byte-exact recovery. Rows-only
    * (binary sink, not SQL-expressible). */
  private def q53(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tmp = graft.Scratch.fresh("kv_")
    new java.io.File(tmp).delete() // KvStore.create remakes it
    // explicit file:// URI: exercises the Hadoop FileSystem codepath the
    // sink uses for hdfs:// and s3a:// store locations
    val storeDir = s"file://$tmp"

    val parts = graft.Spread.ifNarrow(s, Tables(s, dir, "part")
        .select(col("p_partkey"))
        .filter(col("p_partkey") % 4 === 0))
      // narrow scan feeding a CPU-heavy kernel: spread first
      .as[Long]
    val records = parts.map { pk =>
      val img = Array.tabulate(16 * 16)(i => ((pk * 31 + i * 7) % 256).toFloat / 255f)
      val r = Degrade.degradePreset(img, 16, 16, "3tFlash", Rng.sliceSeed(s"p$pk", "axial", 0, 7))
      val key = f"part$pk%06d__axial__slice_000__s001"
      (key, Npy.encode(r.lr, Seq(r.lrH, r.lrW)), Seq(r.lrH, r.lrW, 1), "float32")
    }.toDF("key", "value", "shape", "dtype")
      .persist() // degrade+encode subtree feeds the write AND the verification joins

    KvStore.write(records, storeDir)

    val written = records.select(col("key"), md5(col("value")).as("h"))
    val readBack = KvStore.read(s, storeDir).select(col("key"), md5(col("value")).as("h"))
    val matched = written.as("a").join(readBack.as("b"),
      col("a.key") === col("b.key") && col("a.h") === col("b.h")).count()

    val keys = KvStore.listKeys(storeDir, regex = Some("axial"), limit = 1000)
    val probe = keys.headOption.flatMap(k => KvStore.get(storeDir, k))
      .map(b => Npy.decode(b)._2.mkString("x")).getOrElse("none")

    val out = Seq((written.count(), readBack.count(), matched, keys.length.toLong, probe))
      .toDF("n_written", "n_read", "n_hash_matched", "n_keys_regex", "probe_shape")
    records.unpersist()
    out
  }

  /** S6/S7/K29 PNG pipeline: uint8 normalize → partitioned PNG dir sink
    * (HR + LRx2 tiers) → binaryFile scan-back + decode → pixel-sum parity.
    * Second write without force is a no-op (P4 idempotency). Rows-only. */
  private def q71(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val root = graft.Scratch.fresh("png_")

    val slices = graft.Spread.ifNarrow(s, Tables(s, dir, "supplier")
        .select(col("s_suppkey"))) // CPU-bound kernel, narrow scan
      .as[Long]
      .flatMap { sk =>
        val h = 16; val w = 12
        val img = Array.tabulate(h * w)(i => ((sk * 37 + i * 11) % 300).toFloat)
        val u8 = Image.normalizeUint8(img, 1.0, 99.0)
        val r = Degrade.degradePreset(img, h, w, "3tFlash", Rng.sliceSeed(s"s$sk", "ax", 0, 5))
        val lr8 = Image.normalizeUint8(r.lr, 1.0, 99.0)
        Seq(("HR", "train", f"s$sk%03d__axial__slice_000", u8, h, w),
          ("LRx2", "train", f"s$sk%03d__axial__slice_000", lr8, r.lrH, r.lrW))
      }.toDF("tier", "split", "key", "pixels", "h", "w").persist()

    graft.sinks.Png.writeDir(slices, root)
    graft.sinks.Png.writeDir(slices, root) // idempotent re-run (P4)

    val back = graft.sinks.Png.readDir(s, root)
      .withColumn("tier", regexp_extract(col("path"), "/(HR|LRx\\d+)/", 1))
      .withColumn("px_sum", expr("aggregate(pixels, 0L, (a, x) -> a + x)"))
      .groupBy("tier")
      .agg(count(lit(1)).as("n_files"), sum("px_sum").as("sum_px"))
    val orig = slices
      .withColumn("px_sum", expr("aggregate(pixels, 0L, (a, x) -> a + x)"))
      .groupBy("tier")
      .agg(count(lit(1)).as("n_slices"), sum("px_sum").as("sum_px_orig"))
    val out = orig.join(back, Seq("tier"))
      .withColumn("pixels_match", col("sum_px") === col("sum_px_orig"))
      .select("tier", "n_slices", "n_files", "pixels_match")
      .orderBy("tier")
    val materialized = out.collect()
    slices.unpersist()
    s.createDataFrame(s.sparkContext.parallelize(materialized.toIndexedSeq, 1), out.schema)
  }

  /** S4/S5 as a DataSource V2: write synthetic volumes to disk, then
    * (a) header-only scan — tasks read exactly 352 bytes/file, byte-counter
    * proven; (b) slice scan with orient/idx pushdown — only the requested
    * planes are seek-read, and the DECODED plane content is hash-checked:
    * the synthesis formula is integer arithmetic, so the oracle recomputes
    * the exact pushed-plane pixel sum that only a correct seek-read of the
    * right plane at the right offsets can produce. */
  private def q81(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val root = graft.Scratch.fresh("dsv2_")
    val vols = synthVolumes(8)
    vols.foreach { case (base, bytes) =>
      java.nio.file.Files.write(java.nio.file.Paths.get(root, s"$base.nii"), bytes)
    }
    val totalBytes = vols.map(_._2.length.toLong).sum

    graft.sources.NiftiSource.bytesRead.set(0L)
    val hdr = Nifti.headers(s, root)
      .agg(count(lit(1)).as("n"), sum(expr("shape[0] * shape[1] * shape[2]")).as("vox"))
      .collect()(0)
    val headerBytes = graft.sources.NiftiSource.bytesRead.get()

    graft.sources.NiftiSource.bytesRead.set(0L)
    val pushedSum = Nifti.rawSlices(s, root)
      .filter(col("orient") === "axial" && col("idx") === 2)
      .agg(count(lit(1)).as("n"),
        sum(expr("aggregate(pixels, 0D, (a, x) -> a + cast(x as double))")).as("px"))
      .collect()(0)
    val sliceBytes = graft.sources.NiftiSource.bytesRead.get()

    Seq((hdr.getAs[Long]("n"), hdr.getAs[Long]("vox"), headerBytes,
      pushedSum.getAs[Long]("n"), math.rint(pushedSum.getAs[Double]("px")).toLong,
      headerBytes * 10 < totalBytes && sliceBytes * 4 < totalBytes))
      .toDF("n_files", "n_voxels", "header_scan_bytes",
        "n_pushed_slices", "pushed_px_sum", "pushdown_effective")
  }

  /** S8/S9 in the genuine on-disk format: documents → sharded LMDB
    * environments ([[graft.sinks.LmdbStore]], one real `data.mdb` per
    * partition) → full scan-back hash join + point lookup + structural
    * audit of every page. The oracle replays the format's byte arithmetic:
    * a leaf node larger than me_nodemax=2040 spills to an overflow chain of
    * exactly ceil((16+size)/4096) pages, so the summed per-env
    * `md_overflow_pages` meta field is a deterministic function of the
    * value sizes — every 10th doc carries an 8× repeated payload to force
    * chains. (lmdb_util.py:9-133, v2/lmdb_npy.py:10-57.) */
  private def q203(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val root = graft.Scratch.fresh("lmdbq_")
    val docs = Tables(s, dir, "documents")
      .select(col("doc_id"),
        format_string("doc%08d", col("doc_id")).as("key"),
        when(col("doc_id") % 10 === 0, repeat(col("text"), 8))
          .otherwise(col("text")).cast("binary").as("value"))
      .repartition(4, col("key"))
      .select("key", "value")
      .persist()

    graft.sinks.LmdbStore.write(docs, root)

    val written = docs.select(col("key"), md5(col("value")).as("h"))
    val back = graft.sinks.LmdbStore.read(s, root)
      .select(col("key"), md5(col("value")).as("h"))
    val matched = written.as("a").join(back.as("b"),
      col("a.key") === col("b.key") && col("a.h") === col("b.h")).count()

    val audits = graft.sinks.LmdbStore.auditAll(root) // re-walks every page
    val probe = graft.sinks.LmdbStore.get(root, "doc00000000").map(_.length.toLong).getOrElse(-1L)

    val out = Seq((written.count(), back.count(), matched, audits.size.toLong,
      audits.map(_._2.entries).sum, audits.map(_._2.overflowPages).sum, probe))
      .toDF("n_written", "n_read", "n_hash_matched", "n_envs",
        "entries_stat", "overflow_pages_stat", "probe_doc0_bytes")
    docs.unpersist()
    out
  }

  /** WebDataset-style tar shards: each document becomes a two-member
    * sample (`docNNNNNNNN.txt` + `.json` metadata) in POSIX ustar shards
    * ([[graft.sinks.Tar]]) — the sequential-read container multimodal
    * training loaders stream at 100 TB. The oracle replays the ustar size
    * arithmetic: a member costs 512 header bytes + its payload rounded up
    * to a 512 block, a shard ends with two zero blocks, so total archive
    * bytes are a closed-form function of the member byte lengths. */
  private def q204(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val root = graft.Scratch.fresh("wds_")
    val docs = Tables(s, dir, "documents")
      .select(col("doc_id"), format_string("doc%08d", col("doc_id")).as("key"),
        col("text"), col("lang"), col("source"))
    val members = docs
      .select(col("key"), lit("txt").as("ext"), col("text").cast("binary").as("value"))
      .unionAll(docs.select(col("key"), lit("json").as("ext"),
        concat(lit("{\"doc_id\":"), col("doc_id").cast("string"),
          lit(",\"lang\":\""), col("lang"),
          lit("\",\"source\":\""), col("source"), lit("\"}"))
          .cast("binary").as("value")))
      .persist()

    graft.sinks.Tar.writeShards(members, root, numShards = 4)

    val written = members.select(
      concat_ws(".", col("key"), col("ext")).as("name"), md5(col("value")).as("h"))
    val back = graft.sinks.Tar.readShards(s, root)
      .select(col("name"), md5(col("value")).as("h"))
    val matched = written.join(back, Seq("name", "h")).count()
    val sizes = graft.sinks.Tar.shardSizes(root)

    val out = Seq((docs.count(), members.count(), matched,
      sizes.size.toLong, sizes.map(_._2).sum))
      .toDF("n_samples", "n_members", "n_hash_matched", "n_shards", "total_tar_bytes")
    members.unpersist()
    out
  }

  /** Incremental LMDB ingest gate: batch 1 writes every document, batch 2
    * re-ingests every 3rd with an amended payload via
    * [[graft.sinks.LmdbStore.append]] (new immutable envs + manifest
    * re-commit). Latest-wins is resolved scalably — `max_by(hash, shard)`
    * per key over the parallel scan-back, one keyed aggregation — and
    * every winner must hash-match the amended expectation; the superseded
    * version count and audited entry total are closed-form. */
  private def q205(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val root = graft.Scratch.fresh("lmdbi_")
    val docs = Tables(s, dir, "documents")
      .select(col("doc_id"), format_string("doc%08d", col("doc_id")).as("key"),
        col("text"))
      .persist()

    val batch1 = docs.select(col("key"), col("text").cast("binary").as("value"))
      .repartition(4, col("key"))
    graft.sinks.LmdbStore.write(batch1, root)
    val batch2 = docs.filter(col("doc_id") % 3 === 0)
      .select(col("key"), concat(col("text"), lit("[v2]")).cast("binary").as("value"))
      .repartition(2, col("key"))
    graft.sinks.LmdbStore.append(batch2, root)

    val latest = graft.sinks.LmdbStore.read(s, root)
      .groupBy("key")
      .agg(expr("max_by(md5(value), shard)").as("h"), count(lit(1)).as("n_versions"))
    val expected = docs.select(col("key"),
      md5(when(col("doc_id") % 3 === 0, concat(col("text"), lit("[v2]")))
        .otherwise(col("text")).cast("binary")).as("h"))
    val correct = latest.join(expected, Seq("key", "h")).count()
    val versions = latest.agg(sum("n_versions")).as[Long].collect()(0)
    val entriesStat = graft.sinks.LmdbStore.auditAll(root).map(_._2.entries).sum

    val out = Seq((docs.count(), correct, versions, entriesStat,
      graft.sinks.LmdbStore.get(root, "doc00000000")
        .map(v => new String(v, java.nio.charset.StandardCharsets.UTF_8).endsWith("[v2]"))
        .getOrElse(false)))
      .toDF("n_docs", "n_latest_correct", "n_versions_total", "entries_stat",
        "probe_doc0_superseded")
    docs.unpersist()
    out
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q53_kv_sink_roundtrip" -> (q53 _),
    "q71_png_dir_sink" -> (q71 _),
    "q81_nifti_dsv2_scan" -> (q81 _),
    "q203_lmdb_format_sink" -> (q203 _),
    "q204_wds_tar_shards" -> (q204 _),
    "q205_lmdb_incremental" -> (q205 _)
  )

  /** The sink roundtrips verify INVARIANTS the oracle can state exactly:
    * every record written must be read back hash-identical, key listings
    * hit their limits, and the PNG scan-back reproduces pixel sums — so
    * the count/boolean outputs are DuckDB-computable even though the
    * binary payloads aren't. */
  val oracles: Map[String, String] = Map(
    // q203: the LMDB format's own arithmetic IS the oracle — node bigger
    // than me_nodemax=2040 (key 11 B + header 8 B ⇒ value > 2021 B) spills
    // to ceil((16+size)/4096) overflow pages; the engine reports the summed
    // audited meta fields, DuckDB recomputes them from the value sizes.
    "q203_lmdb_format_sink" ->
      """WITH v AS (SELECT doc_id,
        |  CASE WHEN doc_id % 10 = 0 THEN 8 * octet_length(CAST(text AS BLOB))
        |       ELSE octet_length(CAST(text AS BLOB)) END AS n
        |  FROM documents)
        |SELECT count(*) AS n_written, count(*) AS n_read,
        |  count(*) AS n_hash_matched, CAST(4 AS BIGINT) AS n_envs,
        |  count(*) AS entries_stat,
        |  CAST(COALESCE(SUM(CASE WHEN 8 + 11 + n > 2040
        |    THEN CAST(CEIL((16 + n) / 4096.0) AS BIGINT) ELSE 0 END), 0) AS BIGINT)
        |    AS overflow_pages_stat,
        |  (SELECT 8 * octet_length(CAST(text AS BLOB)) FROM documents WHERE doc_id = 0)
        |    AS probe_doc0_bytes
        |FROM v""".stripMargin,
    // q205: every key's latest version must hash-match; totals are
    // closed-form in the doc_id % 3 re-ingest rule.
    "q205_lmdb_incremental" ->
      """SELECT count(*) AS n_docs, count(*) AS n_latest_correct,
        |  CAST(count(*) + SUM(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_versions_total,
        |  CAST(count(*) + SUM(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS entries_stat,
        |  TRUE AS probe_doc0_superseded
        |FROM documents""".stripMargin,
    // q204: ustar arithmetic — member = 512 + ceil(bytes/512)*512, shard
    // EOT = 1024; 4 fixed shards. Sums are exact in doubles (≪ 2^53).
    "q204_wds_tar_shards" ->
      """WITH m AS (
        |  SELECT octet_length(CAST(text AS BLOB)) AS nb FROM documents
        |  UNION ALL
        |  SELECT octet_length(CAST(concat('{"doc_id":', CAST(doc_id AS VARCHAR),
        |    ',"lang":"', lang, '","source":"', source, '"}') AS BLOB)) FROM documents)
        |SELECT (SELECT count(*) FROM documents) AS n_samples,
        |  count(*) AS n_members, count(*) AS n_hash_matched,
        |  CAST(4 AS BIGINT) AS n_shards,
        |  CAST(SUM(512 + CEIL(nb / 512.0) * 512) + 4 * 1024 AS BIGINT)
        |    AS total_tar_bytes
        |FROM m""".stripMargin,
    "q53_kv_sink_roundtrip" ->
      """SELECT count(*) AS n_written, count(*) AS n_read, count(*) AS n_hash_matched,
        | CAST(LEAST(1000, count(*)) AS BIGINT) AS n_keys_regex, '8x8' AS probe_shape
        |FROM part WHERE p_partkey % 4 = 0""".stripMargin,
    "q71_png_dir_sink" ->
      """SELECT tier, count(*) AS n_slices, count(*) AS n_files, TRUE AS pixels_match
        |FROM supplier, (SELECT unnest(['HR','LRx2']) AS tier) t
        |GROUP BY tier ORDER BY tier""".stripMargin,
    // q81: the synthesis formula is integer arithmetic (the r < k disc test
    // is exact as an integer square compare), so DuckDB recomputes the
    // pushed axial plane z=2 sum over all 8 volumes; 8 files × 352 header
    // bytes is the S5 contract, counter-measured on the engine side.
    "q81_nifti_dsv2_scan" ->
      """WITH xy AS (SELECT x, y, x + 16*y + 448 AS i
        |            FROM range(16) t1(x), range(14) t2(y)),
        |pv AS (SELECT v,
        |  CAST(sum(CASE WHEN (x-8)*(x-8) + (y-7)*(y-7) < (5 + v%3)*(5 + v%3)
        |       THEN 200 + (i*7 + v*31) % 56 ELSE (i*13 + v*17) % 20 END) AS BIGINT) AS s
        | FROM range(8) tv(v), xy GROUP BY v)
        |SELECT CAST(8 AS BIGINT) AS n_files, CAST(8 * 16 * 14 * 6 AS BIGINT) AS n_voxels,
        | CAST(8 * 352 AS BIGINT) AS header_scan_bytes,
        | CAST(8 AS BIGINT) AS n_pushed_slices,
        | CAST(sum(s) AS BIGINT) AS pushed_px_sum,
        | TRUE AS pushdown_effective
        |FROM pv""".stripMargin
  )
}
