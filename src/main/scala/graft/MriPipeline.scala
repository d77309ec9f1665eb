package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Degrade, Image, Npy, NumpyRng, Rng}
import graft.model._
import graft.sinks.KvStore
import graft.sources.Nifti

/** The library-user surface: the reference's end-to-end dataset-building
  * pipeline as a typed, composable API (SURVEY.md §3.1 restated).
  *
  * A user of the reference's `v2/nii_to_lmdb_paralel.py` maps onto:
  * {{{
  * val sl   = MriPipeline.slices(spark, "/data/niftis")          // S1–S5, G1, K2
  * val plan = MriPipeline.planSplit(sl, seed = 42)               // W1 (metadata-only)
  * val rec  = MriPipeline.degradeToRecords(sl, plan, "3tFlash",
  *              crop = 128, step = 64, seed = 123)               // C3, G2/G3, P3, K28
  * MriPipeline.writeStore(rec, "/out/store")                     // S9 (sharded)
  * }}}
  */
object MriPipeline {

  /** G1: scan a directory of NIfTI volumes into oriented, per-volume
    * robust-normalized slices. */
  def slices(spark: SparkSession, root: String,
      orients: Seq[String] = Nifti.Orientations,
      pmin: Double = 0.5, pmax: Double = 99.5,
      pathPattern: String = ".*\\.nii(\\.gz)?$",
      ignoreCorrupt: Boolean = false): Dataset[Slice] = {
    import spark.implicits._
    Nifti.slices(spark, root, orients, pmin, pmax, pathPattern, ignoreCorrupt)
      .select(col("slice_id").as("sliceId"), col("base"), col("orient"),
        col("idx"), col("h"), col("w"), col("pixels"))
      .as[Slice]
  }

  /** G1 at the 100 TB envelope: oriented, per-volume-normalized slices
    * WITHOUT ever materializing a volume — the lazy-production sibling of
    * [[slices]] (which decodes a whole volume per task: fine below ~10⁸
    * voxels, the wrong envelope at the reference's 2.06 GB volumes). Three
    * slice-bounded passes:
    *   1. per-volume clip points: one mergeable percentile-sketch pass
    *      over the AXIAL planes (each voxel appears in exactly one axial
    *      plane, so the sketch sees the volume exactly once) through the
    *      pushed-down DSv2 plane reads;
    *   2. the (base → vmin, vmax) table — O(#volumes) rows — broadcasts;
    *   3. lazily-read oriented planes normalize per-row against the
    *      broadcast cuts ([[Image.normalizeWithCuts]]).
    * Clip-point estimator per the A4 policy: the same Greenwald-Khanna
    * summary `approx_percentile` uses (rank error ≤ n/accuracy, memory
    * O(accuracy·log n) per volume regardless of volume size), but driven
    * as a PER-PARTITION sketch in a tight loop over each plane's float
    * array rather than a 5·10⁸-row explode through a hash aggregate — the
    * per-value row/group-lookup overhead dominated the whole job (measured
    * ~280 s of a 354 s end-to-end run at this volume; the loop form cuts
    * it ~10×). The reference's np.percentile over an in-RAM volume
    * (v2/nii_to_lmdb_paralel.py:248-257) is the [[slices]] path. A task
    * never holds more than one plane plus a sketch — MriVolumeScaleSpec
    * drives a reference-shaped (960, 840, 640) volume through this into a
    * sharded LMDB store and pins total reads to one clip pass + the
    * processed planes. */
  def slicesLazy(spark: SparkSession, root: String,
      orients: Seq[String] = Nifti.Orientations,
      pmin: Double = 0.5, pmax: Double = 99.5,
      accuracy: Int = graft.functions.Percentiles.DefaultAccuracy): Dataset[Slice] = {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.util.QuantileSummaries
    val relErr = 1.0 / accuracy
    implicit val skEnc: org.apache.spark.sql.Encoder[(String, QuantileSummaries)] =
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.javaSerialization[QuantileSummaries])
    val cuts = Nifti.rawSlices(spark, root)
      .filter(col("orient") === "axial")
      .select(col("base"), col("pixels"))
      .as[(String, Array[Float])]
      .mapPartitions { it =>
        // one sketch per volume seen by this partition; planes stream
        // through one at a time (slice-bounded)
        val sk = scala.collection.mutable.HashMap.empty[String, QuantileSummaries]
        it.foreach { case (b, px) =>
          var s = sk.getOrElse(b,
            new QuantileSummaries(QuantileSummaries.defaultCompressThreshold, relErr))
          var i = 0
          // NaN voxels (post-registration masking) are excluded exactly as
          // the batch path's nanPercentile excludes them — a NaN inserted
          // into the sketch poisons its ordering invariants
          while (i < px.length) {
            val v = px(i)
            if (!v.isNaN) s = s.insert(v.toDouble)
            i += 1
          }
          sk(b) = s
        }
        sk.iterator.map { case (b, s) => (b, s.compress()) }
      }
      .groupByKey(_._1)
      .mapGroups { (b, it) =>
        // mergeable: the shuffle carries O(partitions) tiny sketches per
        // volume, never pixel data. An all-NaN volume leaves the sketch
        // EMPTY — degrade to NaN cuts like the batch path's nanPercentile
        // instead of throwing on query().get
        val merged = it.map(_._2).reduce((a, c) => a.merge(c))
        (b, merged.query(pmin / 100.0).getOrElse(Double.NaN),
          merged.query(pmax / 100.0).getOrElse(Double.NaN))
      }
      .toDF("base", "vmin", "vmax")
    val normalize = udf { (px: Seq[Float], vmin: Double, vmax: Double) =>
      Image.normalizeWithCuts(px.toArray, vmin, vmax)._1
    }
    Nifti.rawSlices(spark, root)
      .filter(col("orient").isin(orients: _*))
      .join(broadcast(cuts), Seq("base"))
      .select(
        // %03d (min-width, like the batch path's f"slice_$i%03d") — NOT
        // lpad, which TRUNCATES idx >= 1000 to 3 chars and collides ids
        // on volumes with 1000+ planes
        concat(col("base"), lit("__"), col("orient"),
          format_string("__slice_%03d", col("idx"))).as("sliceId"),
        col("base"), col("orient"), col("idx"), col("h"), col("w"),
        normalize(col("pixels"), col("vmin"), col("vmax")).as("pixels"))
      .as[Slice]
  }

  /** W1: metadata-only split plan — deterministic hash-cut over xxhash64 of
    * the slice id, ratio cut train/val/test (v2 defaults 0.95/0.03/0.02).
    * Pure per-row hash-cut, not a global rank: a rank needs a
    * single-partition Window over every distinct id (the 100 TB
    * bottleneck); bucket-vs-cutoff holds the ratios in expectation and is
    * retry/repartition-stable. */
  def planSplit(slices: Dataset[Slice], seed: Long = 42,
      ratios: (Double, Double) = (0.95, 0.98)): Dataset[SplitLabel] = {
    val spark = slices.sparkSession
    import spark.implicits._
    val cut1 = math.round(ratios._1 * 1000).toInt
    val cut2 = math.round(ratios._2 * 1000).toInt
    slices.select(col("sliceId")).distinct()
      .withColumn("b", pmod(xxhash64(col("sliceId"), lit(seed)), lit(1000L)))
      .withColumn("split",
        when(col("b") < cut1, "train").when(col("b") < cut2, "val").otherwise("test"))
      .select(col("sliceId"), col("split"))
      .as[SplitLabel]
  }

  /** W1 from METADATA ONLY: derive every slice id from the 352-byte header
    * scan (nifti DSv2) — base name + per-orientation slice counts from
    * `shape` — and hash-cut exactly like [[planSplit]]. This is the
    * reference's planning pass (v2/nii_to_lmdb.py:47-120 plans the split
    * before any pixel is read): at 100 TB the plan costs kilobytes of
    * header IO, and the pixel read can then be pushed down to only the
    * slices a stage actually needs. Produces identical labels to
    * planSplit-over-decoded-slices for the same inputs. */
  def planSplitFromHeaders(spark: SparkSession, root: String, seed: Long = 42,
      ratios: (Double, Double) = (0.95, 0.98),
      orients: Seq[String] = Nifti.Orientations): Dataset[SplitLabel] = {
    import spark.implicits._
    val cut1 = math.round(ratios._1 * 1000).toInt
    val cut2 = math.round(ratios._2 * 1000).toInt
    val orientArr = orients.map(o => s"'$o'").mkString("array(", ", ", ")")
    Nifti.headers(spark, root)
      .select(regexp_replace(element_at(split(col("path"), "/"), -1),
        "\\.nii(\\.gz)?$", "").as("base"), col("shape"))
      .select(col("base"), explode(expr(orientArr)).as("orient"), col("shape"))
      .select(col("base"), col("orient"),
        explode(expr("sequence(0, CASE WHEN orient = 'sagittal' THEN shape[1] - 1 ELSE shape[2] - 1 END)")).as("idx"))
      // %03d min-width, same as the slice producers — lpad TRUNCATES idx
      // >= 1000 and the plan's labels would stop matching real slice ids
      .select(concat(col("base"), lit("__"), col("orient"),
        format_string("__slice_%03d", col("idx"))).as("sliceId"))
      .withColumn("b", pmod(xxhash64(col("sliceId"), lit(seed)), lit(1000L)))
      .withColumn("split",
        when(col("b") < cut1, "train").when(col("b") < cut2, "val").otherwise("test"))
      .select(col("sliceId"), col("split"))
      .as[SplitLabel]
  }

  /** The reference's slice-id enumeration order (v2/nii_to_lmdb.py:68-89):
    * volumes in list order, orientations in caller order, slice index
    * ascending; axial/coronal slice along Z, sagittal along Y. The ORDER
    * is load-bearing for [[planSplitNumpyParity]] — the shuffle permutes
    * positions in exactly this sequence. */
  def referenceSliceIds(volumes: Seq[(String, (Int, Int, Int))],
      orients: Seq[String] = Nifti.Orientations): Seq[String] =
    for {
      (base, (_, sy, sz)) <- volumes
      orient <- orients
      n = if (orient == "sagittal") sy else sz
      i <- 0 until n
    } yield f"$base%s__$orient%s__slice_$i%03d"

  /** W1 with the reference's EXACT membership: `default_rng(seed)` shuffle
    * of the slice-id positions, then ratio cuts with int() floors
    * (v2/nii_to_lmdb.py:100-113, split_ratio=(0.95, 0.03, 0.02)) — drawn
    * through [[graft.functions.NumpyRng]], so every slice lands in the
    * SAME split the reference would put it in, bit for bit. A user
    * switching to this engine reproduces their existing train/val/test
    * partition exactly.
    *
    * Scale envelope: Fisher–Yates is inherently sequential, so the
    * permutation runs on the driver over the id list — the same envelope
    * as the reference itself, which plans the split in one process from
    * headers alone (an id list is ~60 B/slice; 10M slices ≈ 600 MB —
    * far above the reference's own corpora). Past that, the hash-cut
    * [[planSplit]] is the 100 TB form (retry-stable, shuffle-free, but
    * its membership is this engine's own spec, not the reference's). */
  def planSplitNumpyParity(spark: SparkSession, sliceIds: Seq[String],
      seed: Long, trainRatio: Double = 0.95,
      valRatio: Double = 0.03): Dataset[SplitLabel] = {
    import spark.implicits._
    val n = sliceIds.length
    val idxs = NumpyRng.defaultRng(seed).permutation(n)
    val nTr = (n * trainRatio).toInt
    val nVa = (n * valRatio).toInt
    val labels = new Array[String](n)
    var p = 0
    while (p < n) {
      labels(idxs(p)) = if (p < nTr) "train" else if (p < nTr + nVa) "val" else "test"
      p += 1
    }
    spark.createDataset(sliceIds.indices.map(i => SplitLabel(sliceIds(i), labels(i))))
  }

  /** C3 + G2/G3 + P3 + K28: degrade each slice, tile HR and LR on aligned
    * grids, drop dark HR patches and gate LR on HR approval (the J1 key
    * discipline), emit `.npy`-encoded store records. */
  /** seedMode: "slice" = per-slice seeds (v2-parallel, K13 — the default);
    * "run" = one seed for every slice (v2-serial semantics,
    * v2/nii_to_lmdb.py:233,268 — preserved as a config switch per
    * SURVEY.md §2.12). lrMode: "physics" = k-space degradation (C3);
    * "naive" = area-resize sampler (C5, create_sample.py:71-78). */
  def degradeToRecords(slices: Dataset[Slice], split: Dataset[SplitLabel],
      preset: String, crop: Int, step: Int, threshSize: Int = 0,
      darkThr: Double = 20.0 / 255.0, darkPct: Double = 0.7,
      seed: Long = 123, seedMode: String = "slice",
      lrMode: String = "physics"): Dataset[KvRecord] = {
    require(seedMode == "slice" || seedMode == "run", s"seedMode slice|run, got $seedMode")
    require(lrMode == "physics" || lrMode == "naive", s"lrMode physics|naive, got $lrMode")
    val spark = slices.sparkSession
    import spark.implicits._
    val p = Degrade.preset(preset)
    val scale = p.fatorReducao
    // the split PLAN broadcasts (one ~60 B row per slice id — ~600 MB even
    // at 10M slices): shuffling the pixel-bearing slice rows into a
    // sort-merge join instead measured +500 s on one reference volume
    // (6 GB of planes through sort+spill), and at 100 TB it would shuffle
    // the whole corpus to attach a label
    slices.joinWith(broadcast(split), slices("sliceId") === split("sliceId"))
      .flatMap { case (sl, lbl) =>
        val sliceSeed =
          if (seedMode == "slice") Rng.sliceSeed(sl.base, sl.orient, sl.idx, seed) else seed
        val r =
          if (lrMode == "physics") Degrade.degradePreset(sl.pixels, sl.h, sl.w, preset, sliceSeed)
          else {
            // C5 naive sampler: top-left trim to a scale-divisible grid,
            // then area (box) resize — no physics
            val lh = sl.h / scale; val lw = sl.w / scale
            val cropH = lh * scale; val cropW = lw * scale
            val base = new Array[Float](cropH * cropW)
            var y = 0
            while (y < cropH) {
              System.arraycopy(sl.pixels, y * sl.w, base, y * cropW, cropW)
              y += 1
            }
            Degrade.Result(sl.pixels, Image.resizeArea(base, cropH, cropW, lh, lw), lh, lw,
              Map("lr_mode" -> "naive"))
          }
        val (hs, ws) = Image.makeCropSpaces(sl.h, sl.w, crop, step, threshSize)
        val out = scala.collection.mutable.ArrayBuffer.empty[KvRecord]
        var s = 1
        for (y <- hs; x <- ws) {
          val hr = Image.extractPatch(sl.pixels, sl.h, sl.w, y, x, crop)
          // P3 dark gate on HR; LR inherits approval via the shared key (J1)
          if (!Image.patchIsDark(hr, darkThr, darkPct)) {
            val key = f"${sl.sliceId}__s$s%03d"
            out += KvRecord(s"${lbl.split}/HR/$key", Npy.encode(hr, Seq(crop, crop)),
              Seq(crop, crop, 1), "float32")
            val lc = math.max(1, crop / scale)
            val lr = Image.extractPatch(r.lr, r.lrH, r.lrW,
              math.min(y / scale, math.max(0, r.lrH - lc)),
              math.min(x / scale, math.max(0, r.lrW - lc)), lc)
            out += KvRecord(s"${lbl.split}/LRx$scale/$key", Npy.encode(lr, Seq(lc, lc)),
              Seq(lc, lc, 1), "float32")
          }
          s += 1
        }
        out
      }
  }

  /** S9: distributed sharded store write (one writer per partition), plus
    * an optional run-level manifest (S13). `format = "lmdb"` lands the
    * records as byte-genuine LMDB environments (one `data.mdb` per shard,
    * [[graft.sinks.LmdbStore]]) that a stock liblmdb trainer can open —
    * the interop-true form of the reference's v2 store
    * (v2/nii_to_lmdb_paralel.py:298-305); `"kvstore"` (default) keeps the
    * Hadoop-FS sharded layout for hdfs://s3a:// destinations. */
  def writeStore(records: Dataset[KvRecord], path: String,
      meta: Seq[(String, String)] = Nil, format: String = "kvstore"): Unit = {
    format match {
      case "kvstore" => KvStore.write(records.toDF(), path)
      case "lmdb" => graft.sinks.LmdbStore.write(
        records.toDF().select("key", "value"), path)
      case other => throw new IllegalArgumentException(
        s"unknown store format '$other' (kvstore|lmdb)")
    }
    if (meta.nonEmpty) writeRunMeta(path, meta)
  }

  /** Continuous form of the flagship job (the reference re-runs
    * `v2/nii_to_lmdb_paralel.py` over the whole input dir per new scan
    * session): watch `landingDir` with a HEADERS-mode NIfTI stream
    * (352 bytes per new file — the watch never touches payload), and per
    * micro-batch run the batch pipeline over exactly the NEW volumes and
    * append to one genuine-LMDB store under the micro-batch's id.
    *
    * Exactly-once end to end: land volumes by atomic rename; give a
    * `checkpoint` dir and a crashed/restarted query replays its
    * uncommitted batch from the offset log while
    * [[graft.sinks.LmdbStore.appendBatch]]'s ledger no-ops anything the
    * store already has. Per-slice seeding + the hash-cut split make the
    * appended records identical to what a batch rebuild would produce
    * (StreamingVolumePipelineSpec pins this byte-for-byte).
    *
    * The per-batch path collection is bounded metadata (the NEW file
    * names); all pixel work runs in the pipeline's executor tasks. */
  def streamIngest(spark: SparkSession, landingDir: String, store: String,
      preset: String = "3tFlash", crop: Int = 128, step: Int = 64,
      seed: Long = 123, splitSeed: Long = 42, checkpoint: Option[String] = None,
      maxFilesPerTrigger: Option[Int] = None, ignoreCorrupt: Boolean = false,
      pathPattern: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    if (!new java.io.File(store, "_MANIFEST").exists())
      graft.sinks.LmdbStore.create(store)
    val reader = spark.readStream.format("nifti").option("mode", "headers")
      .option("ignoreCorrupt", ignoreCorrupt)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    pathPattern.foreach(p => reader.option("pathPattern", p))
    val writer = reader.load(landingDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val paths = batch.select("path").collect().map(_.getString(0)).sorted
        if (paths.nonEmpty) {
          val scope = Scratch.freshPath("ingest_batch_")
          try {
            paths.zipWithIndex.foreach { case (p, i) =>
              // Hadoop Path strings are UNENCODED (a space stays a space),
              // so java.net.URI(p) would throw; Path.toUri.getPath decodes
              // safely for any local path shape. One subdir per file: the
              // landing listing is recursive, so two subdirectories may
              // legally hold the same basename (volume ids must still be
              // corpus-unique for distinct record keys, as in the batch
              // pipeline — but a name clash must not crash the stream).
              val local = java.nio.file.Paths.get(
                new org.apache.hadoop.fs.Path(p).toUri.getPath)
              val sub = java.nio.file.Files.createDirectory(
                scope.resolve(f"f$i%05d"))
              java.nio.file.Files.createSymbolicLink(
                sub.resolve(local.getFileName.toString), local)
            }
            // pattern ".*": the scope holds EXACTLY the admitted files, so
            // the inner read must not re-filter (a custom watch pathPattern
            // would otherwise admit files the default inner pattern drops —
            // ledger-committed but never ingested); ignoreCorrupt passes
            // through so a payload-corrupt file skips instead of poisoning
            // the replayed batch forever
            val sl = slices(spark, scope.toString, pathPattern = ".*",
              ignoreCorrupt = ignoreCorrupt)
            val rec = degradeToRecords(sl, planSplit(sl, splitSeed), preset, crop, step,
              seed = seed)
            graft.sinks.LmdbStore.appendBatch(
              rec.toDF().select(col("key"), col("value")), store, batchId)
            ()
          } finally {
            // a 24/7 ingest must not leak one symlink dir per micro-batch
            // until JVM exit
            Scratch.delete(scope)
          }
        }
        ()
      }
    // The store's batch ledger dedups on the STREAM's batchId, which is
    // only unique within one checkpoint lineage — a restart with a fresh
    // checkpoint restarts ids at 0 and the ledger would silently no-op
    // every new batch as a "replay". So the DEFAULT checkpoint lives
    // inside the store itself (dot-named: invisible to the manifest walk
    // and the orphan sweep): same store → same lineage, restarts resume
    // from the offset log. Callers overriding `checkpoint` own keeping
    // that pairing stable.
    writer.option("checkpointLocation",
      checkpoint.getOrElse(new java.io.File(store, "._ingest_ckpt").getAbsolutePath))
    writer.start()
  }

  /** S13 run-level manifest: the `dataset_meta.txt` analog
    * (v2/nii_to_lmdb.py:306-323) — one `k: v` line per config entry, written
    * next to the shards so a store is self-describing. */
  def writeRunMeta(path: String, meta: Seq[(String, String)]): Unit =
    KvStore.writeText(path, "dataset_meta.txt",
      meta.map { case (k, v) => s"$k: $v" }.mkString("", "\n", "\n"))

  /** Read the run manifest back as typed rows. */
  def readRunMeta(spark: SparkSession, path: String): Dataset[RunMeta] = {
    import spark.implicits._
    KvStore.readText(path, "dataset_meta.txt")
      .split('\n').toIndexedSeq.filter(_.nonEmpty)
      .map { line =>
        val i = line.indexOf(": ")
        RunMeta(line.substring(0, i), line.substring(i + 2))
      }.toDS()
  }

  /** A1/A2: per-split run counters from a written record set. */
  def runStats(records: Dataset[KvRecord]): DataFrame =
    records.toDF()
      .withColumn("split", split_part(col("key"), lit("/"), lit(1)))
      .withColumn("tier", split_part(col("key"), lit("/"), lit(2)))
      .groupBy("split", "tier")
      .agg(count(lit(1)).as("n_patches"), sum(length(col("value"))).as("bytes"))
      .orderBy("split", "tier")
}
