package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{Degrade, Image, Rng}
import graft.sources.Nifti

/** MRI-kernel operator surface (SURVEY.md §2.3–2.5) as driver-checkable
  * queries. The pure-math kernels (K14/K15/K24/K27, tiling G2, dark filter
  * P2/P3, normalization K1/K2, SNR algebra K22/K23/K26) are declared over
  * the testdata tables with DuckDB oracles; the FFT/physics pipelines
  * (K4–K12, C1–C4) run as rows-only queries with deterministic seeds —
  * their numeric correctness is covered by ScalaTest (FftSpec/DegradeSpec).
  */
object MriOps {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  /** K14 SPGR/FLASH signal as pure column math over part-derived maps. */
  private def q37(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      // D-suffixed literals: Spark parses bare decimals as DECIMAL, whose
      // truncating arithmetic (and parquet type) breaks oracle parity
      .withColumn("pd", expr("0.5D + (p_size % 10) / 20.0D"))
      .withColumn("t1", expr("0.8D + (p_size % 5) * 0.2D"))
      .withColumn("t2s", expr("0.02D + (p_size % 7) * 0.01D"))
      .withColumn("fa", expr("20.0D * pi() / 180.0D"))
      .withColumn("e1", expr("exp(-0.040D / (t1 + 1e-8))"))
      .withColumn("signal", expr(
        "round(pd * sin(fa) * (1.0 - e1) / (1.0 - e1 * cos(fa) + 1e-8) * exp(-0.0142 / (t2s + 1e-8)), 6)"))
      .select("p_partkey", "pd", "t1", "t2s", "signal")
      .orderBy("p_partkey")

  /** K15 T1/T2* field rescale: the piecewise heuristic as CASE math. */
  private def q38(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .withColumn("b0", expr(
        "CASE p_size % 4 WHEN 0 THEN 3.0D WHEN 1 THEN 1.5D WHEN 2 THEN 5.0D ELSE 7.0D END"))
      .withColumn("s_t1", expr(
        """round(CASE WHEN abs(b0 - 3.0D) < 0.25D THEN 0.80D
          |           WHEN abs(b0 - 1.5D) < 0.25D THEN 0.70D
          |           ELSE 0.70D + 0.10D * (1.0D - (7.0D - b0) / 5.5D) END, 6)""".stripMargin))
      .withColumn("s_t2s", expr(
        """round(CASE WHEN abs(b0 - 3.0D) < 0.25D THEN 1.40D
          |           WHEN abs(b0 - 1.5D) < 0.25D THEN 1.80D
          |           ELSE 1.80D - 0.40D * (1.0D - (7.0D - b0) / 5.5D) END, 6)""".stripMargin))
      .groupBy("b0", "s_t1", "s_t2s").agg(count(lit(1)).as("n"))
      .orderBy("b0")

  /** K24 SNR target power law: 153.03 · (B0/7)^α · f². */
  private def q39(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .withColumn("b0", expr("CASE p_size % 2 WHEN 0 THEN 3.0D ELSE 1.5D END"))
      .withColumn("f", expr("CAST(2 + p_size % 3 AS DOUBLE)"))
      .withColumn("snr_target", expr("round(153.03D * pow(b0 / 7.0D, 1.0D) * f * f, 6)"))
      .groupBy("b0", "f", "snr_target").agg(count(lit(1)).as("n"))
      .orderBy("b0", "f")

  /** K27 lenient field-string parse (lower, strip t, comma→dot, default 3). */
  private def q40(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .withColumn("field_str", expr(
        "CASE p_size % 5 WHEN 0 THEN '3T' WHEN 1 THEN '1.5T' WHEN 2 THEN '1,5t' WHEN 3 THEN '7t' ELSE 'junk' END"))
      .withColumn("b0", expr(
        "coalesce(try_cast(replace(replace(lower(field_str), 't', ''), ',', '.') AS DOUBLE), 3.0D)"))
      .groupBy("field_str", "b0").agg(count(lit(1)).as("n"))
      .orderBy("field_str")

  /** §2.10 key scheme: build `base__orient__slice_iii__HR_sNNN`, normalize by
    * stripping the tier tag (reference patch_utils.py:48-50), prove HR/LR
    * keys join after normalization. */
  private def q41(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .withColumn("base", concat(lit("vol"), (col("l_orderkey") % 10).cast("string")))
      .withColumn("orient", expr(
        "CASE l_linenumber % 3 WHEN 0 THEN 'axial' WHEN 1 THEN 'coronal' ELSE 'sagittal' END"))
      .withColumn("iii", lpad((col("l_partkey") % 640).cast("string"), 3, "0"))
      .withColumn("snum", (col("l_suppkey") % 100).cast("string"))
      .withColumn("hr_key", concat(col("base"), lit("__"), col("orient"), lit("__slice_"),
        col("iii"), lit("__HR_s"), col("snum")))
      .withColumn("lr_key", concat(col("base"), lit("__"), col("orient"), lit("__slice_"),
        col("iii"), lit("__LRx2_s"), col("snum")))
      .withColumn("hr_norm", regexp_replace(col("hr_key"), "__(HR|LRx\\d+)_(s\\d+)$", "__$2"))
      .withColumn("lr_norm", regexp_replace(col("lr_key"), "__(HR|LRx\\d+)_(s\\d+)$", "__$2"))
    // Two branches instead of one mixed distinct/non-distinct agg: the
    // single-agg form expands every row ×2 WITH the two ~40-char normalized
    // strings in tow (measured 2× slower at sf0.1). The distinct-count
    // branch never touches the regex columns — the '__'-joined key is
    // injective on (base, iii, snum), so counting distinct components is
    // value-identical — and the simple agg partial-aggregates in one pass.
    val simple = li.groupBy("orient")
      .agg(sum(when(col("hr_norm") === col("lr_norm"), 1L).otherwise(0L)).as("n_joinable"),
        count(lit(1)).as("n_rows"),
        min("hr_norm").as("min_key"), max("hr_norm").as("max_key"))
    val nk = li.select("orient", "base", "iii", "snum").distinct()
      .groupBy("orient").agg(count(lit(1)).as("n_keys"))
    simple.join(broadcast(nk), Seq("orient"))
      .select(col("orient"), col("n_keys"), col("n_joinable"), col("n_rows"),
        col("min_key"), col("max_key"))
      .orderBy("orient")
  }

  /** G2 tiling grid arithmetic incl. the tail-crop rule, pure Catalyst. */
  private def q42(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .withColumn("h", expr("64 + p_size % 40"))
      .withColumn("w", expr("48 + CAST(p_partkey % 50 AS INT)"))
      .withColumn("nh_base", expr("(h - 16) div 8 + 1"))
      .withColumn("last_h", expr("8 * ((h - 16) div 8)"))
      .withColumn("nh", expr("nh_base + CASE WHEN h - (last_h + 16) > 4 THEN 1 ELSE 0 END"))
      .withColumn("nw_base", expr("(w - 16) div 8 + 1"))
      .withColumn("last_w", expr("8 * ((w - 16) div 8)"))
      .withColumn("nw", expr("nw_base + CASE WHEN w - (last_w + 16) > 4 THEN 1 ELSE 0 END"))
      .withColumn("n_patches", expr("nh * nw"))
      .select(col("p_partkey"), col("h").cast("long").as("h"), col("w").cast("long").as("w"),
        col("nh").cast("long").as("nh"), col("nw").cast("long").as("nw"),
        col("n_patches").cast("long").as("n_patches"))
      .orderBy("p_partkey")

  /** O2/O4 middle-n slice selection + middle pick, via array HOF. */
  private def q43(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .withColumn("z", expr("100 + p_size % 50"))
      .withColumn("mid_idx", expr("CAST(z div 2 AS BIGINT)"))
      .withColumn("n_mid", expr(
        "CAST(size(filter(sequence(0, z - 1), i -> abs(i - z div 2) <= 8)) AS BIGINT)"))
      .select(col("p_partkey"), col("z").cast("long").as("z"), col("mid_idx"), col("n_mid"))
      .orderBy("p_partkey")

  /** K1+A3 per-volume min-max normalize (two-phase agg + join back). */
  private def q44(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val mm = li.groupBy("l_suppkey")
      .agg(min("l_quantity").as("mn"), max("l_quantity").as("mx"))
    li.join(broadcast(mm), Seq("l_suppkey"))
      .withColumn("norm", expr("(l_quantity - mn) / (CASE WHEN mx - mn = 0 THEN 1.0D ELSE mx - mn END) * 255.0D"))
      .groupBy("l_suppkey")
      .agg(count(lit(1)).as("n"), round(avg("norm"), 4).as("avg_norm"),
        round(min("norm"), 4).as("min_norm"), round(max("norm"), 4).as("max_norm"))
      .orderBy("l_suppkey")
  }

  /** K2 robust percentile normalize (p2/p98 clip) per group. The clip
    * thresholds come from the distributed rank-selection
    * (functions.Percentiles.exactByRank) — exact values, no per-group
    * sort-agg buffer, unchanged oracle. */
  private def q45(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val pct = graft.functions.Percentiles.exactByRank(
      li, "l_returnflag", "l_extendedprice", Seq(0.02, 0.98), collapse = false)
    val pp = pct.groupBy("l_returnflag").agg(
      max(when(col("p") === 0.02, col("value"))).as("plo"),
      max(when(col("p") === 0.98, col("value"))).as("phi"))
    li.join(broadcast(pp), Seq("l_returnflag"))
      .withColumn("norm", expr(
        "greatest(least((l_extendedprice - plo) / (phi - plo), 1.0D), 0.0D)"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), round(avg("norm"), 4).as("avg_norm"),
        sum(when(col("norm") === 0.0 || col("norm") === 1.0, 1L).otherwise(0L)).as("n_clipped"))
      .orderBy("l_returnflag")
  }

  /** P2/P3 dark-patch filter over synthesized patches (one per orderkey). */
  private def q46(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .withColumn("px", expr("((l_partkey * 31 + l_suppkey * 7 + l_linenumber) % 256) / 255.0D"))
      .groupBy("l_orderkey")
      .agg(avg(when(col("px") < 20.0 / 255.0, 1.0).otherwise(0.0)).as("dark_frac"),
        count(lit(1)).as("n_px"))
      .select(lit(1).cast("long").as("grp"),
        when(col("dark_frac") > 0.7, 1L).otherwise(0L).as("is_dark"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n_patches"), sum("is_dark").as("n_dark"),
        (count(lit(1)) - sum("is_dark")).as("n_kept"))

  /** K22+K23+K26 SNR algebra: Rayleigh σ from background std, naive and
    * second-moment-corrected SNR, phase σ ≈ 1/SNR. */
  private def q47(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        avg("l_quantity").as("mean_sig"),
        stddev_samp("l_quantity").as("std_sig"),
        avg(expr("l_quantity * l_quantity")).as("m2"))
      .withColumn("sigma_bg", expr("round(std_sig / sqrt((4.0 - pi()) / 2.0), 4)"))
      .withColumn("snr_naive", expr("round(mean_sig / (std_sig + 1e-12), 4)"))
      .withColumn("snr_corrected", expr("round(sqrt(greatest(m2 / 4.0 - 2.0, 0.0)), 4)"))
      .withColumn("phase_sigma", expr("round(1.0 / (mean_sig / (std_sig + 1e-12)), 6)"))
      .select("l_returnflag", "n", "sigma_bg", "snr_naive", "snr_corrected", "phase_sigma")
      .orderBy("l_returnflag")

  /** K26 phase-σ estimation: per-voxel std over repeated measurements
    * (voxel = (partkey, suppkey), repeats = its lineitem rows), mean over
    * the bright-voxel mask, σ_φ ≈ std/mean per voxel
    * (reference v2/estimate_snr.py:294-334). */
  private def q80(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_partkey", "l_suppkey")
      .agg(count(lit(1)).as("n_rep"), avg("l_quantity").as("mu"),
        stddev_samp("l_quantity").as("sd"))
      .filter(col("n_rep") >= 3 && col("mu") > 10.0)
      .agg(count(lit(1)).as("n_voxels"),
        round(avg("sd"), 4).as("mean_voxel_std"),
        round(avg(col("sd") / col("mu")), 6).as("mean_phase_sigma"))

  // ------------- kernel pipelines (structure + invariants oracle-checked)

  /** C3/C4 v2 degradation on deterministic synthetic slices, oracle-checked
    * on everything DuckDB can state exactly: the downsampled geometry
    * (24×20 through the f=2 preset → 12×10) and the two invariants the
    * physics chain must satisfy — K13 retry-stability (the same seed must
    * reproduce the same bytes, the speculative-execution contract) and a
    * bounded output mean. The FFT numerics themselves are golden-tested in
    * DegradeSpec (not SQL-expressible). */
  private def q50(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val parts = graft.Spread.ifNarrow(s,
      t(s, dir, "part").select(col("p_partkey"), col("p_size"))
        .filter(col("p_partkey") % 10 === 0))
      // a narrow source (single small parquet split) with a CPU-heavy
      // per-row kernel: spread across every core before the map; a
      // pre-split source skips the exchange (round 13)
      .as[(Long, Int)]
    parts.map { case (pk, size) =>
      val h = 24; val w = 20
      val img = Array.tabulate(h * w)(i => ((pk * 31 + size * 17 + i * 7) % 256).toFloat / 255f)
      val seed = Rng.sliceSeed(s"part$pk", "axial", size, 123)
      val r = Degrade.degradePreset(img, h, w, "3tFlash", seed)
      val r2 = Degrade.degradePreset(img, h, w, "3tFlash", seed)
      val stable = java.util.Arrays.equals(r.lr, r2.lr) &&
        java.util.Arrays.equals(r.hr, r2.hr)
      val mean = r.lr.map(_.toDouble).sum / r.lr.length
      (pk, r.lrH.toLong, r.lrW.toLong, stable, mean > 0.0 && mean < 2.0)
    }.toDF("p_partkey", "lr_h", "lr_w", "retry_stable", "lr_mean_in_range")
      .orderBy("p_partkey")
  }

  /** C1/C2 v1 preset dispatch over one synthetic slice per preset —
    * oracle-checked on per-preset downsample geometry (24/fatorReducao)
    * and the same K13 retry-stability invariant as q50. */
  private def q51(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Degrade.presetsV1.keys.toSeq.sorted.toDS().map { name =>
      val h = 24; val w = 24
      val img = Array.tabulate(h * w)(i => ((i * 13) % 200).toFloat / 255f)
      val r = Degrade.degradePreset(img, h, w, name, seed = 42)
      val r2 = Degrade.degradePreset(img, h, w, name, seed = 42)
      val stable = java.util.Arrays.equals(r.lr, r2.lr)
      val mean = r.lr.map(_.toDouble).sum / r.lr.length
      (name, r.lrH.toLong, r.lrW.toLong, stable, mean > 0.0 && mean < 2.0)
    }.toDF("preset", "lr_h", "lr_w", "retry_stable", "lr_mean_in_range")
      .orderBy("preset")
  }

  /** S3/G1/G2/P3 end-to-end: synthesize NIfTI volumes in-memory, decode with
    * the NIfTI codec, explode to oriented slices, tile, dark-filter, count
    * (the flagship reference pipeline shape, self-contained). */
  private def q52(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sups = graft.Spread.ifNarrow(s, t(s, dir, "supplier")
        .select(col("s_suppkey"))) // CPU-bound kernel, narrow scan
      .as[Long]
    sups.flatMap { sk =>
      val dims = Array(16, 14, 6)
      val vol = Array.tabulate(dims.product)(i => ((sk * 97 + i * 11) % 256).toFloat)
      val bytes = Nifti.encode(vol, dims, Array(0.2, 0.2, 0.2))
      val (_, decoded) = Nifti.readVolume(bytes)
      val (norm, _, _) = Image.robustPercentileNormalize(decoded, 0.5, 99.5)
      Nifti.Orientations.iterator.map { o =>
        val n = Nifti.sliceCount(dims, o)
        var nPatches = 0L; var nDark = 0L
        (0 until n).foreach { i =>
          val (px, h, w) = Nifti.sliceOf(norm, dims, o, i)
          val (hs, ws) = Image.makeCropSpaces(h, w, 8, 4, 2)
          for (y <- hs; x <- ws) {
            nPatches += 1
            if (Image.patchIsDark(Image.extractPatch(px, h, w, y, x, 8))) nDark += 1
          }
        }
        (sk, o, n.toLong, nPatches, nDark)
      }
    }.toDF("s_suppkey", "orient", "n_slices", "n_patches", "n_dark")
      .orderBy("s_suppkey", "orient")
  }

  /** §2.11 + S1–S4: STREAMING NIfTI ingest end-to-end. Volumes land in a
    * watched dir in two waves; `readStream.format("nifti")` admits each
    * wave as its own micro-batch (offset = admitted-file set), a streaming
    * aggregation accumulates per-(volume, orientation) slice counts and
    * the EXACT voxel sum, and the drained table is hash-compared against
    * DuckDB's analytic re-derivation (voxel values are integers ≤255
    * synthesized from the supplier key, so the float sum is exact in any
    * order and generate_series re-creates it). Proves: incremental
    * admission, stream/batch scan parity, and content integrity — not
    * just geometry (the q52 pattern, upgraded to the streaming path). */
  private def q212(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // bounded driver work: |supplier| keys (metadata); the pixel work all
    // happens in executor tasks of the streaming scan
    val keys = t(s, dir, "supplier").select(col("s_suppkey").cast("long"))
      .as[Long].collect().filter(_ % 25 == 0).sorted
    val stage = graft.Scratch.fresh("nifti_stream_q212_")
    val dims = Array(10, 8, 6)
    def land(sk: Long): Unit = {
      val vol = Array.tabulate(dims.product)(i => ((sk * 97 + i * 11) % 256).toFloat)
      val bytes = Nifti.encode(vol, dims, Array(0.2, 0.2, 0.2))
      val tmp = java.nio.file.Paths.get(stage, f".vol$sk%05d.tmp")
      java.nio.file.Files.write(tmp, bytes)
      java.nio.file.Files.move(tmp, java.nio.file.Paths.get(stage, f"vol$sk%05d.nii"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      ()
    }
    val (wave1, wave2) = keys.partition(k => (k / 25) % 2 == 0)
    wave1.foreach(land)
    // the dedicated drain session carries the stream-scoped shuffle width
    // from creation — no set/restore on the caller (EventStreams.drainSession)
    val ss = graft.streaming.EventStreams.drainSession(s)
    val agg = ss.readStream.format("nifti").option("mode", "slices").load(stage)
      .withColumn("slice_sum", expr("aggregate(pixels, 0D, (a, x) -> a + CAST(x AS DOUBLE))"))
      .groupBy("base", "orient")
      .agg(count(lit(1)).as("n_slices"), sum("slice_sum").as("pix_sum"))
    val q = agg.writeStream.format("memory").queryName("nifti_stream_ingest")
      .outputMode("complete").start()
    try {
      q.processAllAvailable() // wave 1 admitted
      wave2.foreach(land)
      q.processAllAvailable() // wave 2 admitted incrementally
    } finally q.stop()
    ss.table("nifti_stream_ingest")
      .select(regexp_extract(col("base"), "vol(\\d+)", 1).cast("long").as("s_suppkey"),
        col("orient"), col("n_slices"), col("pix_sum").cast("long").as("pix_sum"))
      .orderBy("s_suppkey", "orient")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q212_nifti_stream_ingest" -> (q212 _),
    "q37_spgr_signal" -> (q37 _),
    "q38_tmap_scale" -> (q38 _),
    "q39_snr_target" -> (q39 _),
    "q40_field_parse" -> (q40 _),
    "q41_key_scheme" -> (q41 _),
    "q42_tiling_grid" -> (q42 _),
    "q43_middle_slices" -> (q43 _),
    "q44_minmax_norm" -> (q44 _),
    "q45_robust_norm" -> (q45 _),
    "q46_dark_filter" -> (q46 _),
    "q47_snr_algebra" -> (q47 _),
    "q80_phase_sigma" -> (q80 _),
    "q50_degrade_v2" -> (q50 _),
    "q51_degrade_v1_presets" -> (q51 _),
    "q52_nifti_pipeline" -> (q52 _)
  )

  val oracles: Map[String, String] = Map(
    // analytic re-derivation of the streamed ingest: slice counts from the
    // (10,8,6) geometry, voxel sums from the synthesis formula — every
    // voxel appears in exactly one slice per orientation, so each
    // orientation's sum is the whole volume's sum
    "q212_nifti_stream_ingest" ->
      """WITH keys AS (SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey
        |  FROM supplier WHERE s_suppkey % 25 = 0),
        |px AS (SELECT k.s_suppkey,
        |  CAST(sum((k.s_suppkey * 97 + g.i * 11) % 256) AS BIGINT) AS pix_sum
        |  FROM keys k, (SELECT unnest(generate_series(0, 479)) AS i) g
        |  GROUP BY 1)
        |SELECT k.s_suppkey, o.orient,
        |  CAST(CASE WHEN o.orient = 'sagittal' THEN 8 ELSE 6 END AS BIGINT) AS n_slices,
        |  p.pix_sum
        |FROM keys k
        |JOIN px p USING (s_suppkey),
        |  (SELECT unnest(['axial', 'coronal', 'sagittal']) AS orient) o
        |ORDER BY s_suppkey, orient""".stripMargin,
    // q50–q52 oracle the structural outputs of the kernel pipelines — the
    // downsample geometry, slice counts and tiling-grid sizes DuckDB can
    // derive analytically — plus retry-stability/sanity booleans; the
    // kernel numerics themselves are golden-tested in DegradeSpec/ImageSpec.
    "q50_degrade_v2" ->
      """SELECT p_partkey, CAST(12 AS BIGINT) AS lr_h, CAST(10 AS BIGINT) AS lr_w,
        | TRUE AS retry_stable, TRUE AS lr_mean_in_range
        |FROM part WHERE p_partkey % 10 = 0 ORDER BY p_partkey""".stripMargin,
    "q51_degrade_v1_presets" ->
      """SELECT preset,
        | CAST(24 // f AS BIGINT) AS lr_h, CAST(24 // f AS BIGINT) AS lr_w,
        | TRUE AS retry_stable, TRUE AS lr_mean_in_range
        |FROM (VALUES ('15T_T1W', 3), ('3T_T1W', 2), ('3T_T2STAR', 2), ('3T_fMRI', 4)) p(preset, f)
        |ORDER BY preset""".stripMargin,
    "q52_nifti_pipeline" ->
      """SELECT s_suppkey, o.orient,
        | CAST(CASE WHEN o.orient = 'sagittal' THEN 14 ELSE 6 END AS BIGINT) AS n_slices,
        | CAST(CASE WHEN o.orient = 'sagittal' THEN 42 ELSE 36 END AS BIGINT) AS n_patches,
        | CAST(0 AS BIGINT) AS n_dark
        |FROM supplier, (SELECT unnest(['axial','coronal','sagittal']) AS orient) o
        |ORDER BY s_suppkey, orient""".stripMargin,
    "q80_phase_sigma" ->
      """WITH v AS (SELECT l_partkey, l_suppkey, count(*) AS n_rep,
        |  avg(l_quantity) AS mu, stddev_samp(l_quantity) AS sd
        | FROM lineitem GROUP BY 1,2)
        |SELECT count(*) AS n_voxels, round(avg(sd), 4) AS mean_voxel_std,
        | round(avg(sd / mu), 6) AS mean_phase_sigma
        |FROM v WHERE n_rep >= 3 AND mu > 10.0""".stripMargin,
    "q37_spgr_signal" ->
      """WITH m AS (SELECT p_partkey,
        | 0.5 + (p_size % 10) / 20.0 AS pd,
        | 0.8 + (p_size % 5) * 0.2 AS t1,
        | 0.02 + (p_size % 7) * 0.01 AS t2s,
        | 20.0 * pi() / 180.0 AS fa
        | FROM part),
        |e AS (SELECT *, exp(-0.040 / (t1 + 1e-8)) AS e1 FROM m)
        |SELECT p_partkey, pd, t1, t2s,
        | round(pd * sin(fa) * (1.0 - e1) / (1.0 - e1 * cos(fa) + 1e-8) * exp(-0.0142 / (t2s + 1e-8)), 6) AS signal
        |FROM e ORDER BY p_partkey""".stripMargin,
    "q38_tmap_scale" ->
      """WITH m AS (SELECT
        | CASE p_size % 4 WHEN 0 THEN 3.0 WHEN 1 THEN 1.5 WHEN 2 THEN 5.0 ELSE 7.0 END AS b0
        | FROM part),
        |sc AS (SELECT b0,
        | round(CASE WHEN abs(b0 - 3.0) < 0.25 THEN 0.80
        |            WHEN abs(b0 - 1.5) < 0.25 THEN 0.70
        |            ELSE 0.70 + 0.10 * (1.0 - (7.0 - b0) / 5.5) END, 6) AS s_t1,
        | round(CASE WHEN abs(b0 - 3.0) < 0.25 THEN 1.40
        |            WHEN abs(b0 - 1.5) < 0.25 THEN 1.80
        |            ELSE 1.80 - 0.40 * (1.0 - (7.0 - b0) / 5.5) END, 6) AS s_t2s
        | FROM m)
        |SELECT b0, s_t1, s_t2s, count(*) AS n FROM sc GROUP BY 1,2,3 ORDER BY b0""".stripMargin,
    "q39_snr_target" ->
      """WITH m AS (SELECT
        | CASE p_size % 2 WHEN 0 THEN 3.0 ELSE 1.5 END AS b0,
        | CAST(2 + p_size % 3 AS DOUBLE) AS f
        | FROM part)
        |SELECT b0, f, round(153.03 * pow(b0 / 7.0, 1.0) * f * f, 6) AS snr_target, count(*) AS n
        |FROM m GROUP BY 1,2,3 ORDER BY b0, f""".stripMargin,
    "q40_field_parse" ->
      """WITH m AS (SELECT
        | CASE p_size % 5 WHEN 0 THEN '3T' WHEN 1 THEN '1.5T' WHEN 2 THEN '1,5t' WHEN 3 THEN '7t' ELSE 'junk' END AS field_str
        | FROM part)
        |SELECT field_str,
        | coalesce(TRY_CAST(replace(replace(lower(field_str), 't', ''), ',', '.') AS DOUBLE), 3.0) AS b0,
        | count(*) AS n
        |FROM m GROUP BY 1,2 ORDER BY field_str""".stripMargin,
    "q41_key_scheme" ->
      """WITH k AS (SELECT
        | 'vol' || CAST(l_orderkey % 10 AS VARCHAR) AS base,
        | CASE l_linenumber % 3 WHEN 0 THEN 'axial' WHEN 1 THEN 'coronal' ELSE 'sagittal' END AS orient,
        | lpad(CAST(l_partkey % 640 AS VARCHAR), 3, '0') AS iii,
        | CAST(l_suppkey % 100 AS VARCHAR) AS snum
        | FROM lineitem),
        |kk AS (SELECT orient,
        | base || '__' || orient || '__slice_' || iii || '__HR_s' || snum AS hr_key,
        | base || '__' || orient || '__slice_' || iii || '__LRx2_s' || snum AS lr_key
        | FROM k),
        |n AS (SELECT orient,
        | regexp_replace(hr_key, '__(HR|LRx\d+)_(s\d+)$', '__\2') AS hr_norm,
        | regexp_replace(lr_key, '__(HR|LRx\d+)_(s\d+)$', '__\2') AS lr_norm
        | FROM kk)
        |SELECT orient, count(DISTINCT hr_norm) AS n_keys,
        | CAST(sum(CASE WHEN hr_norm = lr_norm THEN 1 ELSE 0 END) AS BIGINT) AS n_joinable,
        | count(*) AS n_rows, min(hr_norm) AS min_key, max(hr_norm) AS max_key
        |FROM n GROUP BY 1 ORDER BY 1""".stripMargin,
    "q42_tiling_grid" ->
      """WITH m AS (SELECT p_partkey,
        | 64 + p_size % 40 AS h, 48 + CAST(p_partkey % 50 AS INT) AS w
        | FROM part),
        |g AS (SELECT p_partkey, h, w,
        | (h - 16) // 8 + 1 AS nh_base, 8 * ((h - 16) // 8) AS last_h,
        | (w - 16) // 8 + 1 AS nw_base, 8 * ((w - 16) // 8) AS last_w
        | FROM m),
        |f AS (SELECT p_partkey, h, w,
        | nh_base + CASE WHEN h - (last_h + 16) > 4 THEN 1 ELSE 0 END AS nh,
        | nw_base + CASE WHEN w - (last_w + 16) > 4 THEN 1 ELSE 0 END AS nw
        | FROM g)
        |SELECT p_partkey, CAST(h AS BIGINT) AS h, CAST(w AS BIGINT) AS w,
        | CAST(nh AS BIGINT) AS nh, CAST(nw AS BIGINT) AS nw,
        | CAST(nh * nw AS BIGINT) AS n_patches
        |FROM f ORDER BY p_partkey""".stripMargin,
    "q43_middle_slices" ->
      """WITH m AS (SELECT p_partkey, 100 + p_size % 50 AS z FROM part)
        |SELECT p_partkey, CAST(z AS BIGINT) AS z, CAST(z // 2 AS BIGINT) AS mid_idx,
        | CAST(len(list_filter(range(z), i -> abs(i - z // 2) <= 8)) AS BIGINT) AS n_mid
        |FROM m ORDER BY p_partkey""".stripMargin,
    "q44_minmax_norm" ->
      """WITH mm AS (SELECT l_suppkey, min(l_quantity) AS mn, max(l_quantity) AS mx
        |  FROM lineitem GROUP BY 1),
        |n AS (SELECT l.l_suppkey,
        |  (l_quantity - mn) / (CASE WHEN mx - mn = 0 THEN 1.0 ELSE mx - mn END) * 255.0 AS norm
        | FROM lineitem l JOIN mm ON l.l_suppkey = mm.l_suppkey)
        |SELECT l_suppkey, count(*) AS n, round(avg(norm), 4) AS avg_norm,
        | round(min(norm), 4) AS min_norm, round(max(norm), 4) AS max_norm
        |FROM n GROUP BY 1 ORDER BY 1""".stripMargin,
    "q45_robust_norm" ->
      """WITH pp AS (SELECT l_returnflag,
        |  quantile_cont(l_extendedprice, 0.02) AS plo,
        |  quantile_cont(l_extendedprice, 0.98) AS phi
        | FROM lineitem GROUP BY 1),
        |n AS (SELECT l.l_returnflag,
        |  greatest(least((l_extendedprice - plo) / (phi - plo), 1.0), 0.0) AS norm
        | FROM lineitem l JOIN pp ON l.l_returnflag = pp.l_returnflag)
        |SELECT l_returnflag, count(*) AS n, round(avg(norm), 4) AS avg_norm,
        | CAST(sum(CASE WHEN norm = 0.0 OR norm = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
        |FROM n GROUP BY 1 ORDER BY 1""".stripMargin,
    "q46_dark_filter" ->
      """WITH px AS (SELECT l_orderkey,
        |  ((l_partkey * 31 + l_suppkey * 7 + l_linenumber) % 256) / 255.0 AS px
        | FROM lineitem),
        |p AS (SELECT l_orderkey, avg(CASE WHEN px < 20.0/255.0 THEN 1.0 ELSE 0.0 END) AS dark_frac
        | FROM px GROUP BY 1),
        |d AS (SELECT CASE WHEN dark_frac > 0.7 THEN 1 ELSE 0 END AS is_dark FROM p)
        |SELECT CAST(1 AS BIGINT) AS grp, count(*) AS n_patches,
        | CAST(sum(is_dark) AS BIGINT) AS n_dark,
        | count(*) - CAST(sum(is_dark) AS BIGINT) AS n_kept
        |FROM d GROUP BY 1""".stripMargin,
    "q47_snr_algebra" ->
      """WITH a AS (SELECT l_returnflag, count(*) AS n,
        |  avg(l_quantity) AS mean_sig, stddev_samp(l_quantity) AS std_sig,
        |  avg(l_quantity * l_quantity) AS m2
        | FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, n,
        | round(std_sig / sqrt((4.0 - pi()) / 2.0), 4) AS sigma_bg,
        | round(mean_sig / (std_sig + 1e-12), 4) AS snr_naive,
        | round(sqrt(greatest(m2 / 4.0 - 2.0, 0.0)), 4) AS snr_corrected,
        | round(1.0 / (mean_sig / (std_sig + 1e-12)), 6) AS phase_sigma
        |FROM a ORDER BY l_returnflag""".stripMargin
  )
}
