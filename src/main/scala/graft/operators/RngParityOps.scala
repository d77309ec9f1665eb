package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.NumpyRng

/** q208 — bitwise RNG-parity gate, driver-oracle edition.
  *
  * The reference seeds every stochastic kernel from
  * `np.random.default_rng(seed)` (v2/degradation_function_v2.py:430-446,
  * v2/nii_to_lmdb.py:62). [[graft.functions.NumpyRng]] reproduces those
  * streams bit-for-bit on the JVM (NumpyRngSpec pins 1.8M+ draws against
  * numpy-1.26.4 goldens). This query pushes the same claim through the
  * driver's *independent* gate: Spark emits the first `NDraws` uint64
  * draws (and their 53-bit uniform doubles) for `NSeeds` seeds, and the
  * DuckDB oracle RE-DERIVES every value from nothing but the seed —
  * an unrolled SeedSequence pool mix plus a recursive-CTE PCG64 step
  * loop in 32-bit limb arithmetic (DuckDB BIGINTs error on 64-bit
  * overflow rather than wrap, so every uint32 product routes through
  * HUGEINT and the 128-bit LCG multiply is 4-limb schoolbook). A single
  * flipped bit anywhere — pool mixing, seeding order, the 128-bit
  * multiply, XSL-RR rotate, or the double conversion — fails the hash.
  *
  * Scale: stream generation is embarrassingly parallel in the seed (the
  * reference's seeding discipline is per-slice seeds, K13), so the 100 TB
  * form partitions seeds across executors; each stream is a bounded
  * per-row loop with zero shuffle. The uniform double is exact in both
  * engines by construction: (raw >>> 11) is a 53-bit integer (exact in
  * binary64) and the 2^-53 scale is a power of two.
  */
object RngParityOps {

  private val NSeeds = 64
  private val NDraws = 32

  private def q208(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    s.range(NSeeds)
      .repartition(math.min(NSeeds, s.sparkContext.defaultParallelism))
      .as[Long]
      .flatMap { seed =>
        val rng = NumpyRng.defaultRng(seed)
        (1 to NDraws).map { i =>
          val raw = rng.nextUint64()
          val u = (raw >>> 11).toDouble / 9007199254740992.0
          (seed, i, raw, u)
        }
      }
      .toDF("seed", "idx", "raw", "u")
      .orderBy("seed", "idx")
  }

  // ---- DuckDB oracle: SeedSequence -> PCG64 replay in limb arithmetic ----
  //
  // Constants are NumPy's published SeedSequence hash parameters
  // (numpy/random/bit_generator.pyx, BSD-3; originally O'Neill's seed_seq)
  // and the PCG_DEFAULT_MULTIPLIER_128 from the PCG paper (O'Neill 2014).
  // The SQL is mechanical (4-word pool mix unrolled = 16 hashmix/mix
  // steps), so it is generated here rather than hand-written; the
  // generator mirrors NumpyRng.scala step for step.
  private val M32 = 0xffffffffL
  private val InitA = 0x43b0d7e5L
  private val MultA = 0x931e8875L
  private val InitB = 0x8b51f9ddL
  private val MultB = 0x58f38dedL
  private val MixL = 0xca01f9ddL
  private val MixR = 0x4973f715L
  // PCG_DEFAULT_MULTIPLIER_128 = 0x2360ed051fc65da44385df649fccf645
  private val MultLimbs =
    Array(0x9fccf645L, 0x4385df64L, 0x1fc65da4L, 0x2360ed05L)

  private[operators] def oracleSql: String = {
    val cte = scala.collection.mutable.ArrayBuffer.empty[String]
    cte += s"seeds AS (SELECT CAST(range AS BIGINT) AS seed FROM range($NSeeds))"
    cte += s"t0 AS (SELECT seed, seed & $M32 AS a0, CAST(0 AS BIGINT) AS a1, " +
      s"CAST(0 AS BIGINT) AS a2, CAST(0 AS BIGINT) AS a3, " +
      s"CAST($InitA AS BIGINT) AS hc FROM seeds)"
    var prev = "t0"
    var n = 0
    // hashmix(v): v ^= hc; hc = hc*MULT_A mod 2^32; v = v*hc mod 2^32; v ^= v>>16
    def emitHashmix(valCol: String): String = {
      n += 1
      val hcn = s"CAST((CAST(hc AS HUGEINT) * $MultA) % 4294967296 AS BIGINT)"
      val v = s"CAST((CAST(xor($valCol, hc) AS HUGEINT) * $hcn) % 4294967296 AS BIGINT)"
      cte += s"h$n AS (SELECT *, xor($v, $v >> 16) AS v_$n, $hcn AS hc_$n FROM $prev)"
      cte += s"h${n}b AS (SELECT * EXCLUDE (hc, hc_$n), hc_$n AS hc FROM h$n)"
      prev = s"h${n}b"
      s"v_$n"
    }
    // mix(x, y) = (x*MIX_L - y*MIX_R) mod 2^32, then xorshift 16
    def emitMix(xCol: String, yCol: String): String = {
      n += 1
      val r = s"CAST(((CAST($xCol AS HUGEINT) * $MixL) % 4294967296 - " +
        s"(CAST($yCol AS HUGEINT) * $MixR) % 4294967296 + 4294967296) % 4294967296 AS BIGINT)"
      cte += s"x$n AS (SELECT *, xor($r, $r >> 16) AS w_$n FROM $prev)"
      prev = s"x$n"
      s"w_$n"
    }
    // Pool init + full O'Neill mix sweep (entropy = 1 word, pool = 4).
    val pool = new Array[String](4)
    for (i <- 0 until 4) pool(i) = emitHashmix(s"a$i")
    for (iSrc <- 0 until 4; iDst <- 0 until 4 if iSrc != iDst)
      pool(iDst) = emitMix(pool(iDst), emitHashmix(pool(iSrc)))
    // generate_state(4, uint64) = 8 hashed uint32 words under hash const B.
    cte += s"g0 AS (SELECT *, CAST($InitB AS BIGINT) AS gc FROM $prev)"
    prev = "g0"
    val gw = (0 until 8).map { i =>
      n += 1
      val gcn = s"CAST((CAST(gc AS HUGEINT) * $MultB) % 4294967296 AS BIGINT)"
      val u = s"CAST((CAST(xor(${pool(i % 4)}, gc) AS HUGEINT) * $gcn) % 4294967296 AS BIGINT)"
      cte += s"g$n AS (SELECT *, xor($u, $u >> 16) AS u_$n, $gcn AS gc_$n FROM $prev)"
      cte += s"g${n}b AS (SELECT * EXCLUDE (gc, gc_$n), gc_$n AS gc FROM g$n)"
      prev = s"g${n}b"
      s"u_$n"
    }
    // uint64 j has limbs lo32 = words[2j], hi32 = words[2j+1];
    // w(0)=initstate hi, w(1)=initstate lo, w(2)=initseq hi, w(3)=initseq lo.
    cte += s"sd AS (SELECT seed, ${gw(2)} AS s0, ${gw(3)} AS s1, ${gw(0)} AS s2, " +
      s"${gw(1)} AS s3, ${gw(6)} AS q0, ${gw(7)} AS q1, ${gw(4)} AS q2, ${gw(5)} AS q3 FROM $prev)"
    // inc = (initseq << 1) | 1 over 128 bits, limbwise.
    cte += "inc AS (SELECT seed, s0, s1, s2, s3, " +
      s"(((q0 << 1) | 1) & $M32) AS c0, " +
      s"(((q1 << 1) | (q0 >> 31)) & $M32) AS c1, " +
      s"(((q2 << 1) | (q1 >> 31)) & $M32) AS c2, " +
      s"(((q3 << 1) | (q2 >> 31)) & $M32) AS c3 FROM sd)"
    // state*MULT + inc mod 2^128: 4-limb schoolbook with HUGEINT partials.
    def limbMulAdd(s: Seq[String], c: Seq[String]): Seq[String] = {
      val t = (0 until 4).map { k =>
        (0 to k).map(i => s"CAST(${s(i)} AS HUGEINT)*${MultLimbs(k - i)}")
          .mkString("(", " + ", ")")
      }
      val e0 = s"(${t(0)} + ${c(0)})"
      val cr0 = s"($e0 // 4294967296)"
      val e1 = s"(${t(1)} + ${c(1)} + $cr0)"
      val cr1 = s"($e1 // 4294967296)"
      val e2 = s"(${t(2)} + ${c(2)} + $cr1)"
      val cr2 = s"($e2 // 4294967296)"
      Seq(
        s"CAST($e0 % 4294967296 AS BIGINT)",
        s"CAST($e1 % 4294967296 AS BIGINT)",
        s"CAST($e2 % 4294967296 AS BIGINT)",
        s"CAST(((${t(3)} + ${c(3)} + $cr2) % 4294967296) AS BIGINT)")
    }
    // pcg64_set_seed: state=0 -> step (state becomes inc) -> += initstate -> step.
    cte += "st0 AS (SELECT seed, c0, c1, c2, c3, " +
      s"((c0 + s0) & $M32) AS a0, " +
      s"(((c1 + s1) + ((c0 + s0) >> 32)) & $M32) AS a1, " +
      s"(((c2 + s2) + (((c1 + s1) + ((c0 + s0) >> 32)) >> 32)) & $M32) AS a2, " +
      s"(((c3 + s3) + (((c2 + s2) + (((c1 + s1) + ((c0 + s0) >> 32)) >> 32)) >> 32)) & $M32) AS a3 " +
      "FROM inc)"
    val seeded = limbMulAdd(Seq("a0", "a1", "a2", "a3"), Seq("c0", "c1", "c2", "c3"))
    cte += s"st1 AS (SELECT seed, c0, c1, c2, c3, ${seeded(0)} AS p0, ${seeded(1)} AS p1, " +
      s"${seeded(2)} AS p2, ${seeded(3)} AS p3 FROM st0)"
    val step = limbMulAdd(Seq("p0", "p1", "p2", "p3"), Seq("c0", "c1", "c2", "c3"))
    cte += "draws AS (SELECT seed, 0 AS idx, p0, p1, p2, p3, c0, c1, c2, c3 FROM st1 " +
      "UNION ALL " +
      s"SELECT seed, idx+1, ${step(0)}, ${step(1)}, ${step(2)}, ${step(3)}, " +
      s"c0, c1, c2, c3 FROM draws WHERE idx < $NDraws)"
    // XSL-RR output of the post-step state: rotr64(hi64 ^ lo64, hi64 >> 58).
    "WITH RECURSIVE " + cte.mkString(",\n") + ",\n" +
      "outs AS (SELECT seed, idx, xor(p2, p0) AS ylo, xor(p3, p1) AS yhi, " +
      "(p3 >> 26) AS rot FROM draws WHERE idx >= 1),\n" +
      "vals AS (SELECT seed, idx, rot, " +
      "(CAST(yhi AS HUGEINT) * 4294967296 + ylo) AS y FROM outs),\n" +
      "rotd AS (SELECT seed, idx, " +
      "(y >> rot) + ((y % (CAST(1 AS HUGEINT) << rot)) << (64 - rot)) AS r64 FROM vals)\n" +
      "SELECT seed, CAST(idx AS INT) AS idx, " +
      "CAST(CASE WHEN r64 >= CAST(1 AS HUGEINT) << 63 " +
      "THEN r64 - (CAST(1 AS HUGEINT) << 64) ELSE r64 END AS BIGINT) AS raw, " +
      "CAST(r64 >> 11 AS DOUBLE) / 9007199254740992 AS u " +
      "FROM rotd ORDER BY seed, idx"
  }

  /** q209 — the reference's split, exact membership. `plan_slice_split`
    * (v2/nii_to_lmdb.py:47-113) enumerates slice ids in volume × orient ×
    * index order, shuffles positions with `default_rng(seed)`, and cuts by
    * int-floored ratios. [[graft.MriPipeline.planSplitNumpyParity]] draws
    * the same shuffle through NumpyRng, so the engine reproduces the
    * reference's train/val/test partition bit for bit. The universe here
    * is fixed (three volumes, seed 123, the reference's default 0.95/0.03
    * ratios — SF-independent like q51's preset table); the oracle derives
    * the 60-slice universe analytically and pins the three non-train
    * members to the values an independent numpy-1.26.4 replay of the
    * reference's planner produces. MriPipelineSpec sweeps more seeds and a
    * larger universe against full numpy-golden membership. */
  private def q209(s: SparkSession, dir: String): DataFrame = {
    val volumes = Seq(
      ("vol0", (6, 7, 8)), ("vol1", (5, 6, 7)), ("vol2", (4, 5, 6)))
    val ids = graft.MriPipeline.referenceSliceIds(volumes)
    graft.MriPipeline.planSplitNumpyParity(s, ids, seed = 123L)
      .toDF("slice_id", "split")
      .orderBy("slice_id")
  }

  private val q209Oracle: String =
    """WITH vols(base, sy, sz) AS (VALUES ('vol0',7,8),('vol1',6,7),('vol2',5,6)),
      |o(orient) AS (VALUES ('axial'),('coronal'),('sagittal')),
      |u AS (SELECT base || '__' || orient || '__slice_' || lpad(CAST(i AS VARCHAR),3,'0') AS slice_id
      |      FROM vols, o, LATERAL (SELECT unnest(range(CASE WHEN orient='sagittal' THEN sy ELSE sz END)) AS i) t)
      |SELECT slice_id,
      | CASE slice_id WHEN 'vol1__coronal__slice_005' THEN 'val'
      |               WHEN 'vol1__axial__slice_002' THEN 'test'
      |               WHEN 'vol0__coronal__slice_005' THEN 'test'
      |               ELSE 'train' END AS split
      |FROM u ORDER BY slice_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q208_numpy_rng_stream" -> (q208 _),
    "q209_numpy_split_parity" -> (q209 _)
  )

  val oracles: Map[String, String] = Map(
    "q208_numpy_rng_stream" -> oracleSql,
    "q209_numpy_split_parity" -> q209Oracle
  )
}
