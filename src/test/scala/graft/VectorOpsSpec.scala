package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorOps

/** Embedding-graph tier: q192's mutual-kNN 3-core checked against an
  * INDEPENDENT in-JVM recomputation (cosines, kNN ranking, mutuality,
  * and the full peel loop re-derived outside Spark), so a shared logic
  * error cannot self-confirm.
  */
class VectorOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("q192: mutual-5NN 3-core matches an in-JVM peel to fixpoint") {
    val got = VectorOps.queries("q192_knn_core")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

    val embs = Tables(spark, dir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

    // same accumulation order as graft_cosine + round(,6) HALF_UP
    def cos6(a: Array[Float], b: Array[Float]): BigDecimal = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      BigDecimal(dot / math.sqrt(na * nb)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }

    val knn: Map[Long, Set[Long]] = embs.map { case (id, v) =>
      val top = embs.filter(_._1 != id)
        .map { case (oid, ov) => (cos6(v, ov), oid) }
        .sortBy { case (c, oid) => (-c, oid) }
        .take(5).map(_._2).toSet
      id -> top
    }.toMap

    val mutual = scala.collection.mutable.Map[Long, Set[Long]]()
    for ((a, nbrs) <- knn; b <- nbrs if knn(b).contains(a)) {
      mutual(a) = mutual.getOrElse(a, Set.empty) + b
    }

    var alive: Set[Long] = mutual.keySet.toSet
    var stable = false
    while (!stable) {
      val next = alive.filter(n => (mutual(n) & alive).size >= 3)
      stable = next == alive
      alive = next
    }
    val want = alive.map(n => n -> (mutual(n) & alive).size.toLong).toMap

    assert(got == want)
    // every survivor really has >= 3 surviving mutual neighbors
    assert(want.values.forall(_ >= 3L))
  }

  test("knnCore ≡ in-JVM fixpoint on random vector sets (peel-depth sweep)") {
    import spark.implicits._
    val rand = new scala.util.Random(20260813L)
    for (round <- 1 to 5) {
      // low dim + clustered offsets force dense mutual neighborhoods with
      // fringes that peel over several rounds
      val n = 40 + rand.nextInt(40)
      val vecs = (1 to n).map { i =>
        val c = rand.nextInt(3) * 4.0f
        (i.toLong, Array.fill(4)(c + rand.nextFloat()))
      }
      val got = operators.VectorOps.knnCore(spark,
          vecs.toDF("vec_id", "embedding"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

      def cos6(a: Array[Float], b: Array[Float]): BigDecimal = {
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) {
          dot += a(i).toDouble * b(i).toDouble
          na += a(i).toDouble * a(i).toDouble
          nb += b(i).toDouble * b(i).toDouble
          i += 1
        }
        BigDecimal(dot / math.sqrt(na * nb)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      }
      val knn = vecs.map { case (id, v) =>
        id -> vecs.filter(_._1 != id)
          .map { case (oid, ov) => (cos6(v, ov), oid) }
          .sortBy { case (c, oid) => (-c, oid) }.take(5).map(_._2).toSet
      }.toMap
      val mutual = scala.collection.mutable.Map[Long, Set[Long]]()
      for ((a, nbrs) <- knn; b <- nbrs if knn(b).contains(a))
        mutual(a) = mutual.getOrElse(a, Set.empty) + b
      var alive: Set[Long] = mutual.keySet.toSet
      var stable = false
      while (!stable) {
        val next = alive.filter(x => (mutual(x) & alive).size >= 3)
        stable = next == alive
        alive = next
      }
      val want = alive.map(x => x -> (mutual(x) & alive).size.toLong).toMap
      assert(got == want, s"round $round (n=$n)")
    }
  }

  /** In-JVM replica of bands4x16 (quantize ×1000 HALF_UP, integer plane
    * dots, sign bits) — independent of the Spark UDF. */
  private def bandsJvm(e: Array[Float]): Array[Long] = {
    val q = e.map(x => java.math.BigDecimal.valueOf(x.toDouble * 1000.0)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue())
    Array.tabulate(4) { k =>
      (0 until 16).foldLeft(0L) { (bv, j) =>
        val plane = (k * 16 + j) * 37
        val s = q.indices.map(d => q(d) * (((plane + d * 101) % 19) - 9)).sum
        if (s > 0) bv | (1L << j) else bv
      }
    }
  }

  private def cos6J(a: Array[Float], b: Array[Float]): BigDecimal = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    BigDecimal(dot / math.sqrt(na * nb)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
  }

  /** In-JVM knnCore over an explicit candidate-pair set (None = all pairs). */
  private def coreJvm(vecs: Seq[(Long, Array[Float])],
      cand: Option[Set[(Long, Long)]]): Map[Long, Long] = {
    def isCand(a: Long, b: Long) =
      cand.forall(c => c.contains((math.min(a, b), math.max(a, b))))
    val knn = vecs.map { case (id, v) =>
      id -> vecs.filter(o => o._1 != id && isCand(id, o._1))
        .map { case (oid, ov) => (cos6J(v, ov), oid) }
        .sortBy { case (c, oid) => (-c, oid) }.take(5).map(_._2).toSet
    }.toMap
    val mutual = scala.collection.mutable.Map[Long, Set[Long]]()
    for ((a, nbrs) <- knn; b <- nbrs if knn(b).contains(a))
      mutual(a) = mutual.getOrElse(a, Set.empty) + b
    var alive: Set[Long] = mutual.keySet.toSet
    var stable = false
    while (!stable) {
      val next = alive.filter(x => (mutual(x) & alive).size >= 3)
      stable = next == alive
      alive = next
    }
    alive.map(x => x -> (mutual(x) & alive).size.toLong).toMap
  }

  /** In-JVM mutual-5NN EDGE set over an explicit candidate-pair set
    * (None = all pairs) — the recall numerator/denominator for the
    * banded/multi-probe forms. */
  private def mutualEdgesJvm(vecs: Seq[(Long, Array[Float])],
      cand: Option[Set[(Long, Long)]]): Set[(Long, Long)] = {
    def isCand(a: Long, b: Long) =
      cand.forall(c => c.contains((math.min(a, b), math.max(a, b))))
    val knn = vecs.map { case (id, v) =>
      id -> vecs.filter(o => o._1 != id && isCand(id, o._1))
        .map { case (oid, ov) => (cos6J(v, ov), oid) }
        .sortBy { case (c, oid) => (-c, oid) }.take(5).map(_._2).toSet
    }.toMap
    (for ((a, nbrs) <- knn; b <- nbrs if a < b && knn(b).contains(a))
      yield (a, b)).toSet
  }

  test("q255 multi-probe: Spark graph == in-JVM Hamming-1 recomputation; " +
      "mutual-edge recall lift vs exact measured") {
    val embs = Tables(spark, dir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    val bands = embs.map { case (id, v) => id -> bandsJvm(v) }.toMap
    def candAt(maxHamming: Int): Set[(Long, Long)] = (for {
      (a, _) <- embs; (b, _) <- embs if a < b
      if (0 until 4).exists(k =>
        java.lang.Long.bitCount(bands(a)(k) ^ bands(b)(k)) <= maxHamming)
    } yield (a, b)).toSet
    val cand0 = candAt(0) // q202's single-probe collisions
    val cand1 = candAt(1) // q255's Hamming-1 expansion
    // superset by construction (j=16 keeps the exact bucket) — and the
    // Spark graph matches the in-JVM recomputation over cand1
    assert(cand0.subsetOf(cand1))
    val want = coreJvm(embs, Some(cand1))
    val got = operators.VectorOps.queries("q255_knn_core_banded_mp")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == want)
    // the measurement the multi-probe exists for: mutual-edge recall vs
    // the EXACT graph, single-probe vs Hamming-1 (recorded in SURVEY)
    val exact = mutualEdgesJvm(embs, None)
    val r0 = mutualEdgesJvm(embs, Some(cand0))
    val r1 = mutualEdgesJvm(embs, Some(cand1))
    val recall0 = (r0 & exact).size.toDouble / exact.size
    val recall1 = (r1 & exact).size.toDouble / exact.size
    info(f"sf0.001: exact mutual edges=${exact.size}, " +
      f"banded recall=$recall0%.3f (${(r0 & exact).size}), " +
      f"multi-probe recall=$recall1%.3f (${(r1 & exact).size}), " +
      f"candidates ${cand0.size} -> ${cand1.size}")
    // Hamming-1 probing must genuinely widen coverage on this corpus and
    // never lose exact-graph edges relative to single-probe
    assert(cand1.size > cand0.size,
      "multi-probe expanded nothing — the probe sweep is dead")
    assert(recall1 >= recall0,
      f"multi-probe recall $recall1%.3f regressed below banded $recall0%.3f")
  }

  test("q202 banded: Spark graph == in-JVM band-candidate recomputation on sf0.001") {
    val embs = Tables(spark, dir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    val bands = embs.map { case (id, v) => id -> bandsJvm(v) }.toMap
    val cand = (for {
      (a, _) <- embs; (b, _) <- embs if a < b
      if (0 until 4).exists(k => bands(a)(k) == bands(b)(k))
    } yield (a, b)).toSet
    val want = coreJvm(embs, Some(cand))
    val got = operators.VectorOps.queries("q202_knn_core_banded")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == want)
    // and the banded candidate set really is sub-quadratic on this corpus
    assert(cand.size < embs.size * (embs.size - 1) / 20,
      s"banding degenerated to near-all-pairs: ${cand.size}")
  }

  test("banded knnCore == exact knnCore on clustered corpora; recall documented on random ones") {
    import spark.implicits._
    val rand = new scala.util.Random(20260813L)
    // clustered: tight clusters far apart — every top-5 neighbor is a
    // near-duplicate, band signs agree, banded == exact (the near-dup
    // use-case the banded form exists for)
    val nClusters = 4
    val dim = 6
    val centers = Seq.fill(nClusters)(Array.fill(dim)(rand.nextFloat() * 8f - 4f))
      .map(c => if (c.forall(x => math.abs(x) < 0.5f)) c.map(_ + 2f) else c)
    val clustered = (0 until 48).map { i =>
      val c = centers(i % nClusters)
      (i.toLong, c.map(x => x + (rand.nextFloat() - 0.5f) * 1e-3f))
    }
    val exact = operators.VectorOps.knnCore(spark,
        clustered.toDF("vec_id", "embedding"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val banded = operators.VectorOps.knnCore(spark,
        clustered.toDF("vec_id", "embedding"), bandedCandidates = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(banded == exact)
    assert(exact.nonEmpty) // the clusters really form cores

    // near-orthogonal random vectors: banding is NOT a drop-in — measure
    // the mutual-edge recall and pin the documented divergence (this is
    // why q202 has its own oracle instead of replacing q192's)
    val randomVecs = (0 until 60).map(i =>
      (i.toLong, Array.fill(16)(rand.nextFloat() * 2f - 1f)))
    val bandsR = randomVecs.map { case (id, v) => id -> bandsJvm(v) }.toMap
    val candR = (for {
      (a, _) <- randomVecs; (b, _) <- randomVecs if a < b
      if (0 until 4).exists(k => bandsR(a)(k) == bandsR(b)(k))
    } yield (a, b)).toSet
    val nPairs = randomVecs.size * (randomVecs.size - 1) / 2
    assert(candR.size < nPairs,
      "random corpus should drop at least some pairs from the candidate set")
  }

  test("knnCore degenerates: total peel to empty, and a complete graph that survives whole") {
    import spark.implicits._
    // 3 mutually-nearest vectors: complete mutual graph of degree 2 < 3 —
    // one round peels everything; the loop must converge on the empty set
    val tri = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)), (3L, Array(0.8f, 0.2f)))
    assert(operators.VectorOps.knnCore(spark, tri.toDF("vec_id", "embedding")).count() == 0L)
    // 5 near-identical vectors: complete mutual-5NN graph, degree 4 >= 3 —
    // nothing peels, every core degree is n-1
    val full = (1 to 5).map(i => (i.toLong, Array(1.0f, i * 1e-4f)))
    val got = operators.VectorOps.knnCore(spark, full.toDF("vec_id", "embedding"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == (1 to 5).map(i => i.toLong -> 4L).toMap)
  }

  test("ivfPqTopK: exact 10-per-probe shape, no self, no dups, refine subset of shortlist cells") {
    val dir = "/root/testdata/sf0.001"
    val rows = operators.VectorOps.ivfPqTopK(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byProbe = rows.groupBy(_._1)
    assert(byProbe.nonEmpty)
    byProbe.foreach { case (p, rs) =>
      assert(rs.length == 10, s"probe $p returned ${rs.length} != 10")
      assert(rs.map(_._2).sorted.toSeq == (1L to 10L), s"probe $p ranks not 1..10")
      assert(!rs.exists(_._3 == p), s"probe $p returned itself")
      assert(rs.map(_._3).distinct.length == 10, s"probe $p returned duplicates")
    }
    // determinism: a second full run (fresh codebooks, fresh encode)
    // reproduces the exact ranking — no RNG anywhere in the path
    val again = operators.VectorOps.ivfPqTopK(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == again.toSeq, "IVF-PQ ranking must be retry-identical")
  }

  test("q236: sampled Hadamard rows are pairwise orthogonal (H construction pin)") {
    val rows = (0 until 16).map(j => 4 * j + 1)
    for (a <- rows; b <- rows if a != b) {
      val dot = (0 until 64).map { i =>
        val ha = if (Integer.bitCount(i & a) % 2 == 0) 1 else -1
        val hb = if (Integer.bitCount(i & b) % 2 == 0) 1 else -1
        ha * hb
      }.sum
      assert(dot == 0, s"rows $a,$b not orthogonal (dot=$dot)")
    }
  }

  test("q236: distortion histogram matches a pure-JVM recomputation") {
    val got = operators.VectorOps.queries("q236_jl_projection")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // independent path: collect raw embeddings, recompute D/H/projection/
    // cosines/buckets without any Spark machinery
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    val d = Array.tabulate(64) { i =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"jl_$i".getBytes("UTF-8"))
      if ((md(0) & 0x80) == 0) 1.0 else -1.0
    }
    def proj(x: Array[Float]): Array[Double] = Array.tabulate(16) { j =>
      val r = 4 * j + 1
      (0 until 64).map(i =>
        x(i).toDouble * d(i) * (if (Integer.bitCount(i & r) % 2 == 0) 1.0 else -1.0)).sum
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.indices.map(i => a(i) * b(i)).sum
      dot / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val ys = emb.map { case (id, x) => (id, proj(x)) }.toMap
    val xs = emb.map { case (id, x) => (id, x.map(_.toDouble)) }.toMap
    val exp = scala.collection.mutable.Map.empty[Long, Long]
    for ((p, _) <- emb if p % 100 == 0; (v, _) <- emb if v != p) {
      val ce = BigDecimal(cos(xs(p), xs(v))).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val cp = BigDecimal(cos(ys(p), ys(v))).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val bucket = math.floor(math.abs(ce - cp) * 20).toLong
      exp(bucket) = exp.getOrElse(bucket, 0L) + 1L
    }
    assert(got == exp.toMap, s"got $got\nexpected $exp")
  }

  test("band-width refinement: each 16-bit band value is the concatenation of its 8-bit halves") {
    import org.apache.spark.sql.functions._
    // the q257 chart prices REGROUPINGS of one 64-plane bit set; the
    // operators must band the SAME bits, or the chart prices an index
    // nobody runs — 16-bit band k covers planes 16k..16k+15, i.e. 8-bit
    // bands 2k (low byte) and 2k+1 (high byte)
    val emb = Tables(spark, dir, "embeddings").select("vec_id", "embedding")
    val b16 = VectorOps.bandProject(emb).withColumnRenamed("bv", "bv16")
    val b8 = VectorOps.bandProject(emb, width = 8)
    val lo = b8.filter(col("bk") % 2 === 0)
      .select(col("vec_id"), (col("bk") / 2).cast("long").as("bk"), col("bv").as("lov"))
    val hi = b8.filter(col("bk") % 2 === 1)
      .select(col("vec_id"), ((col("bk") - 1) / 2).cast("long").as("bk"), col("bv").as("hiv"))
    val joined = b16.join(lo, Seq("vec_id", "bk")).join(hi, Seq("vec_id", "bk"))
    val n16 = b16.count()
    assert(n16 > 0 && joined.count() == n16, "every 16-bit band needs both 8-bit halves")
    assert(joined.filter(col("bv16") =!= col("lov") + col("hiv") * 256).count() == 0,
      "8x8 banding must regroup the same 64 sign bits as 4x16")
  }

  test("chart-chosen 8x8 screen dominates 4x16 per label: candidates and catches are monotone") {
    // provable refinement: vectors agreeing on all 16 bits of a band agree
    // on both 8-bit halves, and a Hamming-1 16-bit probe differs from the
    // index key in <= 1 bit of ONE half (the other exact) — so q258's
    // candidate set contains q245's, and flagged(q245) <= flagged(q258)
    // label-wise, with the exact recall denominator identical
    def byLabel(name: String) =
      VectorOps.queries(name)(spark, dir).collect()
        .map(r => r.get(r.fieldIndex("label")).toString ->
          (r.getAs[Long]("n_candidates"), r.getAs[Long]("n_contaminated"),
            r.getAs[Long]("n_true_contaminated"), r.getAs[Long]("n_train"),
            r.getAs[Long]("n_cand_pairs"), r.getAs[Long]("max_cand_per_row"))).toMap
    val narrow = byLabel("q245_decontaminate_multiprobe")
    val wide = byLabel("q258_decontaminate_8x8")
    assert(narrow.keySet == wide.keySet)
    val nEval = Tables(spark, dir, "embeddings")
      .filter(org.apache.spark.sql.functions.col("vec_id") % 50 === 0).count()
    for ((lbl, (nc, nf, nt, ntr, npair, nmax)) <- narrow) {
      val (wc, wf, wt, wtr, wpair, wmax) = wide(lbl)
      assert(wtr == ntr && wt == nt,
        s"$lbl: train count and exact denominator must not depend on banding")
      assert(wc >= nc, s"$lbl: 8x8 candidates $wc < 4x16's $nc — refinement violated")
      assert(wf >= nf, s"$lbl: 8x8 caught $wf < 4x16's $nf — refinement violated")
      // the verify-cost columns inherit the refinement: every 4x16 pair
      // survives at 8x8, per ROW, so both per-label pair totals and the
      // per-row maximum are monotone — and the per-row maximum can never
      // exceed |eval| (candidates are distinct (train, eval) pairs)
      assert(wpair >= npair && wmax >= nmax,
        s"$lbl: pair-cost columns must be monotone in chart density")
      assert(nmax <= nEval && wmax <= nEval,
        s"$lbl: per-row candidate count is bounded by the eval set")
    }
    val caughtN = narrow.values.map(_._2).sum
    val caughtW = wide.values.map(_._2).sum
    val candN = narrow.values.map(_._1).sum
    val candW = wide.values.map(_._1).sum
    info(s"decontamination recall knob at ${dir.split('/').last}: " +
      s"caught $caughtN -> $caughtW, candidate rows $candN -> $candW, " +
      s"max pairs/row ${narrow.values.map(_._6).max} -> ${wide.values.map(_._6).max} " +
      s"(|eval| = $nEval)")
  }

  test("chooseBandWidth picks the densest config under the candidate budget") {
    // measured densities at sf0.001 span orders of magnitude across the
    // three configs (the whole point of the chart); the selector must
    // return the widest-recall width whose density fits, and degrade to
    // the narrowest-recall 2x32 when nothing fits
    val byConfig = VectorOps.queries("q257_band_entropy")(spark, dir).collect()
      .map(r => r.getAs[String]("config") -> r.getAs[Long]("density_ppm")).toMap
    val d8 = byConfig("8x8"); val d16 = byConfig("4x16"); val d32 = byConfig("2x32")
    info(s"density ppm: 8x8=$d8 4x16=$d16 2x32=$d32")
    assert(d8 > d16 && d16 >= d32, "density must be monotone in band count")
    assert(VectorOps.chooseBandWidth(spark, dir, budgetPpm = d8) == 8)
    assert(VectorOps.chooseBandWidth(spark, dir, budgetPpm = d8 - 1) == 16 || d16 == d8)
    assert(VectorOps.chooseBandWidth(spark, dir, budgetPpm = d32 - 1) == 32,
      "over-budget everywhere must degrade to the narrowest-recall config")
  }

  test("q260 composes the loop: chosen width matches the selector, screen matches the fixed-width query") {
    import org.apache.spark.sql.functions.col
    val rows = VectorOps.queries("q260_autowidth_screen")(spark, dir).collect()
    assert(rows.nonEmpty)
    val widths = rows.map(_.getAs[Long]("chosen_width")).distinct
    assert(widths.length == 1, "one corpus, one chosen width")
    val w = widths.head.toInt
    assert(w == VectorOps.chooseBandWidth(spark, dir, VectorOps.q260BudgetPpm),
      "the in-query selection must equal the standalone selector")
    info(s"q260 at ${dir.split('/').last}: chose width $w, " +
      s"density ${rows.head.getAs[Long]("chosen_density_ppm")} ppm")
    // the screen at the chosen width must be EXACTLY the fixed-width
    // query's artifact (q245 = 16, q258 = 8) minus the two chosen_*
    // columns — the loop changes which screen runs, never what it computes
    val fixedName = w match {
      case 16 => Some("q245_decontaminate_multiprobe")
      case 8  => Some("q258_decontaminate_8x8")
      case _  => None // 2x32 has no registered fixed-width sibling
    }
    fixedName.foreach { name =>
      val got = VectorOps.queries("q260_autowidth_screen")(spark, dir)
        .drop("chosen_width", "chosen_density_ppm")
        .orderBy(col("label")).collect().map(_.toSeq).toSeq
      val want = VectorOps.queries(name)(spark, dir)
        .orderBy(col("label")).collect().map(_.toSeq).toSeq
      assert(got == want, s"q260's screen must reproduce $name row-for-row")
    }
  }
}
