package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.{SessionCache, Tables}

/** Suffix-array tier: corpus-wide substring-duplication analysis via a
  * DISTRIBUTED suffix-array construction (prefix doubling) — the primitive
  * behind exact substring-level training-data dedup (the suffix-array
  * dedup of the "Deduplicating Training Data Makes Language Models
  * Better" line of work), which n-gram hashing cannot replace: hashing a
  * fixed gram width answers "does this exact W-gram repeat", while the
  * suffix order + LCP answers "what is the LONGEST repeated substring
  * through this position" for every position at once.
  *
  * Algorithm (q215): rank every suffix of every document by its first
  * `Cap` characters with O(log Cap) prefix-doubling rounds. Each round
  * combines the current rank at `pos` with the rank at `pos + width`
  * (0-sentinel past end-of-document, so a short suffix sorts before any
  * extension of it — matching lexicographic order on truncated
  * substrings), then re-densifies ranks with a distributed dense-rank:
  * distinct pairs → range-partitioned sort → zipWithIndex → join back.
  * No single-partition window anywhere; every step is a shuffle or a
  * range-sort over (corpus-length)-many narrow rows. The doubling stops
  * early once every rank class is a singleton (the classic termination),
  * or at `Cap`. `Cap` is a parameter of the construction — the driver
  * gate pins Cap=64 because the DuckDB oracle must re-derive the same
  * order from `substr(text, pos, 64)`; at 100 TB the same loop runs to
  * 2^k ≥ longest-repeat with k distributed sorts, which IS the published
  * scale algorithm (pDC3 / prefix-doubling MapReduce SA construction).
  *
  * LCP tier (q216): with the total suffix order in hand, a position's
  * longest duplicated prefix is max(LCP with rank-predecessor, LCP with
  * rank-successor) — equal substrings are CONTIGUOUS in suffix order, so
  * only the two neighbors need comparing (never all-pairs). The output
  * counts positions that start a ≥20-char (and ≥40-char) substring
  * occurring at least twice anywhere in the corpus — the per-position
  * "is this span memorizable boilerplate" signal span-granular dedup
  * acts on.
  *
  * Scale shape: rows are (doc_id, pos, rank) — ~|corpus| narrow rows;
  * the doubling shuffles carry three longs per character, the final
  * prefix strings are materialized ONCE (Cap bytes/row) for the LCP
  * compare, and the neighbor lookup is a self-join on rank±1 (shuffle on
  * a dense unique key: no skew possible). Nothing is quadratic; memory
  * per task is partition-bounded.
  *
  * Hash-stability: every output column is an exact integer or a rounded
  * ratio of exact integers; suffix comparison is byte-wise on ASCII text
  * in both engines (binary collation).
  */
object SuffixOps {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  /** Rank-prefix cap pinned by the oracle (see scaladoc above). */
  val Cap = 64

  /** Distributed contiguous 1-based sequence ids in `keys` order — see
    * [[Ranks.seqIdBy]] (promoted to a shared helper; the bin-packing
    * planner uses the same idiom). */
  private def seqIdBy(df: DataFrame, idCol: String, keys: Column*): DataFrame =
    Ranks.seqIdBy(df, idCol, keys: _*)

  /** One densification: replace the (r, r2) pair with its dense rank over
    * the corpus-wide pair order. Returns the re-ranked rows (materialized —
    * see below) plus the number of distinct pairs (== row count ⟺ the
    * order is total and the doubling can stop).
    *
    * The result is eagerly localCheckpoint-ed: `cur` feeds BOTH sides of
    * the next round's self-join, so without lineage truncation the
    * logical plan doubles every round (2^rounds copies of the base scan —
    * the same blowup q70's component loop truncates the same way). */
  private def denseRankPairs(cur: DataFrame): (DataFrame, Long) = {
    val pairs = cur.select("r", "r2").distinct()
    val ranked = seqIdBy(pairs, "nr", col("r"), col("r2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDistinct = ranked.count()
    // Barrier.rebase, not bare localCheckpoint: cur feeds both the pair
    // ranking and this join (two self-references per doubling round — the
    // exponential case of the checkpoint stats blow-up, see graft.Barrier)
    val next = graft.Barrier.rebase(rankJoin(cur, ranked))
    ranked.unpersist(false)
    (next, nDistinct)
  }

  private def rankJoin(cur: DataFrame, ranked: DataFrame): DataFrame =
    cur.join(ranked, Seq("r", "r2"))
      .select(col("doc_id"), col("pos"), col("nr").as("r"))

  /** One doubling round's UN-CHECKPOINTED plan over any (doc_id, pos, r,
    * r2) frame — exposed so EntrySpec can assert the loop's join shape:
    * inside suffixRanks every round is eagerly materialized (barriers +
    * the persist/count), so an all-pairs regression in the doubling
    * would be invisible to an assert on q215's final plan (the same
    * vacuity class as the q202 review find). seqIdBy's sort rides an
    * RDD zipWithIndex and stays below the visible plan; the assertable
    * surface is exactly the rank-join, which is where an all-pairs
    * comparison sort would sneak in. */
  private[graft] def denseRankRound(cur: DataFrame): DataFrame =
    rankJoin(cur, seqIdBy(cur.select("r", "r2").distinct(), "nr", col("r"), col("r2")))

  /** The shared suffix-rank table: (doc_id, source, pos, rank, p64) with
    * `rank` the 1-based position of suffix (doc_id, pos) in the corpus-wide
    * order by (first-Cap-chars, doc_id, pos), and `p64` those first Cap
    * characters (for the LCP compare). Session-cached: q215/q216 and any
    * downstream dedup share one build. */
  def suffixRanks(s: SparkSession, dir: String): DataFrame =
    SessionCache.getOrBuild(s, s"suffix_rank${Cap}_$dir") {
      ranksOf(t(s, dir, "documents").select(col("doc_id"), col("source"), col("text")))
    }

  /** The construction itself, over any (doc_id, source, text) frame —
    * separated from the table/cache wiring so adversarial corpora
    * (periodic strings, single-char runs, shared prefixes) can drive it
    * directly in tests. */
  private[graft] def ranksOf(docs: DataFrame): DataFrame = {
      // Initial rank width: pure-ASCII text packs the first 8 chars into
      // one BIGINT (8 × 7 bits = 56 bits; ascii('') = 0 IS the 0-sentinel,
      // so short suffixes pad exactly like the doubling's coalesce(r2, 0))
      // — the packed value orders identically to the 8-char prefix string,
      // so the doubling starts at width 8 and needs 3 rounds to Cap=64
      // instead of 6. Any codepoint ≥ 128 would break the 7-bit packing,
      // so a one-row scan gates the fast start (width-1 fallback keeps
      // full generality).
      val nonAscii = docs
        .agg(coalesce(max(col("text").rlike("[^\\u0000-\\u007F]")), lit(false)))
        .collect()(0).getBoolean(0)
      val startWidth = if (nonAscii) 1 else 8
      val rSql =
        if (nonAscii) "CAST(ascii(substr(text, pos, 1)) AS BIGINT)"
        else (0 until 8)
          .map(i => s"CAST(ascii(substr(text, pos + $i, 1)) AS BIGINT) * ${1L << (7 * (7 - i))}")
          .mkString(" + ")
      // empty documents contribute no suffixes — and must be excluded
      // BEFORE sequence(): Spark's sequence(1, 0) auto-steps DOWN to
      // [1, 0], which would fabricate two bogus positions per empty doc
      val base = docs
        .where(length(col("text")) > 0)
        .withColumn("pos", explode(sequence(lit(1), length(col("text")))))
        .select(col("doc_id"), col("pos"), expr(rSql).as("r"))
        .localCheckpoint(true)
      val total = base.count()
      var cur = base
      var width = startWidth
      var done = false
      while (width < Cap && !done) {
        val d = width
        val right = cur.select(col("doc_id"), (col("pos") - d).as("pos"), col("r").as("r2"))
        val joined = cur.join(right, Seq("doc_id", "pos"), "left")
          .withColumn("r2", coalesce(col("r2"), lit(0L)))
        val (next, nDistinct) = denseRankPairs(joined)
        cur = next
        width *= 2
        done = nDistinct == total
      }
      val ranked = seqIdBy(cur, "rank", col("r"), col("doc_id"), col("pos"))
      ranked.join(docs, "doc_id")
        .select(col("doc_id"), col("source"), col("pos"), col("rank"),
          expr(s"substr(text, pos, $Cap)").as("p64"))
    }

  /** Bench untimed-warmup hook (same contract as TextOps.prewarmShared):
    * materialize the shared suffix-rank table once so the per-query
    * timings measure the q215/q216 plans, not the one-time build. */
  private[graft] def prewarmShared(s: SparkSession, dir: String): Unit = {
    suffixRanks(s, dir).count()
    dupLens(s, dir).count()
    crossLens(s, dir).count()
    ()
  }

  // ---------------------------------------------------------------------
  // q215 — distributed suffix-array rank (prefix doubling)
  // ---------------------------------------------------------------------

  /** Per-source verification aggregates over the full suffix order: the
    * exact rank sum, a (rank, pos)-mixing checksum that pins the
    * assignment (not just the multiset) of ranks, and the rank of the
    * source's lexicographically-first suffix. */
  private def q215(s: SparkSession, dir: String): DataFrame =
    suffixRanks(s, dir)
      .groupBy("source")
      .agg(count(lit(1)).as("n_suffixes"),
        sum("rank").as("sum_rank"),
        sum((col("rank") % 1000003L) * (col("pos").cast("long") % 1009L)).as("rank_pos_mix"),
        min("rank").as("first_rank"))
      .orderBy("source")

  // ---------------------------------------------------------------------
  // q216 — duplicated-substring coverage via LCP with rank neighbors
  // ---------------------------------------------------------------------

  /** Common-prefix length of `p64` with the (possibly null) neighbor
    * prefix in `other` — the native `graft_cpl` expression (a fused
    * byte-walk; the HOF transform/array_position formulation allocated a
    * 64-element array per row per neighbor and dominated the dupLens
    * build). Both strings are ≤ Cap chars, so the result is inherently
    * Cap-capped; a null neighbor (rank 1 / rank N) contributes 0, exactly
    * like the oracle's CASE WHEN ... IS NULL THEN 0. */
  private def withCpl(df: DataFrame, other: String, out: String): DataFrame = df
    .withColumn(out,
      when(col(other).isNull, lit(0L))
        .otherwise(expr(s"graft_cpl(p64, $other)")))

  /** Per-position longest duplicated prefix: (doc_id, source, pos,
    * dup_len) with dup_len = max(LCP with rank-predecessor, LCP with
    * rank-successor) — the shared core of q216 (coverage counts) and
    * q217 (span removal). The neighbor lookup is a self-join on rank±1:
    * a shuffle on a dense unique key, never a global window. */
  private def dupLens(s: SparkSession, dir: String): DataFrame =
    SessionCache.getOrBuild(s, s"suffix_dup${Cap}_$dir") {
      dupLensOf(s, suffixRanks(s, dir))
    }

  /** LCP-with-rank-neighbors core over any suffix-rank frame (see
    * ranksOf for why the wiring is separated). */
  private[graft] def dupLensOf(s: SparkSession, r: DataFrame): DataFrame = {
    graft.functions.expressions.CommonPrefixLen.register(s)
    val prev = r.select((col("rank") + 1).as("rank"), col("p64").as("prev_p"))
    val next = r.select((col("rank") - 1).as("rank"), col("p64").as("next_p"))
    val nbr = r.join(prev, Seq("rank"), "left").join(next, Seq("rank"), "left")
    withCpl(withCpl(nbr, "prev_p", "lcp_prev"), "next_p", "lcp_next")
      .withColumn("dup_len", greatest(col("lcp_prev"), col("lcp_next")))
      .select(col("doc_id"), col("source"), col("pos"), col("dup_len"))
  }

  // ---------------------------------------------------------------------
  // q226 — cross-source contamination spans (runs decomposition)
  // ---------------------------------------------------------------------

  /** Per-position longest common prefix with any suffix from a DIFFERENT
    * source — the exact-substring cross-corpus contamination signal (the
    * train/test-leakage finding of the "Deduplicating Training Data" line:
    * fixed-width n-gram hashing answers "does this W-gram cross sources",
    * this answers "what is the LONGEST span shared with another source
    * through every position" in one pass).
    *
    * Why no scan is needed: LCP(i, j) over the suffix order is the MIN of
    * adjacent LCPs in (j, i], so it only shrinks with rank distance — the
    * best different-source partner of suffix i is always the NEAREST one,
    * which is the last row of the adjacent maximal same-source RUN. Hence
    * cross_len decomposes into per-run running minima:
    *   F(i) = running min of lcp_prev within i's run  (partner: prev run)
    *   B(i) = reversed running min of lcp_next        (partner: next run)
    *   cross_len(i) = max(F, B), zeroed at the first/last run.
    * Run ids are a distributed prefix sum of source-change flags — the
    * Percentiles.exactByRank idiom: range-partition by rank, per-partition
    * flag subtotals, a 32-row offset window over pid, then a running sum
    * per pid. No global window anywhere; the per-run windows are streaming
    * running-mins over runs whose length is corpus-interleaving-bounded. */
  private def crossLens(s: SparkSession, dir: String): DataFrame =
    SessionCache.getOrBuild(s, s"suffix_cross${Cap}_$dir") {
      crossLensOf(s, suffixRanks(s, dir))
    }

  private[graft] def crossLensOf(s: SparkSession, r: DataFrame): DataFrame = {
    val (plan, ranged) = crossLensPlan(s, r)
    val out = plan.localCheckpoint(true)
    ranged.unpersist()
    out
  }

  /** The un-checkpointed build plan plus the pinned range-partitioned
    * intermediate — separated so EntrySpec can assert the window/join
    * shape of the BUILD (the cached table the queries read hides it). */
  private[graft] def crossLensPlan(s: SparkSession, r: DataFrame): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.expressions.CommonPrefixLen.register(s)
    val prev = r.select((col("rank") + 1).as("rank"),
      col("p64").as("prev_p"), col("source").as("prev_src"))
    val next = r.select((col("rank") - 1).as("rank"), col("p64").as("next_p"))
    val nbr = r.join(prev, Seq("rank"), "left").join(next, Seq("rank"), "left")
    val flagged = withCpl(withCpl(nbr, "prev_p", "lcp_prev"), "next_p", "lcp_next")
      .withColumn("sf",
        when(col("prev_src").isNull || col("prev_src") =!= col("source"), 1L).otherwise(0L))
    val parts = s.sessionState.conf.numShufflePartitions
    // pid must be identical for the subtotal and running-sum consumers —
    // two materializations of a range exchange draw different sampling
    // boundaries (the Percentiles rule), so the pin is load-bearing.
    val ranged = flagged.repartitionByRange(parts, col("rank"))
      .sortWithinPartitions("rank")
      .withColumn("pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wOff = Window.partitionBy(lit(0)).orderBy("pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged.groupBy("pid").agg(sum("sf").as("pf"))
      .withColumn("off", coalesce(sum("pf").over(wOff), lit(0L)))
      .select("pid", "off")
    val wRun = Window.partitionBy("pid").orderBy("rank")
      .rowsBetween(Window.unboundedPreceding, 0)
    val withRun = ranged.join(broadcast(offsets), Seq("pid"))
      .withColumn("run_id", col("off") + sum("sf").over(wRun))
    val maxRun = withRun.agg(max("run_id").as("max_run"))
    val wF = Window.partitionBy("run_id").orderBy("rank")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wB = Window.partitionBy("run_id").orderBy(col("rank").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    // Partner-run source attribution: every run has ONE source, run ids
    // are dense, so the F/B partners' sources come from a tiny
    // (run_id ± 1)-keyed equi-join against the per-run source table. The
    // partner of a position is the PREV run when f >= b (ties to prev —
    // the oracle applies the identical rule), else the NEXT run; whenever
    // cross_len > 0 the chosen side's neighbor run exists, so the
    // attribution is total on the spans any consumer looks at.
    val runSrc = withRun.groupBy("run_id").agg(first("source").as("rsrc"))
    // prun/nrun, not prev/next: the position-level frame already carries a
    // prev_src column (the rank-neighbor source feeding the run flags)
    val prevSrc = runSrc.select((col("run_id") + 1).as("run_id"),
      col("rsrc").as("prun_src"))
    val nextSrc = runSrc.select((col("run_id") - 1).as("run_id"),
      col("rsrc").as("nrun_src"))
    val out = withRun
      .withColumn("f_raw", min("lcp_prev").over(wF))
      .withColumn("b_raw", min("lcp_next").over(wB))
      .crossJoin(broadcast(maxRun))
      .withColumn("f", when(col("run_id") === 1L, 0L).otherwise(col("f_raw")))
      .withColumn("b", when(col("run_id") === col("max_run"), 0L).otherwise(col("b_raw")))
      .withColumn("cross_len", greatest(col("f"), col("b")))
      .join(prevSrc, Seq("run_id"), "left")
      .join(nextSrc, Seq("run_id"), "left")
      .withColumn("partner_src",
        when(col("f") >= col("b"), col("prun_src")).otherwise(col("nrun_src")))
      .select(col("doc_id"), col("source"), col("pos"), col("cross_len"),
        col("partner_src"))
    (out, ranged)
  }

  /** Per-source cross-source contamination coverage: positions starting a
    * ≥20 (≥40) char span that also occurs verbatim in ANOTHER source. */
  private def q226(s: SparkSession, dir: String): DataFrame =
    crossLens(s, dir).groupBy("source")
      .agg(count(lit(1)).as("n_pos"),
        sum(when(col("cross_len") >= 20, 1L).otherwise(0L)).as("n_cross20"),
        sum(when(col("cross_len") >= 40, 1L).otherwise(0L)).as("n_cross40"),
        max("cross_len").as("max_cross_len"),
        sum("cross_len").as("sum_cross_len"))
      .withColumn("cross_frac20",
        round(col("n_cross20").cast("double") / col("n_pos"), 6))
      .orderBy("source")

  /** q233 — the contamination ATTRIBUTION matrix: q226's per-source
    * coverage broken down by WHICH other source the shared span lives in
    * — the "who leaks into whom" diagnostic that decides which pair of
    * crawl sources actually overlaps (a union of many small mutual leaks
    * and one dominant direction aggregate to the same q226 row; this
    * matrix separates them). The partner source rides the runs
    * decomposition for free: a position's best different-source match is
    * the last element of the PREV run (when f ≥ b, ties to prev) or the
    * first of the NEXT run — both attributed by a dense (run_id ± 1)
    * equi-join against the per-run source table. Output is at most
    * |sources|² rows. */
  private def q233(s: SparkSession, dir: String): DataFrame =
    crossLens(s, dir).filter(col("cross_len") >= 20)
      .groupBy("source", "partner_src")
      .agg(count(lit(1)).as("n_pos20"),
        sum(when(col("cross_len") >= 40, 1L).otherwise(0L)).as("n_pos40"),
        max("cross_len").as("max_cross_len"),
        sum("cross_len").cast("long").as("sum_cross_len"))
      .orderBy("source", "partner_src")

  /** Per-source duplicated-substring coverage: how many positions start a
    * substring of length ≥20 (≥40) that occurs at least twice anywhere in
    * the corpus, plus the longest duplicated prefix seen. */
  private def q216(s: SparkSession, dir: String): DataFrame =
    dupLens(s, dir).groupBy("source")
      .agg(count(lit(1)).as("n_pos"),
        sum(when(col("dup_len") >= 20, 1L).otherwise(0L)).as("n_dup20"),
        sum(when(col("dup_len") >= 40, 1L).otherwise(0L)).as("n_dup40"),
        max("dup_len").as("max_dup_len"),
        sum("dup_len").as("sum_dup_len"))
      .withColumn("dup_frac20", round(col("n_dup20").cast("double") / col("n_pos"), 6))
      .orderBy("source")

  // ---------------------------------------------------------------------
  // q217 — exact-substring span removal (the dedup executor)
  // ---------------------------------------------------------------------

  /** Minimum duplicated-prefix length that opens a removal interval
    * (Lee et al.'s ExactSubstr uses 50 on BPE tokens; 40 chars here,
    * detectable up to Cap). Pinned by the oracle. */
  val MinSpan = 40

  /** The operation the suffix tier exists for: REMOVE duplicated spans.
    * Every position whose longest duplicated prefix is ≥ MinSpan opens
    * the interval [pos, pos + dup_len); per-document overlapping
    * intervals merge via gaps-and-islands over a doc-partitioned window
    * (partitioned by doc_id — per-doc state only, never a global
    * window), and the query reports per-source removal accounting:
    * docs touched, merged spans, chars removed/kept. Deterministic and
    * integer-exact, so the cleansed-corpus geometry is hash-gated; the
    * byte-level rewrite is then a trivial per-row substring splice over
    * the merged intervals.
    *
    * Scale shape: the interval set is the ≥MinSpan positions only (a
    * small fraction of the corpus); the window state is one running
    * max per document; everything downstream of dupLens is one shuffle
    * on doc_id. */
  private def q217(s: SparkSession, dir: String): DataFrame =
    spanRemoval(s, dir,
      dupLens(s, dir).filter(col("dup_len") >= MinSpan)
        .select(col("doc_id"), col("source"), col("pos"),
          (col("pos") + col("dup_len")).as("e")))

  /** Gaps-and-islands span merge + per-source removal accounting over any
    * (doc_id, source, pos, e) interval frame — the shared executor of
    * q217 (any-duplicate removal) and q227 (cross-source
    * decontamination). Window state is one running max per document. */
  private def spanRemoval(s: SparkSession, dir: String, spans: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val prevMax = byDoc.rowsBetween(Window.unboundedPreceding, -1)
    val isl = spans
      .withColumn("max_e", max("e").over(prevMax))
      .withColumn("new_isl",
        when(col("max_e").isNull || col("pos") > col("max_e"), 1L).otherwise(0L))
      .withColumn("isl", sum("new_isl").over(byDoc.rowsBetween(Window.unboundedPreceding, 0)))
    val merged = isl.groupBy("doc_id", "source", "isl")
      .agg(min("pos").as("sp"), max("e").as("ep"))
    val perDoc = merged.groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_spans"), sum(col("ep") - col("sp")).as("removed"))
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), col("source"), length(col("text")).cast("long").as("len"))
    docs.join(perDoc.drop("source"), Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_spans", "removed"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_spans") > 0, 1L).otherwise(0L)).as("n_docs_affected"),
        sum("n_spans").as("n_spans"),
        sum("removed").as("removed_chars"),
        sum(col("len") - col("removed")).as("kept_chars"))
      .withColumn("removed_frac",
        round(col("removed_chars").cast("double") /
          (col("removed_chars") + col("kept_chars")), 6))
      .orderBy("source")
  }

  /** q227 — exact-substring DECONTAMINATION executor: remove from every
    * document the spans (≥ MinSpan chars) that also occur verbatim in a
    * DIFFERENT source — the "scrub eval overlap out of train" operation
    * (Lee et al.'s ExactSubstr applied cross-corpus), with per-source
    * removal accounting. Same merged-interval machinery as q217; only the
    * span generator differs (crossLens instead of dupLens), so the two
    * queries' accounting columns are directly comparable — the q217/q227
    * delta is exactly the WITHIN-source duplication. */
  private def q227(s: SparkSession, dir: String): DataFrame =
    spanRemoval(s, dir,
      crossLens(s, dir).filter(col("cross_len") >= MinSpan)
        .select(col("doc_id"), col("source"), col("pos"),
          (col("pos") + col("cross_len")).as("e")))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q215_suffix_rank" -> (q215 _),
    "q216_dup_substrings" -> (q216 _),
    "q217_span_removal" -> (q217 _),
    "q226_cross_source_spans" -> (q226 _),
    "q227_decontaminate_spans" -> (q227 _),
    "q233_contamination_matrix" -> (q233 _))

  /** The q216 oracle's per-neighbor LCP expression, parameterized on the
    * neighbor column (DuckDB list-lambda byte walk, Cap-capped). */
  private def lcpSql(other: String): String =
    s"""CASE WHEN $other IS NULL THEN 0 ELSE least(
       |      CASE WHEN list_position(list_transform(range(1, 65),
       |             k -> substr(p64, CAST(k AS INT), 1) = substr($other, CAST(k AS INT), 1)), false) = 0
       |           THEN 64
       |           ELSE list_position(list_transform(range(1, 65),
       |             k -> substr(p64, CAST(k AS INT), 1) = substr($other, CAST(k AS INT), 1)), false) - 1 END,
       |      length(p64), length($other)) END""".stripMargin

  def oracles: Map[String, String] = Map(
    "q227_decontaminate_spans" ->
      s"""WITH p AS (SELECT doc_id, source, CAST(i AS BIGINT) AS pos,
         |    substr(text, CAST(i AS INT), 64) AS p64
         |  FROM documents, unnest(range(1, length(text) + 1)) AS t(i)),
         |o AS (SELECT doc_id, source, pos, p64,
         |    row_number() OVER (ORDER BY p64, doc_id, pos) AS rank,
         |    lag(p64)  OVER (ORDER BY p64, doc_id, pos) AS prev_p,
         |    lead(p64) OVER (ORDER BY p64, doc_id, pos) AS next_p,
         |    lag(source) OVER (ORDER BY p64, doc_id, pos) AS prev_src
         |  FROM p),
         |c AS (SELECT doc_id, source, pos, rank,
         |    ${lcpSql("prev_p")} AS lcp_prev,
         |    ${lcpSql("next_p")} AS lcp_next,
         |    CASE WHEN prev_src IS NULL OR prev_src <> source THEN 1 ELSE 0 END AS sf
         |  FROM o),
         |rn AS (SELECT *, sum(sf) OVER (ORDER BY rank) AS run_id FROM c),
         |mx AS (SELECT max(run_id) AS mr FROM rn),
         |fb AS (SELECT doc_id, source, pos, run_id,
         |    min(lcp_prev) OVER (PARTITION BY run_id ORDER BY rank) AS f_raw,
         |    min(lcp_next) OVER (PARTITION BY run_id ORDER BY rank DESC) AS b_raw
         |  FROM rn),
         |x AS (SELECT doc_id, source, pos, greatest(
         |    CASE WHEN run_id = 1 THEN 0 ELSE f_raw END,
         |    CASE WHEN run_id = (SELECT mr FROM mx) THEN 0 ELSE b_raw END) AS cross_len
         |  FROM fb),
         |sp AS (SELECT doc_id, source, pos, pos + cross_len AS e FROM x WHERE cross_len >= 40),
         |i AS (SELECT doc_id, source, pos, e,
         |    CASE WHEN max(e) OVER (PARTITION BY doc_id ORDER BY pos
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
         |        OR pos > max(e) OVER (PARTITION BY doc_id ORDER BY pos
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |      THEN 1 ELSE 0 END AS ni
         |  FROM sp),
         |j AS (SELECT doc_id, source, pos, e,
         |    sum(ni) OVER (PARTITION BY doc_id ORDER BY pos
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
         |  FROM i),
         |m AS (SELECT doc_id, source, isl, min(pos) AS sp2, max(e) AS ep
         |  FROM j GROUP BY 1, 2, 3),
         |pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
         |    CAST(sum(ep - sp2) AS BIGINT) AS removed
         |  FROM m GROUP BY 1),
         |d AS (SELECT doc_id, source, CAST(length(text) AS BIGINT) AS len FROM documents)
         |SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN coalesce(pd.n_spans, 0) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_affected,
         |  CAST(sum(coalesce(pd.n_spans, 0)) AS BIGINT) AS n_spans,
         |  CAST(sum(coalesce(pd.removed, 0)) AS BIGINT) AS removed_chars,
         |  CAST(sum(d.len - coalesce(pd.removed, 0)) AS BIGINT) AS kept_chars,
         |  round(CAST(sum(coalesce(pd.removed, 0)) AS DOUBLE) / sum(d.len), 6) AS removed_frac
         |FROM d LEFT JOIN pd USING (doc_id)
         |GROUP BY d.source ORDER BY d.source""".stripMargin,
    "q233_contamination_matrix" ->
      s"""WITH p AS (SELECT doc_id, source, CAST(i AS BIGINT) AS pos,
         |    substr(text, CAST(i AS INT), 64) AS p64
         |  FROM documents, unnest(range(1, length(text) + 1)) AS t(i)),
         |o AS (SELECT doc_id, source, pos, p64,
         |    row_number() OVER (ORDER BY p64, doc_id, pos) AS rank,
         |    lag(p64)  OVER (ORDER BY p64, doc_id, pos) AS prev_p,
         |    lead(p64) OVER (ORDER BY p64, doc_id, pos) AS next_p,
         |    lag(source) OVER (ORDER BY p64, doc_id, pos) AS prev_src
         |  FROM p),
         |c AS (SELECT source, rank,
         |    ${lcpSql("prev_p")} AS lcp_prev,
         |    ${lcpSql("next_p")} AS lcp_next,
         |    CASE WHEN prev_src IS NULL OR prev_src <> source THEN 1 ELSE 0 END AS sf
         |  FROM o),
         |rn AS (SELECT *, sum(sf) OVER (ORDER BY rank) AS run_id FROM c),
         |mx AS (SELECT max(run_id) AS mr FROM rn),
         |rs AS (SELECT run_id, min(source) AS rsrc FROM rn GROUP BY 1),
         |fb AS (SELECT source, run_id,
         |    min(lcp_prev) OVER (PARTITION BY run_id ORDER BY rank) AS f_raw,
         |    min(lcp_next) OVER (PARTITION BY run_id ORDER BY rank DESC) AS b_raw
         |  FROM rn),
         |x AS (SELECT fb.source,
         |    CASE WHEN fb.run_id = 1 THEN 0 ELSE f_raw END AS fz,
         |    CASE WHEN fb.run_id = (SELECT mr FROM mx) THEN 0 ELSE b_raw END AS bz,
         |    ps.rsrc AS prev_src, ns.rsrc AS next_src
         |  FROM fb
         |  LEFT JOIN rs ps ON ps.run_id = fb.run_id - 1
         |  LEFT JOIN rs ns ON ns.run_id = fb.run_id + 1),
         |y AS (SELECT source, greatest(fz, bz) AS cross_len,
         |    CASE WHEN fz >= bz THEN prev_src ELSE next_src END AS partner_src
         |  FROM x)
         |SELECT source, partner_src,
         |  CAST(count(*) AS BIGINT) AS n_pos20,
         |  CAST(sum(CASE WHEN cross_len >= 40 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos40,
         |  CAST(max(cross_len) AS BIGINT) AS max_cross_len,
         |  CAST(sum(cross_len) AS BIGINT) AS sum_cross_len
         |FROM y WHERE cross_len >= 20
         |GROUP BY source, partner_src ORDER BY source, partner_src""".stripMargin,
    "q226_cross_source_spans" ->
      s"""WITH p AS (SELECT doc_id, source, CAST(i AS BIGINT) AS pos,
         |    substr(text, CAST(i AS INT), 64) AS p64
         |  FROM documents, unnest(range(1, length(text) + 1)) AS t(i)),
         |o AS (SELECT doc_id, source, pos, p64,
         |    row_number() OVER (ORDER BY p64, doc_id, pos) AS rank,
         |    lag(p64)  OVER (ORDER BY p64, doc_id, pos) AS prev_p,
         |    lead(p64) OVER (ORDER BY p64, doc_id, pos) AS next_p,
         |    lag(source) OVER (ORDER BY p64, doc_id, pos) AS prev_src
         |  FROM p),
         |c AS (SELECT source, rank,
         |    ${lcpSql("prev_p")} AS lcp_prev,
         |    ${lcpSql("next_p")} AS lcp_next,
         |    CASE WHEN prev_src IS NULL OR prev_src <> source THEN 1 ELSE 0 END AS sf
         |  FROM o),
         |rn AS (SELECT *, sum(sf) OVER (ORDER BY rank) AS run_id FROM c),
         |mx AS (SELECT max(run_id) AS mr FROM rn),
         |fb AS (SELECT source, run_id,
         |    min(lcp_prev) OVER (PARTITION BY run_id ORDER BY rank) AS f_raw,
         |    min(lcp_next) OVER (PARTITION BY run_id ORDER BY rank DESC) AS b_raw
         |  FROM rn),
         |x AS (SELECT source, greatest(
         |    CASE WHEN run_id = 1 THEN 0 ELSE f_raw END,
         |    CASE WHEN run_id = (SELECT mr FROM mx) THEN 0 ELSE b_raw END) AS cross_len
         |  FROM fb)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_pos,
         |  CAST(sum(CASE WHEN cross_len >= 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_cross20,
         |  CAST(sum(CASE WHEN cross_len >= 40 THEN 1 ELSE 0 END) AS BIGINT) AS n_cross40,
         |  CAST(max(cross_len) AS BIGINT) AS max_cross_len,
         |  CAST(sum(cross_len) AS BIGINT) AS sum_cross_len,
         |  round(CAST(sum(CASE WHEN cross_len >= 20 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS cross_frac20
         |FROM x GROUP BY source ORDER BY source""".stripMargin,
    "q215_suffix_rank" ->
      """WITH p AS (SELECT doc_id, source, CAST(i AS BIGINT) AS pos,
        |    substr(text, CAST(i AS INT), 64) AS p64
        |  FROM documents, unnest(range(1, length(text) + 1)) AS t(i)),
        |r AS (SELECT source, pos,
        |    row_number() OVER (ORDER BY p64, doc_id, pos) AS rank
        |  FROM p)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_suffixes,
        |  CAST(sum(rank) AS BIGINT) AS sum_rank,
        |  CAST(sum((rank % 1000003) * (pos % 1009)) AS BIGINT) AS rank_pos_mix,
        |  CAST(min(rank) AS BIGINT) AS first_rank
        |FROM r GROUP BY source ORDER BY source""".stripMargin,
    "q216_dup_substrings" ->
      """WITH p AS (SELECT doc_id, source, CAST(i AS BIGINT) AS pos,
        |    substr(text, CAST(i AS INT), 64) AS p64
        |  FROM documents, unnest(range(1, length(text) + 1)) AS t(i)),
        |r AS (SELECT source, p64,
        |    lag(p64)  OVER (ORDER BY p64, doc_id, pos) AS prev_p,
        |    lead(p64) OVER (ORDER BY p64, doc_id, pos) AS next_p
        |  FROM p),
        |c AS (SELECT source,
        |    CASE WHEN prev_p IS NULL THEN 0 ELSE least(
        |      CASE WHEN list_position(list_transform(range(1, 65),
        |             k -> substr(p64, CAST(k AS INT), 1) = substr(prev_p, CAST(k AS INT), 1)), false) = 0
        |           THEN 64
        |           ELSE list_position(list_transform(range(1, 65),
        |             k -> substr(p64, CAST(k AS INT), 1) = substr(prev_p, CAST(k AS INT), 1)), false) - 1 END,
        |      length(p64), length(prev_p)) END AS lcp_prev,
        |    CASE WHEN next_p IS NULL THEN 0 ELSE least(
        |      CASE WHEN list_position(list_transform(range(1, 65),
        |             k -> substr(p64, CAST(k AS INT), 1) = substr(next_p, CAST(k AS INT), 1)), false) = 0
        |           THEN 64
        |           ELSE list_position(list_transform(range(1, 65),
        |             k -> substr(p64, CAST(k AS INT), 1) = substr(next_p, CAST(k AS INT), 1)), false) - 1 END,
        |      length(p64), length(next_p)) END AS lcp_next
        |  FROM r),
        |d AS (SELECT source, greatest(lcp_prev, lcp_next) AS dup_len FROM c)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_pos,
        |  CAST(sum(CASE WHEN dup_len >= 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup20,
        |  CAST(sum(CASE WHEN dup_len >= 40 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup40,
        |  CAST(max(dup_len) AS BIGINT) AS max_dup_len,
        |  CAST(sum(dup_len) AS BIGINT) AS sum_dup_len,
        |  round(CAST(sum(CASE WHEN dup_len >= 20 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS dup_frac20
        |FROM d GROUP BY source ORDER BY source""".stripMargin,
    "q217_span_removal" ->
      """WITH p AS (SELECT doc_id, source, CAST(i AS BIGINT) AS pos,
        |    substr(text, CAST(i AS INT), 64) AS p64
        |  FROM documents, unnest(range(1, length(text) + 1)) AS t(i)),
        |r AS (SELECT doc_id, source, pos, p64,
        |    lag(p64)  OVER (ORDER BY p64, doc_id, pos) AS prev_p,
        |    lead(p64) OVER (ORDER BY p64, doc_id, pos) AS next_p
        |  FROM p),
        |c AS (SELECT doc_id, source, pos, greatest(
        |    CASE WHEN prev_p IS NULL THEN 0 ELSE least(
        |      CASE WHEN list_position(list_transform(range(1, 65),
        |             k -> substr(p64, CAST(k AS INT), 1) = substr(prev_p, CAST(k AS INT), 1)), false) = 0
        |           THEN 64
        |           ELSE list_position(list_transform(range(1, 65),
        |             k -> substr(p64, CAST(k AS INT), 1) = substr(prev_p, CAST(k AS INT), 1)), false) - 1 END,
        |      length(p64), length(prev_p)) END,
        |    CASE WHEN next_p IS NULL THEN 0 ELSE least(
        |      CASE WHEN list_position(list_transform(range(1, 65),
        |             k -> substr(p64, CAST(k AS INT), 1) = substr(next_p, CAST(k AS INT), 1)), false) = 0
        |           THEN 64
        |           ELSE list_position(list_transform(range(1, 65),
        |             k -> substr(p64, CAST(k AS INT), 1) = substr(next_p, CAST(k AS INT), 1)), false) - 1 END,
        |      length(p64), length(next_p)) END) AS dup_len
        |  FROM r),
        |s AS (SELECT doc_id, source, pos, pos + dup_len AS e FROM c WHERE dup_len >= 40),
        |i AS (SELECT doc_id, source, pos, e,
        |    CASE WHEN max(e) OVER (PARTITION BY doc_id ORDER BY pos
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |        OR pos > max(e) OVER (PARTITION BY doc_id ORDER BY pos
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      THEN 1 ELSE 0 END AS ni
        |  FROM s),
        |j AS (SELECT doc_id, source, pos, e,
        |    sum(ni) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
        |  FROM i),
        |m AS (SELECT doc_id, source, isl, min(pos) AS sp, max(e) AS ep
        |  FROM j GROUP BY 1, 2, 3),
        |pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
        |    CAST(sum(ep - sp) AS BIGINT) AS removed
        |  FROM m GROUP BY 1),
        |d AS (SELECT doc_id, source, CAST(length(text) AS BIGINT) AS len FROM documents)
        |SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN coalesce(pd.n_spans, 0) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_affected,
        |  CAST(sum(coalesce(pd.n_spans, 0)) AS BIGINT) AS n_spans,
        |  CAST(sum(coalesce(pd.removed, 0)) AS BIGINT) AS removed_chars,
        |  CAST(sum(d.len - coalesce(pd.removed, 0)) AS BIGINT) AS kept_chars,
        |  round(CAST(sum(coalesce(pd.removed, 0)) AS DOUBLE) / sum(d.len), 6) AS removed_frac
        |FROM d LEFT JOIN pd USING (doc_id)
        |GROUP BY d.source ORDER BY d.source""".stripMargin)
}
