package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.Percentiles
import graft.plans.TopKPerKey

/** Round-5 curation/operations tier: the table-reconciliation, corpus-
  * mixing, and layout-planning primitives a 100 TB training-data platform
  * runs around the corpus itself (SURVEY §2.12 / §14 continuation).
  *
  * Shared determinism discipline: money rides integer cents, every ratio
  * that reaches the output is a half-up integer quotient in micro-units
  * ((2·num·scale + den) div (2·den) — q149's rule; no double ever reaches
  * a rounding function), and hashes are md5-derived 32-bit integers with
  * the established `conv(substr(md5, 1, 8), 16, 10)` ↔
  * `('0x' || substr(md5, 1, 8))::BIGINT` cross-engine form.
  */
object CurationOps {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  // ---------------------------------------------------------------------
  // q174 — order-independent table checksum (reconciliation)
  // ---------------------------------------------------------------------

  /** Content checksum per table that any copy of the data reproduces
    * WITHOUT a global sort: each row canonicalizes to a '|'-joined string
    * of its business key + integer cents, hashes to a 32-bit integer
    * (first 4 md5 bytes), and the table's checksum is the plain SUM —
    * commutative, so partitioning, task order, and file layout cannot
    * change it. This is THE cheap cross-cluster reconciliation primitive
    * (source vs replicated copy, pre- vs post-migration): one scan, one
    * map-side-combinable aggregation, no shuffle wider than the 2-row
    * result. The published checksum is the sum REDUCED MOD 2^32: the
    * accumulation runs in decimal(38,0) (exact to ~10^28 rows — no row
    * count a real table reaches can wrap it; partial sums stay exact and
    * map-side combinable) and the final mask makes the value engine- and
    * row-count-independent — a 64-bit long sum would have wrapped silently
    * in Spark at ~2.1e9 rows while DuckDB's HUGEINT raised out-of-range,
    * a cross-engine divergence exactly where a reconciliation primitive
    * cannot afford one (round-6 verdict). The mod-2^32 image keeps the
    * commutative-group property (order/partitioning-independent) and the
    * same 32-bit collision bound the row hash already has.
    * ChecksumMaskSpec pins the algebra: arbitrary re-partitionings and
    * orderings reproduce the masked value, including past the old long
    * ceiling. */
  private def q174(s: SparkSession, dir: String): DataFrame = {
    def side(tbl: String, rowStr: String): DataFrame =
      t(s, dir, tbl).select(lit(tbl).as("tbl"),
        expr(s"cast(conv(substring(md5($rowStr), 1, 8), 16, 10) as bigint)").as("h"))
    val o = side("orders",
      "concat_ws('|', o_orderkey, o_custkey, cast(round(o_totalprice * 100) as bigint))")
    val l = side("lineitem",
      "concat_ws('|', l_orderkey, l_linenumber, cast(round(l_extendedprice * 100) as bigint))")
    o.union(l)
      .groupBy("tbl")
      .agg(count(lit(1)).as("n_rows"),
        expr("cast(sum(cast(h as decimal(38,0))) % 4294967296 as bigint)")
          .as("checksum"))
      .orderBy("tbl")
  }

  // ---------------------------------------------------------------------
  // q175 — per-domain document cap (TopKPerKey)
  // ---------------------------------------------------------------------

  /** Per-source document cap — keep only the top-3 docs per source by
    * (n_chars desc, doc_id asc) — executed through the custom TopKPerKey
    * physical operator: map-side k-row bounded buffers per source, so the
    * shuffle carries at most k·sources rows no matter how large the
    * corpus. This is the web-curation "domain cap" rule (no single domain
    * may dominate the training mix) as a first-class operator; the
    * kept-id checksum pins the exact selection, not just its size. */
  private def q175(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("source"), col("doc_id"), col("n_chars"))
    val kept = TopKPerKey(docs, Seq("source"),
      Seq(("n_chars", false), ("doc_id", true)), 3)
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"),
        sum("n_chars").cast("long").as("kept_chars"),
        sum("doc_id").cast("long").as("kept_id_sum"))
    val totals = docs.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").cast("long").as("total_chars"))
    totals.join(kept, Seq("source"))
      .select(col("source"), col("n_docs"), col("total_chars"),
        col("n_kept"), col("kept_chars"), col("kept_id_sum"))
      .orderBy("source")
  }

  // ---------------------------------------------------------------------
  // q176 — temperature-scaled language mixture weights
  // ---------------------------------------------------------------------

  /** Multilingual sampling weights at temperature T = 0.5: w_l ∝ n_l^0.5,
    * the standard low-resource up-weighting rule (raw proportions drown
    * small languages; temperature < 1 flattens the mixture). sqrt is the
    * ONE fractional power that is exactly rounded in IEEE-754, so both
    * engines compute bit-identical weights — then the weight is pinned to
    * an integer (floor(sqrt(n·10¹²))) and the share is the usual micro-
    * unit half-up quotient, so no accumulated-double ever reaches the
    * output. One tiny aggregation; the language dimension is bounded. */
  private def q176(s: SparkSession, dir: String): DataFrame = {
    val w = t(s, dir, "documents")
      .groupBy("lang").agg(count(lit(1)).as("n_docs"))
      .withColumn("w",
        floor(sqrt(col("n_docs").cast("double") * lit(1.0e12))).cast("long"))
    val tot = w.agg(sum("w").cast("long").as("tw"),
      sum("n_docs").cast("long").as("tn"))
    w.crossJoin(broadcast(tot))
      .select(col("lang"), col("n_docs"),
        (expr("(2 * n_docs * 1000000 + tn) div (2 * tn)")
          .cast("double") / 1000000.0).as("raw_share"),
        (expr("(2 * w * 1000000 + tw) div (2 * tw)")
          .cast("double") / 1000000.0).as("t05_share"))
      .orderBy("lang")
  }

  // ---------------------------------------------------------------------
  // q177 — first-touch attribution
  // ---------------------------------------------------------------------

  /** Marketing-style attribution: every user's revenue is credited to the
    * CHANNEL of their first-ever event (first touch). The first event per
    * user is selected by the TopKPerKey operator with k = 1 on
    * (epoch-second asc, event_id asc) — bounded map-side buffers, no
    * per-user sort window — then a single join carries each user's order
    * history onto the channel. Left join: users who never ordered still
    * count toward the channel's audience (n_users ≥ users with orders).
    * Revenue rides integer cents end-to-end. */
  private def q177(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("user_id"), unix_timestamp(col("ts")).as("es"),
        col("event_id"), col("event_type"))
    val first = TopKPerKey(ev, Seq("user_id"),
      Seq(("es", true), ("event_id", true)), 1)
      .select(col("user_id"), col("event_type").as("channel"))
    val orders = t(s, dir, "orders")
      .select(col("o_custkey").as("user_id"), col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
    first.join(orders, Seq("user_id"), "left")
      .groupBy("channel")
      .agg(countDistinct("user_id").as("n_users"),
        count(col("o_orderkey")).as("n_orders"),
        coalesce(sum("cents"), lit(0L)).cast("long").as("revenue_cents"))
      .orderBy("channel")
  }

  // ---------------------------------------------------------------------
  // q178 — range-partition layout planner (equal-mass cuts + skew audit)
  // ---------------------------------------------------------------------

  /** The planning step behind every repartitionByRange/sorted-parquet
    * write at scale: 7 equal-mass cut points over lineitem price cents
    * from ONE grouped rank-selection pass (`Percentiles.exactByRank` —
    * no global sort window), cuts pinned to whole cents (the data's own
    * granularity, q136's rule), then one scan buckets every row against
    * the cut literals and reports per-bucket mass and bounds plus a
    * balance factor (micro-multiples of the ideal n/8 — 1,000,000 means
    * perfectly level). The audit IS the guardrail: a skewed balance
    * column here predicts straggler write tasks before any data moves. */
  private def q178(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(round(col("l_extendedprice") * 100).cast("long").as("cents"))
    val ps = Seq(0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875)
    // collapse=false: cents are 97% unique (the q45 rule) — the collapse
    // pre-shuffle shrinks nothing. Value-identical either way.
    val cuts = Percentiles
      .exactByRank(li.withColumn("g", lit("all")), "g", "cents", ps,
        collapse = false)
      .collect()
      .map(r => math.round(r.getAs[Double]("value")))
      .sorted
    val bucket = cuts.foldLeft(lit(0L))((acc, c) =>
      acc + when(col("cents") > c, 1L).otherwise(0L))
    li.select(col("cents"), bucket.as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        min("cents").as("lo_cents"), max("cents").as("hi_cents"))
      .withColumn("balance_micro",
        expr("(2 * n_rows * 8 * 1000000 + sum(n_rows) over ()) div (2 * sum(n_rows) over ())"))
      .orderBy("bucket")
  }

  // ---------------------------------------------------------------------
  // q179 — exact phrase search via positional postings intersection
  // ---------------------------------------------------------------------

  /** Exact phrase query against a POSITIONAL inverted index: the corpus's
    * most frequent trigram (ties lexicographic — a deterministic,
    * self-contained "query") is located by intersecting the three terms'
    * posting lists on (doc_id, offset-aligned position) — the standard
    * phrase-query plan over a prebuilt index, where work is bounded by
    * posting-list mass (term document frequency), never corpus size. The
    * trigram induction pass doubles as the index-build audit: one
    * adjacency explode, one hash aggregation (q157's bigram shape widened
    * by one). Emits the phrase and the top-20 matching docs by
    * occurrence count. */
  private def q179(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"),
        array_remove(split(lower(col("text")), "\\s+"), "").as("ws"))
    val tri = docs.filter(size(col("ws")) >= 3)
      .withColumn("t1", slice(col("ws"), lit(1), size(col("ws")) - 2))
      .withColumn("t2", slice(col("ws"), lit(2), size(col("ws")) - 2))
      .withColumn("t3", slice(col("ws"), lit(3), size(col("ws")) - 2))
      .select(col("doc_id"),
        explode(arrays_zip(col("t1"), col("t2"), col("t3"))).as("tr"))
      .select(col("doc_id"), col("tr.t1").as("a"), col("tr.t2").as("b"),
        col("tr.t3").as("c"))
    val Array(pa, pb, pc) = tri.groupBy("a", "b", "c")
      .agg(count(lit(1)).as("cn"))
      .orderBy(col("cn").desc, col("a"), col("b"), col("c"))
      .limit(1).collect()(0) match {
        case r => Array(r.getString(0), r.getString(1), r.getString(2))
      }
    // the serving-path plan: postings filtered per term, intersected on
    // offset-aligned positions — each side is df(term)-sized, not corpus-
    // sized, and the (doc_id, pos) join keys are co-partitioned
    val tok = docs.select(col("doc_id"), posexplode(col("ws")).as(Seq("pos", "w")))
    val m = tok.filter(col("w") === pa).select(col("doc_id"), col("pos"))
      .join(tok.filter(col("w") === pb)
        .select(col("doc_id"), (col("pos") - 1).as("pos")), Seq("doc_id", "pos"))
      .join(tok.filter(col("w") === pc)
        .select(col("doc_id"), (col("pos") - 2).as("pos")), Seq("doc_id", "pos"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_occ"))
    m.select(lit(pa).as("a"), lit(pb).as("b"), lit(pc).as("c"),
        col("doc_id"), col("n_occ"))
      .orderBy(col("n_occ").desc, col("doc_id")).limit(20)
  }

  // ---------------------------------------------------------------------
  // q180 — retraction-aware incremental MV maintenance
  // ---------------------------------------------------------------------

  /** Materialized-view maintenance under a CDC batch WITH DELETES: the
    * per-source (n_docs, sum_chars) view is advanced by retraction
    * algebra — deletes carry weight −1, updates are delete+insert pairs —
    * so the incremental pass touches only |delta| rows, never the base
    * corpus (q134 refreshes an append-only view; this is the general
    * form a CDC-fed 100 TB store needs). Deterministic scenario: docs
    * with id % 7 = 0 are deleted, surviving docs with id % 5 = 0 get 10
    * chars appended. The ORACLE recomputes the view from the post-change
    * snapshot directly, so the hash gate IS the incremental ≡ recompute
    * proof; sources whose count reaches zero drop out of the view. */
  private def q180(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("source"), col("doc_id"), col("n_chars"))
    val baseAgg = docs.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").cast("long").as("sum_chars"))
    val del = docs.filter(col("doc_id") % 7 === 0)
      .select(col("source"), lit(-1L).as("w"), col("n_chars"))
    val updDel = docs.filter(col("doc_id") % 7 =!= 0 && col("doc_id") % 5 === 0)
      .select(col("source"), lit(-1L).as("w"), col("n_chars"))
    val updIns = docs.filter(col("doc_id") % 7 =!= 0 && col("doc_id") % 5 === 0)
      .select(col("source"), lit(1L).as("w"), (col("n_chars") + 10L).as("n_chars"))
    val deltaAgg = del.unionByName(updDel).unionByName(updIns)
      .groupBy("source")
      .agg(sum("w").cast("long").as("dn"),
        sum(col("w") * col("n_chars")).cast("long").as("dchars"))
    baseAgg.join(deltaAgg, Seq("source"), "left")
      .select(col("source"),
        (col("n_docs") + coalesce(col("dn"), lit(0L))).as("n_docs"),
        (col("sum_chars") + coalesce(col("dchars"), lit(0L))).as("sum_chars"))
      .filter(col("n_docs") > 0)
      .orderBy("source")
  }

  // ---------------------------------------------------------------------
  // q181 — exact-threshold similarity self-join via prefix filtering
  // ---------------------------------------------------------------------

  /** EXACT all-pairs Jaccard ≥ 0.6 over 3-gram shingle SETS by prefix
    * filtering (the AllPairs/PPJoin family) — the exact-threshold
    * complement of the LSH ladder (q24-q26 trade recall for speed; this
    * guarantees NO missed pair): shingles are globally ordered
    * rarest-first (df asc, shingle asc), each doc blocks only on its
    * first n − ceil(τn) + 1 shingles (any pair at τ must share a prefix
    * shingle), candidates are additionally length-filtered
    * (τ·|A| ≤ |B| ≤ |A|/τ), and survivors are verified with an exact
    * integer test — 5·|A∩B| ≥ 3·|A∪B| is τ = 3/5 with no floating point
    * anywhere. Shingles (not raw words) are what make prefix filtering
    * scale: their df is ≈ 1 outside genuine near-dups, so blocks stay
    * tiny even on a small-vocabulary corpus where word-level prefixes
    * would explode (measured: words 2 min, shingles seconds, same SF).
    * The per-doc rank window is doc-length-bounded; the df join rides
    * the shingle key it is already partitioned by. Similarity is
    * emitted as the usual micro-unit quotient. */
  private def q181(s: SparkSession, dir: String): DataFrame =
    prefixFilterJoin(t(s, dir, "documents").select("doc_id", "text"),
      Some(tok3(s, dir)), prefCacheKey = Some(s"curation|$dir|pref35"))

  /** Lowercased word-3-gram shingle instances per doc — the signature
    * table BOTH verification-tier joins (q181 PPJoin, q191 containment)
    * read four times each (df, per-doc counts, and the two re-verify
    * sides). Derived once per (session, dir) and persisted — the
    * production "materialize the signature table once" step, same policy
    * as TextOps.shared; Bench prewarms it untimed. */
  private[graft] def tok3Of(input: DataFrame): DataFrame = {
    val docs = input
      .select(col("doc_id"),
        array_remove(split(lower(col("text")), "\\s+"), "").as("ws"))
      .filter(size(col("ws")) >= 3)
    docs
      .withColumn("t1", slice(col("ws"), lit(1), size(col("ws")) - 2))
      .withColumn("t2", slice(col("ws"), lit(2), size(col("ws")) - 2))
      .withColumn("t3", slice(col("ws"), lit(3), size(col("ws")) - 2))
      .select(col("doc_id"),
        explode(array_distinct(expr(
          "transform(arrays_zip(t1, t2, t3), s -> concat_ws(' ', s.t1, s.t2, s.t3))"))).as("w"))
  }

  private def tok3(s: SparkSession, dir: String): DataFrame =
    graft.SessionCache.getOrBuild(s, s"curation|$dir|tok3")(
      // repartition before the shingle explode: the build has no exchange,
      // so the cache — which q181/q191 read four times each as the map
      // side of their joins — would otherwise materialize as ONE partition
      // (round-12; the q50/q111 rule)
      tok3Of(graft.Spread.ifNarrow(s,
        t(s, dir, "documents").select("doc_id", "text"))))

  /** Bench untimed-warmup hook (round-6 verdict #1 policy). */
  private[graft] def prewarmShared(s: SparkSession, dir: String): Unit = {
    tok3(s, dir).count()
    ()
  }

  /** The q181 core over any (doc_id, text) frame — public so the property
    * sweep can drive the REAL plan with random corpora and compare against
    * brute force (CurationPropSpec). `tokPre` lets the production query
    * read the session-cached signature table instead of re-deriving the
    * shingle explode once per downstream consumer. */
  private[graft] def prefixFilterJoin(input: DataFrame,
      tokPre: Option[DataFrame] = None,
      prefCacheKey: Option[String] = None): DataFrame = {
    val tok = tokPre.getOrElse(tok3Of(input))
    def prefPlan: DataFrame = {
      val dfs = tok.groupBy("w").agg(count(lit(1)).as("df"))
      val n = tok.groupBy("doc_id").agg(count(lit(1)).as("n"))
      // dfs is corpus-sized for shingles — join on the shingle key both
      // sides already hash-partition by, never broadcast
      val ranked = tok.join(dfs, "w").join(n, "doc_id")
        .withColumn("rk", row_number().over(
          Window.partitionBy("doc_id").orderBy("df", "w")))
      ranked
        .filter(col("rk") <= col("n") - expr("(3 * n + 4) div 5") + 1)
        .select(col("doc_id"), col("w"), col("n"))
    }
    // the candidate self-join reads pref on BOTH legs — without reuse the
    // df/count aggregations and the rank window run twice per execution.
    // Session-cached (not rebase'd): an InMemoryRelation keeps usable
    // size stats, so the downstream join strategy (hash, never
    // sort-merge — EntrySpec-asserted) is unchanged; the propspec path
    // (no key) keeps the raw plan it drives deliberately.
    val pref = prefCacheKey match {
      case Some(k) => graft.SessionCache.getOrBuild(input.sparkSession, k)(prefPlan)
      case None => prefPlan
    }
    val cand = pref.as("x").join(pref.as("y"),
        col("x.w") === col("y.w") && col("x.doc_id") < col("y.doc_id") &&
          col("y.n") * 5 >= col("x.n") * 3 && col("y.n") * 3 <= col("x.n") * 5)
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b_id"),
        col("x.n").as("na"), col("y.n").as("nb"))
      .distinct()
    cand
      .join(tok.as("ta"), col("a") === col("ta.doc_id"))
      .join(tok.as("tb"), col("b_id") === col("tb.doc_id") && col("ta.w") === col("tb.w"))
      .groupBy("a", "b_id", "na", "nb").agg(count(lit(1)).as("inter"))
      .withColumn("uni", col("na") + col("nb") - col("inter"))
      .filter(col("inter") * 5 >= col("uni") * 3)
      .select(col("a"), col("b_id"), col("inter"), col("uni"),
        expr("(2 * inter * 1000000 + uni) div (2 * uni)").as("jac_micro"))
      .orderBy(col("jac_micro").desc, col("a"), col("b_id")).limit(50)
  }

  // ---------------------------------------------------------------------
  // q182 — exact 7-day rolling distinct users (window-explode)
  // ---------------------------------------------------------------------

  /** Exact rolling 7-day active users per day — the metric a naive
    * rolling SUM of daily distincts gets wrong (users active on several
    * days double-count). The scalable exact plan is the window-explode
    * trick: dedup to (user, day) first (bounds the blowup at its
    * source), explode each day into the ≤ 7 window-ends it contributes
    * to — a LINEAR ×7 fan-out, no range join, no quadratic self-join —
    * keep only window-ends that are real days (broadcast semi join
    * against the tiny day dimension), and count distinct per window-end.
    * Work is 7 × |user-days| regardless of corpus size; the range-join
    * formulation the oracle uses would be a broadcast-nested-loop at
    * scale. */
  private def q182(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(to_date(col("ts")).as("d"), col("user_id")).distinct()
    val days = ev.select(col("d").as("wend")).distinct()
    ev.select(explode(sequence(col("d"), date_add(col("d"), 6))).as("wend"),
        col("user_id"))
      .join(broadcast(days), Seq("wend"), "left_semi")
      .groupBy("wend")
      .agg(countDistinct("user_id").as("n_active"))
      .orderBy("wend")
  }

  // ---------------------------------------------------------------------
  // q183 — weighted median price per nation (integer-exact)
  // ---------------------------------------------------------------------

  /** Quantity-weighted median lineitem price per supplier nation: the
    * smallest price whose cumulative weight reaches half the total —
    * selected by the integer test 2·cum ≥ W, so no division or double
    * ever occurs. The cumulative window runs over the per-nation
    * DISTINCT price spectrum (already aggregated — the q159 rule), never
    * raw rows; nation/supplier dims broadcast. The unweighted
    * exactByRank machinery (q136/q178) is the documented alternative
    * when even the distinct spectrum is too wide per group. */
  private def q183(s: SparkSession, dir: String): DataFrame = {
    val sup = t(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
    val nat = t(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
    val byVal = t(s, dir, "lineitem")
      .select(col("l_suppkey"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"),
        col("l_quantity").cast("long").as("qty"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name", "cents").agg(sum("qty").as("w"))
    val tot = byVal.groupBy("n_name").agg(sum("w").cast("long").as("tw"))
    byVal
      .withColumn("cw", sum("w").over(
        Window.partitionBy("n_name").orderBy("cents")
          .rowsBetween(Window.unboundedPreceding, 0)))
      .join(broadcast(tot), "n_name")
      .groupBy("n_name", "tw")
      .agg(min(when(col("cw") * 2 >= col("tw"), col("cents"))).as("median_cents"))
      .select(col("n_name"), col("tw").as("total_qty"), col("median_cents"))
      .orderBy("n_name")
  }

  // ---------------------------------------------------------------------
  // q184 — percent-of-parent revenue shares (region → nation hierarchy)
  // ---------------------------------------------------------------------

  /** Two-level percent-of-parent report: each nation's revenue share
    * within its region and each region's share of the total — the OLAP
    * reporting primitive behind every drill-down dashboard. One
    * aggregation builds the (region, nation) leaf table; parent totals
    * are re-aggregations of that tiny result joined back broadcast (never
    * a second base-table scan); every share is the exact micro-unit
    * quotient. Revenue rides integer cents from the scan up. */
  private def q184(s: SparkSession, dir: String): DataFrame = {
    val sup = t(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
    val nat = t(s, dir, "nation")
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    val reg = t(s, dir, "region").select(col("r_regionkey"), col("r_name"))
    val leaf = t(s, dir, "lineitem")
      .select(col("l_suppkey"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(sum("cents").cast("long").as("cents"))
    val regTot = leaf.groupBy("r_name").agg(sum("cents").cast("long").as("rc"))
    val allTot = leaf.agg(sum("cents").cast("long").as("tc"))
    leaf.join(broadcast(regTot), "r_name").crossJoin(broadcast(allTot))
      .select(col("r_name"), col("n_name"), col("cents"),
        (expr("(2 * cents * 1000000 + rc) div (2 * rc)")
          .cast("double") / 1000000.0).as("nation_share"),
        (expr("(2 * rc * 1000000 + tc) div (2 * tc)")
          .cast("double") / 1000000.0).as("region_share"))
      .orderBy("r_name", "n_name")
  }

  // ---------------------------------------------------------------------
  // q191 — containment similarity join (near-subset detection)
  // ---------------------------------------------------------------------

  /** ASYMMETRIC containment join: all ordered pairs with
    * |A∩B| / |A| ≥ 4/5 over the q181 3-gram shingle sets — the near-
    * SUBSET detector (a doc embedded inside a longer one: quote farms,
    * aggregator pages, truncated re-crawls) that symmetric Jaccard
    * misses by construction (a small doc inside a huge one has tiny
    * Jaccard but containment 1). Prefix filtering adapts to asymmetry:
    * only the PROBE side prefixes (first n_A − ceil(4·n_A/5) + 1
    * shingles, rarest-first) — the indexed side must keep FULL posting
    * lists because a containing doc may match anywhere in its set (the
    * fundamental extra cost of subset semantics); candidates are
    * length-filtered (5·n_B ≥ 4·n_A) and survivors verified by the
    * exact integer test 5·|A∩B| ≥ 4·|A|. The ORACLE is brute-force
    * all-pairs, so the driver's hash gate IS the no-missed-pair proof
    * for the prefix filter (q181's spec-level guarantee, promoted to
    * the oracle itself). Containment is emitted as the micro-unit
    * quotient; the top-50 cut is totally ordered. */
  private def q191(s: SparkSession, dir: String): DataFrame =
    containmentJoin(t(s, dir, "documents").select("doc_id", "text"),
      Some(tok3(s, dir)))

  /** The q191 core over any (doc_id, text) frame — exposed so the property
    * sweep can drive the REAL plan with random corpora and prove the
    * asymmetric prefix filter misses no pair (CurationPropSpec). `tokPre`
    * as in [[prefixFilterJoin]]. */
  private[graft] def containmentJoin(input: DataFrame,
      tokPre: Option[DataFrame] = None): DataFrame = {
    val tok = tokPre.getOrElse(tok3Of(input))
    val dfs = tok.groupBy("w").agg(count(lit(1)).as("df"))
    val n = tok.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val ranked = tok.join(dfs, "w").join(n, "doc_id")
      .withColumn("rk", row_number().over(
        Window.partitionBy("doc_id").orderBy("df", "w")))
    val pref = ranked
      .filter(col("rk") <= col("n") - expr("(4 * n + 4) div 5") + 1)
      .select(col("doc_id").as("a"), col("w"), col("n").as("na"))
    val full = tok.join(n, "doc_id")
      .select(col("doc_id").as("b_id"), col("w"), col("n").as("nb"))
    val cand = pref.join(full, Seq("w"))
      .filter(col("a") =!= col("b_id") && col("nb") * 5 >= col("na") * 4)
      .select("a", "b_id", "na").distinct()
    cand
      .join(tok.as("ta"), col("a") === col("ta.doc_id"))
      .join(tok.as("tb"), col("b_id") === col("tb.doc_id") && col("ta.w") === col("tb.w"))
      .groupBy("a", "b_id", "na").agg(count(lit(1)).as("inter"))
      .filter(col("inter") * 5 >= col("na") * 4)
      .select(col("a"), col("b_id"), col("na"), col("inter"),
        expr("(2 * inter * 1000000 + na) div (2 * na)").as("containment_micro"))
      .orderBy(col("containment_micro").desc, col("a"), col("b_id")).limit(50)
  }

  // ---------------------------------------------------------------------
  // q190 — corpus-frequency boilerplate pruning with document reassembly
  // ---------------------------------------------------------------------

  /** The common-crawl boilerplate-removal shape: tokenize each document
    * into positioned units, compute each unit's DOCUMENT frequency within
    * its source, drop units present in ≥ 85% of that source's documents
    * (20·docf ≥ 17·n_docs — integer test, no ratio), and REASSEMBLE the
    * surviving units in original order. On real corpora the unit is a
    * line (nav bars, cookie banners repeat verbatim across a domain); on
    * this whitespace corpus it is the word — the plan is identical:
    * explode with position, one (source, unit) aggregation for df, an
    * anti join back, and an order-restoring re-aggregation
    * (array_sort over (pos, unit) structs — no per-doc sort window).
    * The cleaned text is pinned by md5 fingerprint, so the oracle proves
    * byte-identical reassembly, not just matching counts. Docs whose
    * every unit is boilerplate survive with an empty cleaned text (the
    * left join + coalesce path the naive inner-join plan would drop). */
  private def q190(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select("doc_id", "source", "text")
    val tok = docs.select(col("doc_id"), col("source"),
      posexplode(array_remove(split(lower(col("text")), "\\s+"), "")).as(Seq("pos", "w")))
    val nDocs = docs.groupBy("source").agg(count(lit(1)).as("nd"))
    val dfs = tok.select("source", "w", "doc_id").distinct()
      .groupBy("source", "w").agg(count(lit(1)).as("docf"))
    val boiler = dfs.join(broadcast(nDocs), "source")
      .filter(col("docf") * 20 >= col("nd") * 17)
      .select(col("source"), col("w"))
    val kept = tok.join(boiler, Seq("source", "w"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        md5(array_join(expr(
          "transform(array_sort(collect_list(struct(pos, w))), x -> x.w)"),
          " ")).as("cleaned_fp"))
    val totals = tok.groupBy("doc_id").agg(count(lit(1)).as("n_words"))
    docs.join(totals, "doc_id").join(kept, Seq("doc_id"), "left_outer")
      .filter(col("doc_id") < 20)
      .select(col("doc_id"), col("source"), col("n_words"),
        (col("n_words") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"),
        coalesce(col("cleaned_fp"), md5(lit(""))).as("cleaned_fp"))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------------
  // q193 — largest-remainder quota allocation (exact stratified sampling plan)
  // ---------------------------------------------------------------------

  /** EXACT proportional allocation of a fixed sampling budget (N = 1000
    * slots) across (source, lang) strata by the largest-remainder
    * (Hamilton) method: base_g = ⌊n_g·N/T⌋, and the L = N − Σ base_g
    * leftover slots go to the strata with the largest remainders
    * (ties broken by stratum key — total order, no float). This is the
    * sampling-plan step every "take exactly N docs, stratified like the
    * corpus" job needs — naive per-stratum rounding over- or under-
    * shoots the budget; largest-remainder is the standard exact fix.
    * Pure integer arithmetic end to end (products, div, mod), so both
    * engines agree bit-for-bit; the remainder rank runs on the
    * AGGREGATED stratum table (a few dozen rows — the q159 aggregated-
    * dimension window rule, not a corpus-sized sort). The quota column
    * sums to exactly N by construction, which the spec asserts. */
  private def q193(s: SparkSession, dir: String): DataFrame =
    hamiltonQuotas(t(s, dir, "documents")
      .groupBy("source", "lang").agg(count(lit(1)).as("n_docs")), 1000L)

  /** The q193 core over any (source, lang, n_docs) stratum frame —
    * exposed so the property sweep can drive the REAL plan with random
    * strata and assert the apportionment invariants (CurationPropSpec). */
  private[graft] def hamiltonQuotas(strata: DataFrame, slots: Long): DataFrame = {
    val tot = strata.agg(sum("n_docs").as("t"))
    val based = strata.crossJoin(broadcast(tot))
      .withColumn("base", expr(s"n_docs * ${slots}L div t"))
      .withColumn("rem", expr(s"n_docs * ${slots}L % t"))
    val sb = based.agg(sum("base").as("sb"))
    val w = Window.orderBy(col("rem").desc, col("source"), col("lang"))
    based.crossJoin(broadcast(sb))
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("quota",
        col("base") + when(col("rk") <= lit(slots) - col("sb"), 1L).otherwise(0L))
      .select("source", "lang", "n_docs", "base", "rem", "quota")
      .orderBy("source", "lang")
  }

  // ---------------------------------------------------------------------
  // q197 — quota execution: exact stratified sample by deterministic hash order
  // ---------------------------------------------------------------------

  /** EXECUTES the q193 sampling plan: inside each (source, lang) stratum,
    * rank documents by md5(doc_id) (a deterministic, content-independent
    * "random" order — stable across retries, engines, and partitionings)
    * and keep exactly quota_g of them, so the final sample hits the
    * 1000-doc budget exactly with the corpus's stratum proportions. This
    * is the plan→execution composition a real curation run performs; the
    * per-stratum rank is a keyed window (shuffle-parallel across strata,
    * never a global sort), and the emitted per-stratum digest (count +
    * id-sum + id-hash-sum) pins the exact selected SET in the oracle
    * without materializing 1000 rows of output. If the budget exceeds the
    * corpus (sf0.001), oversubscribed strata yield all their docs —
    * `pos <= quota` clamps naturally; with corpus ≥ budget the sample
    * hits N exactly (spec-asserted both ways). */
  private def q197(s: SparkSession, dir: String): DataFrame = {
    val slots = 1000L
    val docs = t(s, dir, "documents").select("doc_id", "source", "lang")
    val strata = docs.groupBy("source", "lang").agg(count(lit(1)).as("n_docs"))
    val tot = strata.agg(sum("n_docs").as("t"))
    val based = strata.crossJoin(broadcast(tot))
      .withColumn("base", expr(s"n_docs * ${slots}L div t"))
      .withColumn("rem", expr(s"n_docs * ${slots}L % t"))
    val sb = based.agg(sum("base").as("sb"))
    val wq = Window.orderBy(col("rem").desc, col("source"), col("lang"))
    val quotas = based.crossJoin(broadcast(sb))
      .withColumn("rk", row_number().over(wq).cast("long"))
      .withColumn("quota",
        col("base") + when(col("rk") <= lit(slots) - col("sb"), 1L).otherwise(0L))
      .select("source", "lang", "quota")
    val wr = Window.partitionBy("source", "lang")
      .orderBy(col("h"), col("doc_id"))
    docs.withColumn("h", md5(col("doc_id").cast("string")))
      .withColumn("pos", row_number().over(wr).cast("long"))
      .join(broadcast(quotas), Seq("source", "lang"))
      .filter(col("pos") <= col("quota"))
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_sampled"),
        sum("doc_id").as("id_sum"),
        sum(expr("cast(conv(substring(h, 1, 8), 16, 10) as bigint)")).as("h_sum"))
      .orderBy("source", "lang")
  }

  /** Training-reader epoch plan — the consumption side of the WebDataset
    * tar sink (sinks/Tar.scala): each epoch draws a fresh seeded
    * permutation of the shard list (the portable multiplicative hash of
    * q13, so the oracle replays it exactly) and deals shards to W workers
    * round-robin by rank. Deterministic and coordination-free: every
    * worker derives its own shard list from (epoch, W, worker). The
    * per-(epoch, worker) rollup carries shard/doc/char loads plus a
    * permutation signature — epochs provably differ while each covers
    * every shard exactly once. Scale: the shuffle is over the SHARD LIST
    * (|corpus| / shard_size rows), never documents. */
  private def q213(s: SparkSession, dir: String): DataFrame = {
    val shards = t(s, dir, "documents")
      .groupBy(expr("CAST(doc_id div 64 AS BIGINT)").as("shard_id"))
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_chars"))
    val we = Window.partitionBy("epoch").orderBy("h", "shard_id")
    shards
      .withColumn("epoch", explode(array(lit(0L), lit(1L), lit(2L))))
      .withColumn("h", expr("((shard_id * 2654435761 + epoch * 97 + 7) % 4294967296)"))
      .withColumn("rk", row_number().over(we).cast("long"))
      .withColumn("worker", expr("(rk - 1) % 8"))
      .groupBy("epoch", "worker")
      .agg(count(lit(1)).as("n_shards"),
        sum("n_docs").as("n_docs"),
        sum("n_chars").as("n_chars"),
        sum(expr("shard_id * rk")).as("perm_sig"))
      .orderBy("epoch", "worker")
  }

  // ---------------------------------------------------------------------
  // q219 — DSIR hashed-n-gram importance weighting
  // ---------------------------------------------------------------------

  /** Data Selection via Importance Resampling (Xie et al., 2023): score
    * every document by how much more likely its hashed n-gram features are
    * under a TARGET distribution (here the curated proxy `src0`) than
    * under the raw corpus. The model is a 1024-bucket hashed bigram
    * table — tiny by construction (that is DSIR's point), so it collects
    * to the driver (≤ B rows, corpus-size-independent — the same bounded-
    * collect class as q77's codebook) and rides back as a broadcast
    * literal array; scoring is then a PER-ROW fold over the document's
    * gram buckets with zero shuffle before the final per-source rollup —
    * one corpus pass at 100 TB.
    *
    * Two scores per document: the float log importance weight
    * Σ_g [ln p̂_target(b(g)) − ln p̂_raw(b(g))] (add-one smoothed), and an
    * EXACT integer enrichment score (2·|grams in target-enriched buckets|
    * − |grams|, enrichment decided by the cross-multiplied integer test
    * (ct+1)(Nr+B) > (cr+1)(Nt+B)) so the selection count in the gate is
    * immune to libm ulp skew. Gram hashing is the established
    * `conv(substr(md5,1,8),16,10)` cross-engine form. */
  /** Gram buckets (unigrams then bigrams, in document order) — a compiled
    * UDF rather than a `transform(..., md5)` HOF: Catalyst lambda bodies
    * evaluate INTERPRETED per element (the q34 lesson), and at sf0.1 the
    * interpreted md5+conv per gram plus a per-element `element_at` on a
    * 1024-slot literal array made q219 the slowest query of the whole
    * sweep (21 s; this form runs it in ~1 s). The UDF computes the
    * IDENTICAL integer arithmetic: first 4 md5 bytes as an unsigned int
    * (the established conv(substr(md5,1,8),16,10) form), mod 1024. */
  private val dsirBuckets = udf { (w: Seq[String]) =>
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(g: String): Long = {
      val d = md.digest(g.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      md.reset()
      val h4 = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      h4 % 1024L
    }
    val out = new Array[Long](2 * w.length - 1)
    var i = 0
    while (i < w.length) { out(i) = bucket(w(i)); i += 1 }
    i = 0
    while (i + 1 < w.length) { out(w.length + i) = bucket(w(i) + " " + w(i + 1)); i += 1 }
    out.toSeq
  }

  private def q219(s: SparkSession, dir: String): DataFrame = {
    val B = 1024
    val docs = graft.Spread.ifNarrow(s, t(s, dir, "documents"))
      // narrow source; dsirBuckets is md5-per-gram and `docs` feeds
      // BOTH the bucket count and the scoring pass (q50/q111 rule)
      .select(col("doc_id"), col("source"),
        array_remove(split(col("text"), "\\s+"), "").as("w"))
      .filter(size(col("w")) >= 3)
      .withColumn("bk", dsirBuckets(col("w")))
    val cnt = docs.select(col("source"), explode(col("bk")).as("b"))
      .groupBy("b")
      .agg(count(lit(1)).as("cr"),
        sum(when(col("source") === "src0", 1L).otherwise(0L)).as("ct"))
      .collect()                                   // ≤ B rows — bounded
    val nr = cnt.map(_.getLong(1)).sum
    val nt = cnt.map(_.getLong(2)).sum
    val lam = Array.fill(B)(math.log(nr + B.toDouble) - math.log(nt + B.toDouble))
    val enr = Array.fill(B)(if (nr + B > nt + B) 1L else 0L)
    cnt.foreach { r =>
      val b = r.getLong(0).toInt; val cr = r.getLong(1); val ct = r.getLong(2)
      lam(b) = math.log(ct + 1.0) - math.log(nt + B.toDouble) -
        math.log(cr + 1.0) + math.log(nr + B.toDouble)
      enr(b) = if ((ct + 1) * (nr + B) > (cr + 1) * (nt + B)) 1L else 0L
    }
    // per-doc fold over the bucket list with the model captured in the
    // closure (8 KB, task-serialized) — same left-to-right order as the
    // bucket list itself (unigrams then bigrams)
    val fold = udf { (bk: Seq[Long]) =>
      var ne = 0L; var lw = 0.0d; var i = 0
      while (i < bk.length) { val b = bk(i).toInt; ne += enr(b); lw += lam(b); i += 1 }
      (ne, lw)
    }
    docs
      .withColumn("n_grams", size(col("bk")).cast("long"))
      .withColumn("sc", fold(col("bk")))
      .withColumn("n_enr", col("sc._1"))
      .withColumn("logw", col("sc._2"))
      .withColumn("score", col("n_enr") * 2 - col("n_grams"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_grams").as("n_grams"),
        sum("score").as("sum_score"),
        sum(when(col("score") > 0, 1L).otherwise(0L)).as("n_sel"),
        round(avg("logw"), 4).as("avg_logw"))
      .orderBy("source")
  }

  // ---------------------------------------------------------------------
  // q228 — size-balanced output-shard planning (serpentine LPT)
  // ---------------------------------------------------------------------

  /** The shard bin-packing planner every shard writer (tar/LMDB/parquet)
    * runs before writing: assign documents to K=16 output shards balanced
    * by BYTES, not count — a modulo split over doc ids leaves shards as
    * unbalanced as the size distribution is skewed, and unbalanced shards
    * become stragglers for every downstream trainer epoch. The classic
    * distributed-friendly approximation of LPT (longest processing time
    * first): one global sort by (n_chars desc, doc_id), then SERPENTINE
    * striping — group g of K docs deals left-to-right when g is even and
    * right-to-left when odd, so the "k-th largest in every group" bias of
    * plain round-robin cancels pairwise and max/min shard bytes → 1 as
    * n/K grows. Fully deterministic: the member signature (sum of a
    * multiplicative hash of (doc_id, shard)) pins the exact assignment,
    * not just the totals.
    *
    * Scale shape: ONE range exchange (the global sort), ranks via
    * per-partition zipWithIndex offsets ([[Ranks.seqIdBy]] — no
    * single-partition window anywhere), then per-row arithmetic and a
    * K-row rollup. The imbalance figure is an exact integer ppm ratio
    * (max·10⁶ div min) so no float reaches the output. */
  private def q228(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("n_chars"))
    val ranked = Ranks.seqIdBy(docs, "rn", col("n_chars").desc, col("doc_id").asc)
    val assigned = ranked
      .withColumn("g", expr("CAST((rn - 1) DIV 16 AS BIGINT)"))
      .withColumn("p", expr("CAST((rn - 1) % 16 AS BIGINT)"))
      .withColumn("shard_id",
        when(col("g") % 2 === 0, col("p")).otherwise(lit(15L) - col("p")))
      .withColumn("h", expr("(doc_id * 2654435761L + shard_id) % 4294967296L"))
    val perShard = assigned.groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").cast("long").as("shard_chars"),
        sum("h").cast("long").as("member_sig"))
    val spread = perShard.agg(
      max("shard_chars").as("mx"), min("shard_chars").as("mn"))
    perShard.crossJoin(broadcast(spread))
      .withColumn("imb_ppm", expr("CAST((mx * 1000000L) DIV mn AS BIGINT)"))
      .select("shard_id", "n_docs", "shard_chars", "member_sig", "imb_ppm")
      .orderBy("shard_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q228_shard_binpack" -> (q228 _),
    "q219_dsir_weights" -> (q219 _),
    "q213_epoch_shuffle" -> (q213 _),
    "q197_quota_sample" -> (q197 _),
    "q193_quota_alloc" -> (q193 _),
    "q191_containment_join" -> (q191 _),
    "q190_boilerplate_prune" -> (q190 _),
    "q174_table_checksum" -> (q174 _),
    "q175_domain_cap" -> (q175 _),
    "q176_mixture_weights" -> (q176 _),
    "q177_first_touch" -> (q177 _),
    "q178_range_plan" -> (q178 _),
    "q179_phrase_search" -> (q179 _),
    "q180_retractable_mv" -> (q180 _),
    "q181_prefix_filter_join" -> (q181 _),
    "q182_rolling_distinct" -> (q182 _),
    "q183_weighted_median" -> (q183 _),
    "q184_hierarchy_shares" -> (q184 _)
  )

  val oracles: Map[String, String] = Map(
    "q228_shard_binpack" ->
      """WITH r AS (SELECT doc_id, n_chars,
        |    row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM documents),
        |a AS (SELECT doc_id, n_chars,
        |    CASE WHEN ((rn - 1) // 16) % 2 = 0 THEN (rn - 1) % 16
        |         ELSE 15 - ((rn - 1) % 16) END AS shard_id
        |  FROM r),
        |p AS (SELECT shard_id, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_chars) AS BIGINT) AS shard_chars,
        |    CAST(sum((doc_id * 2654435761 + shard_id) % 4294967296) AS BIGINT) AS member_sig
        |  FROM a GROUP BY 1),
        |s AS (SELECT max(shard_chars) AS mx, min(shard_chars) AS mn FROM p)
        |SELECT shard_id, n_docs, shard_chars, member_sig,
        |  CAST((mx * 1000000) // mn AS BIGINT) AS imb_ppm
        |FROM p, s ORDER BY shard_id""".stripMargin,
    "q219_dsir_weights" ->
      """WITH w AS (SELECT doc_id, source, list_filter(regexp_split_to_array(text,'\s+'), t -> t <> '') AS w FROM documents),
        |wf AS (SELECT * FROM w WHERE len(w) >= 3),
        |g AS (SELECT doc_id, source, list_concat(w, [w[i+1] || ' ' || w[i+2] for i in range(len(w)-1)]) AS grams FROM wf),
        |tok AS (SELECT doc_id, source, CAST(('0x'||substr(md5(gr),1,8)) AS BIGINT) % 1024 AS b
        |  FROM (SELECT doc_id, source, unnest(grams) AS gr FROM g)),
        |cnt AS (SELECT b, CAST(count(*) AS BIGINT) AS cr,
        |    CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS ct
        |  FROM tok GROUP BY 1),
        |tot AS (SELECT CAST(sum(cr) AS BIGINT) AS nr, CAST(sum(ct) AS BIGINT) AS nt FROM cnt),
        |lam AS (SELECT b,
        |    ln(ct + 1.0) - ln(nt + 1024.0) - ln(cr + 1.0) + ln(nr + 1024.0) AS lam,
        |    CASE WHEN (ct + 1) * (nr + 1024) > (cr + 1) * (nt + 1024) THEN 1 ELSE 0 END AS enr
        |  FROM cnt CROSS JOIN tot),
        |pd AS (SELECT tok.doc_id, tok.source, CAST(count(*) AS BIGINT) AS n_grams,
        |    CAST(sum(enr) AS BIGINT) AS n_enr, sum(lam.lam) AS logw
        |  FROM tok JOIN lam USING (b) GROUP BY 1, 2),
        |sc AS (SELECT source, n_grams, 2 * n_enr - n_grams AS score, logw FROM pd)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_grams) AS BIGINT) AS n_grams,
        |  CAST(sum(score) AS BIGINT) AS sum_score,
        |  CAST(sum(CASE WHEN score > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_sel,
        |  round(avg(logw), 4) AS avg_logw
        |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin,
    "q213_epoch_shuffle" ->
      """WITH shards AS (SELECT CAST(doc_id // 64 AS BIGINT) AS shard_id,
        |  CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_chars
        |  FROM documents GROUP BY 1),
        |e AS (SELECT s.*, g.epoch,
        |  ((s.shard_id * 2654435761 + g.epoch * 97 + 7) % 4294967296) AS h
        |  FROM shards s, (SELECT unnest([0, 1, 2]) AS epoch) g),
        |r AS (SELECT *, CAST(row_number() OVER
        |    (PARTITION BY epoch ORDER BY h, shard_id) AS BIGINT) AS rk FROM e)
        |SELECT CAST(epoch AS BIGINT) AS epoch, (rk - 1) % 8 AS worker,
        |  CAST(count(*) AS BIGINT) AS n_shards,
        |  CAST(sum(n_docs) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS n_chars,
        |  CAST(sum(shard_id * rk) AS BIGINT) AS perm_sig
        |FROM r GROUP BY 1, 2 ORDER BY epoch, worker""".stripMargin,
    "q197_quota_sample" ->
      """WITH strata AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY source, lang),
        |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS t FROM strata),
        |based AS (SELECT source, lang, n_docs,
        |    CAST(n_docs * 1000 // t AS BIGINT) AS base,
        |    CAST(n_docs * 1000 % t AS BIGINT) AS rem
        |  FROM strata, tot),
        |sb AS (SELECT CAST(sum(base) AS BIGINT) AS sb FROM based),
        |q AS (SELECT source, lang,
        |    CAST(base + CASE WHEN row_number() OVER (ORDER BY rem DESC, source, lang)
        |      <= 1000 - sb THEN 1 ELSE 0 END AS BIGINT) AS quota
        |  FROM based, sb),
        |ranked AS (SELECT d.source, d.lang, d.doc_id, md5(CAST(d.doc_id AS VARCHAR)) AS h,
        |    row_number() OVER (PARTITION BY d.source, d.lang
        |      ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id) AS pos
        |  FROM documents d),
        |kept AS (SELECT r.* FROM ranked r JOIN q
        |  ON r.source = q.source AND r.lang = q.lang
        |  WHERE r.pos <= q.quota)
        |SELECT source, lang, CAST(count(*) AS BIGINT) AS n_sampled,
        |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
        |  CAST(sum(('0x' || substring(h, 1, 8))::BIGINT) AS BIGINT) AS h_sum
        |FROM kept GROUP BY source, lang ORDER BY source, lang""".stripMargin,
    "q193_quota_alloc" ->
      """WITH strata AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY source, lang),
        |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS t FROM strata),
        |based AS (SELECT source, lang, n_docs,
        |    CAST(n_docs * 1000 // t AS BIGINT) AS base,
        |    CAST(n_docs * 1000 % t AS BIGINT) AS rem
        |  FROM strata, tot),
        |sb AS (SELECT CAST(sum(base) AS BIGINT) AS sb FROM based),
        |rk AS (SELECT *, row_number() OVER (ORDER BY rem DESC, source, lang) AS rk
        |  FROM based, sb)
        |SELECT source, lang, n_docs, base, rem,
        |  CAST(base + CASE WHEN rk <= 1000 - sb THEN 1 ELSE 0 END AS BIGINT) AS quota
        |FROM rk ORDER BY source, lang""".stripMargin,
    // brute-force all-pairs: the hash gate itself proves the prefix
    // filter missed no pair (the exact verification filter makes the
    // candidate-generation strategy invisible in the final result)
    "q191_containment_join" ->
      """WITH w0 AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS ws
        |  FROM documents),
        |tok AS (SELECT DISTINCT doc_id, w FROM (
        |    SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS w
        |    FROM w0, unnest(range(1, len(ws) - 1)) AS t(i)
        |    WHERE len(ws) >= 3)),
        |n AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY doc_id),
        |i AS (SELECT ta.doc_id AS a, tb.doc_id AS b_id, CAST(count(*) AS BIGINT) AS inter
        |  FROM tok ta JOIN tok tb ON ta.w = tb.w AND ta.doc_id <> tb.doc_id
        |  GROUP BY 1, 2)
        |SELECT i.a, i.b_id, na.n AS na, i.inter,
        |  CAST((2 * i.inter * 1000000 + na.n) // (2 * na.n) AS BIGINT) AS containment_micro
        |FROM i JOIN n na ON na.doc_id = i.a
        |WHERE i.inter * 5 >= na.n * 4
        |ORDER BY containment_micro DESC, i.a, i.b_id LIMIT 50""".stripMargin,
    "q190_boilerplate_prune" ->
      """WITH w AS (SELECT doc_id, source,
        |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS ws
        |  FROM documents),
        |tok AS (SELECT doc_id, source, i AS pos, ws[i+1] AS w
        |  FROM w, unnest(range(0, len(ws))) AS t(i)),
        |nd AS (SELECT source, CAST(count(*) AS BIGINT) AS nd FROM documents GROUP BY source),
        |dfs AS (SELECT source, w, CAST(count(DISTINCT doc_id) AS BIGINT) AS docf
        |  FROM tok GROUP BY source, w),
        |boiler AS (SELECT dfs.source, dfs.w FROM dfs JOIN nd ON dfs.source = nd.source
        |  WHERE dfs.docf * 20 >= nd.nd * 17),
        |kept AS (SELECT tok.doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |    md5(string_agg(tok.w, ' ' ORDER BY tok.pos)) AS cleaned_fp
        |  FROM tok ANTI JOIN boiler ON tok.source = boiler.source AND tok.w = boiler.w
        |  GROUP BY tok.doc_id),
        |tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words FROM tok GROUP BY doc_id)
        |SELECT d.doc_id, d.source, tot.n_words,
        |  CAST(tot.n_words - coalesce(kept.n_kept, 0) AS BIGINT) AS n_dropped,
        |  coalesce(kept.cleaned_fp, md5('')) AS cleaned_fp
        |FROM documents d JOIN tot ON d.doc_id = tot.doc_id
        |LEFT JOIN kept ON d.doc_id = kept.doc_id
        |WHERE d.doc_id < 20 ORDER BY d.doc_id""".stripMargin,
    "q174_table_checksum" ->
      """WITH h AS (
        |  SELECT 'orders' AS tbl,
        |    CAST(('0x' || substring(md5(concat_ws('|', o_orderkey, o_custkey,
        |      CAST(round(o_totalprice * 100) AS BIGINT))), 1, 8)) AS BIGINT) AS h
        |  FROM orders
        |  UNION ALL
        |  SELECT 'lineitem' AS tbl,
        |    CAST(('0x' || substring(md5(concat_ws('|', l_orderkey, l_linenumber,
        |      CAST(round(l_extendedprice * 100) AS BIGINT))), 1, 8)) AS BIGINT) AS h
        |  FROM lineitem)
        |SELECT tbl, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CAST(h AS HUGEINT)) % 4294967296 AS BIGINT) AS checksum
        |FROM h GROUP BY tbl ORDER BY tbl""".stripMargin,
    "q175_domain_cap" ->
      """WITH r AS (SELECT source, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id ASC) AS rk
        |  FROM documents),
        |k AS (SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
        |    CAST(sum(n_chars) AS BIGINT) AS kept_chars,
        |    CAST(sum(doc_id) AS BIGINT) AS kept_id_sum
        |  FROM r WHERE rk <= 3 GROUP BY source),
        |tot AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_chars) AS BIGINT) AS total_chars
        |  FROM documents GROUP BY source)
        |SELECT tot.source, n_docs, total_chars, n_kept, kept_chars, kept_id_sum
        |FROM tot JOIN k ON tot.source = k.source ORDER BY tot.source""".stripMargin,
    "q176_mixture_weights" ->
      """WITH w AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(floor(sqrt(CAST(count(*) AS DOUBLE) * 1000000000000.0)) AS BIGINT) AS w
        |  FROM documents GROUP BY lang),
        |tot AS (SELECT CAST(sum(w) AS BIGINT) AS tw,
        |    CAST(sum(n_docs) AS BIGINT) AS tn FROM w)
        |SELECT lang, n_docs,
        |  CAST((2 * n_docs * 1000000 + tn) // (2 * tn) AS DOUBLE) / 1000000.0 AS raw_share,
        |  CAST((2 * w * 1000000 + tw) // (2 * tw) AS DOUBLE) / 1000000.0 AS t05_share
        |FROM w, tot ORDER BY lang""".stripMargin,
    "q177_first_touch" ->
      """WITH ev AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es,
        |    event_id, event_type FROM events),
        |f AS (SELECT user_id, event_type AS channel FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id
        |      ORDER BY es ASC, event_id ASC) AS rk FROM ev)
        |  WHERE rk = 1)
        |SELECT channel, CAST(count(DISTINCT f.user_id) AS BIGINT) AS n_users,
        |  CAST(count(o.o_orderkey) AS BIGINT) AS n_orders,
        |  CAST(coalesce(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)), 0) AS BIGINT)
        |    AS revenue_cents
        |FROM f LEFT JOIN orders o ON o.o_custkey = f.user_id
        |GROUP BY channel ORDER BY channel""".stripMargin,
    "q178_range_plan" ->
      """WITH li AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM lineitem),
        |c AS (SELECT
        |    CAST(round(quantile_cont(cents, 0.125), 0) AS BIGINT) AS c1,
        |    CAST(round(quantile_cont(cents, 0.25), 0) AS BIGINT) AS c2,
        |    CAST(round(quantile_cont(cents, 0.375), 0) AS BIGINT) AS c3,
        |    CAST(round(quantile_cont(cents, 0.5), 0) AS BIGINT) AS c4,
        |    CAST(round(quantile_cont(cents, 0.625), 0) AS BIGINT) AS c5,
        |    CAST(round(quantile_cont(cents, 0.75), 0) AS BIGINT) AS c6,
        |    CAST(round(quantile_cont(cents, 0.875), 0) AS BIGINT) AS c7
        |  FROM li),
        |b AS (SELECT cents,
        |    (CASE WHEN cents > c1 THEN 1 ELSE 0 END) + (CASE WHEN cents > c2 THEN 1 ELSE 0 END)
        |    + (CASE WHEN cents > c3 THEN 1 ELSE 0 END) + (CASE WHEN cents > c4 THEN 1 ELSE 0 END)
        |    + (CASE WHEN cents > c5 THEN 1 ELSE 0 END) + (CASE WHEN cents > c6 THEN 1 ELSE 0 END)
        |    + (CASE WHEN cents > c7 THEN 1 ELSE 0 END) AS bucket
        |  FROM li, c),
        |g AS (SELECT CAST(bucket AS BIGINT) AS bucket,
        |    CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(min(cents) AS BIGINT) AS lo_cents,
        |    CAST(max(cents) AS BIGINT) AS hi_cents
        |  FROM b GROUP BY bucket)
        |SELECT bucket, n_rows, lo_cents, hi_cents,
        |  CAST((2 * n_rows * 8 * 1000000 + sum(n_rows) OVER ())
        |    // (2 * sum(n_rows) OVER ()) AS BIGINT) AS balance_micro
        |FROM g ORDER BY bucket""".stripMargin,
    "q179_phrase_search" ->
      """WITH w AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS ws
        |  FROM documents),
        |tri AS (SELECT doc_id, ws[i] AS a, ws[i+1] AS b, ws[i+2] AS c
        |  FROM w, unnest(range(1, len(ws) - 1)) AS t(i)
        |  WHERE len(ws) >= 3),
        |top AS (SELECT a, b, c FROM (
        |    SELECT a, b, c, count(*) AS cn FROM tri GROUP BY a, b, c
        |    ORDER BY cn DESC, a, b, c LIMIT 1)),
        |m AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_occ
        |  FROM tri JOIN top USING (a, b, c) GROUP BY doc_id)
        |SELECT (SELECT a FROM top) AS a, (SELECT b FROM top) AS b,
        |  (SELECT c FROM top) AS c, doc_id, n_occ
        |FROM m ORDER BY n_occ DESC, doc_id LIMIT 20""".stripMargin,
    "q180_retractable_mv" ->
      """WITH post AS (
        |  SELECT source,
        |    CASE WHEN doc_id % 5 = 0 THEN n_chars + 10 ELSE n_chars END AS n_chars
        |  FROM documents WHERE doc_id % 7 <> 0)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM post GROUP BY source ORDER BY source""".stripMargin,
    "q181_prefix_filter_join" ->
      """WITH w0 AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS ws
        |  FROM documents),
        |tok AS (SELECT DISTINCT doc_id, w FROM (
        |    SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS w
        |    FROM w0, unnest(range(1, len(ws) - 1)) AS t(i)
        |    WHERE len(ws) >= 3)),
        |dfs AS (SELECT w, CAST(count(*) AS BIGINT) AS df FROM tok GROUP BY w),
        |n AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY doc_id),
        |r AS (SELECT t.doc_id, t.w, n.n,
        |    row_number() OVER (PARTITION BY t.doc_id ORDER BY d.df, t.w) AS rk
        |  FROM tok t JOIN dfs d USING (w) JOIN n USING (doc_id)),
        |pref AS (SELECT doc_id, w, n FROM r WHERE rk <= n - (3 * n + 4) // 5 + 1),
        |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b_id, x.n AS na, y.n AS nb
        |  FROM pref x JOIN pref y ON x.w = y.w AND x.doc_id < y.doc_id
        |    AND 5 * y.n >= 3 * x.n AND 3 * y.n <= 5 * x.n),
        |iv AS (SELECT c.a, c.b_id, c.na, c.nb, CAST(count(*) AS BIGINT) AS inter
        |  FROM cand c JOIN tok ta ON ta.doc_id = c.a
        |  JOIN tok tb ON tb.doc_id = c.b_id AND ta.w = tb.w
        |  GROUP BY c.a, c.b_id, c.na, c.nb)
        |SELECT a, b_id, inter, CAST(na + nb - inter AS BIGINT) AS uni,
        |  CAST((2 * inter * 1000000 + (na + nb - inter))
        |    // (2 * (na + nb - inter)) AS BIGINT) AS jac_micro
        |FROM iv WHERE 5 * inter >= 3 * (na + nb - inter)
        |ORDER BY jac_micro DESC, a, b_id LIMIT 50""".stripMargin,
    "q182_rolling_distinct" ->
      """WITH ev AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
        |days AS (SELECT DISTINCT d AS wend FROM ev)
        |SELECT w.wend, CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active
        |FROM days w JOIN ev e ON e.d BETWEEN w.wend - 6 AND w.wend
        |GROUP BY w.wend ORDER BY w.wend""".stripMargin,
    "q183_weighted_median" ->
      """WITH li AS (SELECT n.n_name,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
        |    CAST(l_quantity AS BIGINT) AS qty
        |  FROM lineitem
        |  JOIN supplier s ON l_suppkey = s.s_suppkey
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey),
        |bv AS (SELECT n_name, cents, CAST(sum(qty) AS BIGINT) AS w
        |  FROM li GROUP BY n_name, cents),
        |tot AS (SELECT n_name, CAST(sum(w) AS BIGINT) AS tw FROM bv GROUP BY n_name),
        |cum AS (SELECT n_name, cents, CAST(sum(w) OVER (PARTITION BY n_name
        |    ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS cw
        |  FROM bv)
        |SELECT c.n_name, t.tw AS total_qty,
        |  CAST(min(CASE WHEN c.cw * 2 >= t.tw THEN c.cents END) AS BIGINT) AS median_cents
        |FROM cum c JOIN tot t ON c.n_name = t.n_name
        |GROUP BY c.n_name, t.tw ORDER BY c.n_name""".stripMargin,
    "q184_hierarchy_shares" ->
      """WITH leaf AS (SELECT r.r_name, n.n_name,
        |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM lineitem
        |  JOIN supplier s ON l_suppkey = s.s_suppkey
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |  GROUP BY r.r_name, n.n_name),
        |rt AS (SELECT r_name, CAST(sum(cents) AS BIGINT) AS rc FROM leaf GROUP BY r_name),
        |tt AS (SELECT CAST(sum(cents) AS BIGINT) AS tc FROM leaf)
        |SELECT l.r_name, l.n_name, l.cents,
        |  CAST((2 * l.cents * 1000000 + rt.rc) // (2 * rt.rc) AS DOUBLE) / 1000000.0
        |    AS nation_share,
        |  CAST((2 * rt.rc * 1000000 + tt.tc) // (2 * tt.tc) AS DOUBLE) / 1000000.0
        |    AS region_share
        |FROM leaf l JOIN rt ON l.r_name = rt.r_name, tt
        |ORDER BY l.r_name, l.n_name""".stripMargin
  )
}
