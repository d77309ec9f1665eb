package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.Percentiles

/** Round-4 analytics tier: interval algebra, point-in-time (leakage-free)
  * dimension lookup, degree-ordered triangle counting, RFM segmentation,
  * and inverted-index lexical retrieval — warehouse/curation operations a
  * training-data platform runs beside the corpus tiers (SURVEY §2.12 /
  * §11-13 addenda continuation).
  */
object AnalyticsOps {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  // ---------------------------------------------------------------------
  // q146 — interval merge / coverage (gaps-and-islands on time ranges)
  // ---------------------------------------------------------------------

  /** Merge overlapping per-user activity intervals (each event opens a
    * 30-minute window) and report coverage: the classic gaps-and-islands
    * reduction — an island starts exactly when an interval's start exceeds
    * the running max of all previous ends. This is the "total active time
    * despite overlapping sessions" primitive (billing, dwell time, GPU-hour
    * accounting) that naive `sum(duration)` double-counts.
    *
    * Scale shape: both windows partition by user_id — bounded per-user
    * history, never corpus-wide — and the rest is two integer
    * aggregations. Epoch SECONDS ordering: nanos vs micros floor to the
    * same integer in both engines; ties broken by event_id. */
  private def q146(s: SparkSession, dir: String): DataFrame = {
    val ord = Window.partitionBy("user_id").orderBy("es", "event_id")
    val prevEnd = max("en").over(ord.rowsBetween(Window.unboundedPreceding, -1))
    t(s, dir, "events")
      .select(col("user_id"), col("event_id"), unix_timestamp(col("ts")).as("es"))
      .withColumn("en", col("es") + 1800L)
      .withColumn("is_new", when(prevEnd.isNull || col("es") > prevEnd, 1L).otherwise(0L))
      .withColumn("island",
        sum("is_new").over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "island")
      .agg(count(lit(1)).as("n_ev"), min("es").as("st"), max("en").as("fin"))
      .groupBy("user_id")
      .agg(sum("n_ev").as("n_events"),
        count(lit(1)).as("n_islands"),
        sum(col("fin") - col("st")).as("covered_s"),
        max(col("fin") - col("st")).as("longest_s"))
      .orderBy("user_id")
  }

  // ---------------------------------------------------------------------
  // q147 — point-in-time join against a versioned dimension
  // ---------------------------------------------------------------------

  /** Leakage-free feature lookup: purchases (facts) are joined to the
    * account-state dimension (every signup/error event is a new version of
    * the user's state) AS OF the purchase's position in the stream — the
    * point-in-time-correctness rule every feature store / training-set
    * builder enforces so a model never sees attributes from the future.
    *
    * Implementation is the union-and-carry as-of form (q74's trick aimed
    * at a VERSIONED dimension): version rows and probe rows interleave in
    * one per-user ordered window and `last(…, ignoreNulls)` carries the
    * in-effect version forward — ONE shuffle on user_id, no range join,
    * no per-probe scan. Probes before any version resolve to version 0 /
    * 'none'. Ordered by event_id (the ingestion sequence) so timestamp
    * precision differences cannot reorder. */
  private def q147(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val wDim = Window.partitionBy("user_id").orderBy("eid")
    val dim = ev.filter(col("event_type").isin("signup", "error"))
      .select(col("user_id"), col("event_id").as("eid"),
        col("event_type").as("state"))
      .withColumn("version_n", row_number().over(wDim).cast("long"))
      .withColumn("probe_id", lit(null).cast("long"))
      .withColumn("value", lit(null).cast("double"))
      .withColumn("is_probe", lit(0))
    val probes = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("eid"),
        lit(null).cast("string").as("state"), lit(null).cast("long").as("version_n"),
        col("event_id").as("probe_id"), col("value"), lit(1).as("is_probe"))
    val carry = Window.partitionBy("user_id").orderBy("eid", "is_probe")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dim.unionByName(probes)
      .withColumn("st", last("state", ignoreNulls = true).over(carry))
      .withColumn("vn", last("version_n", ignoreNulls = true).over(carry))
      .filter(col("is_probe") === 1)
      .select(col("probe_id").as("purchase_id"), col("user_id"),
        coalesce(col("st"), lit("none")).as("state"),
        coalesce(col("vn"), lit(0L)).as("state_version"),
        round(col("value") * 100).cast("long").as("value_cents"))
      .orderBy("purchase_id")
  }

  // ---------------------------------------------------------------------
  // q148 — triangle counting (degree-ordered orientation)
  // ---------------------------------------------------------------------

  /** Triangle counts per node on the word co-occurrence (bigram) graph —
    * the clustering/community-density primitive — using the degree-ordered
    * orientation algorithm: orient every undirected edge from its
    * lower-degree endpoint, enumerate wedges only at edge SOURCES, and
    * close them against the canonical edge set. Orientation bounds wedge
    * fan-out by the graph's arboricity (O(m^1.5) total work, hot hubs
    * never enumerate their quadratic neighborhoods) — the trick that keeps
    * triangle counting feasible on power-law graphs at scale, where the
    * naive 3-way self-join explodes on the highest-degree node.
    *
    * The graph is vocabulary-bounded (distinct word pairs), so every join
    * side is small here; the plan shape (two joins + one explode) is what
    * a 1e9-edge run would use, with the wedge join keyed on the oriented
    * source. Deterministic: exact integer counts, ties in the orientation
    * broken lexicographically. */
  private def q148(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(array_remove(split(lower(col("text")), "\\s+"), "").as("ws"))
      .filter(size(col("ws")) >= 2)
    val bigrams = docs
      .withColumn("l", slice(col("ws"), lit(1), size(col("ws")) - 1))
      .withColumn("r", slice(col("ws"), lit(2), size(col("ws")) - 1))
      .select(explode(arrays_zip(col("l"), col("r"))).as("bg"))
      .select(col("bg.l").as("x"), col("bg.r").as("y"))
      .filter(col("x") =!= col("y"))
    val edges = bigrams
      .select(least(col("x"), col("y")).as("u"), greatest(col("x"), col("y")).as("v"))
      .distinct()
    val deg = edges.select(col("u").as("n"))
      .union(edges.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    val srcFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val oriented = edges
      .join(broadcast(deg.select(col("n").as("u"), col("d").as("du"))), "u")
      .join(broadcast(deg.select(col("n").as("v"), col("d").as("dv"))), "v")
      .select(when(srcFirst, col("u")).otherwise(col("v")).as("s"),
        when(srcFirst, col("v")).otherwise(col("u")).as("t"))
    val o1 = oriented.select(col("s"), col("t").as("t1"))
    val o2 = oriented.select(col("s"), col("t").as("t2"))
    val wedges = o1.join(o2, "s").filter(col("t1") < col("t2"))
    val triangles = wedges.join(edges,
      col("t1") === col("u") && col("t2") === col("v"))
      .select(col("s").as("a"), col("t1").as("b"), col("t2").as("c"))
    triangles
      .select(explode(array(col("a"), col("b"), col("c"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n_triangles"))
      .orderBy("word")
  }

  // ---------------------------------------------------------------------
  // q149 — RFM customer segmentation (quartile scores)
  // ---------------------------------------------------------------------

  /** Recency/frequency/monetary segmentation: per-customer metrics from
    * orders, quartile cut points from the distributed rank-selection
    * percentiles (`Percentiles.exactByRank` — no global sort window at any
    * scale, q136's machinery), scores 1–4 by comparison against the cut
    * literals, customers grouped into "rfm" segments. The warehouse
    * counterpart of the corpus quality binning: one aggregation to build
    * the metric table, three bounded rank-selections over it, one final
    * rollup.
    *
    * Cuts are rounded to the metrics' own granularity (whole days / orders
    * / cents) before comparison in both engines, so interpolation ulps
    * cannot flip tied customers (q136's rule). Averages stay in exact
    * integer space end-to-end: each is a half-up integer quotient in
    * micro-units ((2·sum·scale + n) div (2n)) widened to double once —
    * `round(double, 6)` on an exact decimal tie resolves differently in
    * Spark (BigDecimal HALF_UP) and DuckDB (binary-double), so no double
    * ever reaches a rounding function. */
  private def q149(s: SparkSession, dir: String): DataFrame = {
    val anchor = lit("2002-01-01").cast("date")
    val rfm = t(s, dir, "orders").groupBy("o_custkey")
      .agg(datediff(anchor, max("o_orderdate")).cast("double").as("recency"),
        count(lit(1)).cast("double").as("frequency"),
        sum(round(col("o_totalprice") * 100).cast("long")).cast("double").as("monetary"))
    // ONE grouped rank-selection over the unpivoted metrics (not three
    // sequential scans) — exactByRank's group key IS the metric name.
    val unpivoted = rfm.select(explode(map(
      lit("recency"), col("recency"),
      lit("frequency"), col("frequency"),
      lit("monetary"), col("monetary"))).as(Seq("metric", "mv")))
    val cutRows = Percentiles
      .exactByRank(unpivoted, "metric", "mv", Seq(0.25, 0.5, 0.75))
      .collect()
      .map(r => (r.getAs[String]("metric"), r.getAs[Double]("p")) ->
        math.round(r.getAs[Double]("value")).toDouble).toMap
    def cuts(metric: String): Array[Double] =
      Seq(0.25, 0.5, 0.75).map(p => cutRows((metric, p))).toArray
    def score(c: Column, cs: Array[Double]): Column =
      cs.foldLeft(lit(1L))((acc, b) => acc + when(c > b, 1L).otherwise(0L))
    rfm
      .withColumn("r", score(col("recency"), cuts("recency")))
      .withColumn("f", score(col("frequency"), cuts("frequency")))
      .withColumn("m", score(col("monetary"), cuts("monetary")))
      .withColumn("segment", concat(col("r").cast("string"),
        col("f").cast("string"), col("m").cast("string")))
      .groupBy("segment")
      .agg(count(lit(1)).as("n_customers"),
        sum(col("recency").cast("long")).as("sr"),
        sum(col("frequency").cast("long")).as("sf"),
        sum(col("monetary").cast("long")).as("sm"))
      .select(col("segment"), col("n_customers"),
        (expr("(2 * sr * 1000000 + n_customers) div (2 * n_customers)")
          .cast("double") / 1000000.0).as("avg_recency_days"),
        (expr("(2 * sf * 1000000 + n_customers) div (2 * n_customers)")
          .cast("double") / 1000000.0).as("avg_orders"),
        (expr("(2 * sm * 10000 + n_customers) div (2 * n_customers)")
          .cast("double") / 1000000.0).as("avg_spend"))
      .orderBy("segment")
  }

  // ---------------------------------------------------------------------
  // q150 — lexical retrieval: TF-IDF top-k via postings join
  // ---------------------------------------------------------------------

  /** Similar-document retrieval over the inverted index: 20 probe docs,
    * each scored against the whole corpus by TF-IDF cosine computed
    * term-at-a-time through a postings join (sparse dot product — only
    * words the probe actually contains contribute rows), top-5 per probe.
    * The lexical sibling of the embedding ANN ladder (q33/q34/q77/q116):
    * work is |probes| × posting-list mass, LINEAR in the corpus, never
    * all-pairs; the rank window partitions per probe (bounded).
    *
    * Smooth idf = ln((N+1)/(df+1)) + 1 (the standard sklearn form); norms
    * include every indexed term. Scores are rounded before ranking and
    * thresholding in both engines, rank ties broken by doc id. */
  private def q150(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val tok = docs
      .select(col("doc_id"),
        explode(array_remove(split(lower(col("text")), "\\s+"), "")).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val nDocs = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val idf = tok.groupBy("word").agg(count(lit(1)).cast("double").as("df"))
      .crossJoin(broadcast(nDocs))
      .select(col("word"),
        (log((col("n_docs") + 1.0) / (col("df") + 1.0)) + 1.0).as("idf"))
    val weighted = tok.join(broadcast(idf), "word")
      .select(col("doc_id"), col("word"), (col("tf") * col("idf")).as("w"))
    val norms = weighted.groupBy("doc_id")
      .agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
    val probes = weighted.filter(col("doc_id") < 20)
      .select(col("word"), col("doc_id").as("da"), col("w").as("wa"))
    val dots = broadcast(probes)
      .join(weighted.select(col("word"), col("doc_id").as("db"), col("w").as("wb")), "word")
      .filter(col("da") =!= col("db"))
      .groupBy("da", "db")
      .agg(sum(col("wa") * col("wb")).as("dot"), count(lit(1)).as("n_common"))
    val rk = Window.partitionBy("da").orderBy(col("cos").desc, col("db"))
    dots
      .join(broadcast(norms.select(col("doc_id").as("da"), col("nrm").as("na"))), "da")
      .join(norms.select(col("doc_id").as("db"), col("nrm").as("nb")), "db")
      .withColumn("cos", round(col("dot") / (col("na") * col("nb")), 6))
      .withColumn("rk", row_number().over(rk).cast("long"))
      .filter(col("rk") <= 5)
      .select(col("da").as("doc_a"), col("db").as("doc_b"),
        col("n_common"), col("cos"), col("rk"))
      .orderBy("doc_a", "rk")
  }

  // ---------------------------------------------------------------------
  // q151 — k-NN label vote over embeddings
  // ---------------------------------------------------------------------

  /** k-NN classification by cosine: 20 probe vectors, 5 nearest labeled
    * neighbors each (exact cosine via the codegen'd `graft_cosine`
    * expression), majority label with deterministic tie-breaks — the
    * label-propagation / quality-transfer step a curation pipeline runs to
    * extend a small labeled seed set across a large corpus. Probe side is
    * bounded and broadcast, so the scan of the corpus is one pass; the
    * vote windows partition per probe.
    *
    * Ties: neighbor rank by (rounded cos DESC, vec_id); vote rank by
    * (votes DESC, label ASC) — both total orders in both engines. */
  private def q151(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), col("label").cast("long"))
    val probes = emb.filter(col("vec_id") % 100 === 50)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"),
        col("label").as("true_label"))
    val nn = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("vec_id"))
    val neighbors = emb.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("cos", round(VectorOps.cosCol(s, "pe", "embedding"), 6))
      .withColumn("rk", row_number().over(nn))
      .filter(col("rk") <= 5)
    val vote = Window.partitionBy("probe_id")
      .orderBy(col("n_votes").desc, col("label"))
    neighbors.groupBy("probe_id", "true_label", "label")
      .agg(count(lit(1)).as("n_votes"))
      .withColumn("vr", row_number().over(vote))
      .filter(col("vr") === 1)
      .select(col("probe_id"), col("true_label"),
        col("label").as("pred_label"), col("n_votes"),
        (col("label") === col("true_label")).as("correct"))
      .orderBy("probe_id")
  }

  // ---------------------------------------------------------------------
  // q152 — two-hop reach (friend-of-friend expansion)
  // ---------------------------------------------------------------------

  /** Exact 2-hop neighborhood size per node on the word co-occurrence
    * graph: distinct nodes reachable in exactly two hops, excluding self
    * and direct neighbors — the expansion statistic behind
    * recommendation candidates and graph-sampling fan-out estimates. One
    * self-join on the directed adjacency (shuffle keyed on the middle
    * node), a distinct, and an anti join against the direct edges; at
    * scale the middle-node key is degree-bounded by the same orientation
    * argument as q148. */
  private def q152(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(array_remove(split(lower(col("text")), "\\s+"), "").as("ws"))
      .filter(size(col("ws")) >= 2)
    val edges = docs
      .withColumn("l", slice(col("ws"), lit(1), size(col("ws")) - 1))
      .withColumn("r", slice(col("ws"), lit(2), size(col("ws")) - 1))
      .select(explode(arrays_zip(col("l"), col("r"))).as("bg"))
      .select(col("bg.l").as("x"), col("bg.r").as("y"))
      .filter(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("u"), greatest(col("x"), col("y")).as("v"))
      .distinct()
    val adj = edges.select(col("u").as("a"), col("v").as("b"))
      .union(edges.select(col("v").as("a"), col("u").as("b")))
    val twoHop = adj.select(col("a"), col("b").as("mid"))
      .join(adj.select(col("a").as("mid2"), col("b").as("c")),
        col("mid") === col("mid2"))
      .filter(col("a") =!= col("c"))
      .select("a", "c").distinct()
    val strict = twoHop.join(adj.select(col("a"), col("b").as("c")),
      Seq("a", "c"), "left_anti")
    adj.groupBy("a").agg(count(lit(1)).as("n_direct"))
      .join(strict.groupBy("a").agg(count(lit(1)).as("n_two_hop")), Seq("a"), "left")
      .select(col("a").as("word"), col("n_direct"),
        coalesce(col("n_two_hop"), lit(0L)).as("n_two_hop"))
      .orderBy("word")
  }

  // ---------------------------------------------------------------------
  // q153 — canonical-record selection (survivorship)
  // ---------------------------------------------------------------------

  /** Golden-record selection over exact-duplicate groups: documents are
    * fingerprinted (md5 of the lowercased text), and each fingerprint
    * group keeps ONE canonical copy by survivorship policy — longest
    * content first, then source name, then doc id. Exact dedup (q22)
    * answers "what is duplicated"; this answers the follow-up a
    * multi-source corpus merge must decide: WHICH copy survives.
    * One shuffle on the fingerprint; the policy is a min over a
    * lexicographic struct (no window needed — aggregation is map-side
    * combinable). */
  private def q153(s: SparkSession, dir: String): DataFrame = {
    val fp = t(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"),
        md5(lower(col("text"))).as("fp"))
    val keepers = fp.groupBy("fp")
      .agg(min(struct((-col("n_chars")).as("neg_len"), col("source"),
        col("doc_id"))).as("k"),
        count(lit(1)).as("group_n"))
      .select(col("k.doc_id").as("doc_id"), col("group_n"))
    fp.join(keepers, "doc_id").groupBy("source")
      .agg(count(lit(1)).as("n_keepers"),
        sum(col("group_n") - 1).as("n_absorbed"))
      .join(fp.groupBy("source").agg(count(lit(1)).as("n_docs")), Seq("source"), "right")
      .select(col("source"), col("n_docs"),
        coalesce(col("n_keepers"), lit(0L)).as("n_keepers"),
        coalesce(col("n_absorbed"), lit(0L)).as("n_absorbed"))
      .orderBy("source")
  }

  // ---------------------------------------------------------------------
  // q154 — column profiler (catalog statistics)
  // ---------------------------------------------------------------------

  /** Table profiling: one row per column of lineitem with count, nulls,
    * exact distinct cardinality, and numeric min/max/mean — the catalog
    * statistics a warehouse publishes per load (and the optimizer's CBO
    * inputs). Each column profile is one aggregation over the table;
    * string columns carry null numeric stats. At 100 TB the distinct
    * counts would ride the q135 HLL sketches — exact here so the whole
    * report hash-checks. */
  private def q154(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val numeric = Seq("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val strings = Seq("l_returnflag", "l_linestatus")
    val profiles = numeric.map { c =>
      // mean via exact integer cents: a float sum's addition order differs
      // across engines, and at 600k rows the accumulated ulps reach the
      // 1e-6 rounding granularity — integer sums divide identically.
      li.agg(count(lit(1)).as("n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
        countDistinct(col(c)).as("n_distinct"),
        round(min(col(c)).cast("double"), 6).as("min_num"),
        round(max(col(c)).cast("double"), 6).as("max_num"),
        round(sum(round(col(c) * 100).cast("long")).cast("double")
          / count(lit(1)) / 100.0, 6).as("mean"))
        .select(lit(c).as("column_name"), col("*"))
    } ++ strings.map { c =>
      li.agg(count(lit(1)).as("n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
        countDistinct(col(c)).as("n_distinct"),
        lit(null).cast("double").as("min_num"),
        lit(null).cast("double").as("max_num"),
        lit(null).cast("double").as("mean"))
        .select(lit(c).as("column_name"), col("*"))
    }
    profiles.reduce(_ unionByName _).orderBy("column_name")
  }

  // ---------------------------------------------------------------------
  // q155 — Hive-partitioned layout + partition-pruned scan
  // ---------------------------------------------------------------------

  /** Writes events Hive-partitioned by day (`partitionBy("dt")`, one
    * writer task per day via `repartition(dt)` — q96's small-files
    * contract) and reads back a 3-day window. The dt predicate is a
    * PARTITION filter: Spark prunes to 3 of 30 directories at planning
    * time and the other 27 days are never opened (spec-asserted via
    * `input_file_name`). This is THE layout decision for a 100 TB event
    * store — time-partitioned parquet makes every time-bounded query cost
    * proportional to its window, not the corpus. */
  private[graft] def partitionedEventsStore(s: SparkSession, dir: String): String = {
    val out = graft.Scratch.fresh("partevents_")
    t(s, dir, "events")
      .withColumn("dt", date_format(col("ts"), "yyyy-MM-dd"))
      .repartition(col("dt"))
      .write.mode("overwrite").partitionBy("dt").parquet(out)
    out
  }

  private def q155(s: SparkSession, dir: String): DataFrame = {
    val out = partitionedEventsStore(s, dir)
    s.read.parquet(out)
      .filter(col("dt") >= "2024-01-10" && col("dt") <= "2024-01-12")
      .groupBy(col("dt").cast("string").as("dt"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("sum_cents"))
      .orderBy("dt", "event_type")
  }

  // ---------------------------------------------------------------------
  // q156 — forward fill + linear interpolation of masked readings
  // ---------------------------------------------------------------------

  /** Gap repair for per-user value series: readings at event_id % 7 == 0
    * are masked (deterministically, so both engines agree on the holes)
    * and reconstructed — linear interpolation between the nearest
    * surviving anchors when both exist, forward/backward fill at series
    * edges. The sensor-imputation primitive; q140 fills MISSING rows with
    * zeros, this repairs PRESENT rows with estimates.
    *
    * Anchor values ride integer cents and anchor times integer epoch
    * seconds, so the interpolation is one exact-integer ratio and one
    * multiply-add — bit-identical across engines (same expression tree,
    * same promotions). Coincident anchors (nes == pes would make the
    * ratio 0/0) degrade to the forward-fill value instead of emitting
    * NaN. Windows partition per user (bounded). */
  private def q156(s: SparkSession, dir: String): DataFrame = {
    val ord = Window.partitionBy("user_id").orderBy("es", "event_id")
    val before = ord.rowsBetween(Window.unboundedPreceding, -1)
    val after = ord.rowsBetween(1, Window.unboundedFollowing)
    val anchorEs = when(col("cents").isNotNull, col("es"))
    val interp = (col("pval") +
      (col("nval") - col("pval")) *
        ((col("es") - col("pes")).cast("double") / (col("nes") - col("pes")).cast("double"))) / 100.0
    t(s, dir, "events")
      .select(col("user_id"), col("event_id"), unix_timestamp(col("ts")).as("es"),
        when(col("event_id") % 7 =!= 0, round(col("value") * 100).cast("long")).as("cents"))
      .withColumn("pes", last(anchorEs, ignoreNulls = true).over(before))
      .withColumn("pval", last("cents", ignoreNulls = true).over(before))
      .withColumn("nes", first(anchorEs, ignoreNulls = true).over(after))
      .withColumn("nval", first("cents", ignoreNulls = true).over(after))
      .filter(col("event_id") % 7 === 0)
      .select(col("event_id"), col("user_id"), {
        val interpOk =
          col("pval").isNotNull && col("nval").isNotNull && col("nes") > col("pes")
        when(interpOk, "interp")
          .when(col("pval").isNotNull, "ffill")
          .when(col("nval").isNotNull, "bfill")
          .otherwise("none").as("method")
      }, {
        val interpOk =
          col("pval").isNotNull && col("nval").isNotNull && col("nes") > col("pes")
        round(when(interpOk, interp)
          .when(col("pval").isNotNull, col("pval") / 100.0)
          .when(col("nval").isNotNull, col("nval") / 100.0), 6).as("filled")
      })
      .orderBy("event_id")
  }

  // ---------------------------------------------------------------------
  // q157 — PMI collocations (phrase mining)
  // ---------------------------------------------------------------------

  /** Pointwise mutual information over adjacent (ordered) word pairs —
    * the collocation statistic phrase-mining and tokenizer-vocabulary
    * induction use to find units like "new york" that deserve a single
    * token (q128's BPE counts adjacency; PMI normalizes it by the
    * marginals). Three map-side-combinable counts (pairs, unigrams,
    * totals), marginals broadcast back onto the vocabulary²-bounded pair
    * table, PMI = ln(P(ab) / (P(a)·P(b))) computed on an identical
    * expression tree in both engines (exact integer counts widened to
    * double once). Pairs below 5 occurrences are noise-gated. */
  private def q157(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(array_remove(split(lower(col("text")), "\\s+"), "").as("ws"))
    val uni = docs.select(explode(col("ws")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cw"))
    val totals = docs.agg(
      sum(size(col("ws"))).cast("double").as("n_tok"),
      sum(greatest(size(col("ws")) - 1, lit(0))).cast("double").as("n_pairs"))
    val pairs = docs.filter(size(col("ws")) >= 2)
      .withColumn("l", slice(col("ws"), lit(1), size(col("ws")) - 1))
      .withColumn("r", slice(col("ws"), lit(2), size(col("ws")) - 1))
      .select(explode(arrays_zip(col("l"), col("r"))).as("bg"))
      .select(col("bg.l").as("a"), col("bg.r").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("cab"))
      .filter(col("cab") >= 5)
    pairs
      .join(broadcast(uni.select(col("w").as("a"), col("cw").as("ca"))), "a")
      .join(broadcast(uni.select(col("w").as("b"), col("cw").as("cb"))), "b")
      .crossJoin(broadcast(totals))
      .select(col("a"), col("b"), col("cab"),
        round(log((col("cab").cast("double") / col("n_pairs")) /
          ((col("ca").cast("double") / col("n_tok")) *
            (col("cb").cast("double") / col("n_tok")))), 6).as("pmi"))
      .orderBy("a", "b")
  }

  // ---------------------------------------------------------------------
  // q158 — A/B test (two-proportion z)
  // ---------------------------------------------------------------------

  /** Experiment readout: users split into variants by id hash parity,
    * "converted" = at least 14 purchases, two-proportion pooled z-score
    * with the usual normal approximation — the decision statistic every
    * product experiment ends with. Counts are exact integers from two
    * aggregations (per-user rollup, then per-variant), and the z closed
    * form is a single identical expression tree in both engines; the
    * significance boolean compares the ROUNDED z so an ulp cannot flip
    * the verdict. */
  private def q158(s: SparkSession, dir: String): DataFrame = {
    val perUser = t(s, dir, "events")
      .groupBy("user_id")
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purch"))
      .select((col("user_id") % 2).as("variant"),
        when(col("n_purch") >= 14, 1L).otherwise(0L).as("conv"))
    val byVariant = perUser.groupBy("variant")
      .agg(count(lit(1)).as("n"), sum("conv").as("n_conv"))
    val a = byVariant.filter(col("variant") === 0)
      .select(col("n").as("n0"), col("n_conv").as("c0"))
    val b = byVariant.filter(col("variant") === 1)
      .select(col("n").as("n1"), col("n_conv").as("c1"))
    a.crossJoin(b)
      .withColumn("p0", col("c0").cast("double") / col("n0"))
      .withColumn("p1", col("c1").cast("double") / col("n1"))
      .withColumn("pp", (col("c0") + col("c1")).cast("double") / (col("n0") + col("n1")))
      .withColumn("z", round((col("p0") - col("p1")) /
        sqrt(col("pp") * (lit(1.0) - col("pp")) *
          (lit(1.0) / col("n0") + lit(1.0) / col("n1"))), 6))
      .select(col("n0"), col("c0"), col("n1"), col("c1"),
        round(col("p0"), 6).as("p0"), round(col("p1"), 6).as("p1"),
        col("z"), (abs(col("z")) > 1.96).as("significant"))
  }

  // ---------------------------------------------------------------------
  // q159 — revenue concentration (Pareto deciles)
  // ---------------------------------------------------------------------

  /** Pareto/concentration report: customers ranked by lifetime spend,
    * cut into population deciles, each reporting its exact revenue share
    * and the cumulative share — "what fraction of customers makes 80% of
    * revenue". The ranking window runs over the AGGREGATED customer
    * dimension (orders-of-magnitude smaller than the fact table); for a
    * billion-customer dimension the same report derives from
    * `Percentiles.exactByRank` cuts on spend instead of ntile — the
    * documented scale path (q136/q149's machinery). Exact integer cents
    * everywhere; ties broken by customer key so ntile is total-ordered. */
  private def q159(s: SparkSession, dir: String): DataFrame = {
    val spend = t(s, dir, "orders").groupBy("o_custkey")
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
    val decile = ntile(10).over(
      Window.orderBy(col("cents").desc, col("o_custkey"))).cast("long")
    val cum = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val byDecile = spend.withColumn("decile", decile)
      .groupBy("decile")
      .agg(count(lit(1)).as("n_customers"), sum("cents").as("dec_cents"))
    byDecile
      .crossJoin(broadcast(spend.agg(sum("cents").as("total_cents"))))
      .withColumn("cum_cents", sum("dec_cents").over(cum))
      .select(col("decile"), col("n_customers"),
        round(col("dec_cents").cast("double") / col("total_cents"), 6).as("share"),
        round(col("cum_cents").cast("double") / col("total_cents"), 6).as("cum_share"))
      .orderBy("decile")
  }

  // ---------------------------------------------------------------------
  // q160 — market-basket association (support / confidence / lift)
  // ---------------------------------------------------------------------

  /** Item-item association over orders: distinct (order, part) pairs
    * self-joined per order (order sizes are bounded — ≤ 13 items — so the
    * per-key pair fan-out is quadratic in a SMALL constant, the same
    * bounded-bucket argument as the LSH bands), support-gated, then
    * confidence and lift from broadcast item marginals. The global
    * top-100 rides `orderBy(...).limit(100)` — Spark's TakeOrdered, a
    * per-partition top-k + driver merge, NOT a single-partition sort.
    * Lift ordering uses the ROUNDED value with (pa, pb) tie-breaks. */
  private def q160(s: SparkSession, dir: String): DataFrame = {
    val itm = t(s, dir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val nOrders = itm.select("o").distinct().count()
    val freq = itm.groupBy("p").agg(count(lit(1)).as("cp"))
    val pairs = itm.as("a").join(itm.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("pa"), col("b.p").as("pb"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= 2)
    pairs
      .join(broadcast(freq.select(col("p").as("pa"), col("cp").as("ca"))), "pa")
      .join(broadcast(freq.select(col("p").as("pb"), col("cp").as("cb"))), "pb")
      .select(col("pa"), col("pb"), col("support"),
        round(col("support").cast("double") / col("ca"), 6).as("confidence"),
        round(col("support").cast("double") * nOrders /
          (col("ca") * col("cb")).cast("double"), 6).as("lift"))
      .orderBy(col("lift").desc, col("pa"), col("pb"))
      .limit(100)
  }

  // ---------------------------------------------------------------------
  // q161 — entry-path analysis (first-3-event sequences)
  // ---------------------------------------------------------------------

  /** Onboarding-path mining: each user's first three event types (by
    * ingestion order) concatenated into a path string, counted across the
    * population — the "how do users start" report. One bounded per-user
    * window (rows 1–3 only survive), one aggregation over a type³-bounded
    * key space. */
  private def q161(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
    t(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .groupBy("user_id")
      .agg(concat_ws(">", sort_array(collect_list(
        struct(col("rn"), col("event_type")))).getField("event_type")).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
  }

  // ---------------------------------------------------------------------
  // q162 — Gini coefficient of customer spend
  // ---------------------------------------------------------------------

  /** Inequality of the spend distribution in one exact-integer pass:
    * customers ranked by (cents, key), Gini from the rank-weighted sum
    * G = (2·Σ(i·xᵢ) − (n+1)·Σx) / (n·Σx) — every term an exact int64
    * (Σ(i·xᵢ) ≤ 2e15 here), one double division at the end. The ranking
    * window runs over the aggregated customer dimension (q159's
    * documented trade; rank-selection cuts are the billion-row path). */
  private def q162(s: SparkSession, dir: String): DataFrame = {
    val spend = t(s, dir, "orders").groupBy("o_custkey")
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
    val rk = Window.orderBy(col("cents"), col("o_custkey"))
    spend.withColumn("i", row_number().over(rk).cast("long"))
      .agg(count(lit(1)).as("n"),
        sum("cents").as("total_cents"),
        sum(col("i") * col("cents")).as("iwx"))
      .select(col("n"), col("total_cents"),
        round((lit(2.0) * col("iwx") - (col("n") + 1).cast("double") * col("total_cents")) /
          (col("n").cast("double") * col("total_cents")), 6).as("gini"))
  }

  // ---------------------------------------------------------------------
  // q163 — dataset card (one-stop corpus report)
  // ---------------------------------------------------------------------

  /** The dataset card a corpus release ships with, as one query: volume,
    * source/language mix, length distribution (median/p90 via the grouped
    * rank-selection — no sort window), exact-duplicate rate, and mean
    * document length — each a (stat, value) row so the whole card
    * hash-checks. Every number is an exact integer or a once-divided
    * ratio; the length quantiles reuse `Percentiles.exactByRank` and are
    * rounded to the data's own (integer) granularity. */
  private def q163(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents")
    val basic = docs.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("source")).as("n_sources"),
      countDistinct(col("lang")).as("n_langs"),
      sum("n_chars").as("sum_chars"),
      countDistinct(md5(lower(col("text")))).as("n_uniq")).collect()(0)
    val cuts = Percentiles.exactByRank(
        docs.withColumn("g", lit("all")), "g", "n_chars", Seq(0.5, 0.9))
      .collect().map(r => (r.getAs[Double]("p"), math.round(r.getAs[Double]("value")).toDouble)).toMap
    val nDocs = basic.getAs[Long]("n_docs")
    // HALF_UP at 6 decimals — the same decimal rounding Spark's round()
    // and DuckDB's round() apply (rint would tie-break half-even)
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    Seq(
      ("chars_mean", r6(basic.getAs[Long]("sum_chars").toDouble / nDocs)),
      ("chars_p50", cuts(0.5)),
      ("chars_p90", cuts(0.9)),
      ("docs_total", nDocs.toDouble),
      ("dup_rate", r6((nDocs - basic.getAs[Long]("n_uniq")).toDouble / nDocs)),
      ("langs", basic.getAs[Long]("n_langs").toDouble),
      ("sources", basic.getAs[Long]("n_sources").toDouble))
      .toDF("stat", "value")
      .orderBy("stat")
  }

  // ---------------------------------------------------------------------
  // q164 — time-weighted average (trapezoidal)
  // ---------------------------------------------------------------------

  /** Time-weighted mean value per user: trapezoid integration over the
    * event series — Σ Δt·(vᵢ+vᵢ₊₁)/2 over the observed span — the correct
    * average for irregularly sampled readings (a plain mean over-weights
    * bursts). One per-user window (lead), integer cents × integer seconds
    * sums (exact int64), a single final division. Users with one event
    * report their lone value. */
  private def q164(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("es", "event_id")
    t(s, dir, "events")
      .select(col("user_id"), col("event_id"), unix_timestamp(col("ts")).as("es"),
        round(col("value") * 100).cast("long").as("cents"))
      .withColumn("nes", lead("es", 1).over(w))
      .withColumn("ncents", lead("cents", 1).over(w))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        // 2·∫v dt in cent·seconds — exact int64
        sum(when(col("nes").isNotNull,
          (col("nes") - col("es")) * (col("cents") + col("ncents")))).as("twice_area"),
        (max("es") - min("es")).as("span_s"),
        min("cents").as("first_cents"))
      .select(col("user_id"), col("n_events"),
        round(when(col("span_s") > 0,
            col("twice_area").cast("double") / (lit(2.0) * col("span_s")) / 100.0)
          .otherwise(col("first_cents").cast("double") / 100.0), 6).as("twa"))
      .orderBy("user_id")
  }

  // ---------------------------------------------------------------------
  // q165 — exact bitmap semi-join (dense-int dimension)
  // ---------------------------------------------------------------------

  /** The EXACT sibling of q104's Bloom prune: when the dimension key is a
    * bounded dense integer (surrogate keys are), the filtered key set fits
    * a literal bitmap (1 bit/key — ~2 KB here, 125 MB even at 10⁹ keys,
    * broadcast-friendly; roaring-style compression is the sparse-domain
    * path). The fact scan keeps rows by one codegen'd word-index bit test
    * BEFORE any exchange, and — unlike Bloom — no residual join is needed:
    * membership is exact, so the bitmap IS the semi join. Oracle = the
    * plain semi join; spec asserts prunedCount == semiJoinCount. */
  private[graft] def bitmapWords(keys: DataFrame, keyCol: String, maxKey: Long): Seq[Long] = {
    val words = keys
      .select(expr(s"$keyCol div 64").as("w"), expr(s"cast($keyCol % 64 as int)").as("b"))
      .groupBy("w").agg(expr("bit_or(shiftleft(1L, b))").as("word"))
      .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    Seq.tabulate((maxKey / 64 + 1).toInt)(i => words.getOrElse(i, 0L))
  }

  private[graft] def bitmapSemi(df: DataFrame, probeCol: String, bm: Seq[Long]): DataFrame =
    df.withColumn("graft_bm", typedLit(bm))
      .filter(expr(
        s"""$probeCol >= 0 AND $probeCol < ${bm.length * 64L} AND
           |((graft_bm[cast($probeCol div 64 as int)] >> cast($probeCol % 64 as int)) & 1) = 1""".stripMargin))
      .drop("graft_bm")

  private def q165(s: SparkSession, dir: String): DataFrame = {
    val keys = t(s, dir, "customer")
      .filter(col("c_acctbal") > 9000).select("c_custkey")
    val maxKey = t(s, dir, "customer").agg(max("c_custkey")).collect()(0).getLong(0)
    bitmapSemi(t(s, dir, "orders"), "o_custkey", bitmapWords(keys, "c_custkey", maxKey))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("sum_cents"))
      .orderBy("o_orderpriority")
  }

  // ---------------------------------------------------------------------
  // q166 — 2-D skyline (Pareto front)
  // ---------------------------------------------------------------------

  /** Non-dominated customers on (spend, order count): the Pareto front a
    * multi-objective ranking keeps — no other customer is ≥ on both axes
    * and > on one. Identical points collapse first (both survive true
    * dominance), then one descending sweep: a point stays iff its y
    * strictly exceeds the running max y of everything with better-or-equal
    * x. The sweep window runs over the DISTINCT (x, y) point set — already
    * far smaller than the dimension — ordered (x desc, y desc) so equal-x
    * higher-y points correctly dominate. */
  private def q166(s: SparkSession, dir: String): DataFrame = {
    val spend = t(s, dir, "orders").groupBy("o_custkey")
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"),
        count(lit(1)).as("n_orders"))
    val pts = spend.groupBy("cents", "n_orders").agg(count(lit(1)).as("n_customers"))
    val sweep = Window.orderBy(col("cents").desc, col("n_orders").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    pts
      .withColumn("max_prev_y", max("n_orders").over(sweep))
      .filter(col("max_prev_y").isNull || col("n_orders") > col("max_prev_y"))
      .select(col("cents"), col("n_orders"), col("n_customers"))
      .orderBy(col("cents").desc)
  }

  // ---------------------------------------------------------------------
  // q167 — BFS shortest-path levels (iterative frontier expansion)
  // ---------------------------------------------------------------------

  /** Unweighted shortest-path distances from a seed word over the
    * co-occurrence graph — Pregel-style frontier iteration: each round
    * joins the current frontier to the adjacency (one shuffle keyed on
    * the frontier node), anti-joins out already-visited nodes, and
    * localCheckpoints the visited set so the loop's lineage stays O(one
    * round) (the q70/q127 iteration discipline). Terminates at the fixed
    * point; the oracle replays it as a DuckDB RECURSIVE CTE with a
    * diameter cap (spec asserts the cap exceeds the real diameter, so
    * both computations are exact minima). */
  private def q167(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(array_remove(split(lower(col("text")), "\\s+"), "").as("ws"))
      .filter(size(col("ws")) >= 2)
    val edges = docs
      .withColumn("l", slice(col("ws"), lit(1), size(col("ws")) - 1))
      .withColumn("r", slice(col("ws"), lit(2), size(col("ws")) - 1))
      .select(explode(arrays_zip(col("l"), col("r"))).as("bg"))
      .select(col("bg.l").as("x"), col("bg.r").as("y"))
      .filter(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("u"), greatest(col("x"), col("y")).as("v"))
      .distinct()
    val adj = edges.select(col("u").as("a"), col("v").as("b"))
      .union(edges.select(col("v").as("a"), col("u").as("b")))
      .localCheckpoint(true)
    import s.implicits._
    // Barrier.rebase per round: visited references both the previous
    // visited and the frontier (which references visited again) — the
    // Fibonacci case of the checkpoint stats blow-up (see graft.Barrier)
    var visited = graft.Barrier.rebase(Seq(("table", 0L)).toDF("word", "dist"))
    var frontier = visited
    var d = 0L
    var growing = true
    while (growing && d < 12) {
      d += 1
      val dd = d
      val next = graft.Barrier.rebase(frontier.join(adj, col("word") === col("a"))
        .select(col("b").as("word")).distinct()
        .join(visited, Seq("word"), "left_anti")
        .withColumn("dist", lit(dd)))
      growing = next.limit(1).count() > 0
      if (growing) {
        visited = graft.Barrier.rebase(visited.unionByName(next))
        frontier = next
      }
    }
    visited.orderBy("word")
  }

  // ---------------------------------------------------------------------
  // q168 — deterministic negative sampling (contrastive training)
  // ---------------------------------------------------------------------

  /** Contrastive-pair construction: for each anchor vector, 5 negatives
    * drawn from different-label candidates by a content-derived md5
    * priority — retry-stable and engine-exact (q113's sampling rule;
    * rand() is neither). The per-anchor top-5 runs through the custom
    * TopKPerKey operator, whose PARTIAL exec caps every map partition's
    * buffer at k rows per anchor BEFORE the shuffle — the candidate
    * stream is never sorted corpus-wide (the same map-side-prune shape
    * q69 proves in TopKPlanSpec). Anchors broadcast; the label-mismatch
    * join is nested-loop on the tiny side only. */
  private def q168(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings").select(col("vec_id"), col("label").cast("long"))
    val anchors = emb.filter(col("vec_id") % 100 === 25)
      .select(col("vec_id").as("anchor_id"), col("label").as("anchor_label"))
    val cand = emb.select(col("vec_id").as("neg_id"), col("label").as("neg_label"))
    val scored = broadcast(anchors)
      .join(cand, col("neg_label") =!= col("anchor_label"))
      .withColumn("pri", md5(concat(col("anchor_id").cast("string"), lit("_"),
        col("neg_id").cast("string"))))
    graft.plans.TopKPerKey(scored, keyCols = Seq("anchor_id"),
        orderBy = Seq(("pri", true), ("neg_id", true)), k = 5)
      .withColumn("rk", row_number().over(
        Window.partitionBy("anchor_id").orderBy("pri", "neg_id")).cast("long"))
      .select(col("anchor_id"), col("anchor_label"), col("rk"),
        col("neg_id"), col("neg_label"))
      .orderBy("anchor_id", "rk")
  }

  // ---------------------------------------------------------------------
  // q169 — vocabulary coverage / OOV rate
  // ---------------------------------------------------------------------

  /** Tokenizer-vocabulary coverage: induce a top-20 vocabulary from the
    * corpus itself (count desc, word tie-break — the q160 TakeOrdered
    * shape, never a full sort), then measure per-source out-of-vocabulary
    * token rates — the coverage check run before freezing a tokenizer.
    * The vocabulary is broadcast back; OOV is a left-join null test;
    * every ratio is one division of exact counts. */
  private def q169(s: SparkSession, dir: String): DataFrame = {
    val tok = t(s, dir, "documents")
      .select(col("source"),
        explode(array_remove(split(lower(col("text")), "\\s+"), "")).as("w"))
    val vocab = tok.groupBy("w").agg(count(lit(1)).as("cw"))
      .orderBy(col("cw").desc, col("w")).limit(20)
      .select(col("w"), lit(1).as("in_vocab"))
    tok.join(broadcast(vocab), Seq("w"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"),
        countDistinct(when(col("in_vocab").isNull, col("w"))).as("n_oov_types"))
      .withColumn("oov_rate",
        round(col("n_oov").cast("double") / col("n_tokens"), 6))
      .orderBy("source")
  }

  // ---------------------------------------------------------------------
  // q170 — sliding-window context chunking (stride < window)
  // ---------------------------------------------------------------------

  /** LLM context-window chunking: 32-token windows at stride 16 (adjacent
    * chunks share half their tokens — the overlap that keeps boundary
    * context in at least one chunk), with per-source chunk counts, exact
    * mean chunk length, and the distinct-chunk count (overlap-aware
    * dedup). Start offsets come from `sequence(0, len-1, 16)` — pure
    * Catalyst, no UDF — and q123's disjoint-span machinery is the
    * stride = window special case. */
  private def q170(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "documents")
      .select(col("source"),
        array_remove(split(lower(col("text")), "\\s+"), "").as("ws"))
      .filter(size(col("ws")) >= 1)
      .select(col("source"), col("ws"),
        explode(sequence(lit(0), size(col("ws")) - 1, lit(16))).as("st"))
      .select(col("source"),
        slice(col("ws"), col("st") + 1, lit(32)).as("chunk"))
      .select(col("source"), size(col("chunk")).cast("long").as("clen"),
        md5(array_join(col("chunk"), " ")).as("h"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_chunks"),
        sum("clen").as("sum_tokens"),
        countDistinct("h").as("n_distinct_chunks"))
      .withColumn("mean_chunk_len",
        round(col("sum_tokens").cast("double") / col("n_chunks"), 6))
      .orderBy("source")
  }

  // ---------------------------------------------------------------------
  // q171 — numeric distribution drift (decile comparison)
  // ---------------------------------------------------------------------

  /** Distribution-shift detection between ingest halves: exact deciles of
    * the value column for each half from ONE grouped
    * `Percentiles.exactByRank` pass (half IS the group key), compared
    * pointwise — the KS-flavored numeric drift monitor beside q139's
    * word-distribution KL. Quantiles are rounded to the data's own cents
    * granularity (q136's rule) so interpolation ulps cannot differ. */
  private def q171(s: SparkSession, dir: String): DataFrame = {
    val halves = t(s, dir, "events")
      .select(when(col("event_id") % 2 === 0, "a").otherwise("b").as("half"),
        col("value"))
    val cuts = Percentiles
      .exactByRank(halves, "half", "value", (1 to 9).map(_ / 10.0))
      .select(col("half"), col("p"), round(col("value"), 2).as("v"))
    val a = cuts.filter(col("half") === "a").select(col("p"), col("v").as("va"))
    val b = cuts.filter(col("half") === "b").select(col("p"), col("v").as("vb"))
    a.join(b, "p")
      .select(col("p"), col("va"), col("vb"),
        round(abs(col("va") - col("vb")), 2).as("drift"))
      .orderBy("p")
  }

  // ---------------------------------------------------------------------
  // q172 — backfill plan (gap intervals from the time spine)
  // ---------------------------------------------------------------------

  /** The operational follow-up to q140's gap report: compress each
    * event-type's missing hours into contiguous [start, end] intervals —
    * the work units a backfill scheduler actually dispatches (one job per
    * gap RANGE, not per missing hour). q146's gaps-and-islands sweep over
    * the calendar-sized spine: an island starts where the previous gap
    * hour isn't exactly one hour back; per-type windows are
    * calendar-bounded. */
  private def q172(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val hourly = ev.groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val spine = ev.agg(date_trunc("hour", min("ts")).as("lo"),
        date_trunc("hour", max("ts")).as("hi"))
      .select(explode(expr("sequence(lo, hi, interval 1 hour)")).as("hour"))
      .crossJoin(ev.select("event_type").distinct())
    val gaps = spine.join(hourly, Seq("hour", "event_type"), "left_anti")
      .select(col("event_type"), col("hour"), unix_timestamp(col("hour")).as("hs"))
    val ord = Window.partitionBy("event_type").orderBy("hs")
    gaps
      .withColumn("prev", lag("hs", 1).over(ord))
      .withColumn("is_new",
        when(col("prev").isNull || col("hs") - col("prev") =!= 3600L, 1L).otherwise(0L))
      .withColumn("island",
        sum("is_new").over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("event_type", "island")
      .agg(min("hour").as("gap_start"), max("hour").as("gap_end"),
        count(lit(1)).as("n_hours"))
      .select("event_type", "gap_start", "gap_end", "n_hours")
      .orderBy("event_type", "gap_start")
  }

  // ---------------------------------------------------------------------
  // q189 — weighted shortest paths (distributed Bellman-Ford)
  // ---------------------------------------------------------------------

  /** WEIGHTED single-source shortest paths over the word co-occurrence
    * graph (q167's unweighted sibling): distributed Bellman-Ford, the
    * iterative-relaxation shape every Pregel-style graph engine runs.
    * Edge weights are deterministic small integers derived from the
    * canonical edge string (1 + md5₃₂("u|v") mod 9 — content-addressed,
    * so both engines compute bit-identical weights with no RNG). Each
    * round relaxes EVERY edge in parallel — one shuffle keyed on the
    * frontier node — and after k rounds all optimal paths of ≤ k hops
    * are final; the loop runs to the fixed point (no distance improved),
    * localCheckpointing per round so lineage stays O(one round) (the
    * q70/q167 iteration discipline). Convergence is detected by an
    * improvement-join, not a driver-side collect of the distance table.
    * The oracle replays it as a DuckDB RECURSIVE CTE with a cumulative-
    * distance cap of 108 = 9·12, provably ≥ any optimal distance
    * because the BFS diameter is < 12 (q167's spec-asserted cap) and no
    * edge exceeds weight 9 — so both computations are exact minima. */
  private def q189(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(array_remove(split(lower(col("text")), "\\s+"), "").as("ws"))
      .filter(size(col("ws")) >= 2)
    val edges = docs
      .withColumn("l", slice(col("ws"), lit(1), size(col("ws")) - 1))
      .withColumn("r", slice(col("ws"), lit(2), size(col("ws")) - 1))
      .select(explode(arrays_zip(col("l"), col("r"))).as("bg"))
      .select(col("bg.l").as("x"), col("bg.r").as("y"))
      .filter(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("u"), greatest(col("x"), col("y")).as("v"))
      .distinct()
      .withColumn("w", expr(
        "1 + cast(conv(substring(md5(concat_ws('|', u, v)), 1, 8), 16, 10) as bigint) % 9"))
    val adj0 = edges.select(col("u").as("a"), col("v").as("b"), col("w"))
      .union(edges.select(col("v").as("a"), col("u").as("b"), col("w")))
      .localCheckpoint(true)
    // the relaxation loop shuffles a vocabulary-sized table 10+ times with
    // a convergence count per round; it runs on the NARROW loop-session
    // clone (graft.LoopSession — fixed width at creation, no session-conf
    // mutation on the caller) so rounds aren't dominated by empty-task
    // scheduling at the session's 32 shuffle partitions (A/B-measured
    // +23% at sf0.1 without the narrowing). The checkpointed adjacency
    // re-homes onto the clone for free; the rebased result re-homes back.
    val ss = graft.LoopSession.narrow(s, 4)
    val adj = graft.LoopSession.rehome(adj0, ss)
    import ss.implicits._
    // Barrier.rebase per round: one self-reference per relaxation is the
    // linear case of the checkpoint stats blow-up (see graft.Barrier) —
    // benign at 40 rounds but wrong by construction at a 100 TB diameter
    var dist = graft.Barrier.rebase(Seq(("table", 0L)).toDF("word", "dist"))
    var changed = true
    var rounds = 0
    while (changed && rounds < 40) {
      rounds += 1
      val relaxed = graft.Barrier.rebase(dist.join(adj, col("word") === col("a"))
        .select(col("b").as("word"), (col("dist") + col("w")).as("dist"))
        .unionByName(dist)
        .groupBy("word").agg(min("dist").as("dist")))
      changed = relaxed.as("n")
        .join(dist.as("o"), col("n.word") === col("o.word"), "left_outer")
        .filter(col("o.word").isNull || col("n.dist") < col("o.dist"))
        .limit(1).count() > 0
      if (changed) dist = relaxed
    }
    require(!changed, s"Bellman-Ford did not converge in $rounds rounds")
    graft.LoopSession.rehome(dist, s).orderBy("word")
  }

  // ---------------------------------------------------------------------
  // q194 — longest consecutive-day activity streak (gaps-and-islands)
  // ---------------------------------------------------------------------

  /** Longest consecutive-day activity streak per user — the canonical
    * GAPS-AND-ISLANDS window pattern (engagement scoring, retention
    * cohorting, "7-day streak" product features): dedup to (user, day)
    * on integer epoch-days, then `day − row_number()` over the per-user
    * day order is CONSTANT within a run of consecutive days and jumps at
    * every gap — one window pass turns runs into group keys, one
    * aggregation measures them, no self-join and no quadratic range
    * probing. All arithmetic is integer (epoch-day = µs div 86400e6), so
    * the island keys, lengths, and tie-breaks (earliest maximal streak)
    * are bit-identical across engines. Windows partition by user_id —
    * per-key state, shuffle-parallel at any user count. */
  private def q194(s: SparkSession, dir: String): DataFrame = {
    val days = t(s, dir, "events")
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct()
    val wd = Window.partitionBy("user_id").orderBy("day")
    val streaks = days
      .withColumn("grp", col("day") - row_number().over(wd))
      .groupBy("user_id", "grp")
      .agg(count(lit(1)).as("len"), min("day").as("start_day"))
    val wt = Window.partitionBy("user_id").orderBy(col("len").desc, col("start_day"))
    val act = days.groupBy("user_id").agg(count(lit(1)).as("n_active_days"))
    streaks.withColumn("rk", row_number().over(wt)).filter(col("rk") === 1)
      .join(act, "user_id")
      .select(col("user_id"), col("len").as("longest_streak"),
        col("start_day"), col("n_active_days"))
      .orderBy(col("longest_streak").desc, col("user_id"))
  }

  // ---------------------------------------------------------------------
  // q199 — MERGE INTO semantics (row-level upsert/delete resolution)
  // ---------------------------------------------------------------------

  /** Full MERGE INTO semantics over the customer dimension — the
    * warehouse upsert primitive (Delta/Iceberg's MERGE) expressed as one
    * FULL OUTER join + clause resolution, with every clause exercised by
    * a deterministic CDC batch derived from the tables themselves (no
    * RNG): updates carry each ordering customer's cents total
    * (WHEN MATCHED AND op='U' THEN UPDATE), key%97 customers are deleted
    * (WHEN MATCHED AND op='D' THEN DELETE), nation-derived brand-new
    * keys insert (WHEN NOT MATCHED THEN INSERT), and — the clause-gating
    * case naive implementations get wrong — 'I' rows whose key ALREADY
    * exists must be ignored (INSERT clauses only fire on NOT MATCHED),
    * surfacing as 'kept_conflict'. Source keys are made disjoint by
    * precedence (D > U > I), mirroring MERGE's one-source-row-per-target
    * requirement. The output digests the post-merge table per action
    * (count + cents + order-independent md5-32 checksum, the q174
    * device) plus a 'deleted' audit group, so a single mis-resolved row
    * breaks the hash. One shuffle on the merge key; at 100 TB both
    * sides hash-partition on `key` and the join co-locates. */
  private def q199(s: SparkSession, dir: String): DataFrame = {
    val tgt = t(s, dir, "customer").select(col("c_custkey").as("key"),
      round(col("c_acctbal") * 100).cast("long").as("cents"),
      col("c_mktsegment").as("seg"))
    val upd = t(s, dir, "orders")
      .groupBy(col("o_custkey").as("key"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("s_cents"))
      // % 3 carve-out keeps a non-empty 'kept' class: on this corpus every
      // customer orders, so an unrestricted update set would touch all rows
      .filter(col("key") % 97 =!= 0 && col("key") % 101 =!= 0 && col("key") % 3 =!= 0)
      .select(col("key"), lit("U").as("op"), col("s_cents"))
    val del = tgt.filter(col("key") % 97 === 0)
      .select(col("key"), lit("D").as("op"), lit(0L).as("s_cents"))
    val insNew = t(s, dir, "nation")
      .crossJoin(broadcast(tgt.agg(max("key").as("mk"))))
      .select((col("mk") + col("n_nationkey") + 1).as("key"), lit("I").as("op"),
        ((col("n_nationkey") + 1) * 1000).cast("long").as("s_cents"))
    val insConf = tgt.filter(col("key") % 101 === 0 && col("key") % 97 =!= 0)
      .select(col("key"), lit("I").as("op"), lit(0L).as("s_cents"))
    val src = upd.unionByName(del).unionByName(insNew).unionByName(insConf)
    val merged = tgt.as("t").join(src.as("s"), Seq("key"), "full_outer")
      .withColumn("action", when(col("s.op").isNull, "kept")
        .when(col("t.seg").isNotNull && col("s.op") === "D", "deleted")
        .when(col("t.seg").isNotNull && col("s.op") === "U", "updated")
        .when(col("t.seg").isNotNull && col("s.op") === "I", "kept_conflict")
        .when(col("s.op") === "I", "inserted")
        .otherwise("noop_source"))
      .filter(col("action") =!= "noop_source")
      .withColumn("f_cents",
        when(col("action").isin("updated", "inserted"), col("s.s_cents"))
          .otherwise(col("t.cents")))
      .withColumn("f_seg", when(col("action") === "updated", lit("UPDATED"))
        .when(col("action") === "inserted", lit("NEW"))
        .otherwise(col("t.seg")))
    merged.groupBy("action")
      .agg(count(lit(1)).as("n"), sum("f_cents").as("sum_cents"),
        sum(expr("cast(conv(substring(md5(concat_ws('|', key, f_cents, f_seg)), 1, 8), 16, 10) as bigint)"))
          .as("checksum"))
      .orderBy("action")
  }

  // q238 — rendezvous (HRW) consistent sharding + minimal-movement audit

  /** Highest-random-weight shard assignment: doc → argmax over shards of
    * md5(doc_id ++ '_' ++ shard), compared as hex strings (identical
    * lexicographic order in both engines). The audit re-assigns under a
    * 16 → 20 shard expansion and counts movement per original shard.
    * Rendezvous hashing's minimal-disruption theorem — a document moves
    * ONLY when one of the NEW shards wins its argmax, so exactly ~4/20 of
    * rows move and none migrate between surviving shards — is made
    * visible (and hash-gated) by the `n_moved_to_old` column, which must
    * be 0 in every row. This is the re-sharding planner a 100 TB store
    * needs: a modulo scheme reshuffles nearly every row; HRW touches
    * only ~K_new/N of them.
    *
    * Scale shape: both argmaxes are computed per-row inside ONE
    * `transform(sequence(0,19), ...)` + `array_max` projection (native
    * Catalyst, no UDF, nothing broadcast); the only exchange is the
    * 16-row final rollup. */
  private def q238(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "documents").select(col("doc_id"))
      .withColumn("arr", expr(
        "transform(sequence(0,19), s -> struct(" +
          "md5(concat(cast(doc_id as string),'_',cast(s as string))) as h, s as s))"))
      .withColumn("s16", expr("array_max(filter(arr, x -> x.s < 16)).s"))
      .withColumn("s20", expr("array_max(arr).s"))
      .groupBy(col("s16").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("s20") =!= col("s16"), 1L).otherwise(0L)).as("n_moved"),
        sum(when(col("s20") =!= col("s16") && col("s20") < 16, 1L).otherwise(0L))
          .as("n_moved_to_old"))
      .orderBy("shard")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q238_rendezvous_shards" -> (q238 _),
    "q199_merge_upsert" -> (q199 _),
    "q194_activity_streak" -> (q194 _),
    "q189_shortest_paths" -> (q189 _),
    "q146_interval_merge" -> (q146 _),
    "q147_pit_join" -> (q147 _),
    "q148_triangle_count" -> (q148 _),
    "q149_rfm_segments" -> (q149 _),
    "q150_lexical_topk" -> (q150 _),
    "q151_knn_classify" -> (q151 _),
    "q152_two_hop" -> (q152 _),
    "q153_survivorship" -> (q153 _),
    "q154_column_profile" -> (q154 _),
    "q155_partition_pruning" -> (q155 _),
    "q156_interpolate" -> (q156 _),
    "q157_pmi_collocations" -> (q157 _),
    "q158_ab_test" -> (q158 _),
    "q159_pareto_deciles" -> (q159 _),
    "q160_market_basket" -> (q160 _),
    "q161_user_paths" -> (q161 _),
    "q162_gini" -> (q162 _),
    "q163_dataset_card" -> (q163 _),
    "q164_time_weighted_avg" -> (q164 _),
    "q165_bitmap_semijoin" -> (q165 _),
    "q166_skyline" -> (q166 _),
    "q167_bfs_levels" -> (q167 _),
    "q168_negative_sampling" -> (q168 _),
    "q169_oov_rate" -> (q169 _),
    "q170_window_chunks" -> (q170 _),
    "q171_numeric_drift" -> (q171 _),
    "q172_backfill_plan" -> (q172 _))

  private val numericProfileSql = Seq(
    "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice", "l_discount").map { c =>
    s"""SELECT '$c' AS column_name, CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
       |  round(CAST(min($c) AS DOUBLE), 6) AS min_num,
       |  round(CAST(max($c) AS DOUBLE), 6) AS max_num,
       |  round(CAST(sum(CAST(round($c * 100) AS BIGINT)) AS DOUBLE) / count(*) / 100.0, 6) AS mean
       |FROM lineitem""".stripMargin
  }
  private val stringProfileSql = Seq("l_returnflag", "l_linestatus").map { c =>
    s"""SELECT '$c' AS column_name, CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
       |  NULL::DOUBLE AS min_num, NULL::DOUBLE AS max_num, NULL::DOUBLE AS mean
       |FROM lineitem""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // arg_max ties are impossible (md5 hex is collision-free over this
    // key space), so DuckDB's arg_max replays Spark's struct array_max
    "q238_rendezvous_shards" ->
      """WITH g AS (SELECT d.doc_id, s.s,
        |    md5(concat(CAST(d.doc_id AS VARCHAR),'_',CAST(s.s AS VARCHAR))) AS h
        |  FROM documents d CROSS JOIN generate_series(0,19) s(s)),
        |a AS (SELECT doc_id,
        |    arg_max(s, h) FILTER (WHERE s < 16) AS s16,
        |    arg_max(s, h) AS s20
        |  FROM g GROUP BY doc_id)
        |SELECT CAST(s16 AS BIGINT) AS shard,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(*) FILTER (WHERE s20 <> s16) AS BIGINT) AS n_moved,
        |  CAST(count(*) FILTER (WHERE s20 <> s16 AND s20 < 16) AS BIGINT) AS n_moved_to_old
        |FROM a GROUP BY 1""".stripMargin,
    "q151_knn_classify" ->
      s"""WITH sc AS (SELECT a.vec_id AS probe_id, CAST(a.label AS BIGINT) AS true_label,
         |    b.vec_id AS vec_id, CAST(b.label AS BIGINT) AS label, round(${VectorOps.cosSql}, 6) AS cos
         |  FROM embeddings a JOIN embeddings b ON a.vec_id % 100 = 50 AND a.vec_id <> b.vec_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, vec_id) AS rk
         |  FROM sc),
         |v AS (SELECT probe_id, true_label, label, CAST(count(*) AS BIGINT) AS n_votes
         |  FROM r WHERE rk <= 5 GROUP BY 1, 2, 3),
         |w AS (SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY n_votes DESC, label) AS vr
         |  FROM v)
         |SELECT probe_id, true_label, label AS pred_label, n_votes,
         |  label = true_label AS correct
         |FROM w WHERE vr = 1 ORDER BY probe_id""".stripMargin,
    "q152_two_hop" ->
      """WITH w AS (SELECT list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS ws
        |  FROM documents),
        |bg AS (SELECT ws[i] AS x, ws[i+1] AS y FROM w, unnest(range(1, len(ws))) AS t(i)
        |  WHERE len(ws) >= 2),
        |e AS (SELECT DISTINCT least(x, y) AS u, greatest(x, y) AS v FROM bg WHERE x <> y),
        |adj AS (SELECT u AS a, v AS b FROM e UNION ALL SELECT v AS a, u AS b FROM e),
        |th AS (SELECT DISTINCT x.a, y.b AS c FROM adj x JOIN adj y ON x.b = y.a WHERE x.a <> y.b),
        |st AS (SELECT a, c FROM th WHERE NOT EXISTS
        |  (SELECT 1 FROM adj WHERE adj.a = th.a AND adj.b = th.c)),
        |d1 AS (SELECT a, CAST(count(*) AS BIGINT) AS n_direct FROM adj GROUP BY a),
        |d2 AS (SELECT a, CAST(count(*) AS BIGINT) AS n_two_hop FROM st GROUP BY a)
        |SELECT d1.a AS word, n_direct, CAST(coalesce(n_two_hop, 0) AS BIGINT) AS n_two_hop
        |FROM d1 LEFT JOIN d2 USING (a) ORDER BY word""".stripMargin,
    "q153_survivorship" ->
      """WITH f AS (SELECT doc_id, source, n_chars, md5(lower(text)) AS h FROM documents),
        |g AS (SELECT h, count(*) AS group_n FROM f GROUP BY h),
        |k AS (SELECT doc_id, source, h,
        |    row_number() OVER (PARTITION BY h ORDER BY n_chars DESC, source, doc_id) AS rn
        |  FROM f),
        |kk AS (SELECT k.source, CAST(count(*) AS BIGINT) AS n_keepers,
        |    CAST(sum(g.group_n - 1) AS BIGINT) AS n_absorbed
        |  FROM k JOIN g USING (h) WHERE rn = 1 GROUP BY k.source),
        |nd AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM f GROUP BY source)
        |SELECT nd.source, n_docs, CAST(coalesce(n_keepers, 0) AS BIGINT) AS n_keepers,
        |  CAST(coalesce(n_absorbed, 0) AS BIGINT) AS n_absorbed
        |FROM nd LEFT JOIN kk USING (source) ORDER BY source""".stripMargin,
    "q154_column_profile" ->
      (numericProfileSql ++ stringProfileSql).mkString("", "\nUNION ALL\n", "\nORDER BY column_name"),
    "q155_partition_pruning" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS dt, event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM events WHERE strftime(ts, '%Y-%m-%d') BETWEEN '2024-01-10' AND '2024-01-12'
        |GROUP BY 1, 2 ORDER BY dt, event_type""".stripMargin,
    "q156_interpolate" ->
      """WITH e AS (SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS es,
        |    CASE WHEN event_id % 7 <> 0 THEN CAST(round(value * 100) AS BIGINT) END AS cents
        |  FROM events),
        |f AS (SELECT *,
        |    last_value(CASE WHEN cents IS NOT NULL THEN es END IGNORE NULLS) OVER wp AS pes,
        |    last_value(cents IGNORE NULLS) OVER wp AS pval,
        |    first_value(CASE WHEN cents IS NOT NULL THEN es END IGNORE NULLS) OVER wf AS nes,
        |    first_value(cents IGNORE NULLS) OVER wf AS nval
        |  FROM e WINDOW
        |    wp AS (PARTITION BY user_id ORDER BY es, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |    wf AS (PARTITION BY user_id ORDER BY es, event_id
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
        |SELECT event_id, user_id,
        |  CASE WHEN pval IS NOT NULL AND nval IS NOT NULL AND nes > pes THEN 'interp'
        |       WHEN pval IS NOT NULL THEN 'ffill'
        |       WHEN nval IS NOT NULL THEN 'bfill' ELSE 'none' END AS method,
        |  round(CASE WHEN pval IS NOT NULL AND nval IS NOT NULL AND nes > pes THEN
        |      (pval + (nval - pval) * (CAST(es - pes AS DOUBLE) / CAST(nes - pes AS DOUBLE))) / 100.0
        |    WHEN pval IS NOT NULL THEN pval / 100.0
        |    WHEN nval IS NOT NULL THEN nval / 100.0 END, 6) AS filled
        |FROM f WHERE event_id % 7 = 0 ORDER BY event_id""".stripMargin,
    "q157_pmi_collocations" ->
      """WITH w AS (SELECT list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS ws
        |  FROM documents),
        |uni AS (SELECT word AS wd, CAST(count(*) AS BIGINT) AS cw
        |  FROM (SELECT unnest(ws) AS word FROM w) GROUP BY word),
        |tot AS (SELECT CAST(sum(len(ws)) AS DOUBLE) AS n_tok,
        |    CAST(sum(greatest(len(ws) - 1, 0)) AS DOUBLE) AS n_pairs FROM w),
        |pr AS (SELECT ws[i] AS a, ws[i+1] AS b, CAST(count(*) AS BIGINT) AS cab
        |  FROM w, unnest(range(1, len(ws))) AS t(i) WHERE len(ws) >= 2
        |  GROUP BY 1, 2 HAVING count(*) >= 5)
        |SELECT a, b, cab,
        |  round(ln((CAST(cab AS DOUBLE) / n_pairs) /
        |    ((CAST(ua.cw AS DOUBLE) / n_tok) * (CAST(ub.cw AS DOUBLE) / n_tok))), 6) AS pmi
        |FROM pr JOIN uni ua ON ua.wd = pr.a JOIN uni ub ON ub.wd = pr.b, tot
        |ORDER BY a, b""".stripMargin,
    "q158_ab_test" ->
      """WITH pu AS (SELECT user_id,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n_purch
        |  FROM events GROUP BY user_id),
        |v AS (SELECT user_id % 2 AS variant,
        |    CASE WHEN n_purch >= 14 THEN 1 ELSE 0 END AS conv FROM pu),
        |bv AS (SELECT variant, CAST(count(*) AS BIGINT) AS n, CAST(sum(conv) AS BIGINT) AS n_conv
        |  FROM v GROUP BY variant),
        |x AS (SELECT
        |    (SELECT n FROM bv WHERE variant = 0) AS n0, (SELECT n_conv FROM bv WHERE variant = 0) AS c0,
        |    (SELECT n FROM bv WHERE variant = 1) AS n1, (SELECT n_conv FROM bv WHERE variant = 1) AS c1),
        |y AS (SELECT *, CAST(c0 AS DOUBLE) / n0 AS p0, CAST(c1 AS DOUBLE) / n1 AS p1,
        |    CAST(c0 + c1 AS DOUBLE) / (n0 + n1) AS pp FROM x),
        |z AS (SELECT *, round((p0 - p1) / sqrt(pp * (1.0 - pp) * (1.0 / n0 + 1.0 / n1)), 6) AS zv
        |  FROM y)
        |SELECT n0, c0, n1, c1, round(p0, 6) AS p0, round(p1, 6) AS p1, zv AS z,
        |  abs(zv) > 1.96 AS significant
        |FROM z""".stripMargin,
    "q159_pareto_deciles" ->
      """WITH sp AS (SELECT o_custkey, sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
        |  FROM orders GROUP BY o_custkey),
        |d AS (SELECT o_custkey, cents,
        |    CAST(ntile(10) OVER (ORDER BY cents DESC, o_custkey) AS BIGINT) AS decile FROM sp),
        |bd AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_customers,
        |    CAST(sum(cents) AS BIGINT) AS dec_cents FROM d GROUP BY decile),
        |tt AS (SELECT CAST(sum(cents) AS BIGINT) AS total_cents FROM sp),
        |cc AS (SELECT *, CAST(sum(dec_cents) OVER (ORDER BY decile
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cents
        |  FROM bd)
        |SELECT decile, n_customers,
        |  round(CAST(dec_cents AS DOUBLE) / total_cents, 6) AS share,
        |  round(CAST(cum_cents AS DOUBLE) / total_cents, 6) AS cum_share
        |FROM cc, tt ORDER BY decile""".stripMargin,
    "q160_market_basket" ->
      """WITH itm AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |no AS (SELECT count(DISTINCT o) AS n_orders FROM itm),
        |fr AS (SELECT p, CAST(count(*) AS BIGINT) AS cp FROM itm GROUP BY p),
        |pairs AS (SELECT a.p AS pa, b.p AS pb, CAST(count(*) AS BIGINT) AS support
        |  FROM itm a JOIN itm b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT pa, pb, support,
        |  round(CAST(support AS DOUBLE) / fa.cp, 6) AS confidence,
        |  round(CAST(support AS DOUBLE) * n_orders / CAST(fa.cp * fb.cp AS DOUBLE), 6) AS lift
        |FROM pairs JOIN fr fa ON fa.p = pa JOIN fr fb ON fb.p = pb, no
        |ORDER BY lift DESC, pa, pb LIMIT 100""".stripMargin,
    "q161_user_paths" ->
      """WITH r AS (SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
        |  FROM events),
        |p AS (SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
        |  FROM r WHERE rn <= 3 GROUP BY user_id)
        |SELECT path, CAST(count(*) AS BIGINT) AS n_users
        |FROM p GROUP BY path ORDER BY n_users DESC, path""".stripMargin,
    "q162_gini" ->
      """WITH sp AS (SELECT o_custkey, sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
        |  FROM orders GROUP BY o_custkey),
        |r AS (SELECT cents, CAST(row_number() OVER (ORDER BY cents, o_custkey) AS BIGINT) AS i
        |  FROM sp),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS total_cents,
        |    CAST(sum(i * cents) AS BIGINT) AS iwx FROM r)
        |SELECT n, total_cents,
        |  round((2.0 * iwx - CAST(n + 1 AS DOUBLE) * total_cents) /
        |    (CAST(n AS DOUBLE) * total_cents), 6) AS gini
        |FROM a""".stripMargin,
    "q163_dataset_card" ->
      """WITH b AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
        |    CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |    CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |    CAST(count(DISTINCT md5(lower(text))) AS BIGINT) AS n_uniq
        |  FROM documents),
        |q AS (SELECT round(quantile_cont(n_chars, 0.5), 0) AS p50,
        |    round(quantile_cont(n_chars, 0.9), 0) AS p90 FROM documents)
        |SELECT stat, value FROM (
        |  SELECT 'chars_mean' AS stat, round(CAST(sum_chars AS DOUBLE) / n_docs, 6) AS value FROM b
        |  UNION ALL SELECT 'chars_p50', p50 FROM q
        |  UNION ALL SELECT 'chars_p90', p90 FROM q
        |  UNION ALL SELECT 'docs_total', CAST(n_docs AS DOUBLE) FROM b
        |  UNION ALL SELECT 'dup_rate', round(CAST(n_docs - n_uniq AS DOUBLE) / n_docs, 6) FROM b
        |  UNION ALL SELECT 'langs', CAST(n_langs AS DOUBLE) FROM b
        |  UNION ALL SELECT 'sources', CAST(n_sources AS DOUBLE) FROM b)
        |ORDER BY stat""".stripMargin,
    "q164_time_weighted_avg" ->
      """WITH e AS (SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS es,
        |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |l AS (SELECT *, lead(es) OVER (PARTITION BY user_id ORDER BY es, event_id) AS nes,
        |    lead(cents) OVER (PARTITION BY user_id ORDER BY es, event_id) AS ncents FROM e),
        |g AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |    CAST(sum(CASE WHEN nes IS NOT NULL THEN (nes - es) * (cents + ncents) END) AS BIGINT) AS twice_area,
        |    CAST(max(es) - min(es) AS BIGINT) AS span_s,
        |    CAST(min(cents) AS BIGINT) AS first_cents
        |  FROM l GROUP BY user_id)
        |SELECT user_id, n_events,
        |  round(CASE WHEN span_s > 0 THEN CAST(twice_area AS DOUBLE) / (2.0 * span_s) / 100.0
        |        ELSE CAST(first_cents AS DOUBLE) / 100.0 END, 6) AS twa
        |FROM g ORDER BY user_id""".stripMargin,
    "q165_bitmap_semijoin" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM orders WHERE o_custkey IN
        |  (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q166_skyline" ->
      """WITH sp AS (SELECT o_custkey,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents,
        |    CAST(count(*) AS BIGINT) AS n_orders
        |  FROM orders GROUP BY o_custkey),
        |pts AS (SELECT cents, n_orders, CAST(count(*) AS BIGINT) AS n_customers
        |  FROM sp GROUP BY cents, n_orders),
        |sw AS (SELECT *, max(n_orders) OVER (ORDER BY cents DESC, n_orders DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS max_prev_y FROM pts)
        |SELECT cents, n_orders, n_customers FROM sw
        |WHERE max_prev_y IS NULL OR n_orders > max_prev_y
        |ORDER BY cents DESC""".stripMargin,
    "q199_merge_upsert" ->
      """WITH tgt AS (SELECT c_custkey AS key,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS cents, c_mktsegment AS seg
        |  FROM customer),
        |upd AS (SELECT o_custkey AS key, 'U' AS op,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS s_cents
        |  FROM orders GROUP BY 1
        |  HAVING o_custkey % 97 <> 0 AND o_custkey % 101 <> 0 AND o_custkey % 3 <> 0),
        |del AS (SELECT key, 'D' AS op, CAST(0 AS BIGINT) AS s_cents
        |  FROM tgt WHERE key % 97 = 0),
        |mk AS (SELECT max(key) AS mk FROM tgt),
        |insnew AS (SELECT mk + n_nationkey + 1 AS key, 'I' AS op,
        |    CAST((n_nationkey + 1) * 1000 AS BIGINT) AS s_cents FROM nation, mk),
        |insconf AS (SELECT key, 'I' AS op, CAST(0 AS BIGINT) AS s_cents
        |  FROM tgt WHERE key % 101 = 0 AND key % 97 <> 0),
        |src AS (SELECT * FROM upd UNION ALL SELECT * FROM del
        |  UNION ALL SELECT * FROM insnew UNION ALL SELECT * FROM insconf),
        |m AS (SELECT coalesce(t.key, s.key) AS key, t.cents AS t_cents,
        |    t.seg AS t_seg, s.op, s.s_cents
        |  FROM tgt t FULL OUTER JOIN src s ON t.key = s.key),
        |a AS (SELECT *, CASE WHEN op IS NULL THEN 'kept'
        |    WHEN t_seg IS NOT NULL AND op = 'D' THEN 'deleted'
        |    WHEN t_seg IS NOT NULL AND op = 'U' THEN 'updated'
        |    WHEN t_seg IS NOT NULL AND op = 'I' THEN 'kept_conflict'
        |    WHEN op = 'I' THEN 'inserted' ELSE 'noop_source' END AS action
        |  FROM m),
        |f AS (SELECT action, key,
        |    CASE WHEN action IN ('updated', 'inserted') THEN s_cents ELSE t_cents END AS f_cents,
        |    CASE WHEN action = 'updated' THEN 'UPDATED'
        |         WHEN action = 'inserted' THEN 'NEW' ELSE t_seg END AS f_seg
        |  FROM a WHERE action <> 'noop_source')
        |SELECT action, count(*) AS n, CAST(sum(f_cents) AS BIGINT) AS sum_cents,
        |  CAST(sum(('0x' || substring(md5(CAST(key AS VARCHAR) || '|' ||
        |    CAST(f_cents AS VARCHAR) || '|' || f_seg), 1, 8))::BIGINT) AS BIGINT) AS checksum
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,
    "q194_activity_streak" ->
      """WITH days AS (SELECT DISTINCT user_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day FROM events),
        |isl AS (SELECT user_id, day,
        |    day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
        |  FROM days),
        |st AS (SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len,
        |    CAST(min(day) AS BIGINT) AS start_day
        |  FROM isl GROUP BY user_id, grp),
        |best AS (SELECT user_id, len, start_day,
        |    row_number() OVER (PARTITION BY user_id ORDER BY len DESC, start_day) AS rk
        |  FROM st),
        |act AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_active_days
        |  FROM days GROUP BY user_id)
        |SELECT b.user_id, b.len AS longest_streak, b.start_day, act.n_active_days
        |FROM best b JOIN act ON b.user_id = act.user_id
        |WHERE b.rk = 1 ORDER BY longest_streak DESC, b.user_id""".stripMargin,
    "q189_shortest_paths" ->
      """WITH RECURSIVE w AS (SELECT list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS ws
        |  FROM documents),
        |bg AS (SELECT ws[i] AS x, ws[i+1] AS y FROM w, unnest(range(1, len(ws))) AS t(i)
        |  WHERE len(ws) >= 2),
        |e AS (SELECT DISTINCT least(x, y) AS u, greatest(x, y) AS v FROM bg WHERE x <> y),
        |ew AS (SELECT u, v,
        |    1 + CAST(('0x' || substring(md5(u || '|' || v), 1, 8))::BIGINT % 9 AS BIGINT) AS w
        |  FROM e),
        |adj AS (SELECT u AS a, v AS b, w FROM ew UNION ALL SELECT v AS a, u AS b, w FROM ew),
        |sp AS (
        |  SELECT 'table' AS word, CAST(0 AS BIGINT) AS dist
        |  UNION
        |  SELECT adj.b AS word, sp.dist + adj.w AS dist
        |  FROM sp JOIN adj ON adj.a = sp.word WHERE sp.dist + adj.w <= 108)
        |SELECT word, CAST(min(dist) AS BIGINT) AS dist
        |FROM sp GROUP BY word ORDER BY word""".stripMargin,
    "q167_bfs_levels" ->
      """WITH RECURSIVE w AS (SELECT list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS ws
        |  FROM documents),
        |bg AS (SELECT ws[i] AS x, ws[i+1] AS y FROM w, unnest(range(1, len(ws))) AS t(i)
        |  WHERE len(ws) >= 2),
        |e AS (SELECT DISTINCT least(x, y) AS u, greatest(x, y) AS v FROM bg WHERE x <> y),
        |adj AS (SELECT u AS a, v AS b FROM e UNION ALL SELECT v AS a, u AS b FROM e),
        |bfs AS (
        |  SELECT 'table' AS word, CAST(0 AS BIGINT) AS dist
        |  UNION
        |  SELECT adj.b AS word, bfs.dist + 1 AS dist
        |  FROM bfs JOIN adj ON adj.a = bfs.word WHERE bfs.dist < 12)
        |SELECT word, CAST(min(dist) AS BIGINT) AS dist
        |FROM bfs GROUP BY word ORDER BY word""".stripMargin,
    "q168_negative_sampling" ->
      """WITH a AS (SELECT vec_id AS anchor_id, CAST(label AS BIGINT) AS anchor_label
        |  FROM embeddings WHERE vec_id % 100 = 25),
        |c AS (SELECT vec_id AS neg_id, CAST(label AS BIGINT) AS neg_label FROM embeddings),
        |s AS (SELECT anchor_id, anchor_label, neg_id, neg_label,
        |    md5(CAST(anchor_id AS VARCHAR) || '_' || CAST(neg_id AS VARCHAR)) AS pri
        |  FROM a JOIN c ON neg_label <> anchor_label),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY anchor_id ORDER BY pri, neg_id) AS BIGINT) AS rk
        |  FROM s)
        |SELECT anchor_id, anchor_label, rk, neg_id, neg_label
        |FROM r WHERE rk <= 5 ORDER BY anchor_id, rk""".stripMargin,
    "q169_oov_rate" ->
      """WITH tok AS (SELECT source,
        |    unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS w
        |  FROM documents),
        |vc AS (SELECT w FROM (SELECT w, count(*) AS cw FROM tok GROUP BY w
        |  ORDER BY cw DESC, w LIMIT 20)),
        |j AS (SELECT source, tok.w, vc.w IS NOT NULL AS in_vocab
        |  FROM tok LEFT JOIN vc ON tok.w = vc.w)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN NOT in_vocab THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |  CAST(count(DISTINCT CASE WHEN NOT in_vocab THEN w END) AS BIGINT) AS n_oov_types,
        |  round(CAST(sum(CASE WHEN NOT in_vocab THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS oov_rate
        |FROM j GROUP BY source ORDER BY source""".stripMargin,
    "q170_window_chunks" ->
      """WITH w AS (SELECT source,
        |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS ws
        |  FROM documents),
        |ch AS (SELECT source, ws[st+1 : st+32] AS chunk
        |  FROM w, unnest(range(0, len(ws), 16)) AS t(st) WHERE len(ws) >= 1),
        |h AS (SELECT source, CAST(len(chunk) AS BIGINT) AS clen,
        |    md5(array_to_string(chunk, ' ')) AS h FROM ch)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(sum(clen) AS BIGINT) AS sum_tokens,
        |  CAST(count(DISTINCT h) AS BIGINT) AS n_distinct_chunks,
        |  round(CAST(sum(clen) AS DOUBLE) / count(*), 6) AS mean_chunk_len
        |FROM h GROUP BY source ORDER BY source""".stripMargin,
    "q171_numeric_drift" ->
      """WITH h AS (SELECT CASE WHEN event_id % 2 = 0 THEN 'a' ELSE 'b' END AS half, value
        |  FROM events),
        |c AS (SELECT half,
        |    quantile_cont(value, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS vs
        |  FROM h GROUP BY half),
        |u AS (SELECT half, i / 10.0 AS p, round(vs[i], 2) AS v
        |  FROM c, unnest(range(1, 10)) t(i))
        |SELECT a.p, a.v AS va, b.v AS vb, round(abs(a.v - b.v), 2) AS drift
        |FROM u a JOIN u b ON a.p = b.p AND a.half = 'a' AND b.half = 'b'
        |ORDER BY a.p""".stripMargin,
    "q172_backfill_plan" ->
      """WITH h AS (SELECT date_trunc('hour', ts) AS hour, event_type FROM events GROUP BY 1, 2),
        |bounds AS (SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi FROM events),
        |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM bounds),
        |grid AS (SELECT hour, event_type FROM spine CROSS JOIN (SELECT DISTINCT event_type FROM events)),
        |gaps AS (SELECT g.event_type, g.hour, CAST(floor(epoch(g.hour)) AS BIGINT) AS hs
        |  FROM grid g LEFT JOIN h ON g.hour = h.hour AND g.event_type = h.event_type
        |  WHERE h.hour IS NULL),
        |m AS (SELECT *, lag(hs) OVER (PARTITION BY event_type ORDER BY hs) AS prev FROM gaps),
        |i AS (SELECT *, sum(CASE WHEN prev IS NULL OR hs - prev <> 3600 THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY event_type ORDER BY hs
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island FROM m)
        |SELECT event_type, min(hour) AS gap_start, max(hour) AS gap_end,
        |  CAST(count(*) AS BIGINT) AS n_hours
        |FROM i GROUP BY event_type, island ORDER BY event_type, gap_start""".stripMargin,
    "q146_interval_merge" ->
      """WITH e AS (SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS es,
        |    CAST(floor(epoch(ts)) AS BIGINT) + 1800 AS en FROM events),
        |m AS (SELECT *, max(en) OVER (PARTITION BY user_id ORDER BY es, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end FROM e),
        |i AS (SELECT *, sum(CASE WHEN prev_end IS NULL OR es > prev_end THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY es, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island FROM m),
        |g AS (SELECT user_id, island, count(*) AS n_ev, min(es) AS st, max(en) AS fin
        |  FROM i GROUP BY 1, 2)
        |SELECT user_id, CAST(sum(n_ev) AS BIGINT) AS n_events,
        |  CAST(count(*) AS BIGINT) AS n_islands,
        |  CAST(sum(fin - st) AS BIGINT) AS covered_s,
        |  CAST(max(fin - st) AS BIGINT) AS longest_s
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q147_pit_join" ->
      """WITH dim AS (SELECT user_id, event_id AS eid, event_type AS state,
        |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS BIGINT) AS version_n
        |  FROM events WHERE event_type IN ('signup', 'error')),
        |p AS (SELECT user_id, event_id AS eid, value FROM events WHERE event_type = 'purchase'),
        |u AS (SELECT user_id, eid, state, version_n, NULL::BIGINT AS probe_id,
        |    NULL::DOUBLE AS value, 0 AS is_probe FROM dim
        |  UNION ALL SELECT user_id, eid, NULL, NULL, eid, value, 1 FROM p),
        |f AS (SELECT user_id, probe_id, value, is_probe,
        |    last_value(state IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY eid, is_probe
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS st,
        |    last_value(version_n IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY eid, is_probe
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS vn
        |  FROM u)
        |SELECT probe_id AS purchase_id, user_id, coalesce(st, 'none') AS state,
        |  CAST(coalesce(vn, 0) AS BIGINT) AS state_version,
        |  CAST(round(value * 100) AS BIGINT) AS value_cents
        |FROM f WHERE is_probe = 1 ORDER BY purchase_id""".stripMargin,
    "q148_triangle_count" ->
      """WITH w AS (SELECT list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS ws
        |  FROM documents),
        |bg AS (SELECT ws[i] AS x, ws[i+1] AS y FROM w, unnest(range(1, len(ws))) AS t(i)
        |  WHERE len(ws) >= 2),
        |e AS (SELECT DISTINCT least(x, y) AS u, greatest(x, y) AS v FROM bg WHERE x <> y),
        |d AS (SELECT n, count(*) AS dg
        |  FROM (SELECT u AS n FROM e UNION ALL SELECT v AS n FROM e) q GROUP BY n),
        |o AS (SELECT CASE WHEN du.dg < dv.dg OR (du.dg = dv.dg AND u < v) THEN u ELSE v END AS s,
        |             CASE WHEN du.dg < dv.dg OR (du.dg = dv.dg AND u < v) THEN v ELSE u END AS t
        |      FROM e JOIN d du ON du.n = e.u JOIN d dv ON dv.n = e.v),
        |wd AS (SELECT o1.s AS a, o1.t AS b, o2.t AS c
        |  FROM o o1 JOIN o o2 ON o1.s = o2.s AND o1.t < o2.t),
        |tr AS (SELECT a, b, c FROM wd JOIN e ON e.u = wd.b AND e.v = wd.c),
        |x AS (SELECT unnest([a, b, c]) AS word FROM tr)
        |SELECT word, CAST(count(*) AS BIGINT) AS n_triangles
        |FROM x GROUP BY word ORDER BY word""".stripMargin,
    "q149_rfm_segments" ->
      """WITH rfm AS (SELECT o_custkey,
        |    CAST(date_diff('day', CAST(max(o_orderdate) AS DATE), DATE '2002-01-01') AS DOUBLE) AS recency,
        |    CAST(count(*) AS DOUBLE) AS frequency,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) AS monetary
        |  FROM orders GROUP BY o_custkey),
        |c AS (SELECT
        |    round(quantile_cont(recency, 0.25), 0) AS r1, round(quantile_cont(recency, 0.5), 0) AS r2,
        |    round(quantile_cont(recency, 0.75), 0) AS r3,
        |    round(quantile_cont(frequency, 0.25), 0) AS f1, round(quantile_cont(frequency, 0.5), 0) AS f2,
        |    round(quantile_cont(frequency, 0.75), 0) AS f3,
        |    round(quantile_cont(monetary, 0.25), 0) AS m1, round(quantile_cont(monetary, 0.5), 0) AS m2,
        |    round(quantile_cont(monetary, 0.75), 0) AS m3
        |  FROM rfm),
        |s AS (SELECT o_custkey, recency, frequency, monetary,
        |    1 + (CASE WHEN recency > r1 THEN 1 ELSE 0 END) + (CASE WHEN recency > r2 THEN 1 ELSE 0 END)
        |      + (CASE WHEN recency > r3 THEN 1 ELSE 0 END) AS r,
        |    1 + (CASE WHEN frequency > f1 THEN 1 ELSE 0 END) + (CASE WHEN frequency > f2 THEN 1 ELSE 0 END)
        |      + (CASE WHEN frequency > f3 THEN 1 ELSE 0 END) AS f,
        |    1 + (CASE WHEN monetary > m1 THEN 1 ELSE 0 END) + (CASE WHEN monetary > m2 THEN 1 ELSE 0 END)
        |      + (CASE WHEN monetary > m3 THEN 1 ELSE 0 END) AS m
        |  FROM rfm, c)
        |SELECT CAST(r AS VARCHAR) || CAST(f AS VARCHAR) || CAST(m AS VARCHAR) AS segment,
        |  CAST(count(*) AS BIGINT) AS n_customers,
        |  CAST((2 * CAST(sum(CAST(recency AS BIGINT)) AS BIGINT) * 1000000 + count(*))
        |    // (2 * count(*)) AS DOUBLE) / 1000000.0 AS avg_recency_days,
        |  CAST((2 * CAST(sum(CAST(frequency AS BIGINT)) AS BIGINT) * 1000000 + count(*))
        |    // (2 * count(*)) AS DOUBLE) / 1000000.0 AS avg_orders,
        |  CAST((2 * CAST(sum(CAST(monetary AS BIGINT)) AS BIGINT) * 10000 + count(*))
        |    // (2 * count(*)) AS DOUBLE) / 1000000.0 AS avg_spend
        |FROM s GROUP BY segment ORDER BY segment""".stripMargin,
    "q150_lexical_topk" ->
      """WITH tok AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf FROM (
        |    SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS word
        |    FROM documents)
        |  GROUP BY doc_id, word),
        |nd AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
        |dfs AS (SELECT word, ln(((SELECT n_docs FROM nd) + 1) / (CAST(count(*) AS DOUBLE) + 1)) + 1 AS idf
        |  FROM tok GROUP BY word),
        |wt AS (SELECT doc_id, tok.word, tf * idf AS w FROM tok JOIN dfs USING (word)),
        |nr AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM wt GROUP BY doc_id),
        |pr AS (SELECT * FROM wt WHERE doc_id < 20),
        |dots AS (SELECT pr.doc_id AS da, b.doc_id AS db, sum(pr.w * b.w) AS dot,
        |    CAST(count(*) AS BIGINT) AS n_common
        |  FROM pr JOIN wt b ON pr.word = b.word AND pr.doc_id <> b.doc_id GROUP BY 1, 2),
        |sc AS (SELECT da, db, n_common, round(dot / (x.nrm * y.nrm), 6) AS cos
        |  FROM dots JOIN nr x ON x.doc_id = da JOIN nr y ON y.doc_id = db),
        |rk AS (SELECT *, CAST(row_number() OVER (PARTITION BY da ORDER BY cos DESC, db) AS BIGINT) AS rk
        |  FROM sc)
        |SELECT da AS doc_a, db AS doc_b, n_common, cos, rk
        |FROM rk WHERE rk <= 5 ORDER BY doc_a, rk""".stripMargin)
}
