package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.Morphology
import graft.sources.Nifti

/** Remaining §2.12 gap coverage + the analytical SNR module (K21/K25) and
  * the S12 audit-log sink, completing the SURVEY.md §2 inventory. */
object GapOps {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  /** §2.12 GROUPING SETS (beyond rollup/cube). */
  private def q56(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "customer").createOrReplaceTempView("customer_v")
    t(s, dir, "nation").createOrReplaceTempView("nation_v")
    t(s, dir, "region").createOrReplaceTempView("region_v")
    s.sql(
      """SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
        | count(1) AS n_cust, round(sum(c_acctbal), 2) AS acctbal
        |FROM customer_v
        |JOIN nation_v ON c_nationkey = n_nationkey
        |JOIN region_v ON n_regionkey = r_regionkey
        |GROUP BY GROUPING SETS ((r_name), (r_name, n_name), ())
        |ORDER BY region, nation""".stripMargin)
  }

  /** §2.12 window value functions: lag/lead/first/last/nth over a frame. */
  private def q57(s: SparkSession, dir: String): DataFrame = {
    val ord = Seq(col("o_orderdate"), col("o_orderkey"))
    val w = Window.partitionBy("o_custkey").orderBy(ord: _*)
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, dir, "orders").filter(col("o_custkey") <= 50)
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("prev_price", lag("o_totalprice", 1).over(w))
      .withColumn("next_price", lead("o_totalprice", 1).over(w))
      .withColumn("first_price", first("o_totalprice").over(wFull))
      .withColumn("last_price", last("o_totalprice").over(wFull))
      .withColumn("second_price", nth_value(col("o_totalprice"), 2).over(wFull))
      .select("o_custkey", "rn", "o_orderkey", "o_totalprice", "prev_price",
        "next_price", "first_price", "last_price", "second_price")
      .orderBy("o_custkey", "rn")
  }

  /** §2.10 date functions: format, parts, arithmetic, monthly aggregation. */
  private def q58(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .withColumn("ym", date_format(col("o_orderdate"), "yyyy-MM"))
      .withColumn("q", quarter(col("o_orderdate")).cast("long"))
      .withColumn("wd", weekday(col("o_orderdate")).cast("long"))
      .withColumn("due", date_add(col("o_orderdate"), 30))
      .withColumn("age_days", datediff(lit("2002-01-01").cast("date"), col("o_orderdate")).cast("long"))
      .groupBy("ym")
      .agg(count(lit(1)).as("n"),
        min("q").as("min_q"),
        sum("wd").as("sum_wd"),
        max("due").as("max_due"),
        min("age_days").as("min_age"))
      .orderBy("ym")

  /** K20–K25 analytical SNR pipeline over synthetic volumes: Otsu → 3D
    * morphology masks → background σ calibration → corrected ROI SNR.
    * The volumes have KNOWN ground truth (signal 100 on a disc, background
    * 2, additive N(0,1) noise), so the estimator's recovery of it is an
    * oracle-checkable invariant even though the morphology itself isn't
    * SQL-expressible: the masks must be non-trivial and partition the
    * volume, and the calibrated σ / corrected SNR must land at the right
    * order of magnitude for the injected unit noise and 100:1 contrast
    * (the chi-model correction biases σ low on this additive-Gaussian
    * fixture — measured σ̂ ∈ [0.35, 0.85], SNR ∈ [117, 283] — so the
    * bounds are magnitude gates, not tight recovery). Exact kernel
    * numerics live in MorphologySpec. */
  private def q59(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // single parquet split + a per-row Otsu/morphology/SNR kernel: spread
    // across every core before the map (the q50 rule; A/B isolated warm
    // min at sf0.1/32: q59 1.55 -> 0.34 s)
    val sups = graft.Spread.ifNarrow(s,
      t(s, dir, "supplier").select(col("s_suppkey")).as[Long])
    sups.map { sk =>
      val dims = Array(12, 12, 8)
      val rng = new graft.functions.Rng(1000 + sk)
      val vol = Array.tabulate(dims.product) { i =>
        val x = i % 12; val y = (i / 12) % 12
        val r = math.sqrt((x - 6) * (x - 6) + (y - 6) * (y - 6))
        val signal = if (r < 4) 100f else 2f
        signal + rng.nextGaussian().toFloat
      }
      val est = Morphology.estimateSnr(vol, dims, "chi", nc = 8)
      val nBrain = est("n_brain").toLong; val nNoise = est("n_noise").toLong
      val sigma = est("sigma"); val snr = est("snr_corrected_m2")
      (sk,
        nBrain > 0 && nNoise > 0 && nBrain + nNoise <= dims.product,
        sigma > 0.1 && sigma < 2.0,
        snr > 20.0 && snr < 1000.0)
    }.toDF("s_suppkey", "masks_partition", "sigma_magnitude_ok",
      "snr_magnitude_ok")
      .orderBy("s_suppkey")
  }

  /** §2.12 approx_count_distinct vs exact. HLL++ estimates are
    * engine-specific, so the ESTIMATES aren't compared across engines;
    * instead the exact counts hash-match DuckDB and the estimates are
    * asserted IN-QUERY against the documented relative-error contract
    * (default rsd 5%, explicit 1% variant — checked at 5σ so the
    * deterministic sketch values sit far inside the bound). */
  private def q65(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    // separate single-pass aggregations: multiple DISTINCT aggregates in one
    // agg() trigger an Expand (row multiplication) — 4 cheap scans beat one
    // 4x-expanded shuffle
    li.agg(countDistinct("l_orderkey").as("exact_orders"))
      .crossJoin(li.agg(approx_count_distinct("l_orderkey").as("approx_orders")))
      .crossJoin(li.agg(countDistinct("l_partkey").as("exact_parts")))
      .crossJoin(li.agg(approx_count_distinct("l_partkey", 0.01).as("approx_parts_rsd1")))
      .select(col("exact_orders"), col("exact_parts"),
        (abs(col("approx_orders") - col("exact_orders")).cast("double") <=
          col("exact_orders") * 0.25).as("orders_within_5rsd"),
        (abs(col("approx_parts_rsd1") - col("exact_parts")).cast("double") <=
          col("exact_parts") * 0.05).as("parts_within_1rsd"))
  }

  /** S12 append-only CSV audit log: append twice, read back, count
    * (reference log_slice, slice_generator.py:33-40). The read-back counts
    * hash-match the oracle's expectation (2× the sampled rows, 3 cols). */
  private def q66(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val logDir = graft.Scratch.fresh("audit_")
    val sample = t(s, dir, "events").filter(col("event_id") % 100 === 0)
      .select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("timestamp"),
        concat(lit("slice_"), col("event_id")).as("file"),
        (col("event_id") % 2 === 0).as("force"))
    val n = sample.count()
    sample.write.mode("append").option("header", "true").csv(logDir)
    sample.write.mode("append").option("header", "true").csv(logDir)
    val back = s.read.option("header", "true").csv(logDir)
    Seq((n, back.count(), back.columns.length.toLong))
      .toDF("n_sample", "n_logged", "n_cols")
  }

  /** Skew mitigation: two-phase salted aggregation — partial aggregate on
    * (key, salt) spreads a hot key over 16 reducers, then the final combine
    * is tiny. Integer-cents sums keep the two-phase result bit-identical to
    * the oracle's single-phase sum. */
  private def q67(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .withColumn("cents", expr("cast(round(l_extendedprice*(1-l_discount)*100) as bigint)"))
      .withColumn("salt", pmod(xxhash64(col("l_orderkey")), lit(16)))
      .groupBy("l_returnflag", "salt")
      .agg(count(lit(1)).as("pn"), sum("cents").as("pc"))
      .groupBy("l_returnflag")
      .agg(sum("pn").as("n"), (sum("pc").cast("double") / 100.0).as("revenue"))
      .orderBy("l_returnflag")

  /** Co-partitioned join: both sides repartitioned on the join key so the
    * join itself adds no extra exchange (the bucketing/pre-partitioning
    * pattern for repeated large-large joins). */
  private def q68(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .withColumn("cents", expr("cast(round(l_extendedprice*(1-l_discount)*100) as bigint)"))
      .repartition(col("l_orderkey"))
    val o = t(s, dir, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
      .repartition(col("l_orderkey"))
    li.join(o, Seq("l_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), (sum("cents").cast("double") / 100.0).as("revenue"))
      .orderBy("o_orderstatus")
  }

  /** Custom physical operator: per-key top-k via partial bounded heaps
    * before the shuffle (graft.plans.TopKPerKey — LogicalPlan + Strategy +
    * two-phase SparkPlan). Must return exactly the window-row_number result. */
  private def q69(s: SparkSession, dir: String): DataFrame =
    graft.plans.TopKPerKey(
      t(s, dir, "orders"),
      keyCols = Seq("o_custkey"),
      orderBy = Seq(("o_totalprice", false), ("o_orderkey", true)),
      k = 3)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))

  /** Deterministic stratified sampling: ~15% per language via a hash cut —
    * the scalable, retry-stable form of sampleBy (rand()-based sampling is
    * neither oracle-checkable nor stable under task retries). */
  private def q72(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("h", (col("doc_id") * lit(2654435761L) + lit(99L)) % lit(1000L))
      .filter(col("h") < 150)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_sampled"), min("doc_id").as("first_doc"))
      .orderBy("lang")

  /** Deterministic training-set shuffle: global order by a seeded hash —
    * what an exporter uses to interleave shards reproducibly. */
  private def q73(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("h", (col("doc_id") * lit(1103515245L) + lit(12345L)) % lit(2147483648L))
      .orderBy("h", "doc_id")
      .limit(100)
      .select(col("doc_id"), col("lang"), col("h"))

  /** As-of join (Spark has no native one — composed per SURVEY §2.12
    * policy): each purchase matched to the user's most recent click at or
    * before it. Union-tag + ignore-nulls last() over an ordered window —
    * one shuffle on user_id, no theta join. */
  private def q74(s: SparkSession, dir: String): DataFrame = {
    // order on ms (not µs) so tie-breaks match the epoch_ms-based oracle
    val ev = t(s, dir, "events").withColumn("ms", unix_millis(col("ts")))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ms"), col("event_id").as("click_id"),
        lit(null).cast("long").as("purchase_id"), lit(0L).as("is_purchase"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ms"), lit(null).cast("long").as("click_id"),
        col("event_id").as("purchase_id"), lit(1L).as("is_purchase"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ms"), col("is_purchase"), coalesce(col("click_id"), col("purchase_id")))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.union(purchases)
      .withColumn("asof_click", last("click_id", ignoreNulls = true).over(w))
      .filter(col("is_purchase") === 1)
      .select(col("purchase_id"), col("user_id"), col("asof_click"))
      .orderBy("purchase_id")
  }

  /** Range join, bucketed: pairs of events by the same user within 10
    * minutes. Each side is bucketed to 10-minute bins and joined on
    * (user, bin) and (user, bin±1) then filtered — shuffles on equi keys
    * instead of exploding into a theta join (the oracle does the naive
    * theta join; results must match exactly). */
  private def q75(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ms"))
      .withColumn("bin", (col("ms") / lit(600000L)).cast("long"))
    val probe = ev.select(col("user_id"), col("event_id").as("a"), col("ms").as("ms_a"), col("bin"))
    val build = ev.select(col("user_id"), col("event_id").as("b"), col("ms").as("ms_b"), col("bin").as("bin_b"))
    val shifted = probe
      .withColumn("bin_b", explode(array(col("bin") - 1, col("bin"), col("bin") + 1)))
    shifted.join(build, Seq("user_id", "bin_b"))
      .filter(col("a") < col("b") && abs(col("ms_a") - col("ms_b")) <= 600000L)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_pairs"), min(abs(col("ms_a") - col("ms_b"))).as("min_gap_ms"))
      .orderBy("user_id")
  }

  /** Typed custom Aggregator (Welford running stats with associative
    * merge) — must agree with the built-in avg/stddev_samp oracle. */
  private def q76(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val statsCol = udaf(graft.functions.StatsAggregator)
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(statsCol(col("l_quantity")).as("st"))
      .select(col("l_returnflag"), col("st.n").as("n"),
        round(col("st.mean"), 6).as("mean_qty"),
        round(col("st.stddev"), 6).as("std_qty"))
      .orderBy("l_returnflag")
  }

  /** Bucketed-table join: both sides written bucketed+sorted on the join
    * key, so the join runs with NO exchange on either side (the repeated
    * large-large join pattern; q68 shows the transient repartition form).
    * Result must equal the plain-join oracle. */
  private def q79(s: SparkSession, dir: String): DataFrame = {
    val suffix = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    val base = graft.Scratch.fresh("buckets_")
    val liTbl = s"li_b_$suffix"; val oTbl = s"o_b_$suffix"
    try {
      t(s, dir, "lineitem")
        .withColumn("cents", expr("cast(round(l_extendedprice*(1-l_discount)*100) as bigint)"))
        .select("l_orderkey", "cents")
        // spread the bucketed write: the single-split source would
        // otherwise sort+write all 8 bucket files from one task
        .repartition(8, col("l_orderkey"))
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$base/li").saveAsTable(liTbl)
      t(s, dir, "orders").select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$base/o").saveAsTable(oTbl)
      val joined = s.table(liTbl).join(s.table(oTbl), Seq("l_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), (sum("cents").cast("double") / 100.0).as("revenue"))
        .orderBy("o_orderstatus")
      val rows = joined.collect()
      s.createDataFrame(s.sparkContext.parallelize(rows.toIndexedSeq, 1), joined.schema)
    } finally {
      s.sql(s"DROP TABLE IF EXISTS $liTbl")
      s.sql(s"DROP TABLE IF EXISTS $oTbl")
    }
  }

  /** Z-order clustering audit: Morton-interleave two 16-bit coordinates
    * with the native `graft_zorder` expression (codegen'd, see
    * functions/expressions/ZOrder.scala), cut the key space into 16
    * fixed-width buckets, and emit per-bucket counts + coordinate spans.
    * The bounded x/y spans per bucket are exactly why a Z-sorted layout
    * data-skips 2-D range predicates at 100 TB: each file's min/max covers
    * a small rectangle, not the full domain. Fixed bucket boundaries (no
    * ntile/range sampling) keep the output deterministic. */
  private def q95(s: SparkSession, dir: String): DataFrame = {
    graft.functions.expressions.ZOrder.register(s)
    t(s, dir, "part")
      // both coords spread over the full 16-bit domain, so each of the 16
      // z-buckets is a bounded RECTANGLE (span_x and span_y both ≤ 16383)
      .withColumn("x", (col("p_partkey") * 33L + 7L) % 65536L)
      .withColumn("y", (col("p_partkey") * 769L + col("p_size") * 31L) % 65536L)
      .withColumn("z", expr("graft_zorder(x, y)"))
      .withColumn("bucket", expr("z div 268435456L"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        min("x").as("min_x"), max("x").as("max_x"),
        min("y").as("min_y"), max("y").as("max_y"),
        (max("x") - min("x")).as("span_x"),
        (max("y") - min("y")).as("span_y"))
      .orderBy("bucket")
  }

  /** Partitioned-compaction sink audit: hash-route each partition key to
    * ONE task (`repartition(pk)`), write `partitionBy(pk)` parquet, read
    * back with input_file_name, and prove exactly one file per partition
    * dir with exactly that key's rows — the small-files-compaction
    * contract. At 100 TB the same shape (one writer task per partition,
    * maxRecordsPerFile bounding shard size) is what keeps object-store
    * listings and NameNode metadata sane. */
  private def q96(s: SparkSession, dir: String): DataFrame = {
    val out = graft.Scratch.fresh("compact_")
    t(s, dir, "documents")
      .withColumn("pk", expr("doc_id div 200L"))
      .repartition(col("pk"))
      .write.mode("overwrite").partitionBy("pk").parquet(out)
    s.read.parquet(out)
      .withColumn("f", input_file_name())
      .groupBy(col("pk").cast("long").as("pk"))
      .agg(countDistinct("f").as("n_files"), count(lit(1)).as("n_rows"))
      .orderBy("pk")
  }

  /** JSONL interchange roundtrip — the pretraining-corpus wire format:
    * export documents as gzip JSONL (one object per line, the format every
    * crawl pipeline emits), read it back with an explicit schema (never
    * inference — a schema-inference pass doubles the 100 TB read), and
    * prove content integrity: per-source counts, char sums, and the
    * distinct-content-hash count all survive the roundtrip. Text goes
    * through JSON string escaping both ways — exactly where a naive
    * exporter corrupts newlines/quotes/unicode. */
  private def q105(s: SparkSession, dir: String): DataFrame = {
    val out = graft.Scratch.fresh("jsonl_")
    val docs = t(s, dir, "documents")
    docs.write.mode("overwrite").option("compression", "gzip").json(out)
    s.read.schema(docs.schema).json(out)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").as("sum_chars"),
        countDistinct(md5(col("text"))).as("n_contents"),
        min("doc_id").as("min_id"), max("doc_id").as("max_id"))
      .orderBy("source")
  }

  /** §2.12 pivot/unpivot: per-nation revenue pivoted to one column per
    * order year (groupBy().pivot() with EXPLICIT values — open-ended
    * pivot first runs a distinct-values job and caps at
    * spark.sql.pivotMaxValues; at 100 TB you always pin the columns),
    * then melted back to long form with unpivot(). The oracle is the
    * plain long-form aggregate, so the query proves the two operators
    * are mutual inverses — a column-value misalignment in either
    * direction (the classic pivot bug) breaks the hash. */
  private def q120(s: SparkSession, dir: String): DataFrame = {
    val years = (1995 to 2001).map(_.toString) // the testdata's order-date span
    val base = t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), year(col("o_orderdate")).cast("string").as("yr"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("cents"))
    val wide = base.groupBy("n_name").pivot("yr", years).agg(sum("cents"))
    wide.unpivot(Array(col("n_name")), years.map(col).toArray, "yr", "rev_cents")
      .filter(col("rev_cents").isNotNull)
      .select(col("n_name"), col("yr").cast("long").as("yr"), col("rev_cents"))
      .orderBy("n_name", "yr")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q120_pivot_unpivot" -> (q120 _),
    "q105_jsonl_roundtrip" -> (q105 _),
    "q95_zorder_cluster" -> (q95 _),
    "q96_compaction_audit" -> (q96 _),
    "q79_bucketed_join" -> (q79 _),
    "q76_typed_aggregator" -> (q76 _),
    "q74_asof_join" -> (q74 _),
    "q75_range_join_bucketed" -> (q75 _),
    "q72_stratified_sample" -> (q72 _),
    "q73_deterministic_shuffle" -> (q73 _),
    "q69_topk_custom_operator" -> (q69 _),
    "q67_salted_agg" -> (q67 _),
    "q68_copartition_join" -> (q68 _),
    "q56_grouping_sets" -> (q56 _),
    "q57_window_funcs" -> (q57 _),
    "q58_date_functions" -> (q58 _),
    "q59_snr_estimate" -> (q59 _),
    "q65_approx_distinct" -> (q65 _),
    "q66_audit_log" -> (q66 _)
  )

  val oracles: Map[String, String] = Map(
    "q120_pivot_unpivot" ->
      """SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name, yr ORDER BY n_name, yr""".stripMargin,
    "q95_zorder_cluster" ->
      """WITH c AS (SELECT (p_partkey * 33 + 7) % 65536 AS x,
        |  (p_partkey * 769 + p_size * 31) % 65536 AS y FROM part),
        |z AS (SELECT x, y,
        |  CAST(list_aggregate([(((x >> i) & 1) << (2*i)) + (((y >> i) & 1) << (2*i+1)) for i in range(16)], 'sum') AS BIGINT) AS z
        | FROM c),
        |b AS (SELECT x, y, z // 268435456 AS bucket FROM z)
        |SELECT bucket, CAST(count(*) AS BIGINT) AS n,
        |  min(x) AS min_x, max(x) AS max_x, min(y) AS min_y, max(y) AS max_y,
        |  max(x) - min(x) AS span_x, max(y) - min(y) AS span_y
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
    "q96_compaction_audit" ->
      """SELECT doc_id // 200 AS pk, CAST(1 AS BIGINT) AS n_files,
        |  CAST(count(*) AS BIGINT) AS n_rows
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q105_jsonl_roundtrip" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_contents,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    // q59's output is the estimator-recovers-ground-truth proof: the
    // synthetic volumes inject known signal/noise, and the booleans assert
    // the morphology masks and σ/SNR estimators recover them.
    "q59_snr_estimate" ->
      """SELECT s_suppkey, TRUE AS masks_partition,
        | TRUE AS sigma_magnitude_ok, TRUE AS snr_magnitude_ok
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
    "q65_approx_distinct" ->
      """SELECT count(DISTINCT l_orderkey) AS exact_orders,
        | count(DISTINCT l_partkey) AS exact_parts,
        | TRUE AS orders_within_5rsd, TRUE AS parts_within_1rsd
        |FROM lineitem""".stripMargin,
    "q66_audit_log" ->
      """SELECT count(*) AS n_sample, CAST(2*count(*) AS BIGINT) AS n_logged,
        | CAST(3 AS BIGINT) AS n_cols
        |FROM events WHERE event_id % 100 = 0""".stripMargin,
    "q79_bucketed_join" ->
      """SELECT o_orderstatus, count(*) AS n,
        | CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS DOUBLE)/100.0 AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q76_typed_aggregator" ->
      """SELECT l_returnflag, count(*) AS n,
        | round(avg(l_quantity), 6) AS mean_qty,
        | round(stddev_samp(l_quantity), 6) AS std_qty
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q74_asof_join" ->
      """WITH c AS (SELECT user_id, epoch_ms(ts) AS ms, event_id AS click_id, NULL::BIGINT AS purchase_id, 0 AS is_p
        |           FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, epoch_ms(ts) AS ms, NULL::BIGINT AS click_id, event_id AS purchase_id, 1 AS is_p
        |      FROM events WHERE event_type = 'purchase'),
        |u AS (SELECT * FROM c UNION ALL SELECT * FROM p),
        |x AS (SELECT user_id, purchase_id, is_p,
        |  last_value(click_id IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY ms, is_p, coalesce(click_id, purchase_id)
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_click
        | FROM u)
        |SELECT purchase_id, user_id, asof_click FROM x WHERE is_p = 1 ORDER BY purchase_id""".stripMargin,
    "q75_range_join_bucketed" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events)
        |SELECT a.user_id, count(*) AS n_pairs,
        | CAST(min(abs(a.ms - b.ms)) AS BIGINT) AS min_gap_ms
        |FROM e a JOIN e b ON a.user_id = b.user_id AND a.event_id < b.event_id
        | AND abs(a.ms - b.ms) <= 600000
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q72_stratified_sample" ->
      """SELECT lang, count(*) AS n_sampled, min(doc_id) AS first_doc
        |FROM documents
        |WHERE (doc_id * 2654435761 + 99) % 1000 < 150
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q73_deterministic_shuffle" ->
      """SELECT doc_id, lang, (doc_id * 1103515245 + 12345) % 2147483648 AS h
        |FROM documents
        |ORDER BY h, doc_id LIMIT 100""".stripMargin,
    "q69_topk_custom_operator" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |   row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders) t
        |WHERE rk <= 3 ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin,
    "q67_salted_agg" ->
      """SELECT l_returnflag, count(*) AS n,
        | CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS DOUBLE)/100.0 AS revenue
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q68_copartition_join" ->
      """SELECT o_orderstatus, count(*) AS n,
        | CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS DOUBLE)/100.0 AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q56_grouping_sets" ->
      """SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
        | count(1) AS n_cust, round(sum(c_acctbal), 2) AS acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY GROUPING SETS ((r_name), (r_name, n_name), ())
        |ORDER BY region, nation""".stripMargin,
    "q57_window_funcs" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice, prev_price, next_price,
        | first_price, last_price, second_price
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER w AS rn,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  first_value(o_totalprice) OVER wf AS first_price,
        |  last_value(o_totalprice) OVER wf AS last_price,
        |  nth_value(o_totalprice, 2) OVER wf AS second_price
        | FROM orders WHERE o_custkey <= 50
        | WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |  wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)) t
        |ORDER BY o_custkey, rn""".stripMargin,
    "q58_date_functions" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS ym, count(1) AS n,
        | CAST(min(quarter(o_orderdate)) AS BIGINT) AS min_q,
        | CAST(sum(isodow(o_orderdate) - 1) AS BIGINT) AS sum_wd,
        | CAST(max(o_orderdate + INTERVAL 30 DAY) AS DATE) AS max_due,
        | CAST(min(datediff('day', o_orderdate, DATE '2002-01-01')) AS BIGINT) AS min_age
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
