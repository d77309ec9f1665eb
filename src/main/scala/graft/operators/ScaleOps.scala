package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Percentiles

/** Round-4 scale tier: semi-join reduction via Bloom filters, columnar
  * storage interchange (ORC/CSV), content-defined chunking dedup, and
  * robust (median/MAD) outlier gating — the remaining operations a 100 TB
  * curation pipeline runs that SURVEY.md §2 + the LLM tier didn't already
  * cover. Every query is DuckDB-oracle hash-checked.
  */
object ScaleOps {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  // ---------------------------------------------------------------------
  // q104 — Bloom-filter semi-join reduction
  // ---------------------------------------------------------------------

  /** Semi-join reduction: filter a big fact table by key membership in a
    * filtered dimension WITHOUT shuffling the fact side and WITHOUT
    * requiring the key set itself to be broadcast-able.
    *
    * The 100 TB story: when the interesting dimension subset has 10⁸ keys,
    * a broadcast semi join no longer fits, and a shuffle semi join moves
    * the whole fact table. A Bloom filter over the keys is ~1.2 bytes/key
    * at 1% false positives — broadcastable at sizes where the key set is
    * not — and prunes the fact scan BEFORE any exchange; the exact
    * (shuffle) semi join then runs over the surviving ~1% instead of 100%.
    * Catalyst's runtime row-level filtering does the same transform
    * opportunistically (spark.sql.optimizer.runtime.bloomFilter.enabled);
    * this is the explicit, always-on form with the filter built as a
    * first-class aggregate.
    *
    * Build: k=3 positions per key via xxhash64(key, salt) mod m (m = 2¹⁶
    * bits here, sized for the sf key count), OR-folded into m/64 longs with
    * a bit_or aggregate — one map-side-combinable pass, collect of 1 KB.
    * Probe: array-literal word lookup + bit test, fully codegen'd, no join.
    * The oracle is the plain exact semi join: the Bloom stage is
    * semantically transparent (its false positives are removed by the
    * exact residual join), so any probe/build bug breaks the hash. */
  /** Build the Bloom bitset over `keys.keyCol` (m bits, k=3 salts) — one
    * bit_or aggregate, collect of m/64 longs. */
  private[graft] def bloomBits(keys: DataFrame, keyCol: String, mBits: Int): Seq[Long] = {
    val words = keys
      .select(explode(array((0 until 3).map(k =>
        pmod(xxhash64(col(keyCol), lit(k)), lit(mBits.toLong))): _*)).as("pos"))
      .select(expr("pos div 64").as("w"), expr("cast(pos % 64 as int)").as("b"))
      .groupBy("w").agg(expr("bit_or(shiftleft(1L, b))").as("word"))
      .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    Seq.tabulate(mBits / 64)(i => words.getOrElse(i, 0L))
  }

  /** Probe-side prune: keep rows whose `probeCol` hits all k Bloom bits.
    * Array-literal word lookup + bit test — codegen'd, no join, runs at
    * the scan before any exchange. */
  private[graft] def bloomPrune(df: DataFrame, probeCol: String,
      bf: Seq[Long], mBits: Int): DataFrame = {
    val bloomHit = (0 until 3).map { k =>
      val pos = s"pmod(xxhash64($probeCol, $k), $mBits)"
      s"((graft_bf[cast($pos div 64 as int)] >> cast($pos % 64 as int)) & 1) = 1"
    }.mkString(" AND ")
    df.withColumn("graft_bf", typedLit(bf))
      .filter(expr(bloomHit))
      .drop("graft_bf")
  }

  private def q104(s: SparkSession, dir: String): DataFrame = {
    val mBits = 1 << 16
    val keys = t(s, dir, "customer")
      .filter(col("c_acctbal") > 9000).select("c_custkey")
    val pruned = bloomPrune(t(s, dir, "orders"), "o_custkey",
      bloomBits(keys, "c_custkey", mBits), mBits)
    // residual exact semi join over the pruned ~1%: false positives out
    pruned.join(keys, pruned("o_custkey") === keys("c_custkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("rev_cents"))
      .orderBy("o_orderpriority")
  }

  // ---------------------------------------------------------------------
  // q110 — ORC + CSV interchange roundtrip
  // ---------------------------------------------------------------------

  /** Columnar/text storage interchange: the same corpus written to ORC
    * (the second columnar format production lakes actually hold) and to
    * CSV (the interchange format curation teams still receive), read back,
    * and proven content-identical via per-format integrity aggregates.
    *
    * The corpus text is first salted with the characters that break naive
    * exporters — an embedded newline, a double quote, and the delimiter —
    * so the CSV leg genuinely exercises quoting + escaping + multiline
    * record reassembly (the raw testdata text is too clean to catch a
    * broken escape configuration). The oracle applies the same salt in SQL
    * and recomputes the aggregates from the parquet source, so a single
    * corrupted roundtrip row breaks the hash. q105 is the JSONL sibling. */
  private def q110(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .withColumn("text", concat(col("text"), lit("\n\"x,"), col("lang")))
    val orcDir = graft.Scratch.fresh("orc_")
    val csvDir = graft.Scratch.fresh("csv_")
    docs.write.mode("overwrite").option("compression", "zlib").orc(orcDir)
    docs.write.mode("overwrite")
      .option("header", "true").option("escape", "\"")
      .csv(csvDir)
    val orcBack = s.read.orc(orcDir)
    val csvBack = s.read.schema(docs.schema)
      .option("header", "true").option("escape", "\"").option("multiLine", "true")
      .csv(csvDir)
    def integrity(df: DataFrame, fmt: String): DataFrame =
      df.agg(
        count(lit(1)).as("n_docs"),
        sum(length(col("text"))).as("sum_len"),
        countDistinct(md5(col("text"))).as("n_distinct"),
        sum(col("n_chars")).as("sum_chars"))
        .select(lit(fmt).as("format"), col("n_docs"), col("sum_len"),
          col("n_distinct"), col("sum_chars"))
    integrity(orcBack, "orc").unionByName(integrity(csvBack, "csv"))
      .orderBy("format")
  }

  // ---------------------------------------------------------------------
  // q111 — content-defined chunking dedup
  // ---------------------------------------------------------------------

  /** Content-defined chunking: split every document at positions where a
    * rolling content hash hits a boundary pattern (here: md5 of the
    * trailing 8-gram starts with nibble '0' → expected chunk ≈ 16 chars),
    * hash each chunk, and measure chunk-level duplication per source.
    *
    * This is the substring-granular dedup used on code/web corpora where
    * document-level MinHash misses shared boilerplate embedded in
    * otherwise-distinct pages: because boundaries depend only on LOCAL
    * content, a shared paragraph chunks identically regardless of its
    * offset in the host document (an insertion upstream shifts fixed-size
    * blocks but not CDC chunks). Per-row array work + one hash-partitioned
    * aggregate over (source, chunk_hash) — no joins, scales linearly; the
    * chunk store at 100 TB is exactly the q100 signature-table shape.
    * Oracle: DuckDB replays the identical boundary rule with list
    * comprehensions over the same md5, so both engines must cut every
    * document at identical offsets. */
  /** Append exploded CDC chunk hashes (col "h") to a frame with a `text`
    * column and a `slen` = length(text) column. */
  private[graft] def withChunkHashes(df: DataFrame): DataFrame =
    // sorted distinct boundary set {0, content cuts, slen}; the i <= slen
    // guard inside filter (with greatest() on the range end) sidesteps
    // sequence()'s auto-reversal when slen < 8
    df.withColumn("bounds", expr(
      """array_sort(array_distinct(concat(
        |  array(0L),
        |  filter(sequence(8L, greatest(slen, 8L)),
        |         i -> i <= slen AND
        |              substring(md5(substring(text, cast(i as int) - 7, 8)), 1, 1) = '0'),
        |  array(slen))))""".stripMargin))
      .withColumn("h", explode(expr(
        """transform(sequence(1, size(bounds) - 1),
          |  j -> md5(substring(text, cast(bounds[j - 1] as int) + 1,
          |                     cast(bounds[j] - bounds[j - 1] as int))))""".stripMargin)))

  private def q111(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("text"),
        length(col("text")).cast("long").as("slen"))
    val chunked = withChunkHashes(base)
    val chunkAgg = chunked.groupBy("source")
      .agg(count(lit(1)).as("n_chunks"), countDistinct(col("h")).as("n_distinct"))
    val docAgg = base.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("slen").as("sum_len"))
    docAgg.join(chunkAgg, Seq("source"))
      .withColumn("dup_ratio",
        round((col("n_chunks") - col("n_distinct")).cast("double") / col("n_chunks"), 6))
      .withColumn("avg_chunk_len",
        round(col("sum_len").cast("double") / col("n_chunks"), 4))
      .select("source", "n_docs", "n_chunks", "n_distinct", "dup_ratio", "avg_chunk_len")
      .orderBy("source")
  }

  // ---------------------------------------------------------------------
  // q112 — robust outlier gate (median / MAD)
  // ---------------------------------------------------------------------

  /** Robust per-group outlier detection: |x − median| > 4.4478 · MAD
    * (3σ-equivalent under normality; 1.4826·MAD estimates σ), the
    * quality-gate form that survives the contaminated distributions a mean
    * ± k·stddev gate is wrecked by — the outliers being hunted inflate the
    * mean-based threshold but not the median-based one.
    *
    * Both quantile passes route through [[Percentiles.exactByRank]], so no
    * group is ever sorted inside one task — the same 100 TB shape q08
    * proved, run twice (median of values, then median of absolute
    * deviations), with the tiny per-group statistics broadcast back. The
    * 4.4478 threshold multiplies once on the oracle side too, keeping the
    * boundary comparison bit-identical. */
  private def q112(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").select(col("event_type"), col("value"))
    val med = Percentiles.exactByRank(ev, "event_type", "value", Seq(0.5))
      .select(col("event_type"), col("value").as("med"))
    val dev = ev.join(broadcast(med), Seq("event_type"))
      .withColumn("ad", abs(col("value") - col("med")))
    val mad = Percentiles.exactByRank(dev, "event_type", "ad", Seq(0.5))
      .select(col("event_type"), col("value").as("mad"))
    dev.join(broadcast(mad), Seq("event_type"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(when(col("ad") > lit(4.4478) * col("mad"), 1L).otherwise(0L)).as("n_outliers"),
        round(max("med"), 6).as("med"),
        round(max("mad"), 6).as("mad"))
      .orderBy("event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q104_bloom_prune" -> (q104 _),
    "q110_storage_roundtrip" -> (q110 _),
    "q111_cdc_chunking" -> (q111 _),
    "q112_robust_outliers" -> (q112 _)
  )

  val oracles: Map[String, String] = Map(
    "q104_bloom_prune" ->
      """SELECT o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q110_storage_roundtrip" ->
      """WITH d AS (SELECT text || chr(10) || '"x,' || lang AS text, n_chars FROM documents),
        |i AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(length(text)) AS BIGINT) AS sum_len,
        |  CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars FROM d)
        |SELECT 'csv' AS format, * FROM i
        |UNION ALL SELECT 'orc', * FROM i
        |ORDER BY format""".stripMargin,
    "q111_cdc_chunking" ->
      """WITH d AS (SELECT doc_id, source, text, length(text) AS slen FROM documents),
        |bo AS (SELECT doc_id, source, text, slen,
        |  list_sort(list_distinct(
        |    [CAST(0 AS BIGINT)] ||
        |    [i for i in range(8, greatest(slen, 7) + 1)
        |       if substr(md5(substr(text, CAST(i AS INT) - 7, 8)), 1, 1) = '0'] ||
        |    [slen])) AS bounds
        |  FROM d),
        |ch AS (SELECT source,
        |  unnest(list_transform(range(2, len(bounds) + 1),
        |    j -> md5(substr(text, CAST(bounds[j - 1] AS INT) + 1,
        |                    CAST(bounds[j] - bounds[j - 1] AS INT))))) AS h
        |  FROM bo),
        |ca AS (SELECT source, CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(count(DISTINCT h) AS BIGINT) AS n_distinct FROM ch GROUP BY source),
        |da AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(slen) AS BIGINT) AS sum_len FROM d GROUP BY source)
        |SELECT da.source, n_docs, n_chunks, n_distinct,
        |  round(CAST(n_chunks - n_distinct AS DOUBLE) / n_chunks, 6) AS dup_ratio,
        |  round(CAST(sum_len AS DOUBLE) / n_chunks, 4) AS avg_chunk_len
        |FROM da JOIN ca ON da.source = ca.source
        |ORDER BY da.source""".stripMargin,
    "q112_robust_outliers" ->
      """WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY event_type),
        |d AS (SELECT e.event_type, abs(value - med) AS ad, med
        |  FROM events e JOIN med USING (event_type)),
        |mad AS (SELECT event_type, quantile_cont(ad, 0.5) AS mad
        |  FROM d GROUP BY event_type)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN ad > 4.4478 * mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  round(max(med), 6) AS med, round(max(mad), 6) AS mad
        |FROM d JOIN mad USING (event_type)
        |GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
