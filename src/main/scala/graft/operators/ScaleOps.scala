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
    // The roundtrip's parallelism must follow cluster width, not source
    // file count: the sf input is ONE parquet file, and multiLine CSV is
    // non-splittable on read — without this repartition both the write
    // and the read-back run single-task (14.5 s of the round-4 bench).
    val sharded = docs.repartition(16)
    sharded.write.mode("overwrite").option("compression", "zlib").orc(orcDir)
    sharded.write.mode("overwrite")
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
    * column and a `slen` = length(text) column.
    *
    * Round 12: compiled UDF instead of the previous
    * `filter(sequence(...)) -> md5(substring(...))` HOF chain — Catalyst
    * HOF lambdas evaluate interpreted PER ELEMENT (the q27-simhash /
    * bandsUdf lesson), and the boundary scan is one md5 per character
    * position, so a 300-char doc paid ~300 interpreted md5(substring)
    * expression trees plus UTF8String/hex allocations each. The UDF runs
    * the IDENTICAL arithmetic (boundary at position i in 8..slen iff
    * md5(chars[i-8..i)) has high nibble 0 — the hex-'0' test computed
    * directly on the digest byte; chunk hash = md5 hex of the chars
    * between consecutive boundaries, over UTF-8 bytes exactly like
    * Catalyst's md5(substring)), so the DuckDB oracle and the
    * shift-invariance spec are unchanged. A/B isolated warm min at
    * sf0.1/32 (UDF + the q111 repartition below together):
    * q111 3.22 -> 0.59 s. */
  private val chunkHashesUdf = udf { (text: String, slen: Long) =>
    val md = java.security.MessageDigest.getInstance("MD5")
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    // char->byte offset map (texts are ASCII in the shipped corpora, but
    // the substring semantics are char-based — map offsets exactly)
    val n = text.length
    val charOff = new Array[Int](n + 1)
    if (bytes.length == n) { // ASCII fast path
      var k = 0
      while (k <= n) { charOff(k) = k; k += 1 }
    } else {
      var ci = 0; var bi = 0
      while (ci < n) {
        charOff(ci) = bi
        val cp = text.codePointAt(ci)
        val cw = Character.charCount(cp)
        bi += text.substring(ci, ci + cw).getBytes(
          java.nio.charset.StandardCharsets.UTF_8).length
        ci += cw
        if (cw == 2) charOff(ci - 1) = bi // low surrogate maps to end
      }
      charOff(n) = bytes.length
    }
    def md5HighNibbleZero(fromChar: Int, untilChar: Int): Boolean = {
      md.reset()
      md.update(bytes, charOff(fromChar), charOff(untilChar) - charOff(fromChar))
      (md.digest()(0) & 0xF0) == 0
    }
    def md5Hex(fromChar: Int, untilChar: Int): String = {
      md.reset()
      md.update(bytes, charOff(fromChar), charOff(untilChar) - charOff(fromChar))
      val d = md.digest()
      val sb = new java.lang.StringBuilder(32)
      var i = 0
      while (i < d.length) {
        sb.append(Character.forDigit((d(i) >> 4) & 0xF, 16))
        sb.append(Character.forDigit(d(i) & 0xF, 16))
        i += 1
      }
      sb.toString
    }
    val L = math.min(slen, n.toLong).toInt // slen == length(text) by contract
    val cuts = scala.collection.mutable.ArrayBuffer(0)
    var i = 8
    while (i <= L) {
      if (md5HighNibbleZero(i - 8, i) && cuts.last != i) cuts += i
      i += 1
    }
    if (cuts.last != L) cuts += L
    val out = new Array[String](cuts.length - 1)
    var j = 1
    while (j < cuts.length) { out(j - 1) = md5Hex(cuts(j - 1), cuts(j)); j += 1 }
    out.toSeq
  }

  private[graft] def withChunkHashes(df: DataFrame): DataFrame =
    df.withColumn("h", explode(chunkHashesUdf(col("text"), col("slen"))))

  private def q111(s: SparkSession, dir: String): DataFrame = {
    // the chunk kernel is one md5 per character position — spread it
    // across every core before the per-row work when the source is
    // narrow (the q50/q110 rule: kernel parallelism follows cluster
    // width, not source file count; pre-split sources skip the exchange)
    val base = graft.Spread.ifNarrow(s, t(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("text"),
        length(col("text")).cast("long").as("slen")))
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

  // ---------------------------------------------------------------------
  // q113 — deterministic weighted sampling (priority rule)
  // ---------------------------------------------------------------------

  /** Deterministic weighted sampling: top-5 docs per source by the
    * priority h/w, where h is a 32-bit uniform drawn from md5(text) and
    * w = n_chars — longer documents proportionally likelier, yet the draw
    * is a pure function of content, so it is identical across retries,
    * executors, and engines (the property `rand()`-based sampling lacks:
    * any task retry or partition change redraws the sample and breaks
    * idempotent re-runs of a curation pipeline). One IEEE double division
    * per row (correctly rounded, so cross-engine exact) and a per-source
    * top-k — the 100 TB shape is hash-partition by source + per-task heaps,
    * never a global sort. */
  private def q113(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source")
      .orderBy(col("pri").asc, col("doc_id").asc)
    t(s, dir, "documents")
      .withColumn("h", expr("cast(conv(substring(md5(text), 1, 8), 16, 10) as bigint)"))
      .withColumn("pri", col("h").cast("double") / col("n_chars"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 5)
      .select(col("source"), col("rk"), col("doc_id"), col("n_chars"),
        round(col("pri"), 4).as("pri"))
      .orderBy("source", "rk")
  }

  // ---------------------------------------------------------------------
  // q114 — funnel analysis over the event stream
  // ---------------------------------------------------------------------

  /** Ordered funnel over the events table: users who viewed, then clicked
    * within 2 h AFTER their first view, then purchased within 24 h AFTER
    * that first click — the sequential-constraint analytics query (not
    * just set intersection: each stage's timestamp must follow the
    * previous stage's, inside a conversion window that makes every stage
    * discriminating — unwindowed, every user of this corpus eventually
    * reaches every stage and the funnel measures nothing).
    *
    * Three min-aggregations chained by broadcast-joined per-user
    * timestamps — each stage is one map-side-combinable groupBy on
    * user_id, no windows, no self-join explosion; at 100 TB everything
    * shuffles once on user_id. All time comparisons run on integer
    * microseconds in BOTH engines (the raw parquet is nanos; comparing
    * truncated µs on one side and raw ns on the other could order two
    * near-simultaneous events differently). */
  private def q114(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_type"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("us").as("t_view"))
    val clickW = 7200L * 1000000L   // 2 h in µs
    val buyW = 86400L * 1000000L    // 24 h in µs
    val clicks = ev.filter(col("event_type") === "click")
      .join(broadcast(views), Seq("user_id"))
      .filter(col("us") > col("t_view") && col("us") <= col("t_view") + lit(clickW))
      .groupBy("user_id").agg(min("us").as("t_click"), min("t_view").as("t_view"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .join(broadcast(clicks), Seq("user_id"))
      .filter(col("us") > col("t_click") && col("us") <= col("t_click") + lit(buyW))
      .groupBy("user_id").agg(min("us").as("t_buy"), min("t_view").as("t_view"))
    ev.agg(countDistinct("user_id").as("n_users"))
      .crossJoin(views.agg(count(lit(1)).as("n_viewed")))
      .crossJoin(clicks.agg(count(lit(1)).as("n_clicked_after_view")))
      .crossJoin(purchases.agg(
        count(lit(1)).as("n_purchased_after_click"),
        // integer µs sum first, ONE division pair at the end: a per-row
        // double division + double-sum avg() is partition-order-dependent
        round(sum(col("t_buy") - col("t_view")).cast("double")
          / count(lit(1)) / lit(1000000.0), 4).as("avg_view_to_buy_secs")))
  }

  // ---------------------------------------------------------------------
  // q115 — schema evolution across ingest batches
  // ---------------------------------------------------------------------

  /** Schema drift across ingest batches: an early batch lands with a
    * 2-column schema, a later batch adds columns; `mergeSchema` reads the
    * union with nulls filling the early batch's missing columns. The
    * integrity aggregate distinguishes genuinely-missing (early batch)
    * from present-but-null — a broken merge that drops or misaligns
    * columns breaks counts and sums the oracle recomputes from the source
    * of truth. This is the data-lake reality every long-lived 100 TB
    * corpus hits: schemas evolve, history does not get rewritten. */
  private def q115(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val root = graft.Scratch.fresh("evo_")
    docs.filter(col("doc_id") % 2 === 0)
      .select("doc_id", "text")
      .write.mode("overwrite").parquet(s"$root/batch=1")
    docs.filter(col("doc_id") % 2 =!= 0)
      .select("doc_id", "text", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$root/batch=2")
    s.read.option("mergeSchema", "true")
      .parquet(s"$root/batch=1", s"$root/batch=2")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(length(col("text"))).as("sum_len"),
        sum(when(col("lang").isNull, 1L).otherwise(0L)).as("n_lang_null"),
        sum(coalesce(col("n_chars"), lit(0L))).as("sum_chars_present"),
        countDistinct(col("lang")).as("n_langs"))
  }

  // ---------------------------------------------------------------------
  // q117 — lexical diversity scoring
  // ---------------------------------------------------------------------

  /** Lexical diversity per source: macro type-token ratio (distinct
    * words / total words) and hapax fraction (words occurring once in
    * their document), the repetitiveness signals orthogonal to q91's
    * Gopher duplicate-fraction cuts — template spam shows high word
    * counts with low TTR and almost no hapaxes.
    *
    * Shape: one shuffle on (doc_id, word) for in-document counts, then
    * per-source integer rollups; every ratio is a SINGLE division of two
    * exact integer sums (micro-averaged per-doc double ratios would be a
    * partition-order-dependent double sum). The per-doc diversity flag
    * (2·distinct > total) is an exact integer comparison, so the
    * discriminating count is bit-identical across engines. */
  private def q117(s: SparkSession, dir: String): DataFrame = {
    val words = t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        explode(array_remove(split(lower(col("text")), "\\s+"), "")).as("word"))
    val perDoc = words.groupBy("doc_id", "source", "word")
      .agg(count(lit(1)).as("c"))
      .groupBy("doc_id", "source")
      .agg(sum("c").as("nw"),
        count(lit(1)).as("ndist"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("hapax"))
    perDoc.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("nw").as("n_words"),
        sum("ndist").as("n_distinct"),
        sum("hapax").as("n_hapax"),
        sum(when(col("ndist") * 2 > col("nw"), 1L).otherwise(0L)).as("n_diverse"))
      .withColumn("macro_ttr",
        round(col("n_distinct").cast("double") / col("n_words"), 6))
      .withColumn("hapax_frac",
        round(col("n_hapax").cast("double") / col("n_words"), 6))
      .orderBy("source")
  }

  // ---------------------------------------------------------------------
  // q118 — snapshot diff (full-outer reconcile)
  // ---------------------------------------------------------------------

  /** Snapshot reconciliation: classify every doc_id across two corpus
    * snapshots as added / removed / changed / unchanged by full-outer
    * join on the key and content-fingerprint comparison — the audit every
    * periodic 100 TB re-crawl runs before promoting a new snapshot (row
    * counts alone can't tell silent content drift from churn).
    *
    * Snapshots are derived deterministically from the corpus (old: id%7≠0;
    * new: id%5≠0 with id%3=0 docs mutated), so both engines construct the
    * identical diff problem. One shuffle on doc_id; fingerprints are md5,
    * compared — never materialized content-side-by-side. */
  private def q118(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val old = docs.filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"), md5(col("text")).as("fp_old"))
    val nw = docs.filter(col("doc_id") % 5 =!= 0)
      .select(col("doc_id"),
        md5(when(col("doc_id") % 3 === 0, concat(col("text"), lit("!")))
          .otherwise(col("text"))).as("fp_new"))
    old.join(nw, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("fp_old").isNull, "added")
          .when(col("fp_new").isNull, "removed")
          .when(col("fp_old") =!= col("fp_new"), "changed")
          .otherwise("unchanged"))
      .groupBy("status")
      .agg(count(lit(1)).as("n"), sum("doc_id").as("id_checksum"))
      .orderBy("status")
  }

  // ---------------------------------------------------------------------
  // q121 — heavy hitters: Misra-Gries sketch + exact verify
  // ---------------------------------------------------------------------

  /** Frequent-items detection with bounded memory: a K=64-counter
    * Misra-Gries summary ([[graft.functions.MisraGries]]) scans the item
    * stream once and yields ≤64 candidates in O(K) memory per partition;
    * only the candidates are exactly recounted, and the threshold test
    * (64·count > N, i.e. frequency > N/64 — integer cross-multiplication,
    * no division) is applied to EXACT counts. The MG guarantee — any item
    * with frequency > N/(K+1) survives the sketch — makes the candidate
    * set sufficient for this threshold, so the result equals the plain
    * exact SQL the oracle runs, even though the sketch evicts constantly.
    * At 100 TB this is the difference between a full-domain groupBy
    * shuffle (items ≫ memory) and one scan + a recount of 64 keys.
    *
    * The item stream is a deterministic skew fixture over events (7 hot
    * items carry ~2/3 of the stream; 4096 cold items force evictions):
    * the corpus's natural word distribution is uniform, so without the
    * fixture the query would exercise neither eviction nor the threshold. */
  private def q121(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.udaf
    val items = t(s, dir, "events").select(expr(
      """CASE WHEN event_id % 3 != 0 THEN concat('hot_', event_id % 7)
        |     ELSE concat('cold_', event_id % 4096) END""".stripMargin).as("item"))
    val mg = udaf(new graft.functions.MisraGries(64),
      org.apache.spark.sql.Encoders.STRING)
    val cand = items.agg(mg(col("item")).as("sk"))
      .selectExpr("map_keys(sk.m) AS ks").head()
      .getAs[scala.collection.Seq[String]]("ks").toSeq
    val total = items.count()
    items.filter(col("item").isin(cand: _*))
      .groupBy("item").agg(count(lit(1)).as("n"))
      .filter(col("n") * 64 > total)
      .orderBy(col("n").desc, col("item"))
  }

  // ---------------------------------------------------------------------
  // q131 — inverted index build + conjunctive query answering
  // ---------------------------------------------------------------------

  /** Search-index surface: build word → sorted-posting-list postings from
    * the corpus, MATERIALIZE them to parquet (the stored index a corpus
    * search service actually serves from), read the index back, and answer
    * a two-term conjunctive query by posting intersection — never touching
    * document content at query time.
    *
    * Scale shape: the postings build is one (doc, word)-distinct shuffle,
    * a per-word df pass, then a groupBy(word, shard) with sort_array inside
    * the aggregate (no window) — posting rows are DF-CAPPED IN CODE: a word
    * with df > `invIdxShardCap` splits into nested power-of-2 residue
    * shards (shard = doc_id & (nshards-1)), so no aggregation buffer ever
    * holds more than ~cap doc ids and a stop-word's posting row can never
    * OOM one task at 100 TB. Query answering joins the two words' shard
    * rows via masking by the smaller shard count (nested residue classes
    * align exactly), intersects per shard pair, and unions — index-backed,
    * corpus-independent. The oracle computes the same answer straight from
    * `documents`, so a corrupt store, a truncated list, a bad shard
    * assignment, or a bad intersection all break the hash. */
  /** Per-shard posting cap: q131 uses a cap small enough that the shipped
    * corpus genuinely shards (df("table") ≫ cap), so the production path
    * is what the oracle gates; ShardedIndexSpec drives deeper cascades. */
  private[graft] val invIdxShardCap = 128L

  /** Sharded inverted-index build over (doc_id, text) rows: emits one row
    * per (word, shard) with columns (word, df, nshards, shard, postings).
    * nshards is the power of 2 ≥ df/cap (1 for sub-cap words); the shard
    * of a doc is doc_id & (nshards-1). Nesting property: for any two
    * words, masking the bigger word's shard id by the smaller word's count
    * gives the matching shard — shard-aligned intersection needs exactly
    * max(n1, n2) pair joins, never a cross product. */
  private[graft] def buildInvertedIndex(docs: DataFrame, cap: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    val pairs = docs.select(col("doc_id"),
      explode(array_distinct(array_remove(split(lower(col("text")), "\\s+"), ""))).as("word"))
    // smallest power of 2 with df/nshards <= cap: bit length of need-1 via
    // floor(log2) on need-1+0.5 (the +0.5 sits strictly between integers,
    // so float log2 can never round across a power-of-2 boundary)
    val dfs = pairs.groupBy("word").agg(count(lit(1)).as("df"))
      .withColumn("need", ceil(col("df").cast("double") / lit(cap.toDouble)).cast("long"))
      .withColumn("bl", when(col("need") <= 1L, lit(0)).otherwise(
        floor(log(2.0, (col("need") - 1).cast("double") + 0.5)).cast("int") + 1))
      .withColumn("nshards", expr("shiftleft(CAST(1 AS BIGINT), bl)"))
      .drop("need", "bl")
    pairs.join(dfs, Seq("word"))
      .withColumn("shard", col("doc_id").bitwiseAND(col("nshards") - 1))
      .groupBy("word", "df", "nshards", "shard")
      .agg(sort_array(collect_list(col("doc_id"))).as("postings"))
  }

  /** Shard-aligned conjunctive intersection of two words from a sharded
    * index frame: join on the masked residue, intersect per pair, union.
    * The two shard counts are resolved FIRST from the index metadata (a
    * bounded two-value read, the percentile-cuts pattern) so the mask is a
    * literal and the shard join is a genuine equi-join on the masked
    * residue — a mask depending on both sides in the join condition would
    * compile to a nested-loop join, quadratic in shard count for two
    * stop words at production cap sizes. */
  private[graft] def intersectPostings(idx: DataFrame, w1: String, w2: String,
      label: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val ns = idx.filter(col("word").isin(w1, w2))
      .groupBy("word").agg(first("nshards").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val mask = lit(math.min(ns.getOrElse(w1, 1L), ns.getOrElse(w2, 1L)) - 1L)
    val t1 = idx.filter(col("word") === w1)
      .select(col("shard").as("s1"), col("nshards").as("n1"),
        col("postings").as("p1"), col("df").as("df1"))
    val t2 = idx.filter(col("word") === w2)
      .select(col("shard").as("s2"), col("nshards").as("n2"),
        col("postings").as("p2"), col("df").as("df2"))
    t1.join(t2, col("s1").bitwiseAND(mask) === col("s2").bitwiseAND(mask))
      .select(col("df1"), col("df2"),
        array_intersect(col("p1"), col("p2")).as("hits"))
      .groupBy(lit(label).as("query"))
      .agg(max("df1").as("df1"), max("df2").as("df2"),
        sum(size(col("hits"))).cast("long").as("n_hits"),
        sum(aggregate(col("hits"), lit(0L), (acc, x) => acc + x)).as("hits_checksum"))
  }

  private def q131(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val store = graft.Scratch.fresh("invidx_")
    buildInvertedIndex(t(s, dir, "documents").select("doc_id", "text"), invIdxShardCap)
      .write.mode("overwrite").parquet(store)
    intersectPostings(s.read.parquet(store), "table", "window", "table AND window")
      .select(col("query"), col("df1").as("df_table"), col("df2").as("df_window"),
        col("n_hits"), col("hits_checksum"))
  }

  // ---------------------------------------------------------------------
  // q251 — postings delta+varint compression accounting
  // ---------------------------------------------------------------------

  /** Index-size planning table for the q131 store: the byte cost of the
    * postings under the standard delta-gap + LEB128 varint encoding
    * every search/dedup index ships with, vs raw fixed-width 8-byte
    * postings — rolled up per power-of-2 df band, the granularity an
    * index operator budgets by (rare terms dominate term COUNT, stop
    * words dominate BYTES; the band table shows both).
    *
    * Exactness: varint length is the full 9-level integer CASE over the
    * 128^k thresholds (good to 2^63); gaps come from a lag window
    * PARTITIONED BY WORD (keys = vocabulary — never a global window),
    * with the first posting encoding doc_id + 1 so every encoded value
    * is ≥ 1; the df band uses the log2(x + 0.5) trick the q131 shard
    * planner already relies on (the half-offset sits strictly between
    * integers, so float log2 can never round across a power-of-2
    * boundary). Ratio is half-up ppm over non-negative integers. */
  private def q251(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = t(s, dir, "documents").select(col("doc_id"),
      explode(array_distinct(array_remove(split(lower(col("text")), "\\s+"), ""))).as("word"))
    val w = Window.partitionBy("word").orderBy("doc_id")
    val vlen = "CASE WHEN g < 128 THEN 1 WHEN g < 16384 THEN 2" +
      " WHEN g < 2097152 THEN 3 WHEN g < 268435456 THEN 4" +
      " WHEN g < 34359738368 THEN 5 WHEN g < 4398046511104 THEN 6" +
      " WHEN g < 562949953421312 THEN 7 WHEN g < 72057594037927936 THEN 8" +
      " ELSE 9 END"
    val perTerm = pairs
      .withColumn("g", coalesce(col("doc_id") - lag("doc_id", 1).over(w),
        col("doc_id") + 1L))
      .withColumn("vb", expr(s"CAST($vlen AS BIGINT)"))
      .groupBy("word")
      .agg(count(lit(1)).as("df"), sum("vb").as("vbytes"))
    perTerm
      // explicit floor on BOTH sides: Spark's double->BIGINT cast
      // truncates but DuckDB's ROUNDS — the cast alone is not portable
      .withColumn("band", expr("CAST(floor(log2(df + 0.5D)) AS BIGINT)"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_terms"),
        sum("df").as("n_postings"),
        (sum("df") * 8L).as("raw_bytes"),
        sum("vbytes").as("varint_bytes"))
      .withColumn("ratio_ppm", expr(
        "CAST((2 * varint_bytes * 1000000 + raw_bytes) DIV (2 * raw_bytes) AS BIGINT)"))
      .orderBy("band")
  }

  // ---------------------------------------------------------------------
  // q132 — SCD type-2 history collapse
  // ---------------------------------------------------------------------

  /** Slowly-changing-dimension type-2 build: collapse each user's event
    * stream into versioned attribute history — a new version exactly when
    * event_type differs from the previous event (lag over the per-user
    * stream, ordered by event_id: the ingestion sequence, identical in
    * both engines where the nanos-vs-micros timestamp is not). Emits the
    * per-user version count and the first/last attribute values — the
    * dimension-table maintenance every warehouse load runs.
    *
    * Scale shape: one window over user_id partitions (bounded by per-user
    * history length), one integer aggregation. */
  private def q132(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("event_id")
    t(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"))
      .withColumn("prev", lag("event_type", 1).over(w))
      .withColumn("is_new_version",
        when(col("prev").isNull || col("prev") =!= col("event_type"), 1L).otherwise(0L))
      .groupBy("user_id")
      .agg(sum("is_new_version").as("n_versions"),
        count(lit(1)).as("n_events"),
        min_by(col("event_type"), col("event_id")).as("first_type"),
        max_by(col("event_type"), col("event_id")).as("last_type"))
      .orderBy("user_id")
  }

  // ---------------------------------------------------------------------
  // q133 — cohort retention matrix
  // ---------------------------------------------------------------------

  /** Weekly cohort retention: users grouped by first-seen ISO week, the
    * matrix counting distinct users from each cohort active k weeks later
    * — the engagement analysis every event pipeline serves. Weeks are
    * date_trunc('week') in both engines (ISO Monday); the cohort label is
    * emitted as a yyyy-MM-dd STRING so timestamp-precision differences
    * cannot leak into the hash; offsets are exact integer day-diffs / 7.
    *
    * Scale shape: first-seen is a min-aggregate per user (map-side
    * combinable), the matrix a distinct-count on (cohort, offset) — no
    * windows, no self-joins. */
  private def q133(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val ev = t(s, dir, "events")
      .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("wk"))
    val cohort = ev.groupBy("user_id").agg(min("wk").as("cw"))
    ev.join(cohort, "user_id")
      .groupBy(col("cw"), (datediff(col("wk"), col("cw")) / 7).cast("long").as("week_offset"))
      .agg(countDistinct("user_id").as("n_users"))
      .select(date_format(col("cw"), "yyyy-MM-dd").as("cohort_week"),
        col("week_offset"), col("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  // ---------------------------------------------------------------------
  // q134 — incremental materialized-view refresh
  // ---------------------------------------------------------------------

  /** Incremental view maintenance: a stored per-customer order aggregate
    * (the materialized view, built from the base 90% of orders and
    * persisted to parquet) merged with a delta batch's partial aggregate —
    * the output is the REFRESHED view, and the oracle recomputes it from
    * scratch over all orders, so any merge bug (lost deltas, double
    * counts, missed new-customer rows) is a hash mismatch. This is the
    * correctness contract of every incremental ETL: merge(base, delta) ≡
    * full recompute.
    *
    * Scale shape: the delta aggregation touches only the delta; the merge
    * is a groupBy-sum over (|view| + |delta-agg|) rows keyed on the view
    * key — never re-reads the base fact table. Money sums in exact integer
    * cents. */
  private def q134(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val store = graft.Scratch.fresh("mv_")
    val orders = t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
    def agg(df: DataFrame) = df.groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"), sum("cents").as("sum_cents"))
    agg(orders.filter(col("o_orderkey") % 10 =!= 0))
      .write.mode("overwrite").parquet(store) // the stored MV
    val delta = agg(orders.filter(col("o_orderkey") % 10 === 0))
    s.read.parquet(store).union(delta)
      .groupBy("o_custkey")
      .agg(sum("n_orders").as("n_orders"), sum("sum_cents").as("sum_cents"))
      .orderBy("o_custkey")
  }

  // ---------------------------------------------------------------------
  // q135 — mergeable distinct-count state (HLL sketch store)
  // ---------------------------------------------------------------------

  /** Persisted, mergeable cardinality state: per-(type, ingest-batch) HLL
    * sketches (Spark's DataSketches `hll_sketch_agg`) written to parquet —
    * the distinct-count analog of q134's materialized view — then read
    * back and `hll_union_agg`-merged across batches, with the estimate
    * checked against the exact distinct count in-query. This is how a
    * 100 TB pipeline answers "distinct users ever" without re-scanning
    * history: each batch contributes a ~KB sketch, merge is associative,
    * and the raw stream is never re-read.
    *
    * The estimate value is implementation-defined (DataSketches), so the
    * output exposes the exact count plus the ±5 % acceptance boolean
    * (lgK=12's error is ~1 %); the oracle emits the exact count and
    * literal TRUE — an estimator regression is a hash mismatch, and
    * nothing impl-specific leaks into the hash. */
  private def q135(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val store = graft.Scratch.fresh("hll_")
    val ev = t(s, dir, "events")
      .select(col("event_type"), col("user_id"), (col("event_id") % 4).as("batch"))
    ev.groupBy("event_type", "batch")
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
      .write.mode("overwrite").parquet(store)
    val merged = s.read.parquet(store)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_batches"),
        expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
    val exact = ev.groupBy("event_type").agg(countDistinct("user_id").as("n_exact"))
    merged.join(exact, "event_type")
      .select(col("event_type"), col("n_batches"), col("n_exact"),
        (abs(col("est") - col("n_exact")) <= col("n_exact") * 0.05).as("est_ok"))
      .orderBy("event_type")
  }

  // ---------------------------------------------------------------------
  // q136 — equi-depth binning (distributed exact percentiles as cuts)
  // ---------------------------------------------------------------------

  /** Equi-depth (equal-frequency) binning of a skewed numeric column: the
    * 7 octile boundaries come from `Percentiles.exactByRank` (the
    * distributed rank-selection — no global sort window at any scale),
    * rows are assigned by comparison against the boundary literals, and
    * each bin reports its exact count and value range — the feature
    * binning / histogram-equalization primitive.
    *
    * Boundaries are rounded to cents BEFORE comparison in both engines:
    * interpolated quantiles of duplicate-heavy 2-decimal data frequently
    * land exactly ON a data value, where a last-ulp difference in
    * interpolation arithmetic would flip every tied row's bin; rounding
    * to the data's own granularity makes the cuts engine-identical. */
  private def q136(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val li = t(s, dir, "lineitem")
      .select(col("l_extendedprice").as("price"), lit("all").as("g"))
    // collapse=false: l_extendedprice is 97% unique (the q45 rule) — the
    // duplicate-collapse pre-shuffle is a full extra exchange that shrinks
    // nothing. Value-identical either way (PercentilesSpec).
    val cuts = Percentiles.exactByRank(li, "g", "price", (1 to 7).map(_ / 8.0),
      collapse = false)
      .select(round(col("value"), 2).as("b"), col("p"))
      .orderBy("p").collect().map(_.getAs[Double]("b"))
    val bin = cuts.foldLeft(lit(0L))((acc, b) =>
      acc + when(col("price") > b, 1L).otherwise(0L))
    li.withColumn("bin", bin)
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        round(min("price"), 2).as("lo"),
        round(max("price"), 2).as("hi"))
      .orderBy("bin")
  }

  // ---------------------------------------------------------------------
  // q137 — per-group linear regression (sufficient statistics)
  // ---------------------------------------------------------------------

  /** Per-event-type OLS fit of value against event_id, computed from the
    * five sufficient statistics (n, Σx, Σx², Σy, Σxy) in ONE map-side-
    * combinable aggregation — the scalable form of regression: no matrix
    * library, no second pass, merge = plain addition (the same shape a
    * 1000-executor fit uses). x is the integer event_id so Σx/Σx² are
    * EXACT (int64); only the y-moments are floating, and both engines
    * evaluate the identical closed-form slope/intercept/R² expressions,
    * emitted rounded. */
  private def q137(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    t(s, dir, "events")
      .select(col("event_type"), col("event_id").as("x"), col("value").as("y"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum("x").as("sx"), sum(col("x") * col("x")).as("sxx"),
        sum("y").as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("y") * col("y")).as("syy"))
      .withColumn("den_x", (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
      .withColumn("num", col("n") * col("sxy") - col("sx") * col("sy"))
      .withColumn("slope", col("num") / col("den_x"))
      .select(col("event_type"), col("n"),
        round(col("slope"), 10).as("slope"),
        round((col("sy") - col("slope") * col("sx")) / col("n"), 6).as("intercept"),
        round(col("num") * col("num") /
          (col("den_x") * (col("n") * col("syy") - col("sy") * col("sy"))), 8).as("r2"))
      .orderBy("event_type")
  }

  // ---------------------------------------------------------------------
  // q140 — time-spine gap filling
  // ---------------------------------------------------------------------

  /** Dense hourly series: generate the full hour spine between the
    * corpus's min and max hour, cross it with the event-type dimension,
    * and left-join the observed hourly counts with zero-fill — the gap
    * filling every time-series consumer (forecasting, anomaly baselines,
    * the q129 gate) needs before it can trust "no data" to mean zero
    * rather than missing.
    *
    * Scale shape: the spine is |hours| × |types| rows — calendar-sized,
    * not corpus-sized — built with `sequence()` from two scalar
    * aggregates; the observed-counts side is the usual map-side-combined
    * rollup, joined on (hour, type). */
  private def q140(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val hourly = t(s, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val spine = t(s, dir, "events")
      .agg(date_trunc("hour", min("ts")).as("lo"), date_trunc("hour", max("ts")).as("hi"))
      .select(explode(expr("sequence(lo, hi, interval 1 hour)")).as("hour"))
      .crossJoin(t(s, dir, "events").select("event_type").distinct())
    spine.join(hourly, Seq("hour", "event_type"), "left")
      .select(col("hour"), col("event_type"),
        coalesce(col("n"), lit(0L)).as("n"),
        col("n").isNull.as("was_gap"))
      .orderBy("event_type", "hour")
  }

  // ---------------------------------------------------------------------
  // q141 — data-quality assertion report
  // ---------------------------------------------------------------------

  /** Declarative data-quality report — the dbt-test / expectations
    * analog: key uniqueness, referential integrity (FK orphans via anti
    * join), null-fraction, and domain checks, one row per assertion with
    * checked/violation counts and a pass flag. Every check is an
    * aggregate or an anti join (broadcast when the parent side is a
    * dimension); the report is the gate a 100 TB load runs before
    * promoting a batch.
    *
    * All counts are exact integers, so the whole report — including the
    * booleans — hash-checks. */
  private def q141(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val orders = t(s, dir, "orders")
    val customer = t(s, dir, "customer")
    val lineitem = t(s, dir, "lineitem")
    val docs = t(s, dir, "documents")
    def report(name: String, checked: Long, violations: Long) = {
      import s.implicits._
      Seq((name, checked, violations, violations == 0L))
        .toDF("check_name", "n_checked", "n_violations", "pass")
    }
    val cCnt = customer.count()
    val cDist = customer.select("c_custkey").distinct().count()
    val oCnt = orders.count()
    val oOrphans = orders.join(customer,
      orders("o_custkey") === customer("c_custkey"), "left_anti").count()
    val lCnt = lineitem.count()
    val lOrphans = lineitem.join(orders,
      lineitem("l_orderkey") === orders("o_orderkey"), "left_anti").count()
    val dCnt = docs.count()
    val dNull = docs.filter(col("text").isNull || col("text") === "").count()
    val lNeg = lineitem.filter(col("l_quantity") <= 0).count()
    report("customer.c_custkey.unique", cCnt, cCnt - cDist)
      .union(report("orders.o_custkey.fk_customer", oCnt, oOrphans))
      .union(report("lineitem.l_orderkey.fk_orders", lCnt, lOrphans))
      .union(report("documents.text.nonempty", dCnt, dNull))
      .union(report("lineitem.l_quantity.positive", lCnt, lNeg))
      .orderBy("check_name")
  }

  // ---------------------------------------------------------------------
  // q142 — time-range rolling window (peak hourly rate per user)
  // ---------------------------------------------------------------------

  /** Sliding one-hour event rate per user via a RANGE window frame over
    * integer epoch-seconds (3599 PRECEDING .. CURRENT ROW), reporting
    * each user's peak — the rate-limiting / burst-detection primitive
    * that a ROWS frame cannot express (rows ≠ time).
    *
    * Ordering is on whole epoch SECONDS: flooring nanos or micros to
    * seconds yields the identical integer, and RANGE frames treat tied
    * ordering values as peers in both engines, so no tiebreak column is
    * needed. Partitions are per-user — bounded — never corpus-wide. */
  private def q142(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("es").rangeBetween(-3599L, 0L)
    t(s, dir, "events")
      .select(col("user_id"), unix_timestamp(col("ts")).as("es"))
      .withColumn("rolling_n", count(lit(1)).over(w))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), max("rolling_n").as("peak_hourly"))
      .orderBy("user_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q140_time_spine" -> (q140 _),
    "q141_dq_report" -> (q141 _),
    "q142_rolling_peak" -> (q142 _),
    "q135_hll_merge" -> (q135 _),
    "q136_equidepth_bins" -> (q136 _),
    "q137_group_regression" -> (q137 _),
    "q131_inverted_index" -> (q131 _),
    "q251_postings_varint" -> (q251 _),
    "q132_scd2_history" -> (q132 _),
    "q133_cohort_retention" -> (q133 _),
    "q134_mv_refresh" -> (q134 _),
    "q121_heavy_hitters" -> (q121 _),
    "q117_lexical_diversity" -> (q117 _),
    "q118_snapshot_diff" -> (q118 _),
    "q113_weighted_sample" -> (q113 _),
    "q114_funnel" -> (q114 _),
    "q115_schema_evolution" -> (q115 _),
    "q104_bloom_prune" -> (q104 _),
    "q110_storage_roundtrip" -> (q110 _),
    "q111_cdc_chunking" -> (q111 _),
    "q112_robust_outliers" -> (q112 _)
  )

  val oracles: Map[String, String] = Map(
    "q140_time_spine" ->
      """WITH h AS (SELECT date_trunc('hour', ts) AS hour, event_type, CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |bounds AS (SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi FROM events),
        |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM bounds),
        |grid AS (SELECT hour, event_type FROM spine CROSS JOIN (SELECT DISTINCT event_type FROM events))
        |SELECT g.hour, g.event_type, coalesce(n, 0) AS n, n IS NULL AS was_gap
        |FROM grid g LEFT JOIN h ON g.hour = h.hour AND g.event_type = h.event_type
        |ORDER BY g.event_type, g.hour""".stripMargin,
    "q141_dq_report" ->
      """WITH checks AS (
        |  SELECT 'customer.c_custkey.unique' AS check_name,
        |    CAST(count(*) AS BIGINT) AS n_checked,
        |    CAST(count(*) - count(DISTINCT c_custkey) AS BIGINT) AS n_violations
        |  FROM customer
        |  UNION ALL
        |  SELECT 'orders.o_custkey.fk_customer', CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |  UNION ALL
        |  SELECT 'lineitem.l_orderkey.fk_orders', CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN ord.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM lineitem l LEFT JOIN orders ord ON l.l_orderkey = ord.o_orderkey
        |  UNION ALL
        |  SELECT 'documents.text.nonempty', CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN text IS NULL OR text = '' THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM documents
        |  UNION ALL
        |  SELECT 'lineitem.l_quantity.positive', CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM lineitem)
        |SELECT check_name, n_checked, n_violations, n_violations = 0 AS pass
        |FROM checks ORDER BY check_name""".stripMargin,
    "q142_rolling_peak" ->
      """WITH e AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events),
        |r AS (SELECT user_id, CAST(count(*) OVER (PARTITION BY user_id ORDER BY es
        |    RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW) AS BIGINT) AS rolling_n
        |  FROM e)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(max(rolling_n) AS BIGINT) AS peak_hourly
        |FROM r GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q135_hll_merge" ->
      """SELECT event_type, CAST(4 AS BIGINT) AS n_batches,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
        |  TRUE AS est_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q136_equidepth_bins" ->
      """WITH b AS (SELECT round(quantile_cont(l_extendedprice, 0.125), 2) AS b1,
        |  round(quantile_cont(l_extendedprice, 0.25), 2) AS b2,
        |  round(quantile_cont(l_extendedprice, 0.375), 2) AS b3,
        |  round(quantile_cont(l_extendedprice, 0.5), 2) AS b4,
        |  round(quantile_cont(l_extendedprice, 0.625), 2) AS b5,
        |  round(quantile_cont(l_extendedprice, 0.75), 2) AS b6,
        |  round(quantile_cont(l_extendedprice, 0.875), 2) AS b7
        |  FROM lineitem)
        |SELECT bin, CAST(count(*) AS BIGINT) AS n,
        |  round(min(price), 2) AS lo, round(max(price), 2) AS hi
        |FROM (SELECT l_extendedprice AS price,
        |    CAST((CASE WHEN l_extendedprice > b1 THEN 1 ELSE 0 END)
        |       + (CASE WHEN l_extendedprice > b2 THEN 1 ELSE 0 END)
        |       + (CASE WHEN l_extendedprice > b3 THEN 1 ELSE 0 END)
        |       + (CASE WHEN l_extendedprice > b4 THEN 1 ELSE 0 END)
        |       + (CASE WHEN l_extendedprice > b5 THEN 1 ELSE 0 END)
        |       + (CASE WHEN l_extendedprice > b6 THEN 1 ELSE 0 END)
        |       + (CASE WHEN l_extendedprice > b7 THEN 1 ELSE 0 END) AS BIGINT) AS bin
        |  FROM lineitem, b)
        |GROUP BY bin ORDER BY bin""".stripMargin,
    "q137_group_regression" ->
      """WITH s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(event_id) AS BIGINT) AS sx,
        |    CAST(sum(event_id * event_id) AS BIGINT) AS sxx,
        |    sum(value) AS sy, sum(event_id * value) AS sxy, sum(value * value) AS syy
        |  FROM events GROUP BY event_type)
        |SELECT event_type, n,
        |  round((n * sxy - sx * sy) / CAST(n * sxx - sx * sx AS DOUBLE), 10) AS slope,
        |  round((sy - ((n * sxy - sx * sy) / CAST(n * sxx - sx * sx AS DOUBLE)) * sx) / n, 6) AS intercept,
        |  round((n * sxy - sx * sy) * (n * sxy - sx * sy)
        |    / (CAST(n * sxx - sx * sx AS DOUBLE) * (n * syy - sy * sy)), 8) AS r2
        |FROM s ORDER BY event_type""".stripMargin,
    // same distinct (doc, word) pairs, lag-gap per word (first posting
    // encodes doc_id + 1), identical 128^k CASE chain and log2(x+0.5)
    // banding; half-up ppm ratio (DIV == // on non-negative numerators)
    "q251_postings_varint" ->
      """WITH p AS (SELECT DISTINCT doc_id,
        |    unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t <> '')) AS word
        |  FROM documents),
        |g AS (SELECT word, coalesce(doc_id - lag(doc_id) OVER
        |    (PARTITION BY word ORDER BY doc_id), doc_id + 1) AS g FROM p),
        |v AS (SELECT word,
        |    CASE WHEN g < 128 THEN 1 WHEN g < 16384 THEN 2
        |         WHEN g < 2097152 THEN 3 WHEN g < 268435456 THEN 4
        |         WHEN g < 34359738368 THEN 5 WHEN g < 4398046511104 THEN 6
        |         WHEN g < 562949953421312 THEN 7 WHEN g < 72057594037927936 THEN 8
        |         ELSE 9 END AS vb
        |  FROM g),
        |t AS (SELECT word, CAST(count(*) AS BIGINT) AS df,
        |    CAST(sum(vb) AS BIGINT) AS vbytes FROM v GROUP BY 1),
        |b AS (SELECT CAST(floor(log2(df + 0.5)) AS BIGINT) AS band, df, vbytes FROM t)
        |SELECT band, CAST(count(*) AS BIGINT) AS n_terms,
        |  CAST(sum(df) AS BIGINT) AS n_postings,
        |  CAST(sum(df) * 8 AS BIGINT) AS raw_bytes,
        |  CAST(sum(vbytes) AS BIGINT) AS varint_bytes,
        |  CAST((2 * sum(vbytes) * 1000000 + sum(df) * 8) // (2 * sum(df) * 8) AS BIGINT) AS ratio_ppm
        |FROM b GROUP BY band ORDER BY band""".stripMargin,
    "q131_inverted_index" ->
      """WITH tok AS (SELECT doc_id,
        |    unnest(list_distinct(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> ''))) AS word
        |  FROM documents),
        |dfs AS (SELECT word, CAST(count(*) AS BIGINT) AS df FROM tok GROUP BY word),
        |hits AS (SELECT a.doc_id FROM (SELECT doc_id FROM tok WHERE word = 'table') a
        |  JOIN (SELECT doc_id FROM tok WHERE word = 'window') b USING (doc_id))
        |SELECT 'table AND window' AS query,
        |  (SELECT df FROM dfs WHERE word = 'table') AS df_table,
        |  (SELECT df FROM dfs WHERE word = 'window') AS df_window,
        |  CAST(count(*) AS BIGINT) AS n_hits,
        |  CAST(coalesce(sum(doc_id), 0) AS BIGINT) AS hits_checksum
        |FROM hits""".stripMargin,
    "q132_scd2_history" ->
      """WITH t AS (SELECT user_id, event_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS prev
        |  FROM events)
        |SELECT user_id,
        |  CAST(sum(CASE WHEN prev IS NULL OR prev <> event_type THEN 1 ELSE 0 END) AS BIGINT) AS n_versions,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  min_by(event_type, event_id) AS first_type,
        |  max_by(event_type, event_id) AS last_type
        |FROM t GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q133_cohort_retention" ->
      """WITH ev AS (SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk FROM events),
        |c AS (SELECT user_id, min(wk) AS cw FROM ev GROUP BY user_id)
        |SELECT strftime(cw, '%Y-%m-%d') AS cohort_week,
        |  CAST(date_diff('day', cw, wk) // 7 AS BIGINT) AS week_offset,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM ev JOIN c USING (user_id)
        |GROUP BY cw, week_offset ORDER BY cohort_week, week_offset""".stripMargin,
    "q134_mv_refresh" ->
      """SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "q121_heavy_hitters" ->
      """WITH it AS (SELECT CASE WHEN event_id % 3 <> 0 THEN 'hot_' || (event_id % 7)
        |                        ELSE 'cold_' || (event_id % 4096) END AS item
        |  FROM events),
        |tot AS (SELECT count(*) AS n_total FROM it)
        |SELECT item, CAST(count(*) AS BIGINT) AS n
        |FROM it, tot GROUP BY item, n_total
        |HAVING count(*) * 64 > n_total
        |ORDER BY n DESC, item""".stripMargin,
    "q117_lexical_diversity" ->
      """WITH w AS (SELECT doc_id, source, unnest(regexp_split_to_array(lower(text), '\s+')) AS word
        |  FROM documents),
        |wc AS (SELECT doc_id, source, word, CAST(count(*) AS BIGINT) AS c
        |  FROM w WHERE word <> '' GROUP BY doc_id, source, word),
        |pd AS (SELECT doc_id, source, CAST(sum(c) AS BIGINT) AS nw,
        |  CAST(count(*) AS BIGINT) AS ndist,
        |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax
        |  FROM wc GROUP BY doc_id, source)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(nw) AS BIGINT) AS n_words,
        |  CAST(sum(ndist) AS BIGINT) AS n_distinct,
        |  CAST(sum(hapax) AS BIGINT) AS n_hapax,
        |  CAST(sum(CASE WHEN ndist * 2 > nw THEN 1 ELSE 0 END) AS BIGINT) AS n_diverse,
        |  round(CAST(CAST(sum(ndist) AS BIGINT) AS DOUBLE) / CAST(sum(nw) AS BIGINT), 6) AS macro_ttr,
        |  round(CAST(CAST(sum(hapax) AS BIGINT) AS DOUBLE) / CAST(sum(nw) AS BIGINT), 6) AS hapax_frac
        |FROM pd GROUP BY source ORDER BY source""".stripMargin,
    "q118_snapshot_diff" ->
      """WITH o AS (SELECT doc_id, md5(text) AS fp_old FROM documents WHERE doc_id % 7 <> 0),
        |n AS (SELECT doc_id,
        |  md5(CASE WHEN doc_id % 3 = 0 THEN text || '!' ELSE text END) AS fp_new
        |  FROM documents WHERE doc_id % 5 <> 0),
        |j AS (SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN fp_old IS NULL THEN 'added'
        |       WHEN fp_new IS NULL THEN 'removed'
        |       WHEN fp_old <> fp_new THEN 'changed'
        |       ELSE 'unchanged' END AS status
        |  FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
        |SELECT status, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(doc_id) AS BIGINT) AS id_checksum
        |FROM j GROUP BY status ORDER BY status""".stripMargin,
    "q113_weighted_sample" ->
      """WITH p AS (SELECT source, doc_id, n_chars,
        |  CAST(CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) AS DOUBLE) / n_chars AS pri
        |  FROM documents),
        |r AS (SELECT source, doc_id, n_chars, pri,
        |  CAST(row_number() OVER (PARTITION BY source ORDER BY pri ASC, doc_id ASC) AS BIGINT) AS rk
        |  FROM p)
        |SELECT source, rk, doc_id, n_chars, round(pri, 4) AS pri
        |FROM r WHERE rk <= 5 ORDER BY source, rk""".stripMargin,
    "q114_funnel" ->
      """WITH ev AS (SELECT user_id, epoch_ns(ts) // 1000 AS us, event_type FROM events),
        |v AS (SELECT user_id, min(us) AS t_view FROM ev WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT ev.user_id, min(us) AS t_click, min(t_view) AS t_view
        |  FROM ev JOIN v USING (user_id)
        |  WHERE event_type = 'click' AND us > t_view
        |    AND us <= t_view + 7200000000 GROUP BY ev.user_id),
        |p AS (SELECT ev.user_id, min(us) AS t_buy, min(t_view) AS t_view
        |  FROM ev JOIN c USING (user_id)
        |  WHERE event_type = 'purchase' AND us > t_click
        |    AND us <= t_click + 86400000000 GROUP BY ev.user_id)
        |SELECT (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM ev) AS n_users,
        |  (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_viewed,
        |  (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_clicked_after_view,
        |  (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_purchased_after_click,
        |  (SELECT round(CAST(CAST(sum(t_buy - t_view) AS BIGINT) AS DOUBLE)
        |     / count(*) / 1000000.0, 4) FROM p) AS avg_view_to_buy_secs""".stripMargin,
    "q115_schema_evolution" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(length(text)) AS BIGINT) AS sum_len,
        |  CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_lang_null,
        |  CAST(sum(CASE WHEN doc_id % 2 <> 0 THEN n_chars ELSE 0 END) AS BIGINT) AS sum_chars_present,
        |  CAST(count(DISTINCT CASE WHEN doc_id % 2 <> 0 THEN lang END) AS BIGINT) AS n_langs
        |FROM documents""".stripMargin,
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
