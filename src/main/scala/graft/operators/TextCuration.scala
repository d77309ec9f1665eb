package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Curation tier of the text pipeline (lang-id, quality scores and
  * Gopher gates, PII, domain mix, packing, decontamination, URL
  * canonicalization, NFC normalization, WordPiece tokenization,
  * blocklist scan, funnel/ablation, flagship pipeline) — split out of
  * the former monolithic TextOps in round 8; bodies unchanged. */
trait TextCurationQueries extends Serializable { self: TextSharedCore =>
  /** Stopword-marker language ID; confusion counts vs the labeled lang. */
  private def q29(s: SparkSession, dir: String): DataFrame =
    words(s, dir)
      .withColumn("s_en", expr("size(filter(w, t -> t IN ('the','a','of','and','to')))").cast("long"))
      .withColumn("s_es", expr("size(filter(w, t -> t IN ('el','la','de','los','y')))").cast("long"))
      .withColumn("s_de", expr("size(filter(w, t -> t IN ('der','die','das','und','ist')))").cast("long"))
      .withColumn("s_fr", expr("size(filter(w, t -> t IN ('le','les','des','et','est')))").cast("long"))
      .withColumn("pred", expr(
        """CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
          |     WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
          |     WHEN s_de >= s_fr THEN 'de' ELSE 'fr' END""".stripMargin))
      .groupBy("lang", "pred").agg(count(lit(1)).as("n"))
      .orderBy("lang", "pred")

  /** Quality score (length, stopword ratio, punctuation, word length) →
    * decile buckets per source (the filter stage of a data pipeline). */
  private def q30(s: SparkSession, dir: String): DataFrame =
    words(s, dir)
      .withColumn("nw", size(col("w")).cast("long"))
      .withColumn("n_stop", expr("size(filter(w, t -> t IN ('the','a','of','and','to','is','in')))").cast("long"))
      .withColumn("n_punct", expr("size(regexp_extract_all(text, '[^a-z0-9 ]', 0))").cast("long"))
      .withColumn("sum_wl", expr("aggregate(w, 0L, (acc, t) -> acc + length(t))"))
      .withColumn("score", expr(
        """0.4 * least(cast(nw as double) / 100.0, 1.0)
          |+ 0.3 * (1.0 - cast(n_stop as double) / cast(nw as double))
          |+ 0.2 * (1.0 - least(cast(n_punct as double) / cast(n_chars as double), 1.0))
          |+ 0.1 * least(cast(sum_wl as double) / cast(nw as double) / 10.0, 1.0)""".stripMargin))
      .withColumn("bucket", floor(col("score") * 10).cast("long"))
      .groupBy("source", "bucket").agg(count(lit(1)).as("n"))
      .orderBy("source", "bucket")

  /** Token counting: whitespace tokens + BPE-ish regex tokens per source. */
  private def q31(s: SparkSession, dir: String): DataFrame =
    words(s, dir)
      .withColumn("ws_tokens", size(col("w")).cast("long"))
      .withColumn("bpe_tokens",
        expr("size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))").cast("long"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("ws_tokens").as("sum_ws"),
        sum("bpe_tokens").as("sum_bpe"),
        round(avg(col("bpe_tokens").cast("double")), 4).as("avg_bpe"))
      .orderBy("source")

  /** End-to-end LLM training-data pipeline (the text-side flagship),
    * fully oracle-checked: quality score → filter ≥ 0.4 → exact dedup
    * (keep min doc_id per content hash) → near-dup dedup (LSH candidates,
    * jac ≥ 0.9, drop higher id) → hash-cut train/val/test split → per-split
    * doc/token/quality stats. Every stage is the scale-safe form: per-row
    * scoring, hash-groupBy dedup, banded candidates, rank-free split. */
  private def q88(s: SparkSession, dir: String): DataFrame = {
    val scored = words(s, dir)
      .withColumn("nw", size(col("w")).cast("long"))
      .withColumn("n_stop", expr("size(filter(w, t -> t IN ('the','a','of','and','to','is','in')))").cast("long"))
      .withColumn("n_punct", expr("size(regexp_extract_all(text, '[^a-z0-9 ]', 0))").cast("long"))
      .withColumn("sum_wl", expr("aggregate(w, 0L, (acc, t) -> acc + length(t))"))
      .withColumn("score", expr(
        """0.4 * least(cast(nw as double) / 100.0, 1.0)
          |+ 0.3 * (1.0 - cast(n_stop as double) / cast(nw as double))
          |+ 0.2 * (1.0 - least(cast(n_punct as double) / cast(n_chars as double), 1.0))
          |+ 0.1 * least(cast(sum_wl as double) / cast(nw as double) / 10.0, 1.0)""".stripMargin))
      .filter(col("score") >= 0.4)
      .withColumn("fp", md5(col("text")))
    val keepers = scored.groupBy("fp").agg(min("doc_id").as("doc_id"))
    val exactDeduped = scored.join(keepers, Seq("fp", "doc_id"))
    val losers = jaccard(s, dir).filter(col("jac") >= 0.9)
      .select(col("b_id").as("doc_id")).distinct()
    val clean = exactDeduped.join(losers, Seq("doc_id"), "left_anti")
      .withColumn("b", ((col("doc_id") * lit(2654435761L) + lit(7L)) % lit(4294967296L)) % lit(1000L))
      .withColumn("split",
        when(col("b") < 900, "train").when(col("b") < 950, "val").otherwise("test"))
    clean.groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        sum("nw").as("sum_tokens"),
        round(avg("score"), 4).as("avg_score"))
      .orderBy("split")
  }

  /** Benchmark decontamination: drop training docs sharing any 5-gram with
    * a held-out eval set (the doc_id % 17 == 0 docs stand in for a
    * benchmark corpus). The classic n-gram-overlap decontamination pass
    * every large pretraining pipeline runs (13-grams at production n; 5
    * here so the synthetic corpus has a non-trivial hit rate). Scale shape:
    * the eval side's distinct n-grams are TINY relative to the corpus —
    * broadcast them and left-semi join, so the 100 TB training side is
    * never shuffled; contaminated-doc ids collapse via groupBy. */
  private def q90(s: SparkSession, dir: String): DataFrame = {
    val g5 = words(s, dir).filter(size(col("w")) >= 5)
      .select(col("doc_id"), col("source"), explode(expr(
        "transform(sequence(0, size(w)-5), i -> concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3], w[i+4]))")).as("g"))
    val evalGrams = g5.filter(col("doc_id") % 17 === 0).select("g").distinct()
    val train = g5.filter(col("doc_id") % 17 =!= 0)
    val contaminated = train.join(broadcast(evalGrams), Seq("g"), "left_semi")
      .select("doc_id").distinct().withColumn("hit", lit(1))
    words(s, dir).filter(size(col("w")) >= 5 && col("doc_id") % 17 =!= 0)
      .select("doc_id", "source")
      .join(contaminated, Seq("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_train"),
        sum(when(col("hit").isNotNull, 1L).otherwise(0L)).as("n_contaminated"))
      .orderBy("source")
  }

  /** Gopher-style repetition signals: duplicate-word fraction and
    * top-2-gram mass per source. All ratios are derived from integer sums
    * (exact across engines) with ONE final IEEE division + round, so the
    * hash compare is stable. Per-row feature extraction → one groupBy:
    * zero extra shuffles at 100 TB. */
  private def q91(s: SparkSession, dir: String): DataFrame = {
    val perDoc = words(s, dir)
      .select(col("doc_id"), col("source"), explode(expr(
        "transform(sequence(0, size(w)-2), i -> concat_ws(' ', w[i], w[i+1]))")).as("g"))
      .groupBy("doc_id", "source", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id", "source")
      .agg(max("c").as("top2"), sum("c").as("n_pairs"))
    val wordStats = words(s, dir)
      .select(col("doc_id"), size(col("w")).cast("long").as("nw"),
        size(array_distinct(col("w"))).cast("long").as("nd"))
    perDoc.join(wordStats, Seq("doc_id"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("nw").as("tot_words"),
        sum("nd").as("tot_distinct"),
        round(lit(1.0) - sum("nd").cast("double") / sum("nw").cast("double"), 4).as("dup_word_frac"),
        round(sum("top2").cast("double") / sum("n_pairs").cast("double"), 4).as("top2_frac"))
      .orderBy("source")
  }

  /** PII scan + redaction audit. The synthetic corpus has no PII, so a
    * deterministic injection (emails on doc_id % 7, phones on doc_id % 11 —
    * built identically in the oracle) makes the scan non-vacuous; the regex
    * machinery (extract_all counts + global replace length delta) is what's
    * under test. Per-row regex → single groupBy: no shuffle of text. */
  private def q92(s: SparkSession, dir: String): DataFrame = {
    // the n_emails/n_phones > 0 predicates optimize to RLIKE early-exit
    // probes (RegexCountToRLike) once projection collapse inlines them
    graft.functions.expressions.RegexCountToRLike.register(s)
    // [.] instead of \. — the pattern goes through BOTH expr() (SQL string
    // literal, which eats backslash escapes) and the Column API (which
    // doesn't); a bracket class parses identically everywhere.
    val emailPat = "[a-z0-9._]+@[a-z0-9.-]+[.][a-z][a-z]+"
    val phonePat = "5[0-9][0-9]-[0-9][0-9][0-9][0-9]"
    val aug = t(s, dir, "documents")
      .withColumn("aug", concat(col("text"),
        when(col("doc_id") % 7 === 0,
          concat(lit(" contact user"), col("doc_id"), lit("@example.com now"))).otherwise(lit("")),
        when(col("doc_id") % 11 === 0,
          concat(lit(" call 555-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0"))).otherwise(lit(""))))
      .withColumn("n_emails", expr(s"size(regexp_extract_all(aug, '$emailPat', 0))").cast("long"))
      .withColumn("n_phones", expr(s"size(regexp_extract_all(aug, '$phonePat', 0))").cast("long"))
      .withColumn("red", regexp_replace(regexp_replace(col("aug"), emailPat, "<EMAIL>"), phonePat, "<PHONE>"))
    aug.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_emails") > 0, 1L).otherwise(0L)).as("n_email_docs"),
        sum(when(col("n_phones") > 0, 1L).otherwise(0L)).as("n_phone_docs"),
        sum("n_emails").as("tot_emails"),
        sum("n_phones").as("tot_phones"),
        sum(length(col("aug")) - length(col("red"))).cast("long").as("redacted_delta"))
      .orderBy("source")
  }

  /** Temperature-scaled domain mixing (α = 0.5): per-source sampling
    * weights w_s = |s|^α / Σ|t|^α over total chars, and the doc budget each
    * source gets at B = 1000. The standard multi-source pretraining mix
    * (upweights small domains, tempers big ones). α = 0.5 so the power is
    * a single IEEE sqrt — bit-identical across engines, unlike libm pow.
    * One tiny aggregate (|sources| rows) → driver-size; the 100 TB side
    * only ever computes per-source sums. */
  private def q93(s: SparkSession, dir: String): DataFrame = {
    val bySrc = t(s, dir, "documents").groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("tot_chars"))
    val wTot = bySrc.agg(sum(sqrt(col("tot_chars").cast("double"))).as("z"))
    bySrc.crossJoin(broadcast(wTot))
      .withColumn("weight", round(sqrt(col("tot_chars").cast("double")) / col("z"), 6))
      .withColumn("n_target",
        round(sqrt(col("tot_chars").cast("double")) / col("z") * lit(1000.0), 0).cast("long"))
      .select("source", "n_docs", "tot_chars", "weight", "n_target")
      .orderBy("source")
  }

  /** Sequence packing (concat-then-chunk): within each source, docs in
    * doc_id order are concatenated and cut into 512-token bins — the
    * GPT-style pretraining packing pass. Emits per-source bin counts, the
    * straddler count (docs crossing a bin boundary), and last-bin fill.
    * All-integer arithmetic → exact hash parity. The running sum windows
    * by SOURCE (each partition is one domain's stream), not globally —
    * the global-cumsum single-partition trap; at 100 TB you'd sub-shard
    * each source by a hash and pack per (source, shard). */
  private def q94(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    words(s, dir)
      .select(col("doc_id"), col("source"), size(col("w")).cast("long").as("tok"))
      .withColumn("cum", sum("tok").over(w))
      // `div`, not `/`: Spark's `/` on longs is DOUBLE division — exact
      // only below 2^53, and this column is a token cumsum at corpus scale
      .withColumn("start_bin", expr("(cum - tok) div 512L"))
      .withColumn("end_bin", expr("(cum - 1L) div 512L"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("tok").as("tot_tokens"),
        (max("end_bin") + 1L).as("n_bins"),
        sum(when(col("end_bin") > col("start_bin"), 1L).otherwise(0L)).as("n_straddlers"),
        (max("cum") - max("end_bin") * 512L).as("last_bin_fill"))
      .orderBy("source")
  }

  /** Cross-source contamination matrix: 3-gram Jaccard between every
    * source pair (corpus-level analytics for "how much does domain A leak
    * into domain B"). Reuses the shared shingle table aggregated to
    * (source, gram) — the self-join is |sources|², not |docs|², and the
    * gram-level join shuffles on the gram key only. */

  private def q97(s: SparkSession, dir: String): DataFrame = {
    val srcGrams = this.srcGrams(s, dir)
    val sizes = srcGrams.groupBy("source").agg(count(lit(1)).as("n"))
    val inter = srcGrams.as("x").join(srcGrams.as("y"),
        col("x.sh") === col("y.sh") && col("x.source") < col("y.source"))
      .groupBy(col("x.source").as("src_a"), col("y.source").as("src_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("za"), col("src_a") === col("za.source"))
      .join(sizes.as("zb"), col("src_b") === col("zb.source"))
      .select(col("src_a"), col("src_b"), col("inter"),
        round(col("inter").cast("double") /
          (col("za.n") + col("zb.n") - col("inter")).cast("double"), 6).as("jac"))
      .orderBy("src_a", "src_b")
  }

  /** Distinctive terms per source — TF-IDF-shaped "what characterizes this
    * domain" analytics, but scored with the log-free lift ratio
    * (tf_src/|src|) / (tf_corpus/|corpus|): a single division of exact
    * integer products, so the score (and therefore the top-5 ranking) is
    * bit-identical across engines — libm log is NOT correctly rounded and
    * would make ranks flappy at ties. Two hash aggs + a broadcast of the
    * per-source/corpus totals; the word-level shuffle is the only big
    * exchange, exactly as a 100 TB vocabulary statistics job wants. */
  private def q99(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = words(s, dir).select(col("source"), explode(col("w")).as("word"))
    val sw = tok.groupBy("source", "word").agg(count(lit(1)).as("c_sw"))
    val srcTot = sw.groupBy("source").agg(sum("c_sw").as("tot_s"))
    val wTot = sw.groupBy("word").agg(sum("c_sw").as("c_w"))
    val allTot = srcTot.agg(sum("tot_s").as("tot_all"))
    val scored = sw
      .join(broadcast(srcTot), Seq("source"))
      .join(wTot, Seq("word"))
      .crossJoin(broadcast(allTot))
      .withColumn("lift", round(
        (col("c_sw") * col("tot_all")).cast("double") /
          (col("tot_s") * col("c_w")).cast("double"), 6))
    val w = Window.partitionBy("source").orderBy(col("lift").desc, col("word"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 5)
      .select("source", "rk", "word", "c_sw", "lift")
      .orderBy("source", "rk")
  }

  /** Per-source classifier report: docs scored by the hashed linear model,
    * pass = raw score > 0 (exact integer test). Per-row map + one tiny
    * aggregation — the zero-shuffle shape a 100 TB quality-filter pass
    * needs; mean score is a single division of exact integer sums. */
  private def q108(s: SparkSession, dir: String): DataFrame = {
    graft.Spread.ifNarrow(s, words(s, dir)) // q222's scoring spread
      .withColumn("raw", hashedScoreRaw(col("w")))
      .withColumn("n_grams", (size(col("w")) * 2 - 1).cast("long"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("raw") > 0, 1L).otherwise(0L)).as("n_pass"),
        sum("raw").as("sum_raw"),
        round(sum(col("raw")).cast("double") /
          (sum(col("n_grams")) * 1000L).cast("double"), 6).as("mean_score"))
      .orderBy("source")
  }

  /** URL canonicalization + dedup (the Common-Crawl-style pre-fetch dedup
    * step). The corpus has no URL column, so URLs are synthesized
    * deterministically (q92's injection pattern) with the classic
    * near-duplicate forms — mixed-case host, explicit default port,
    * tracking params, trailing slash, fragment — and canonicalized by
    * lowercased host, port strip, utm strip, fragment strip, trailing-
    * slash strip. 500 canonical targets under ~5 variant spellings each;
    * the rollup proves the collapse ratio and that every canonical form
    * is scheme://lower-host/path. Per-row regex work, one count
    * aggregation — text never shuffles. */
  private def q214(s: SparkSession, dir: String): DataFrame = {
    val urls = t(s, dir, "documents")
      .withColumn("url", concat(
        lit("https://"),
        when(col("doc_id") % 3 === 0, lit("WWW.Example.COM")).otherwise(lit("www.example.com")),
        when(col("doc_id") % 5 === 0, lit(":443")).otherwise(lit("")),
        lit("/docs/"), (col("doc_id") % 500).cast("string"),
        when(col("doc_id") % 2 === 0, lit("/")).otherwise(lit("")),
        when(col("doc_id") % 4 === 0, lit("?utm_source=feed&utm_campaign=x")).otherwise(lit("")),
        when(col("doc_id") % 7 === 0, lit("#sec2")).otherwise(lit(""))))
      .withColumn("host", lower(regexp_extract(col("url"), "https://([^/:?#]+)", 1)))
      .withColumn("path", regexp_replace(
        regexp_extract(col("url"), "https://[^/?#]+([^?#]*)", 1), "/$", ""))
      .withColumn("canon", concat(lit("https://"), col("host"), col("path")))
    val perCanon = urls.groupBy("canon")
      .agg(count(lit(1)).as("n_raw"), countDistinct("url").as("n_forms"),
        // portable canonical-set signature: the doc number survives in the
        // path, the q13 multiplicative hash replays in DuckDB exactly
        expr("((CAST(regexp_extract(canon, '/docs/([0-9]+)$', 1) AS BIGINT)" +
          " * 2654435761 + 13) % 4294967296)").as("h"))
    perCanon.agg(
      sum("n_raw").cast("long").as("n_urls"),
      count(lit(1)).as("n_canonical"),
      max("n_forms").cast("long").as("max_forms"),
      sum(when(col("n_forms") > 1, 1L).otherwise(0L)).as("n_collapsed"),
      sum("h").cast("long").as("canon_sig"))
  }

  // ---------------------------------------------------------------------
  // q218 — Gopher-style document quality rules
  // ---------------------------------------------------------------------

  /** Per-document quality gates with all thresholds evaluated in EXACT
    * integer arithmetic (no double ever reaches a comparison), the
    * Gopher/RedPajama rule-set shape (cf. "Scaling Language Models:
    * Methods, Analysis & Insights from Training Gopher", appendix A1.1):
    *
    *   r1  word count in [50, 100000]
    *   r2  mean word length in [3, 10]        (3·nw ≤ Σ|w| ≤ 10·nw)
    *   r3  ≥ 2 distinct required stopwords present
    *   r4  distinct-word ratio ≥ 0.5          (2·n_distinct ≥ nw)
    *   r5  stopword fraction in [0.02, 0.30]  (50·n_stop ≥ nw ∧ 10·n_stop ≤ 3·nw)
    *
    * Every rule is a per-row map over the words array (higher-order
    * functions, zero shuffle); the only exchange is the final per-source
    * rollup — the exact shape a 100 TB quality-filter pass needs. */
  private def gated(s: SparkSession, dir: String): DataFrame =
    gopherGates(words(s, dir))

  /** Gate core over any frame carrying a `w` words-array column —
    * separated from the table read so the boundary algebra is unit-
    * testable on synthetic word lists (GopherGateSpec). */
  private[graft] def gopherGates(in: DataFrame): DataFrame = {
    val stop = "array('the','a','of','and','to')"
    in
      .withColumn("nw", size(col("w")).cast("long"))
      .withColumn("sum_wl", expr(
        "aggregate(w, cast(0 as bigint), (a, x) -> a + length(x))"))
      .withColumn("n_stop", expr(
        s"cast(size(filter(w, x -> array_contains($stop, x))) as bigint)"))
      .withColumn("n_stop_d", expr(
        s"cast(size(array_intersect(array_distinct(w), $stop)) as bigint)"))
      .withColumn("n_dist", size(array_distinct(col("w"))).cast("long"))
      .withColumn("r1", col("nw") >= 50 && col("nw") <= 100000L)
      .withColumn("r2", col("sum_wl") >= col("nw") * 3 && col("sum_wl") <= col("nw") * 10)
      .withColumn("r3", col("n_stop_d") >= 2)
      .withColumn("r4", col("n_dist") * 2 >= col("nw"))
      .withColumn("r5", col("n_stop") * 50 >= col("nw") && col("n_stop") * 10 <= col("nw") * 3)
  }

  /** Per-source rule report: independent pass counts per rule, all-pass
    * count, and a half-up integer-micro retention share (q149 rounding
    * rule — no float rounding in the gate path). */
  private def q218(s: SparkSession, dir: String): DataFrame = {
    def cnt(c: String) = sum(when(col(c), 1L).otherwise(0L)).as(s"n_$c")
    gated(s, dir)
      .withColumn("all_pass",
        col("r1") && col("r2") && col("r3") && col("r4") && col("r5"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        cnt("r1"), cnt("r2"), cnt("r3"), cnt("r4"), cnt("r5"),
        sum(when(col("all_pass"), 1L).otherwise(0L)).as("n_pass"))
      .withColumn("retention",
        expr("(2 * n_pass * 1000000 + n_docs) div (2 * n_docs)").cast("double") / 1000000.0)
      .orderBy("source")
  }

  // ---------------------------------------------------------------------
  // q221 — curation attrition funnel (gates → exact dedup)
  // ---------------------------------------------------------------------

  /** The per-stage attrition table every production curation pipeline
    * publishes: documents surviving each gate applied IN SEQUENCE
    * (r1 → r1∧r2 → … → all five), then corpus-wide exact dedup over the
    * survivors (keep the min doc_id per md5(text) — dedup runs AFTER the
    * cheap per-row gates, so the only shuffle on the expensive stage sees
    * already-filtered rows; at 100 TB that ordering is the difference
    * between hashing the corpus and hashing the survivors). */
  private def q221(s: SparkSession, dir: String): DataFrame = {
    val g = gated(s, dir)
      .withColumn("s1", col("r1"))
      .withColumn("s2", col("s1") && col("r2"))
      .withColumn("s3", col("s2") && col("r3"))
      .withColumn("s4", col("s3") && col("r4"))
      .withColumn("s5", col("s4") && col("r5"))
    val keepW = org.apache.spark.sql.expressions.Window.partitionBy(md5(col("text")))
    val d = g.filter(col("s5"))
      .withColumn("keeper", col("doc_id") === min("doc_id").over(keepW))
      .select(col("doc_id"), col("keeper"))
    def cnt(c: String) = sum(when(col(c), 1L).otherwise(0L)).as(s"n_$c")
    g.join(d, Seq("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        cnt("s1"), cnt("s2"), cnt("s3"), cnt("s4"), cnt("s5"),
        sum(when(col("keeper") === true, 1L).otherwise(0L)).as("n_kept"))
      .withColumn("retention",
        expr("(2 * n_kept * 1000000 + n_docs) div (2 * n_docs)").cast("double") / 1000000.0)
      .orderBy("source")
  }

  // ---------------------------------------------------------------------
  // q230 — Unicode NFC normalization pass (graft_nfc expression)
  // ---------------------------------------------------------------------

  /** Composed spelling of the probe phrase (U+00E9 twice) and its NFD
    * decomposition (e + U+0301) — byte-for-byte the same pair in the
    * Spark plan and the DuckDB oracle because BOTH strings interpolate
    * from these vals. */
  private val NfcComposed = "caf\u00e9 r\u00e9sum\u00e9"
  private val NfcDecomposed = "cafe\u0301 re\u0301sume\u0301"

  /** The normalization pass every curation stack runs BEFORE hashing:
    * Unicode NFC (the custom codegen'd `graft_nfc` expression — Spark SQL
    * has no normalizer), control-character strip, whitespace squeeze,
    * trim. The corpus is pure ASCII, so the unicode surface is
    * synthesized deterministically (the q92/q214 injection pattern):
    * 250 snippet groups, each spelled composed by half its docs and
    * NFD-decomposed by the other half, some groups carrying a control
    * char + ragged spacing. The rollup proves the operational point —
    * n_raw_distinct collapses ~2:1 to n_norm_distinct, i.e. without this
    * pass every downstream content hash, shingle, and suffix rank would
    * treat trivially-respelled duplicates as distinct documents.
    *
    * Scale shape: per-row map (ASCII fast path returns the input
    * UTF8String untouched — no allocation on the dominant path), one
    * per-source rollup; the distinct counts are hash aggregates over
    * bounded-cardinality synthesized strings. */
  private def q230(s: SparkSession, dir: String): DataFrame = {
    graft.functions.expressions.NfcNormalize.register(s)
    val raw = t(s, dir, "documents").select(col("doc_id"), col("source"))
      .withColumn("snippet", concat(
        lit("snippet "), (col("doc_id") % 250).cast("string"), lit(" "),
        when((col("doc_id") / 250).cast("long") % 2 === 0, lit(NfcComposed))
          .otherwise(lit(NfcDecomposed)),
        when(col("doc_id") % 250 % 5 === 0,
          lit("  twin  spaces ")).otherwise(lit(""))))
      .withColumn("norm", trim(regexp_replace(regexp_replace(
        expr("graft_nfc(snippet)"), "[\\x00-\\x1f]", ""), " +", " ")))
    raw.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("norm") =!= col("snippet"), 1L).otherwise(0L)).as("n_changed"),
        sum(length(col("snippet"))).cast("long").as("raw_chars"),
        sum(length(col("norm"))).cast("long").as("norm_chars"),
        countDistinct("snippet").as("n_raw_distinct"),
        countDistinct("norm").as("n_norm_distinct"))
      .orderBy("source")
  }

  // ---------------------------------------------------------------------
  // q231 — subword tokenization (WordPiece-style greedy longest match)
  // ---------------------------------------------------------------------

  /** Fixed subword vocabulary (token, id) — multi-char merges first, then
    * the single-character alphabet as the fallback tier (the WordPiece
    * base-vocab convention). A val so the Spark UDF and the DuckDB
    * oracle's VALUES list interpolate from the SAME table. */
  private[graft] val WpVocab: Seq[(String, Int)] =
    Seq("str", "eam", "wind", "ow", "bat", "ch", "ta", "ble", "jo", "in",
      "agg", "sort", "key", "data", "row", "scan", "filt", "er", "merge",
      "query").zipWithIndex ++
      ('a' to 'z').map(_.toString).zipWithIndex.map { case (c, i) => (c, 20 + i) }

  /** Greedy longest-prefix segmentation of one word against [[WpVocab]]:
    * returns (n_tokens, n_unk, id_sum). A character with no vocab match
    * is consumed as one UNK token (contributes to n_unk, not id_sum) —
    * so tokenization always terminates and covers every byte. */
  private[graft] def wpSegment(word: String): (Long, Long, Long) = {
    val byLenDesc = WpVocab.sortBy { case (t, _) => (-t.length, t) }
    var i = 0
    var nTok = 0L
    var nUnk = 0L
    var idSum = 0L
    while (i < word.length) {
      var matched = -1
      var mLen = 0
      var j = 0
      while (matched < 0 && j < byLenDesc.length) {
        val (t, id) = byLenDesc(j)
        if (word.startsWith(t, i)) { matched = id; mLen = t.length }
        j += 1
      }
      if (matched >= 0) { idSum += matched; i += mLen } else { nUnk += 1; i += 1 }
      nTok += 1
    }
    (nTok, nUnk, idSum)
  }

  /** The token-yield report every mixture/budget plan needs: documents
    * tokenized with a REAL subword tokenizer (greedy longest-match over a
    * fixed merge vocabulary — the WordPiece inference rule), not
    * whitespace counting, rolled up per source as token counts, UNK
    * counts, an exact token-id checksum, and integer-ppm fertility
    * (tokens per word).
    *
    * Scale shape — "tokenize the dictionary, not the corpus": the
    * segmentation loop runs once per DISTINCT word (a vocabulary-bounded
    * table, sublinear in corpus size), and the corpus contributes only a
    * (source, word) count aggregation that joins the segmented dictionary
    * on the word key. At 100 TB the heavy text pass is therefore ONE
    * map-side-combinable count agg; the per-word segmentation cost is
    * amortized over every occurrence. The DuckDB oracle replays the exact
    * greedy rule with a recursive CTE + LATERAL longest-prefix probe over
    * the same interpolated vocabulary. */
  private def q231(s: SparkSession, dir: String): DataFrame = {
    val seg = udf { (w: String) =>
      val (t, u, i) = wpSegment(w); (t, u, i)
    }
    val occ = words(s, dir)
      .select(col("source"), explode(col("w")).as("word"))
      .groupBy("source", "word").agg(count(lit(1)).as("cnt"))
    val dict = occ.select("word").distinct()
      .withColumn("seg", seg(col("word")))
      .select(col("word"), col("seg._1").as("n_tok"),
        col("seg._2").as("n_unk"), col("seg._3").as("idsum"))
    occ.join(dict, Seq("word"))
      .groupBy("source")
      .agg(sum("cnt").cast("long").as("n_words"),
        sum(col("n_tok") * col("cnt")).cast("long").as("n_tokens"),
        sum(col("n_unk") * col("cnt")).cast("long").as("n_unk"),
        sum(col("idsum") * col("cnt")).cast("long").as("id_checksum"))
      .withColumn("fertility_ppm", expr(
        "CAST(((n_tokens * 1000000) + (n_words DIV 2)) DIV n_words AS BIGINT)"))
      .orderBy("source")
  }

  // ---------------------------------------------------------------------
  // q232 — filter ablation (per-rule attrition attribution)
  // ---------------------------------------------------------------------

  /** The ablation table behind every "which gate is costing us data"
    * decision: for each Gopher rule, how many documents fail it at all
    * (marginal), how many fail ONLY it (unique attribution — exactly the
    * docs that would be rescued by dropping the rule), and the corpus
    * pass rate with the rule removed. n_pass_without = n_pass_all +
    * n_fail_only is an identity, published precomputed so the consumer
    * never re-derives it wrong. Rates are half-up integer-ppm (the q149
    * rounding rule).
    *
    * Scale shape: the gate columns come from the same per-row map as
    * q218; the per-rule rollup is a 5-way stack of the gated frame
    * (metadata columns only — the words array is dropped BEFORE the
    * stack, so the corpus text contributes one scan), each branch a
    * map-side-combinable count aggregation; output is 5 rows. */
  private def q232(s: SparkSession, dir: String): DataFrame = {
    val g = gated(s, dir)
      .withColumn("n_fail", (0 until 5).map(i =>
        when(col(s"r${i + 1}"), 0).otherwise(1)).reduce(_ + _))
      .select((1 to 5).map(i => col(s"r$i")) :+ col("n_fail"): _*)
    val stacked = g.select(expr(
      """stack(5,
        |  'r1', r1, 'r2', r2,
        |  'r3', r3, 'r4', r4,
        |  'r5', r5)""".stripMargin).as(Seq("rule", "pass")),
      col("n_fail"))
    val perRule = stacked.groupBy("rule").agg(
      sum(when(!col("pass"), 1L).otherwise(0L)).as("n_fail_rule"),
      sum(when(!col("pass") && col("n_fail") === 1, 1L).otherwise(0L))
        .as("n_fail_only"))
    val totals = g.agg(count(lit(1)).as("n_docs"),
      sum(when(col("n_fail") === 0, 1L).otherwise(0L)).as("n_pass_all"))
    perRule.crossJoin(broadcast(totals))
      .withColumn("n_pass_without", col("n_pass_all") + col("n_fail_only"))
      .withColumn("pass_ppm", expr(
        "CAST((2 * n_pass_all * 1000000 + n_docs) DIV (2 * n_docs) AS BIGINT)"))
      .withColumn("pass_without_ppm", expr(
        "CAST((2 * n_pass_without * 1000000 + n_docs) DIV (2 * n_docs) AS BIGINT)"))
      .select("rule", "n_docs", "n_fail_rule", "n_fail_only",
        "n_pass_all", "n_pass_without", "pass_ppm", "pass_without_ppm")
      .orderBy("rule")
  }

  // q235 — Aho–Corasick blocklist scan (multi-literal contamination filter)

  /** The fixed blocklist. Chosen to exercise every automaton edge case:
    * nested patterns ("table" inside "fast table"/"table table" — output
    * links), a self-bordered pattern ("a a", whose occurrences can
    * overlap: greedy-non-overlap semantics resolve it identically to SQL
    * replace()), multi-word phrases, and a pattern absent from the
    * corpus vocabulary ("drop cascade" — zero-count rows must still be
    * exact). */
  private[graft] val blocklistPatterns: Array[String] = Array(
    "fast table", "table table", "scan slow", "value part hash",
    "window spark", "a a", "big vector", "table", "merge batch",
    "drop cascade")

  /** Blocklist hit matrix: per (pattern, source), how many documents
    * contain the literal and how many (greedy non-overlapping)
    * occurrences there are in total — the audit report a contamination /
    * bad-content literal filter produces before documents are dropped.
    *
    * Scale shape: the automaton (built once from the pattern list,
    * pattern-count-independent matching) is broadcast; the scan is a
    * zero-shuffle per-row projection; the only exchange is the final
    * (pattern, source) rollup — at most |patterns|·|sources| rows. A 10k
    * entry blocklist costs the same text pass as this 10-entry one. */
  private def q235(s: SparkSession, dir: String): DataFrame = {
    val bc = s.sparkContext.broadcast(graft.functions.AhoCorasick.build(blocklistPatterns))
    val hitsUdf = udf { (text: String) =>
      val c = bc.value.countNonOverlapping(if (text == null) "" else text)
      c.toSeq.zipWithIndex.map { case (n, pid) => (pid, n) }
    }
    val patDf = s.createDataFrame(
      blocklistPatterns.zipWithIndex.map { case (p, i) => (i, p) }.toSeq)
      .toDF("pid", "pat")
    t(s, dir, "documents")
      .select(col("source"), explode(hitsUdf(col("text"))).as("h"))
      .select(col("source"), col("h._1").as("pid"), col("h._2").as("n"))
      .join(broadcast(patDf), Seq("pid"))
      .groupBy("pat", "source")
      .agg(sum(when(col("n") > 0, 1L).otherwise(0L)).as("n_docs"),
        sum(col("n").cast("long")).as("n_hits"))
      .orderBy("pat", "source")
  }

  /** DuckDB VALUES list interpolated from [[WpVocab]] — one source of
    * truth for both engines. */
  // q248 — Heaps-law vocabulary growth curve

  /** Vocabulary growth (Heaps' law, V ≈ K·N^β) measured the one-pass
    * way: each word's FIRST-occurrence document (min doc_id over its
    * occurrences) makes cumulative vocabulary at any corpus prefix a
    * COUNT of first occurrences below the threshold — the corpus is
    * never re-scanned per checkpoint, which is what turns "plot the
    * curve" from 10 corpus passes into one. The curve is the sizing
    * input every tokenizer-vocab and dedup-memory budget starts from.
    * Output is exact integers per prefix step (docs, tokens, cumulative
    * vocabulary, newly seen words); the β fit itself is the consumer's
    * log-log regression over 10 points, kept out of the engine so no
    * transcendental touches the hash gate.
    *
    * Scale shape: one (word)-keyed shuffle for the min-doc table
    * (vocabulary-bounded, sublinear in corpus size), one rollup of
    * per-doc token counts; the 10-row threshold table is broadcast onto
    * both sides, and the lag window runs over the 10-row result. */
  private def q248(s: SparkSession, dir: String): DataFrame =
    vocabGrowth(words(s, dir))

  /** q248 core over any (doc_id, w: array<string>) frame — exposed so
    * TextScaleSpec can prove a REAL Heaps curve on its 500k-doc
    * synthetic corpus (the shipped testdata's 31-word vocabulary makes
    * the curve flat, which gates the machinery but not the shape). */
  private[graft] def vocabGrowth(wds: DataFrame): DataFrame = {
    val spark = wds.sparkSession
    import spark.implicits._
    val maxRow = wds.agg(max("doc_id")).head()
    if (maxRow.isNullAt(0)) // empty corpus: no thresholds, schema-stable
      return Seq.empty[(Long, Long, Long, Long, Long, Long)]
        .toDF("k", "cut", "docs_cum", "tokens_cum", "vocab_cum", "new_words")
    val maxId = maxRow.getLong(0)
    val th = (1 to 10).map(k => (k.toLong, (maxId + 1) * k / 10)).toDF("k", "cut")
    val tok = wds.select(col("doc_id"), explode(col("w")).as("word"))
    val fd = tok.groupBy("word").agg(min("doc_id").as("fd"))
    val perDoc = wds.select(col("doc_id"), size(col("w")).cast("long").as("nt"))
    val cum = perDoc.crossJoin(broadcast(th)).filter(col("doc_id") < col("cut"))
      .groupBy("k", "cut")
      .agg(count(lit(1)).as("docs_cum"), sum("nt").as("tokens_cum"))
    val vc = fd.crossJoin(broadcast(th)).filter(col("fd") < col("cut"))
      .groupBy("k").agg(count(lit(1)).as("vocab_cum"))
    val w10 = org.apache.spark.sql.expressions.Window.orderBy("k")
    cum.join(vc, Seq("k"))
      .withColumn("new_words",
        col("vocab_cum") - coalesce(lag("vocab_cum", 1).over(w10), lit(0L)))
      .select("k", "cut", "docs_cum", "tokens_cum", "vocab_cum", "new_words")
      .orderBy("k")
  }

  // q250 — length-bucketed batching padding audit

  /** The padding-waste table behind every LLM dataloader configuration:
    * fixed batches of B = 32 documents, each padded to its batch max
    * length, under (a) corpus order and (b) length-sorted order — the
    * classic length-bucketing trade every trainer measures before
    * turning it on (sorted batches waste almost nothing but correlate
    * examples; the table quantifies exactly what the shuffle-quality
    * trade buys). padded = Σ_batches rows·max(len); waste_ppm half-up
    * over non-negative integers (q149 rule), so the whole table is
    * float-free.
    *
    * Scale shape: each ordering is one scale-honest global rank
    * (Ranks.seqIdBy — range-partitioned sort + zipWithIndex, never a
    * single-partition window; both key sets are total orders per the
    * seqIdBy contract), one rank DIV 32 bucket rollup, one 1-row fold;
    * output is 2 rows. The (doc_id, len) table is localCheckpointed so
    * both orderings read one corpus scan. */
  private def q250(s: SparkSession, dir: String): DataFrame = {
    val lens = words(s, dir)
      .select(col("doc_id"), size(col("w")).cast("long").as("nt"))
      .localCheckpoint()
    def strat(name: String, keys: Column*): DataFrame =
      Ranks.seqIdBy(lens, "rk", keys: _*)
        .withColumn("b", expr("CAST((rk - 1) DIV 32 AS BIGINT)"))
        .groupBy("b")
        .agg(count(lit(1)).as("n"), max("nt").as("mx"), sum("nt").as("tok"))
        .groupBy(lit(name).as("strategy"))
        .agg(
          sum("n").as("n_docs"),
          count(lit(1)).as("n_batches"),
          sum("tok").as("sum_tokens"),
          sum(col("n") * col("mx")).as("padded_tokens"))
        .withColumn("waste_ppm", expr(
          "CAST((2 * (padded_tokens - sum_tokens) * 1000000 + padded_tokens)" +
            " DIV (2 * padded_tokens) AS BIGINT)"))
    strat("corpus_order", col("doc_id"))
      .unionByName(strat("length_sorted", col("nt"), col("doc_id")))
      .orderBy("strategy")
  }

  // q253 — per-domain adaptive quality threshold

  /** The FineWeb/per-dump refinement of a global quality cut: each
    * DOMAIN gets its own threshold (here the per-source p25 of the q108
    * hashed score), so a uniformly-weaker domain isn't wholesale-deleted
    * by a corpus-global cut and a uniformly-stronger one still sheds its
    * own worst quartile. Thresholds come from Percentiles.exactByRank —
    * the distributed rank-selection that never builds a per-group sort
    * buffer (the q08/q45 lesson), value-identical to DuckDB's
    * quantile_cont — and attach back as a broadcast (|sources| rows).
    * The pass rate lands ~750000 ppm per source BY CONSTRUCTION (the
    * whole point of adaptive cuts); the hash gate rides on the exact
    * thresholds and counts. */
  private def q253(s: SparkSession, dir: String): DataFrame = {
    // q222's scoring spread; `scored` is evaluated by BOTH the percentile
    // pass and the final join, so the serial kernel was paid twice
    val scored = graft.Spread.ifNarrow(s, words(s, dir))
      .withColumn("raw", hashedScoreRaw(col("w")).cast("double"))
      .select(col("doc_id"), col("source"), col("raw"))
    val cuts = graft.functions.Percentiles
      .exactByRank(scored, "source", "raw", Seq(0.25))
      .select(col("source"), col("value").as("p25"))
    scored.join(broadcast(cuts), Seq("source"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        round(max("p25"), 4).as("p25"),
        sum(when(col("raw") > col("p25"), 1L).otherwise(0L)).as("n_pass"))
      .withColumn("pass_ppm", expr(
        "CAST((2 * n_pass * 1000000 + n_docs) DIV (2 * n_docs) AS BIGINT)"))
      .orderBy("source")
  }

  // q252 — Luhn-validated payment-card PII scan

  /** The production refinement of q92's regex PII scan: a 16-digit run
    * is only treated as a payment card if it passes the Luhn mod-10
    * check — the validation step that separates card PII from order
    * numbers/timestamps and keeps the redaction false-positive rate
    * usable. The corpus has no cards, so they are injected
    * deterministically (the q92/q214/q230 convention): doc_id % 9 == 0
    * appends a VALID card (15 digits from doc_id + the computed Luhn
    * check digit); doc_id % 13 == 0 appends a near-miss (check digit
    * shifted by 5) that the regex finds but Luhn MUST reject — the scan
    * is graded on telling them apart, not on the regex.
    *
    * All Luhn arithmetic is exact integers evaluated with the same
    * digit-position algebra on both engines (right-index j: doubled iff
    * j even over the full 16-digit number); candidate extraction and
    * validation are per-row HOFs (regexp_extract_all + filter/aggregate
    * lambdas), so the corpus is scanned once with zero joins — the only
    * exchange is the per-source rollup. The signature sums an 8-digit
    * substring of each valid card (bounded, overflow-safe in BIGINT). */
  private def q252(s: SparkSession, dir: String): DataFrame = {
    val luhn16 = "aggregate(sequence(1, 16), CAST(0 AS BIGINT), (a, j) -> a +" +
      " CASE WHEN j % 2 = 0 THEN" +
      "   IF(2 * CAST(substring(c, 17 - j, 1) AS BIGINT) > 9," +
      "      2 * CAST(substring(c, 17 - j, 1) AS BIGINT) - 9," +
      "      2 * CAST(substring(c, 17 - j, 1) AS BIGINT))" +
      " ELSE CAST(substring(c, 17 - j, 1) AS BIGINT) END)"
    t(s, dir, "documents")
      .withColumn("base", lpad((col("doc_id") % 999999999L).cast("string"), 15, "7"))
      // Luhn sum of the base as it will sit in the full number (right
      // index j of base = right index j+1 of the 16-digit number, so
      // base digits double at ODD j)
      .withColumn("lsum", expr(
        "aggregate(sequence(1, 15), CAST(0 AS BIGINT), (a, j) -> a +" +
          " CASE WHEN j % 2 = 1 THEN" +
          "   IF(2 * CAST(substring(base, 16 - j, 1) AS BIGINT) > 9," +
          "      2 * CAST(substring(base, 16 - j, 1) AS BIGINT) - 9," +
          "      2 * CAST(substring(base, 16 - j, 1) AS BIGINT))" +
          " ELSE CAST(substring(base, 16 - j, 1) AS BIGINT) END)"))
      .withColumn("chk", expr("(10 - (lsum % 10)) % 10"))
      .withColumn("aug", concat(col("text"),
        when(col("doc_id") % 9 === 0,
          concat(lit(" card "), col("base"), col("chk").cast("string"))).otherwise(lit("")),
        when(col("doc_id") % 13 === 0,
          concat(lit(" ref "), col("base"),
            expr("(chk + 5) % 10").cast("string"))).otherwise(lit(""))))
      .withColumn("cands", expr("regexp_extract_all(aug, '[0-9]{16}', 0)"))
      .withColumn("valids", expr(s"filter(cands, c -> ($luhn16) % 10 = 0)"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(col("cands")).cast("long")).as("n_candidates"),
        sum(size(col("valids")).cast("long")).as("n_luhn_valid"),
        sum((size(col("cands")) - size(col("valids"))).cast("long")).as("n_rejected"),
        sum(when(size(col("valids")) > 0, 1L).otherwise(0L)).as("n_docs_with_cards"),
        sum(expr(
          "aggregate(valids, CAST(0 AS BIGINT)," +
            " (a, c) -> a + CAST(substring(c, 5, 8) AS BIGINT))")).as("valid_sig"))
      .orderBy("source")
  }

  private def wpVocabValues: String =
    WpVocab.map { case (t, i) => s"('$t',$i)" }.mkString(",")

  private[operators] val curationQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q248_vocab_growth" -> (q248 _),
    "q250_length_bucketing" -> (q250 _),
    "q252_luhn_pii" -> (q252 _),
    "q253_adaptive_threshold" -> (q253 _),
    "q235_blocklist_scan" -> (q235 _),
    "q232_gate_ablation" -> (q232 _),
    "q231_wordpiece_tokenize" -> (q231 _),
    "q230_unicode_normalize" -> (q230 _),
    "q218_gopher_rules" -> (q218 _),
    "q221_curation_funnel" -> (q221 _),
    "q214_url_canonical" -> (q214 _),
    "q108_hashed_classifier" -> (q108 _),
    "q99_distinctive_terms" -> (q99 _),
    "q93_domain_mix" -> (q93 _),
    "q94_seq_packing" -> (q94 _),
    "q97_source_overlap" -> (q97 _),
    "q90_decontaminate" -> (q90 _),
    "q91_repetition" -> (q91 _),
    "q92_pii_scan" -> (q92 _),
    "q88_llm_pipeline" -> (q88 _),
    "q29_lang_id" -> (q29 _),
    "q30_quality_score" -> (q30 _),
    "q31_token_count" -> (q31 _)
  )

  private[operators] val curationOracles: Map[String, String] = Map(
    // quantile_cont's linear interpolation is value-identical to
    // exactByRank (the q08/q45 precedent); same integer score, strict >
    // cut, half-up ppm
    "q253_adaptive_threshold" ->
      """WITH wf AS (SELECT source, list_filter(regexp_split_to_array(text,'\s+'), t -> t <> '') AS w
        |  FROM documents
        |  WHERE len(list_filter(regexp_split_to_array(text,'\s+'), t -> t <> '')) >= 3),
        |g AS (SELECT source,
        |    list_concat(w, [w[i+1] || ' ' || w[i+2] for i in range(len(w)-1)]) AS grams FROM wf),
        |r AS (SELECT source,
        |    CAST(CAST(list_aggregate(
        |      [ (CAST(('0x'||substr(md5(gr),1,8)) AS BIGINT) % 65536 * 2654435761 % 2001) - 1000
        |        for gr in grams], 'sum') AS BIGINT) AS DOUBLE) AS raw
        |  FROM g),
        |c AS (SELECT source, quantile_cont(raw, 0.25) AS p25 FROM r GROUP BY 1)
        |SELECT r.source, CAST(count(*) AS BIGINT) AS n_docs,
        |  round(max(c.p25), 4) AS p25,
        |  CAST(sum(CASE WHEN raw > p25 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
        |  CAST((2 * sum(CASE WHEN raw > p25 THEN 1 ELSE 0 END) * 1000000 + count(*))
        |    // (2 * count(*)) AS BIGINT) AS pass_ppm
        |FROM r JOIN c USING (source) GROUP BY 1 ORDER BY 1""".stripMargin,
    // identical injection (15-digit base + computed Luhn check; near-miss
    // shifts the check by 5) and identical digit-position algebra —
    // right-index j doubled iff j even over the 16-digit candidate
    "q252_luhn_pii" ->
      """WITH b AS (SELECT doc_id, source, text,
        |    lpad(CAST(doc_id % 999999999 AS VARCHAR), 15, '7') AS base
        |  FROM documents),
        |l AS (SELECT *, CAST(list_aggregate(
        |    [CASE WHEN j % 2 = 1 THEN
        |       CASE WHEN 2 * CAST(substr(base, 16 - j, 1) AS BIGINT) > 9
        |            THEN 2 * CAST(substr(base, 16 - j, 1) AS BIGINT) - 9
        |            ELSE 2 * CAST(substr(base, 16 - j, 1) AS BIGINT) END
        |     ELSE CAST(substr(base, 16 - j, 1) AS BIGINT) END
        |     for j in range(1, 16)], 'sum') AS BIGINT) AS lsum
        |  FROM b),
        |a AS (SELECT doc_id, source, text ||
        |    CASE WHEN doc_id % 9 = 0
        |      THEN ' card ' || base || CAST((10 - (lsum % 10)) % 10 AS VARCHAR)
        |      ELSE '' END ||
        |    CASE WHEN doc_id % 13 = 0
        |      THEN ' ref ' || base || CAST(((10 - (lsum % 10)) % 10 + 5) % 10 AS VARCHAR)
        |      ELSE '' END AS aug
        |  FROM l),
        |c AS (SELECT source, regexp_extract_all(aug, '[0-9]{16}') AS cands FROM a),
        |v AS (SELECT source, cands,
        |    list_filter(cands, c -> CAST(list_aggregate(
        |      [CASE WHEN j % 2 = 0 THEN
        |         CASE WHEN 2 * CAST(substr(c, 17 - j, 1) AS BIGINT) > 9
        |              THEN 2 * CAST(substr(c, 17 - j, 1) AS BIGINT) - 9
        |              ELSE 2 * CAST(substr(c, 17 - j, 1) AS BIGINT) END
        |       ELSE CAST(substr(c, 17 - j, 1) AS BIGINT) END
        |       for j in range(1, 17)], 'sum') AS BIGINT) % 10 = 0) AS valids
        |  FROM c)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(len(cands)) AS BIGINT) AS n_candidates,
        |  CAST(sum(len(valids)) AS BIGINT) AS n_luhn_valid,
        |  CAST(sum(len(cands) - len(valids)) AS BIGINT) AS n_rejected,
        |  CAST(sum(CASE WHEN len(valids) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_with_cards,
        |  CAST(sum(list_aggregate(list_prepend(CAST(0 AS BIGINT),
        |    [CAST(substr(c, 5, 8) AS BIGINT) for c in valids]), 'sum')) AS BIGINT) AS valid_sig
        |FROM v GROUP BY source ORDER BY source""".stripMargin,
    // batches of 32 in each total order, padded to batch max; half-up
    // ppm waste over non-negative integers (DIV ≡ //)
    "q250_length_bucketing" ->
      """WITH w AS (SELECT doc_id, list_filter(regexp_split_to_array(text,'\s+'), t -> t <> '') AS w
        |  FROM documents),
        |wf AS (SELECT * FROM w WHERE len(w) >= 3),
        |l AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS nt FROM wf),
        |r1 AS (SELECT nt, (row_number() OVER (ORDER BY doc_id) - 1) // 32 AS b FROM l),
        |g1 AS (SELECT b, count(*) AS n, max(nt) AS mx, sum(nt) AS tok FROM r1 GROUP BY 1),
        |s1 AS (SELECT 'corpus_order' AS strategy, CAST(sum(n) AS BIGINT) AS n_docs,
        |    CAST(count(*) AS BIGINT) AS n_batches, CAST(sum(tok) AS BIGINT) AS sum_tokens,
        |    CAST(sum(n * mx) AS BIGINT) AS padded_tokens FROM g1),
        |r2 AS (SELECT nt, (row_number() OVER (ORDER BY nt, doc_id) - 1) // 32 AS b FROM l),
        |g2 AS (SELECT b, count(*) AS n, max(nt) AS mx, sum(nt) AS tok FROM r2 GROUP BY 1),
        |s2 AS (SELECT 'length_sorted' AS strategy, CAST(sum(n) AS BIGINT) AS n_docs,
        |    CAST(count(*) AS BIGINT) AS n_batches, CAST(sum(tok) AS BIGINT) AS sum_tokens,
        |    CAST(sum(n * mx) AS BIGINT) AS padded_tokens FROM g2)
        |SELECT strategy, n_docs, n_batches, sum_tokens, padded_tokens,
        |  CAST((2 * (padded_tokens - sum_tokens) * 1000000 + padded_tokens)
        |    // (2 * padded_tokens) AS BIGINT) AS waste_ppm
        |FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2) ORDER BY strategy""".stripMargin,
    // identical integer thresholds ((max+1)*k)//10, first-occurrence
    // vocabulary counts, 10-row lag — floor division on non-negative
    // numerators throughout
    "q248_vocab_growth" ->
      """WITH w AS (SELECT doc_id, list_filter(regexp_split_to_array(text,'\s+'), t -> t <> '') AS w
        |  FROM documents),
        |wf AS (SELECT * FROM w WHERE len(w) >= 3),
        |mx AS (SELECT max(doc_id) AS m FROM wf),
        |th AS (SELECT CAST(k AS BIGINT) AS k, ((m + 1) * k) // 10 AS cut
        |  FROM mx, (SELECT unnest([1,2,3,4,5,6,7,8,9,10]) AS k) ks),
        |tok AS (SELECT doc_id, unnest(w) AS word FROM wf),
        |fd AS (SELECT word, min(doc_id) AS fd FROM tok GROUP BY 1),
        |pd AS (SELECT doc_id, len(w) AS nt FROM wf),
        |cum AS (SELECT k, CAST(cut AS BIGINT) AS cut,
        |    CAST(count(*) AS BIGINT) AS docs_cum,
        |    CAST(sum(nt) AS BIGINT) AS tokens_cum
        |  FROM th JOIN pd ON doc_id < cut GROUP BY 1, 2),
        |vc AS (SELECT k, CAST(count(*) AS BIGINT) AS vocab_cum
        |  FROM th JOIN fd ON fd < cut GROUP BY 1)
        |SELECT k, cut, docs_cum, tokens_cum, vocab_cum,
        |  CAST(vocab_cum - coalesce(lag(vocab_cum) OVER (ORDER BY k), 0) AS BIGINT) AS new_words
        |FROM cum JOIN vc USING (k) ORDER BY k""".stripMargin,
    // replace() removes leftmost non-overlapping occurrences — exactly the
    // automaton's greedy counting semantics (see AhoCorasick scaladoc)
    "q235_blocklist_scan" ->
      """WITH pats AS (SELECT * FROM (VALUES ('fast table'),('table table'),
        |    ('scan slow'),('value part hash'),('window spark'),('a a'),
        |    ('big vector'),('table'),('merge batch'),('drop cascade')) p(pat)),
        |h AS (SELECT d.source, p.pat,
        |    (length(d.text) - length(replace(d.text, p.pat, ''))) // length(p.pat) AS n
        |  FROM documents d CROSS JOIN pats p)
        |SELECT pat, source,
        |  CAST(count(*) FILTER (WHERE n > 0) AS BIGINT) AS n_docs,
        |  CAST(sum(n) AS BIGINT) AS n_hits
        |FROM h GROUP BY pat, source""".stripMargin,
    "q232_gate_ablation" ->
      """WITH w AS (SELECT doc_id, source,
        |        list_filter(regexp_split_to_array(text,'\s+'), t -> t <> '') AS w
        |      FROM documents),
        |wf AS (SELECT * FROM w WHERE len(w) >= 3),
        |f AS (SELECT doc_id,
        |  CAST(len(w) AS BIGINT) AS nw,
        |  CAST(list_aggregate([CAST(length(t) AS BIGINT) for t in w], 'sum') AS BIGINT) AS sum_wl,
        |  CAST(len(list_filter(w, t -> t IN ('the','a','of','and','to'))) AS BIGINT) AS n_stop,
        |  CAST(len(list_intersect(list_distinct(w), ['the','a','of','and','to'])) AS BIGINT) AS n_stop_d,
        |  CAST(len(list_distinct(w)) AS BIGINT) AS n_dist
        | FROM wf),
        |r AS (SELECT doc_id,
        |  (nw >= 50 AND nw <= 100000) AS r1,
        |  (sum_wl >= nw * 3 AND sum_wl <= nw * 10) AS r2,
        |  (n_stop_d >= 2) AS r3,
        |  (n_dist * 2 >= nw) AS r4,
        |  (n_stop * 50 >= nw AND n_stop * 10 <= nw * 3) AS r5
        | FROM f),
        |nf AS (SELECT *,
        |  (CASE WHEN r1 THEN 0 ELSE 1 END + CASE WHEN r2 THEN 0 ELSE 1 END +
        |   CASE WHEN r3 THEN 0 ELSE 1 END + CASE WHEN r4 THEN 0 ELSE 1 END +
        |   CASE WHEN r5 THEN 0 ELSE 1 END) AS n_fail
        | FROM r),
        |st AS (
        |  SELECT 'r1' AS rule, r1 AS pass, n_fail FROM nf UNION ALL
        |  SELECT 'r2', r2, n_fail FROM nf UNION ALL
        |  SELECT 'r3', r3, n_fail FROM nf UNION ALL
        |  SELECT 'r4', r4, n_fail FROM nf UNION ALL
        |  SELECT 'r5', r5, n_fail FROM nf),
        |pr AS (SELECT rule,
        |  CAST(sum(CASE WHEN NOT pass THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_rule,
        |  CAST(sum(CASE WHEN NOT pass AND n_fail = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_only
        | FROM st GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN n_fail = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_all
        | FROM nf)
        |SELECT rule, n_docs, n_fail_rule, n_fail_only, n_pass_all,
        |  n_pass_all + n_fail_only AS n_pass_without,
        |  CAST((2 * n_pass_all * 1000000 + n_docs) // (2 * n_docs) AS BIGINT) AS pass_ppm,
        |  CAST((2 * (n_pass_all + n_fail_only) * 1000000 + n_docs) // (2 * n_docs) AS BIGINT)
        |    AS pass_without_ppm
        |FROM pr, tot ORDER BY rule""".stripMargin,
    "q231_wordpiece_tokenize" ->
      s"""WITH RECURSIVE vocab(tok, tid) AS (
         |  SELECT * FROM (VALUES $wpVocabValues) v(tok, tid)),
         |w AS (SELECT source,
         |    unnest(list_filter(regexp_split_to_array(text,'\\s+'), x -> x <> '')) AS word
         |  FROM documents
         |  WHERE len(list_filter(regexp_split_to_array(text,'\\s+'), x -> x <> '')) >= 3),
         |wc AS (SELECT source, word, count(*) AS cnt FROM w GROUP BY 1, 2),
         |dict AS (SELECT DISTINCT word FROM wc),
         |seg AS (
         |  SELECT word, word AS rest, 0::BIGINT AS n_tok, 0::BIGINT AS n_unk,
         |    0::BIGINT AS idsum
         |  FROM dict
         |  UNION ALL
         |  SELECT word,
         |    CASE WHEN m.tok IS NULL THEN substr(rest, 2)
         |         ELSE substr(rest, length(m.tok) + 1) END,
         |    n_tok + 1,
         |    n_unk + CASE WHEN m.tok IS NULL THEN 1 ELSE 0 END,
         |    idsum + COALESCE(m.tid, 0)
         |  FROM seg LEFT JOIN LATERAL (
         |    SELECT v.tok, v.tid FROM vocab v
         |    WHERE starts_with(seg.rest, v.tok)
         |    ORDER BY length(v.tok) DESC LIMIT 1) m ON TRUE
         |  WHERE rest <> ''),
         |done AS (SELECT word, n_tok, n_unk, idsum FROM seg WHERE rest = '')
         |SELECT source,
         |  CAST(sum(cnt) AS BIGINT) AS n_words,
         |  CAST(sum(n_tok * cnt) AS BIGINT) AS n_tokens,
         |  CAST(sum(n_unk * cnt) AS BIGINT) AS n_unk,
         |  CAST(sum(idsum * cnt) AS BIGINT) AS id_checksum,
         |  CAST((sum(n_tok * cnt) * 1000000 + (sum(cnt) // 2)) // sum(cnt) AS BIGINT)
         |    AS fertility_ppm
         |FROM done JOIN wc USING (word)
         |GROUP BY source ORDER BY source""".stripMargin,
    "q230_unicode_normalize" ->
      s"""WITH r AS (SELECT doc_id, source,
         |    'snippet ' || CAST(doc_id % 250 AS VARCHAR) || ' ' ||
         |    CASE WHEN (doc_id // 250) % 2 = 0 THEN '$NfcComposed' ELSE '$NfcDecomposed' END ||
         |    CASE WHEN (doc_id % 250) % 5 = 0 THEN chr(7) || '  twin  spaces ' ELSE '' END
         |      AS snippet
         |  FROM documents),
         |n AS (SELECT doc_id, source, snippet,
         |    trim(regexp_replace(regexp_replace(nfc_normalize(snippet),
         |      '[\\x00-\\x1f]', '', 'g'), ' +', ' ', 'g')) AS norm
         |  FROM r)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN norm <> snippet THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
         |  CAST(sum(length(snippet)) AS BIGINT) AS raw_chars,
         |  CAST(sum(length(norm)) AS BIGINT) AS norm_chars,
         |  CAST(count(DISTINCT snippet) AS BIGINT) AS n_raw_distinct,
         |  CAST(count(DISTINCT norm) AS BIGINT) AS n_norm_distinct
         |FROM n GROUP BY source ORDER BY source""".stripMargin,
    "q218_gopher_rules" ->
      s"""WITH $gopherCte,
        |a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN r1 THEN 1 ELSE 0 END) AS BIGINT) AS n_r1,
        |  CAST(sum(CASE WHEN r2 THEN 1 ELSE 0 END) AS BIGINT) AS n_r2,
        |  CAST(sum(CASE WHEN r3 THEN 1 ELSE 0 END) AS BIGINT) AS n_r3,
        |  CAST(sum(CASE WHEN r4 THEN 1 ELSE 0 END) AS BIGINT) AS n_r4,
        |  CAST(sum(CASE WHEN r5 THEN 1 ELSE 0 END) AS BIGINT) AS n_r5,
        |  CAST(sum(CASE WHEN r1 AND r2 AND r3 AND r4 AND r5 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
        | FROM r GROUP BY 1)
        |SELECT source, n_docs, n_r1, n_r2, n_r3, n_r4, n_r5, n_pass,
        |  CAST((2 * n_pass * 1000000 + n_docs) // (2 * n_docs) AS DOUBLE) / 1000000.0 AS retention
        |FROM a ORDER BY source""".stripMargin,
    "q221_curation_funnel" ->
      s"""WITH $gopherCte,
        |s AS (SELECT doc_id, source, text, r1 AS s1, (r1 AND r2) AS s2,
        |  (r1 AND r2 AND r3) AS s3, (r1 AND r2 AND r3 AND r4) AS s4,
        |  (r1 AND r2 AND r3 AND r4 AND r5) AS s5 FROM r),
        |k AS (SELECT doc_id,
        |    (doc_id = min(doc_id) OVER (PARTITION BY md5(text))) AS keeper
        |  FROM s WHERE s5),
        |j AS (SELECT s.*, coalesce(k.keeper, false) AS keeper
        |  FROM s LEFT JOIN k USING (doc_id)),
        |a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) AS n_s1,
        |  CAST(sum(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT) AS n_s2,
        |  CAST(sum(CASE WHEN s3 THEN 1 ELSE 0 END) AS BIGINT) AS n_s3,
        |  CAST(sum(CASE WHEN s4 THEN 1 ELSE 0 END) AS BIGINT) AS n_s4,
        |  CAST(sum(CASE WHEN s5 THEN 1 ELSE 0 END) AS BIGINT) AS n_s5,
        |  CAST(sum(CASE WHEN keeper THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        | FROM j GROUP BY 1)
        |SELECT source, n_docs, n_s1, n_s2, n_s3, n_s4, n_s5, n_kept,
        |  CAST((2 * n_kept * 1000000 + n_docs) // (2 * n_docs) AS DOUBLE) / 1000000.0 AS retention
        |FROM a ORDER BY source""".stripMargin,
    "q214_url_canonical" ->
      """WITH u AS (SELECT doc_id,
        |  'https://' ||
        |  CASE WHEN doc_id % 3 = 0 THEN 'WWW.Example.COM' ELSE 'www.example.com' END ||
        |  CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END ||
        |  '/docs/' || CAST(doc_id % 500 AS VARCHAR) ||
        |  CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END ||
        |  CASE WHEN doc_id % 4 = 0 THEN '?utm_source=feed&utm_campaign=x' ELSE '' END ||
        |  CASE WHEN doc_id % 7 = 0 THEN '#sec2' ELSE '' END AS url
        |  FROM documents),
        |c AS (SELECT url,
        |  'https://' || lower(regexp_extract(url, 'https://([^/:?#]+)', 1)) ||
        |  regexp_replace(regexp_extract(url, 'https://[^/?#]+([^?#]*)', 1), '/$', '') AS canon
        |  FROM u),
        |p AS (SELECT canon, CAST(count(*) AS BIGINT) AS n_raw,
        |  CAST(count(DISTINCT url) AS BIGINT) AS n_forms,
        |  ((CAST(regexp_extract(canon, '/docs/([0-9]+)$', 1) AS BIGINT) * 2654435761 + 13) % 4294967296) AS h
        |  FROM c GROUP BY canon)
        |SELECT CAST(sum(n_raw) AS BIGINT) AS n_urls,
        |  CAST(count(*) AS BIGINT) AS n_canonical,
        |  CAST(max(n_forms) AS BIGINT) AS max_forms,
        |  CAST(sum(CASE WHEN n_forms > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_collapsed,
        |  CAST(sum(h) AS BIGINT) AS canon_sig
        |FROM p""".stripMargin,
    "q108_hashed_classifier" ->
      """WITH wf AS (SELECT source, list_filter(regexp_split_to_array(text,'\s+'), t -> t <> '') AS w
        |  FROM documents
        |  WHERE len(list_filter(regexp_split_to_array(text,'\s+'), t -> t <> '')) >= 3),
        |g AS (SELECT source, len(w) AS nw,
        |    list_concat(w, [w[i+1] || ' ' || w[i+2] for i in range(len(w)-1)]) AS grams
        |  FROM wf),
        |r AS (SELECT source, CAST(2*nw - 1 AS BIGINT) AS n_grams,
        |    CAST(list_aggregate(
        |      [ (CAST(('0x'||substr(md5(gr),1,8)) AS BIGINT) % 65536 * 2654435761 % 2001) - 1000
        |        for gr in grams], 'sum') AS BIGINT) AS raw
        |  FROM g)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN raw > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
        |  CAST(sum(raw) AS BIGINT) AS sum_raw,
        |  round(CAST(sum(raw) AS DOUBLE) / CAST(sum(n_grams) * 1000 AS DOUBLE), 6) AS mean_score
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "q99_distinctive_terms" ->
      """WITH w AS (SELECT doc_id, source, list_filter(regexp_split_to_array(text,'\s+'), t -> t <> '') AS w FROM documents),
        |wf AS (SELECT * FROM w WHERE len(w) >= 3),
        |tok AS (SELECT source, unnest(w) AS word FROM wf),
        |sw AS (SELECT source, word, count(*) AS c_sw FROM tok GROUP BY 1,2),
        |st AS (SELECT source, sum(c_sw) AS tot_s FROM sw GROUP BY 1),
        |wt AS (SELECT word, sum(c_sw) AS c_w FROM sw GROUP BY 1),
        |tt AS (SELECT sum(tot_s) AS tot_all FROM st),
        |sc AS (SELECT sw.source, sw.word, sw.c_sw,
        |  round(CAST(sw.c_sw * tt.tot_all AS DOUBLE) / CAST(st.tot_s * wt.c_w AS DOUBLE), 6) AS lift
        | FROM sw JOIN st USING (source) JOIN wt USING (word), tt),
        |r AS (SELECT *, row_number() OVER (PARTITION BY source ORDER BY lift DESC, word) AS rk FROM sc)
        |SELECT source, CAST(rk AS BIGINT) AS rk, word, CAST(c_sw AS BIGINT) AS c_sw, lift
        |FROM r WHERE rk <= 5 ORDER BY source, rk""".stripMargin,
    "q93_domain_mix" ->
      """WITH b AS (SELECT source, count(*) AS n_docs, sum(n_chars) AS tot_chars FROM documents GROUP BY 1),
        |z AS (SELECT sum(sqrt(CAST(tot_chars AS DOUBLE))) AS z FROM b)
        |SELECT source, CAST(n_docs AS BIGINT) AS n_docs, CAST(tot_chars AS BIGINT) AS tot_chars,
        |  round(sqrt(CAST(tot_chars AS DOUBLE)) / z, 6) AS weight,
        |  CAST(round(sqrt(CAST(tot_chars AS DOUBLE)) / z * 1000.0, 0) AS BIGINT) AS n_target
        |FROM b, z ORDER BY source""".stripMargin,
    "q94_seq_packing" ->
      """WITH w AS (SELECT doc_id, source, list_filter(regexp_split_to_array(text,'\s+'), t -> t <> '') AS w FROM documents),
        |wf AS (SELECT * FROM w WHERE len(w) >= 3),
        |d AS (SELECT doc_id, source, len(w) AS tok FROM wf),
        |c AS (SELECT doc_id, source, tok,
        |  sum(tok) OVER (PARTITION BY source ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum FROM d),
        |e AS (SELECT *, (cum - tok) // 512 AS start_bin, (cum - 1) // 512 AS end_bin FROM c)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(tok) AS BIGINT) AS tot_tokens,
        |  CAST(max(end_bin) + 1 AS BIGINT) AS n_bins,
        |  CAST(sum(CASE WHEN end_bin > start_bin THEN 1 ELSE 0 END) AS BIGINT) AS n_straddlers,
        |  CAST(max(cum) - max(end_bin) * 512 AS BIGINT) AS last_bin_fill
        |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,
    "q97_source_overlap" ->
      s"""WITH $shingleCte,
         |sg AS (SELECT DISTINCT d.source, sh.sh FROM sh JOIN documents d USING (doc_id)),
         |sz AS (SELECT source, count(*) AS n FROM sg GROUP BY 1),
         |i AS (SELECT x.source AS src_a, y.source AS src_b, count(*) AS inter
         |  FROM sg x JOIN sg y ON x.sh = y.sh AND x.source < y.source GROUP BY 1,2)
         |SELECT src_a, src_b, CAST(inter AS BIGINT) AS inter,
         |  round(CAST(inter AS DOUBLE) / CAST(za.n + zb.n - inter AS DOUBLE), 6) AS jac
         |FROM i JOIN sz za ON src_a = za.source JOIN sz zb ON src_b = zb.source
         |ORDER BY 1, 2""".stripMargin,
    "q90_decontaminate" ->
      """WITH w AS (SELECT doc_id, source, list_filter(regexp_split_to_array(text,'\s+'), t -> t <> '') AS w FROM documents),
        |wf AS (SELECT * FROM w WHERE len(w) >= 5),
        |g AS (SELECT doc_id, source, unnest([array_to_string(w[i+1:i+5], ' ') for i in range(len(w)-4)]) AS g FROM wf),
        |ev AS (SELECT DISTINCT g FROM g WHERE doc_id % 17 = 0),
        |cont AS (SELECT DISTINCT doc_id FROM g WHERE doc_id % 17 <> 0 AND g IN (SELECT g FROM ev))
        |SELECT source, CAST(count(*) AS BIGINT) AS n_train,
        |  CAST(sum(CASE WHEN doc_id IN (SELECT doc_id FROM cont) THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated
        |FROM wf WHERE doc_id % 17 <> 0 GROUP BY 1 ORDER BY 1""".stripMargin,
    "q91_repetition" ->
      """WITH w AS (SELECT doc_id, source, list_filter(regexp_split_to_array(text,'\s+'), t -> t <> '') AS w FROM documents),
        |wf AS (SELECT * FROM w WHERE len(w) >= 3),
        |g AS (SELECT doc_id, source, unnest([w[i+1]||' '||w[i+2] for i in range(len(w)-1)]) AS g FROM wf),
        |pc AS (SELECT doc_id, source, g, count(*) AS c FROM g GROUP BY 1,2,3),
        |pd AS (SELECT doc_id, source, max(c) AS top2, sum(c) AS n_pairs FROM pc GROUP BY 1,2),
        |ws AS (SELECT doc_id, len(w) AS nw, len(list_distinct(w)) AS nd FROM wf)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(nw) AS BIGINT) AS tot_words,
        |  CAST(sum(nd) AS BIGINT) AS tot_distinct,
        |  round(1.0 - CAST(sum(nd) AS DOUBLE)/CAST(sum(nw) AS DOUBLE), 4) AS dup_word_frac,
        |  round(CAST(sum(top2) AS DOUBLE)/CAST(sum(n_pairs) AS DOUBLE), 4) AS top2_frac
        |FROM pd JOIN ws USING (doc_id) GROUP BY 1 ORDER BY 1""".stripMargin,
    "q92_pii_scan" ->
      """WITH a AS (SELECT doc_id, source, text ||
        |  CASE WHEN doc_id % 7 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now' ELSE '' END ||
        |  CASE WHEN doc_id % 11 = 0 THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END AS aug
        | FROM documents),
        |b AS (SELECT source,
        |  len(regexp_extract_all(aug, '[a-z0-9._]+@[a-z0-9.-]+[.][a-z][a-z]+')) AS n_emails,
        |  len(regexp_extract_all(aug, '5[0-9][0-9]-[0-9][0-9][0-9][0-9]')) AS n_phones,
        |  length(aug) - length(regexp_replace(regexp_replace(aug,
        |    '[a-z0-9._]+@[a-z0-9.-]+[.][a-z][a-z]+', '<EMAIL>', 'g'),
        |    '5[0-9][0-9]-[0-9][0-9][0-9][0-9]', '<PHONE>', 'g')) AS delta
        | FROM a)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN n_emails > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_email_docs,
        |  CAST(sum(CASE WHEN n_phones > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_phone_docs,
        |  CAST(sum(n_emails) AS BIGINT) AS tot_emails,
        |  CAST(sum(n_phones) AS BIGINT) AS tot_phones,
        |  CAST(sum(delta) AS BIGINT) AS redacted_delta
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
    "q88_llm_pipeline" ->
      s"""WITH $shingleCte,
         |f AS (SELECT doc_id, text, n_chars,
         |  CAST(len(w) AS BIGINT) AS nw,
         |  CAST(len(list_filter(w, t -> t IN ('the','a','of','and','to','is','in'))) AS BIGINT) AS n_stop,
         |  CAST(len(regexp_extract_all(text, '[^a-z0-9 ]')) AS BIGINT) AS n_punct,
         |  CAST(list_aggregate([CAST(length(t) AS BIGINT) for t in w], 'sum') AS BIGINT) AS sum_wl
         | FROM wf),
         |scored AS (SELECT doc_id, nw, md5(text) AS fp,
         |  0.4 * least(CAST(nw AS DOUBLE) / 100.0, 1.0)
         |  + 0.3 * (1.0 - CAST(n_stop AS DOUBLE) / CAST(nw AS DOUBLE))
         |  + 0.2 * (1.0 - least(CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE), 1.0))
         |  + 0.1 * least(CAST(sum_wl AS DOUBLE) / CAST(nw AS DOUBLE) / 10.0, 1.0) AS score
         | FROM f),
         |flt AS (SELECT * FROM scored WHERE score >= 0.4),
         |keepers AS (SELECT fp, min(doc_id) AS doc_id FROM flt GROUP BY fp),
         |exact AS (SELECT flt.* FROM flt JOIN keepers USING (fp, doc_id)),
         |losers AS (SELECT DISTINCT b_id AS doc_id FROM jac WHERE jac >= 0.9),
         |clean AS (SELECT exact.*,
         |   ((doc_id*2654435761+7)%4294967296)%1000 AS b
         |  FROM exact WHERE doc_id NOT IN (SELECT doc_id FROM losers)),
         |sp AS (SELECT *, CASE WHEN b < 900 THEN 'train'
         |                      WHEN b < 950 THEN 'val' ELSE 'test' END AS split FROM clean)
         |SELECT split, count(*) AS n_docs, CAST(sum(nw) AS BIGINT) AS sum_tokens,
         |  round(avg(score), 4) AS avg_score
         |FROM sp GROUP BY 1 ORDER BY 1""".stripMargin,
    "q29_lang_id" ->
      """WITH w AS (SELECT doc_id, lang, list_filter(regexp_split_to_array(text,'\s+'), t -> t <> '') AS w FROM documents),
        |wf AS (SELECT * FROM w WHERE len(w) >= 3),
        |sc AS (SELECT lang,
        |  len(list_filter(w, t -> t IN ('the','a','of','and','to'))) AS s_en,
        |  len(list_filter(w, t -> t IN ('el','la','de','los','y'))) AS s_es,
        |  len(list_filter(w, t -> t IN ('der','die','das','und','ist'))) AS s_de,
        |  len(list_filter(w, t -> t IN ('le','les','des','et','est'))) AS s_fr
        | FROM wf),
        |p AS (SELECT lang,
        |  CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
        |       WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
        |       WHEN s_de >= s_fr THEN 'de' ELSE 'fr' END AS pred
        | FROM sc)
        |SELECT lang, pred, count(*) AS n FROM p GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q30_quality_score" ->
      """WITH w AS (SELECT doc_id, source, n_chars, text, list_filter(regexp_split_to_array(text,'\s+'), t -> t <> '') AS w FROM documents),
        |wf AS (SELECT * FROM w WHERE len(w) >= 3),
        |f AS (SELECT source,
        |  CAST(len(w) AS BIGINT) AS nw,
        |  CAST(len(list_filter(w, t -> t IN ('the','a','of','and','to','is','in'))) AS BIGINT) AS n_stop,
        |  CAST(len(regexp_extract_all(text, '[^a-z0-9 ]')) AS BIGINT) AS n_punct,
        |  CAST(list_aggregate([CAST(length(t) AS BIGINT) for t in w], 'sum') AS BIGINT) AS sum_wl,
        |  n_chars
        | FROM wf),
        |sc AS (SELECT source,
        |  0.4 * least(CAST(nw AS DOUBLE) / 100.0, 1.0)
        |  + 0.3 * (1.0 - CAST(n_stop AS DOUBLE) / CAST(nw AS DOUBLE))
        |  + 0.2 * (1.0 - least(CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE), 1.0))
        |  + 0.1 * least(CAST(sum_wl AS DOUBLE) / CAST(nw AS DOUBLE) / 10.0, 1.0) AS score
        | FROM f)
        |SELECT source, CAST(floor(score * 10) AS BIGINT) AS bucket, count(*) AS n
        |FROM sc GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q31_token_count" ->
      """WITH w AS (SELECT doc_id, source, text, list_filter(regexp_split_to_array(text,'\s+'), t -> t <> '') AS w FROM documents),
        |wf AS (SELECT * FROM w WHERE len(w) >= 3),
        |f AS (SELECT source, CAST(len(w) AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS bpe_tokens
        | FROM wf)
        |SELECT source, count(*) AS n_docs,
        | CAST(sum(ws_tokens) AS BIGINT) AS sum_ws,
        | CAST(sum(bpe_tokens) AS BIGINT) AS sum_bpe,
        | round(avg(CAST(bpe_tokens AS DOUBLE)), 4) AS avg_bpe
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
