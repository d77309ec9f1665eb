package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Classifier-eval tier of the text pipeline (q222 operating points,
  * q239 exact Mann-Whitney AUC, q244 reliability bins + ECE/MCE) —
  * split out of the former monolithic TextOps in round 8; bodies
  * unchanged. */
trait TextEvalQueries extends Serializable { self: TextSharedCore =>
  // ---------------------------------------------------------------------
  // q222 — quality-classifier threshold sweep (operating-point table)
  // ---------------------------------------------------------------------

  /** The tuning table behind every "score > τ" curation gate: confusion
    * counts and precision/recall at a fixed grid of thresholds, with the
    * curated proxy source (`src0`) as pseudo-positive label and q108's
    * hashed linear model as the classifier. Scores and confusion counts
    * are exact integers; precision/recall are half-up integer micro
    * quotients (q149 rule), so the whole table is float-free.
    *
    * Scale shape: one per-row scoring pass (zero shuffle), a broadcast of
    * the 9-row threshold grid, and one rollup keyed by threshold — the
    * corpus is scanned once regardless of grid size. */
  private def q222(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val grid = Seq(-30000L, -10000L, -3000L, -1000L, 0L, 1000L, 3000L, 10000L, 30000L)
    // the source is a single parquet split but hashedScoreRaw is ~2 md5s
    // per word per row — spread the scoring across every core before the
    // per-row work (the q50/q111 rule; A/B isolated warm min at sf0.1/32:
    // q222 2.68 -> 0.58 s)
    val scored = graft.Spread.ifNarrow(s, words(s, dir))
      .withColumn("raw", hashedScoreRaw(col("w")))
      .withColumn("pos", col("source") === "src0")
      .select("raw", "pos")
    scored.crossJoin(broadcast(grid.toDF("thr")))
      .groupBy("thr")
      .agg(
        sum(when(col("pos") && col("raw") > col("thr"), 1L).otherwise(0L)).as("tp"),
        sum(when(!col("pos") && col("raw") > col("thr"), 1L).otherwise(0L)).as("fp"),
        sum(when(col("pos") && col("raw") <= col("thr"), 1L).otherwise(0L)).as("fn"),
        sum(when(!col("pos") && col("raw") <= col("thr"), 1L).otherwise(0L)).as("tn"))
      .withColumn("prec", expr(
        "case when tp + fp = 0 then cast(null as double) " +
          "else cast((2 * tp * 1000000 + (tp + fp)) div (2 * (tp + fp)) as double) / 1000000.0 end"))
      .withColumn("recall", expr(
        "cast((2 * tp * 1000000 + (tp + fn)) div (2 * (tp + fn)) as double) / 1000000.0"))
      .orderBy("thr")
  }

  // q239 — classifier AUC (Mann–Whitney rank-sum, exact integer)

  /** ROC-AUC of the stopword-density score as an en/non-en classifier,
    * computed exactly via the Mann–Whitney identity AUC = (R⁺ −
    * n⁺(n⁺+1)/2)/(n⁺n⁻) with MIDRANKS for ties (scores are ppm
    * integers, so ties are the norm, not the edge case). All arithmetic
    * stays integral — 2·midrank = c_lo + c_hi + 1 per tie group, and the
    * final AUC is emitted ×10⁶ under floor division (numerator provably
    * ≥ 0, so Spark DIV and DuckDB // agree) — the q174 cross-engine
    * float-free rule. Completes the q222 threshold sweep: q222 gives
    * operating points, q239 the threshold-free ranking quality.
    *
    * Scale shape: one groupBy(score) shuffle; the rank window runs over
    * the AGGREGATED score table (≤ 10⁶ ppm values at any corpus size —
    * data-size-independent), not the corpus. Exact-integer envelope:
    * r2_pos ≤ 2N² needs N ≲ 2·10⁹ eval rows before Long overflow — far
    * past any labeled eval set; past that, stratify. */
  private def q239(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = words(s, dir)
      .withColumn("nw", size(col("w")).cast("long"))
      .withColumn("n_stop", expr(
        "size(filter(w, t -> t IN ('the','a','of','and','to','is','in')))").cast("long"))
      .withColumn("score", expr("CAST((n_stop * 1000000) DIV nw AS BIGINT)"))
      .withColumn("pos", when(col("lang") === "en", 1L).otherwise(0L))
    val grp = d.groupBy("score")
      .agg(count(lit(1)).as("n"), sum("pos").as("np"))
    val w = Window.orderBy("score")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grp.withColumn("c_hi", sum("n").over(w))
      .withColumn("r2", col("np") * (col("c_hi") - col("n") + col("c_hi") + 1L))
      .agg(sum("np").as("n_pos"), sum(col("n") - col("np")).as("n_neg"),
        sum("r2").as("r2_pos"))
      .withColumn("auc_ppm", expr(
        "CAST(((r2_pos - n_pos * (n_pos + 1)) * 1000000) DIV (2 * n_pos * n_neg) AS BIGINT)"))
  }

  // q244 — classifier calibration audit (reliability bins + ECE/MCE)

  /** Reliability diagram + Expected/Maximum Calibration Error of the q108
    * hashed classifier against the q222 pseudo-label — the third leg of
    * the eval tier (q222 operating points, q239 ranking quality, q244
    * probability quality): a curation gate that thresholds on a score
    * TRUSTS its magnitude, and ECE is the number that says whether it
    * should. Confidence is a deterministic integer transform of the raw
    * millis score (500000 + 10·raw, clamped to [0, 999999] ppm — the
    * monotone calibration-map stand-in; a production sigmoid would be
    * transcendental and cross-engine fragile), binned into ten
    * equal-width bins by ppm DIV 100000. Per bin: half-up-ppm mean
    * confidence and accuracy; ECE = Σ n_b·|acc−conf| / N and MCE = max
    * gap, all integer with non-negative numerators so Spark DIV ≡
    * DuckDB //.
    *
    * Scale shape: one per-row scoring pass (zero shuffle), a rollup
    * keyed by the ≤10-value bin, and a 1-row broadcast for the corpus-
    * wide ECE/MCE attach — corpus scanned exactly once. */
  /** Calibration core over (conf: ppm in [0, 999999], p: 0/1) rows:
    * ten equal-width reliability bins (ppm DIV 100000), half-up-ppm mean
    * confidence and accuracy per bin, and the corpus-wide ECE/MCE
    * attached via a 1-row broadcast. All arithmetic is integer with
    * non-negative numerators (Spark DIV ≡ DuckDB //); the corpus is
    * scanned exactly once — the only "join" is the ≤10-row bins table
    * crossed with the 1-row total. */
  private[graft] def calibrationEce(scored: DataFrame): DataFrame = {
    // The ≤10-row bin table feeds BOTH the output and the ECE/MCE total;
    // without the localCheckpoint the physical plan duplicates the bin
    // subplan and the corpus is scanned twice — checkpointing the tiny
    // rollup makes "corpus scanned exactly once" literally true.
    val bins = scored
      .groupBy(expr("conf DIV 100000").as("bin"))
      .agg(count(lit(1)).as("n"), sum("p").as("n_pos"),
        sum("conf").as("sum_conf"))
      .withColumn("conf_ppm", expr("(2 * sum_conf + n) DIV (2 * n)"))
      .withColumn("acc_ppm", expr("(2 * n_pos * 1000000 + n) DIV (2 * n)"))
      .withColumn("gap_ppm", expr("abs(acc_ppm - conf_ppm)"))
      .drop("sum_conf")
      .localCheckpoint()
    val tot = bins.agg(
      expr("CAST((2 * sum(n * gap_ppm) + sum(n)) DIV (2 * sum(n)) AS BIGINT)").as("ece_ppm"),
      max("gap_ppm").as("mce_ppm"))
    bins.crossJoin(broadcast(tot)).orderBy("bin")
  }

  private def q244(s: SparkSession, dir: String): DataFrame =
    calibrationEce(graft.Spread.ifNarrow(s, words(s, dir)) // q222's scoring spread
      .withColumn("raw", hashedScoreRaw(col("w")))
      .withColumn("p", when(col("source") === "src0", 1L).otherwise(0L))
      .withColumn("conf", expr(
        "least(CAST(999999 AS BIGINT), greatest(CAST(0 AS BIGINT), 500000 + raw * 10))")))

  private[operators] val evalQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q244_calibration_ece" -> (q244 _),
    "q239_classifier_auc" -> (q239 _),
    "q222_classifier_sweep" -> (q222 _)
  )

  private[operators] val evalOracles: Map[String, String] = Map(
    // identical integer score (q222's gram weights), clamp, DIV-100000
    // binning, half-up ppm means, floor division on non-negative
    // numerators throughout
    "q244_calibration_ece" ->
      """WITH wf AS (SELECT source, list_filter(regexp_split_to_array(text,'\s+'), t -> t <> '') AS w
        |  FROM documents
        |  WHERE len(list_filter(regexp_split_to_array(text,'\s+'), t -> t <> '')) >= 3),
        |g AS (SELECT source,
        |    list_concat(w, [w[i+1] || ' ' || w[i+2] for i in range(len(w)-1)]) AS grams FROM wf),
        |r AS (SELECT source = 'src0' AS pos,
        |    CAST(list_aggregate(
        |      [ (CAST(('0x'||substr(md5(gr),1,8)) AS BIGINT) % 65536 * 2654435761 % 2001) - 1000
        |        for gr in grams], 'sum') AS BIGINT) AS raw
        |  FROM g),
        |c AS (SELECT least(999999, greatest(0, 500000 + raw * 10)) AS conf,
        |    CASE WHEN pos THEN 1 ELSE 0 END AS p FROM r),
        |b AS (SELECT conf // 100000 AS bin, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(p) AS BIGINT) AS n_pos, CAST(sum(conf) AS BIGINT) AS sum_conf
        |  FROM c GROUP BY 1),
        |e AS (SELECT bin, n, n_pos,
        |    (2*sum_conf + n) // (2*n) AS conf_ppm,
        |    (2*n_pos*1000000 + n) // (2*n) AS acc_ppm FROM b),
        |t AS (SELECT sum(n) AS nn, sum(n * abs(acc_ppm - conf_ppm)) AS sg,
        |    max(abs(acc_ppm - conf_ppm)) AS mce FROM e)
        |SELECT CAST(bin AS BIGINT) AS bin, n, n_pos,
        |  CAST(conf_ppm AS BIGINT) AS conf_ppm, CAST(acc_ppm AS BIGINT) AS acc_ppm,
        |  CAST(abs(acc_ppm - conf_ppm) AS BIGINT) AS gap_ppm,
        |  CAST((2*sg + nn) // (2*nn) AS BIGINT) AS ece_ppm,
        |  CAST(mce AS BIGINT) AS mce_ppm
        |FROM e, t ORDER BY bin""".stripMargin,
    // midrank identity: 2·midrank over a tie group = c_lo + c_hi + 1;
    // numerator ≥ 0 so floor (//) and truncating (DIV) division agree
    "q239_classifier_auc" ->
      """WITH w AS (SELECT lang, list_filter(regexp_split_to_array(text,'\s+'), t -> t <> '') AS w FROM documents),
        |wf AS (SELECT * FROM w WHERE len(w) >= 3),
        |f AS (SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
        |   (CAST(len(list_filter(w, t -> t IN ('the','a','of','and','to','is','in'))) AS BIGINT) * 1000000)
        |     // CAST(len(w) AS BIGINT) AS score
        | FROM wf),
        |g AS (SELECT score, count(*) AS n, sum(pos) AS np FROM f GROUP BY score),
        |r AS (SELECT score, n, np,
        |   sum(n) OVER (ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c_hi
        | FROM g),
        |t AS (SELECT sum(np) AS n_pos, sum(n - np) AS n_neg,
        |   sum(np * ((c_hi - n) + c_hi + 1)) AS r2_pos FROM r)
        |SELECT CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
        |  CAST(r2_pos AS BIGINT) AS r2_pos,
        |  CAST(((r2_pos - n_pos*(n_pos+1)) * 1000000) // (2*n_pos*n_neg) AS BIGINT) AS auc_ppm
        |FROM t""".stripMargin,
    "q222_classifier_sweep" ->
      """WITH wf AS (SELECT source, list_filter(regexp_split_to_array(text,'\s+'), t -> t <> '') AS w
        |  FROM documents
        |  WHERE len(list_filter(regexp_split_to_array(text,'\s+'), t -> t <> '')) >= 3),
        |g AS (SELECT source,
        |    list_concat(w, [w[i+1] || ' ' || w[i+2] for i in range(len(w)-1)]) AS grams FROM wf),
        |r AS (SELECT source = 'src0' AS pos,
        |    CAST(list_aggregate(
        |      [ (CAST(('0x'||substr(md5(gr),1,8)) AS BIGINT) % 65536 * 2654435761 % 2001) - 1000
        |        for gr in grams], 'sum') AS BIGINT) AS raw
        |  FROM g),
        |t AS (SELECT CAST(unnest([-30000,-10000,-3000,-1000,0,1000,3000,10000,30000]) AS BIGINT) AS thr),
        |c AS (SELECT thr,
        |  CAST(sum(CASE WHEN pos AND raw > thr THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |  CAST(sum(CASE WHEN NOT pos AND raw > thr THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        |  CAST(sum(CASE WHEN pos AND raw <= thr THEN 1 ELSE 0 END) AS BIGINT) AS fn,
        |  CAST(sum(CASE WHEN NOT pos AND raw <= thr THEN 1 ELSE 0 END) AS BIGINT) AS tn
        | FROM r CROSS JOIN t GROUP BY 1)
        |SELECT thr, tp, fp, fn, tn,
        |  CASE WHEN tp + fp = 0 THEN NULL
        |       ELSE CAST((2*tp*1000000 + (tp+fp)) // (2*(tp+fp)) AS DOUBLE) / 1000000.0 END AS prec,
        |  CAST((2*tp*1000000 + (tp+fn)) // (2*(tp+fn)) AS DOUBLE) / 1000000.0 AS recall
        |FROM c ORDER BY thr""".stripMargin
  )
}
