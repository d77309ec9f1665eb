package graft

import java.io.File
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Ranks, TextOps}
import graft.sinks.Tar

/** The LLM-curation flagship, END-TO-END at sf0.1 — the text-side analog
  * of MriVolumeScaleSpec's composition proof: the individually-gated
  * stages (normalize q230, quality gates q218, exact dedup q22, near-dup
  * prune q26/q88, n-gram decontamination q90, shard planning q228, tar
  * shard sink q204) chained into the one pipeline a production curation
  * stack actually runs, with the hand-offs asserted — funnel monotone and
  * non-vacuous at every stage, the written shards byte-faithful to the
  * survivor set, and the bin-packing plan measurably tighter than the
  * sink's own hash sharding.
  *
  * Composition hazards this catches that the per-stage gates cannot:
  * a stage reordering that silently changes survivor sets (dedup before
  * gating keeps different representatives), a sink that re-partitions
  * away the planner's assignment, and any all-pairs plan sneaking into
  * the composed lineage (asserted on the final physical plan, where every
  * upstream stage is still visible).
  */
class CurationPipelineScaleSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("documents sf0.1: normalize → gates → exact dedup → near-dup prune → " +
      "decontaminate → binpack plan → tar shards, composed", SlowTag) {
    val t0 = System.nanoTime()
    val dir = "/root/testdata/sf0.1"
    graft.functions.expressions.NfcNormalize.register(spark)

    // Stage 1 — normalization pass. The corpus is pure ASCII, so this
    // must be a BYTE-IDENTITY here (which is itself the fast-path proof:
    // any normalizer that mangles ASCII would corrupt every downstream
    // hash); the stage stays in the pipeline because on a real crawl it
    // is load-bearing (q230 proves the collapse on non-ASCII spellings).
    val normed = TextOps.words(spark, dir)
      .withColumn("norm", trim(regexp_replace(regexp_replace(
        expr("graft_nfc(text)"), "[\\x00-\\x1f]", ""), " +", " ")))
    val nChangedByNorm = normed.filter(col("norm") =!= col("text")).count()
    assert(nChangedByNorm == 0L, "ASCII corpus must be NFC-invariant")
    val nAll = normed.count()

    // Stage 2 — Gopher quality gates (the q218 rule set), survivors only.
    // r1 (the >= 50-word floor) is deliberately left to q218's own oracle:
    // the synthetic corpus is a SCALE MODEL with short docs (~20-80
    // words), so the absolute floor would cut 5000 -> 62 and starve every
    // downstream stage of data to exercise; the four RATIO rules r2-r5
    // keep their production thresholds (5000 -> ~850 here).
    val gatedDf = TextOps.gopherGates(normed)
      .filter(col("r2") && col("r3") && col("r4") && col("r5"))
      .select("doc_id", "source", "n_chars", "norm")
    val nGated = gatedDf.count()

    // Stage 3 — exact dedup on the NORMALIZED text (keep min doc_id).
    val keepers = gatedDf.withColumn("fp", md5(col("norm")))
      .groupBy("fp").agg(min("doc_id").as("doc_id"))
    val exact = gatedDf.join(keepers, Seq("doc_id"), "left_semi")
    val nExact = exact.count()

    // Stage 4 — near-dup prune: drop the higher doc_id of every verified
    // jaccard >= 0.9 pair (the q26/q88 rule, from the shared candidate
    // pipeline — LSH candidates only, never all-pairs).
    val losers = TextOps.jaccard(spark, dir).filter(col("jac") >= 0.9)
      .select(col("b_id").as("doc_id")).distinct()
    val nearDeduped = exact.join(losers, Seq("doc_id"), "left_anti")
    val nNear = nearDeduped.count()

    // Stage 5 — n-gram decontamination: scrub docs sharing any 8-gram
    // with a "benchmark" eval set, eval side broadcast, corpus never
    // shuffled (the q90 shape). The eval set is the 10 lowest-id
    // survivors with >= 8 words — drawn FROM the surviving distribution
    // so the stage provably fires (each eval doc at minimum self-matches)
    // while remaining fully deterministic.
    val evalIds = nearDeduped
      .filter(size(array_remove(split(col("norm"), "\\s+"), "")) >= 8)
      .select("doc_id").orderBy("doc_id").limit(10)
    val evalGrams = nearDeduped.join(evalIds, Seq("doc_id"), "left_semi")
      .withColumn("w", array_remove(split(col("norm"), "\\s+"), ""))
      .select(explode(expr(
        "transform(sequence(0, size(w)-8), i -> concat_ws(' '," +
          " w[i], w[i+1], w[i+2], w[i+3], w[i+4], w[i+5], w[i+6], w[i+7]))")).as("g"))
      .distinct()
    val docGrams = nearDeduped
      .withColumn("w", array_remove(split(col("norm"), "\\s+"), ""))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(w)-8), i -> concat_ws(' '," +
          " w[i], w[i+1], w[i+2], w[i+3], w[i+4], w[i+5], w[i+6], w[i+7]))")).as("g"))
    val contaminated = docGrams.join(broadcast(evalGrams), Seq("g"))
      .select("doc_id").distinct()
    val clean = nearDeduped.join(contaminated, Seq("doc_id"), "left_anti")
    val nClean = clean.count()

    // Funnel: monotone, non-vacuous at every stage (each stage must both
    // drop something somewhere in the pipeline and keep a majority).
    assert(nAll >= nGated && nGated >= nExact && nExact >= nNear && nNear >= nClean,
      s"funnel not monotone: $nAll -> $nGated -> $nExact -> $nNear -> $nClean")
    assert(nClean > 0 && nClean < nAll, s"vacuous funnel: $nAll -> $nClean")
    assert(nNear < nExact, "near-dup prune dropped nothing — stage is vacuous")
    assert(nClean < nNear, "decontamination dropped nothing — stage is vacuous")

    // Composed-plan audit: with every stage visible in one lineage, still
    // nothing all-pairs and no single-partition window.
    val composed = clean.queryExecution.executedPlan.toString()
    assert(!composed.contains("CartesianProduct"),
      s"composed pipeline contains a cartesian join:\n$composed")
    assert(!composed.contains("Window"),
      s"composed pipeline contains a window:\n$composed")

    // Stage 6 — shard plan: serpentine LPT over (n_chars desc, doc_id)
    // (the q228 rule) for K=16 shards.
    val k = 16
    val ranked = Ranks.seqIdBy(
      clean.select(col("doc_id"), col("n_chars"), col("norm")), "rn",
      col("n_chars").desc, col("doc_id").asc)
    val planned = ranked
      .withColumn("g", expr("CAST((rn - 1) DIV 16 AS BIGINT)"))
      .withColumn("p", expr("CAST((rn - 1) % 16 AS BIGINT)"))
      .withColumn("shard_id",
        when(col("g") % 2 === 0, col("p")).otherwise(lit(15L) - col("p")))
    val plannedSizes = planned.groupBy("shard_id")
      .agg(sum("n_chars").cast("long").as("bytes"))
      .collect().map(r => r.getLong(1))
    assert(plannedSizes.length == k)

    // Stage 7 — write the survivors as WebDataset-style tar shards.
    val out = Scratch.fresh("curation_e2e_")
    Tar.writeShards(
      planned.select(concat(lit("doc"), lpad(col("doc_id").cast("string"), 8, "0")).as("key"),
        lit("txt").as("ext"), col("norm").cast("binary").as("value")),
      out, numShards = k)

    // Read-back fidelity: every survivor present exactly once,
    // byte-identical text (md5-set equality, order-free).
    val back = Tar.readShards(spark, out)
    assert(back.count() == nClean, "shard member count != survivor count")
    val sigPipe = clean.agg(sum(expr(
      "CAST(conv(substring(md5(norm), 1, 12), 16, 10) AS BIGINT)")))
      .collect()(0).getLong(0)
    val sigBack = back.agg(sum(expr(
      "CAST(conv(substring(md5(CAST(value AS STRING)), 1, 12), 16, 10) AS BIGINT)")))
      .collect()(0).getLong(0)
    assert(sigPipe == sigBack, "shard payload md5-sum != survivor md5-sum")

    // The planner earns its keep: serpentine spread must beat the sink's
    // own hash sharding (deterministic — same corpus, same hash).
    val hashSizes = back
      .withColumn("bytes", length(col("value")).cast("long"))
      .groupBy("shard").agg(sum("bytes").as("bytes"))
      .collect().map(_.getLong(1))
    val plannedSpread = plannedSizes.max - plannedSizes.min
    val hashSpread = hashSizes.max - hashSizes.min
    info(f"funnel: $nAll -> gated $nGated -> exact $nExact -> near $nNear -> clean $nClean")
    info(f"planned spread $plannedSpread bytes vs hash spread $hashSpread bytes over $k shards")
    assert(plannedSpread < hashSpread,
      s"serpentine plan ($plannedSpread) must beat hash sharding ($hashSpread)")

    info(f"end-to-end ${(System.nanoTime() - t0) / 1e9}%.1f s at sf0.1")
    def rm(f: File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(); ()
    }
    rm(new File(out))
  }
}
