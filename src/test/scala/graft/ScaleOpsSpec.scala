package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ScaleOps

/** Round-4 scale tier: Bloom semi-join reduction guarantees (no false
  * negatives, real pruning), CDC chunking shift-invariance, and the
  * storage-roundtrip / outlier-gate surfaces running non-vacuously.
  */
class ScaleOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("bloom prune: no false negatives, real pruning, bounded false positives") {
    import spark.implicits._
    val mBits = 1 << 16
    val keys = Tables(spark, dir, "customer")
      .filter(col("c_acctbal") > 9000).select("c_custkey")
    val bf = ScaleOps.bloomBits(keys, "c_custkey", mBits)
    assert(bf.length == mBits / 64)
    val orders = Tables(spark, dir, "orders")
    val pruned = ScaleOps.bloomPrune(orders, "o_custkey", bf, mBits)

    val trueMatches = orders.join(keys,
      orders("o_custkey") === keys("c_custkey"), "left_semi").count()
    val prunedN = pruned.count()
    val total = orders.count()
    // a Bloom filter can only over-approximate the member set
    assert(prunedN >= trueMatches, "bloom dropped a true match (false negative)")
    // and at this key density it must actually prune (fpr ~0.02% at k=3)
    assert(prunedN < total, "bloom pruned nothing")
    assert(prunedN <= trueMatches + math.max(10L, total / 100),
      s"false-positive rate implausibly high: $prunedN candidates for $trueMatches matches")
    // every member key must test positive — directly, not via orders
    val misses = ScaleOps.bloomPrune(keys.select(col("c_custkey").as("k")), "k", bf, mBits)
    assert(misses.count() == keys.count(), "a member key failed its own bloom test")
  }

  test("CDC chunking is shift-invariant: shared paragraph chunks identically at different offsets") {
    import spark.implicits._
    // the same 200-char "paragraph" embedded after different-length prefixes;
    // deterministic pseudo-random chars so boundaries appear (~1/16 rate)
    val shared = (0 until 200).map(i => ('a' + (i * 7 + 3) % 26).toChar).mkString
    val prefixA = (0 until 37).map(i => ('a' + (i * 11 + 5) % 26).toChar).mkString
    val prefixB = (0 until 101).map(i => ('a' + (i * 13 + 1) % 26).toChar).mkString
    val docs = Seq((1L, prefixA + shared), (2L, prefixB + shared))
      .toDF("doc_id", "text")
      .withColumn("slen", length(col("text")).cast("long"))
    val chunks = ScaleOps.withChunkHashes(docs)
      .select("doc_id", "h").collect()
      .groupBy(_.getLong(0)).map { case (k, rs) => k -> rs.map(_.getString(1)).toSet }
    val common = chunks(1L).intersect(chunks(2L))
    // interior chunks of the shared paragraph must collide despite the
    // offset shift — the property fixed-size blocking does NOT have
    assert(common.nonEmpty,
      s"no shared chunks across shifted copies (doc1 ${chunks(1L).size}, doc2 ${chunks(2L).size})")
    // sanity: chunking covers the text (chunk count > 1 per doc at 1/16 cut rate)
    assert(chunks(1L).size > 1 && chunks(2L).size > 1)
  }

  test("weighted sample is content-deterministic and weight-biased") {
    val a = SparkEntry.queries("q113_weighted_sample")(spark, dir).collect()
    val b = SparkEntry.queries("q113_weighted_sample")(spark, dir).collect()
    // a rerun (= a retry) draws the identical sample — the rand() failure mode
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    // weight bias: sampled docs skew longer than the corpus average
    val corpusAvg = Tables(spark, dir, "documents")
      .agg(avg("n_chars")).head().getDouble(0)
    val sampleAvg = a.map(_.getAs[Long]("n_chars")).sum.toDouble / a.length
    assert(sampleAvg > corpusAvg,
      s"weighting had no effect: sample avg $sampleAvg vs corpus $corpusAvg")
  }

  test("funnel stages are monotone and discriminating") {
    val r = SparkEntry.queries("q114_funnel")(spark, dir).head()
    val (nu, nv, nc, np) = (r.getAs[Long]("n_users"), r.getAs[Long]("n_viewed"),
      r.getAs[Long]("n_clicked_after_view"), r.getAs[Long]("n_purchased_after_click"))
    assert(nu >= nv && nv >= nc && nc >= np, s"funnel not monotone: $nu/$nv/$nc/$np")
    assert(nc < nv, "click window does not discriminate")
  }

  test("PQ reconstruction quality clears the floor with real margin; codebooks all used") {
    val a = graft.operators.VectorOps.pqAudit(spark, dir).collect()
    assert(a.nonEmpty)
    val worst = a.map(_.getAs[Double]("cos")).min
    info(f"PQ worst recon cosine: $worst%.4f (declared floor 0.45)")
    // the declared q116 floor must hold with margin, not by luck
    assert(worst >= 0.50, f"PQ floor margin too thin: worst cos $worst%.4f")
    val codes = a.flatMap(_.getAs[scala.collection.Seq[Int]]("codes"))
    assert(codes.min >= 0 && codes.max < 16)
    assert(codes.distinct.length == 16, "some PQ codes never used on sf0.001")
  }

  test("Misra-Gries: bounded size, eviction exercised, guarantee holds under any partitioning") {
    import spark.implicits._
    import org.apache.spark.sql.functions.udaf
    val k = 8
    // 4 hot items at freq 400/2600 ≈ 15.4% each — above the MG guarantee
    // threshold 1/(k+1) = 11.1% with margin; 1000 singleton colds force
    // constant eviction (a fixture with hots BELOW N/(K+1) is legal MG
    // behavior to evict — the guarantee only protects items above it)
    val data = (0 until 4).flatMap(h => Seq.fill(400)(s"hot_$h")) ++
      (0 until 1000).map(i => s"cold_$i")
    val mg = udaf(new graft.functions.MisraGries(k), org.apache.spark.sql.Encoders.STRING)
    for (parts <- Seq(1, 7, 32)) {
      val df = data.toDF("item").repartition(parts)
      val m = df.agg(mg(col("item")).as("sk")).selectExpr("sk.m").head()
        .getAs[Map[String, Long]](0)
      assert(m.size <= k, s"summary exceeded K: ${m.size}")
      // every item above N/(K+1) must survive — the MG guarantee
      (0 until 4).foreach(h => assert(m.contains(s"hot_$h"),
        s"hot_$h evicted at $parts partitions: ${m.keys}"))
      // and eviction genuinely ran (1004 distinct items seen, ≤ 8 kept)
      assert(m.size < 1004)
    }
  }

  test("snapshot diff classifies all four states non-vacuously") {
    val rows = SparkEntry.queries("q118_snapshot_diff")(spark, dir).collect()
    val byStatus = rows.map(r => r.getAs[String]("status") -> r.getAs[Long]("n")).toMap
    assert(byStatus.keySet == Set("added", "removed", "changed", "unchanged"))
    assert(byStatus.values.forall(_ > 0), s"some diff state vacuous: $byStatus")
  }

  test("q110/q112/q115 run non-vacuously on sf0.001") {
    val evo = SparkEntry.queries("q115_schema_evolution")(spark, dir).head()
    assert(evo.getAs[Long]("n_rows") > 0)
    assert(evo.getAs[Long]("n_lang_null") > 0, "schema merge produced no null-filled rows")
    assert(evo.getAs[Long]("n_langs") > 0, "late-batch columns lost in merge")
    val rt = SparkEntry.queries("q110_storage_roundtrip")(spark, dir).collect()
    assert(rt.map(_.getAs[String]("format")).toSet == Set("orc", "csv"))
    // both formats must agree on every integrity statistic
    assert(rt.map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).distinct.length == 1)
    val out = SparkEntry.queries("q112_robust_outliers")(spark, dir).collect()
    assert(out.nonEmpty)
    val n = out.map(_.getAs[Long]("n")).sum
    val k = out.map(_.getAs[Long]("n_outliers")).sum
    assert(k > 0 && k < n / 10, s"outlier gate vacuous or wild: $k of $n")
  }

  test("q140 time spine: dense grid, zero-filled gaps, totals preserved") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q140_time_spine")(spark, dir).collect()
    val types = rows.map(_.getAs[String]("event_type")).distinct
    val hours = rows.map(_.getAs[java.sql.Timestamp]("hour")).distinct
    assert(rows.length == types.length * hours.length, "grid not dense")
    val filledTotal = rows.map(_.getAs[Long]("n")).sum
    val rawTotal = Tables(spark, dir, "events").count()
    assert(filledTotal == rawTotal, "zero-fill changed the total")
    assert(rows.exists(_.getAs[Boolean]("was_gap")), "no gaps at this sf — vacuous fill")
    rows.filter(_.getAs[Boolean]("was_gap")).foreach(r => assert(r.getAs[Long]("n") == 0L))
  }

  test("q141 DQ report: clean synthetic data passes; a planted orphan is caught") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rows = SparkEntry.queries("q141_dq_report")(spark, dir).collect()
    assert(rows.length == 5)
    rows.foreach(r => assert(r.getAs[Boolean]("pass"),
      s"${r.getString(0)}: ${r.getAs[Long]("n_violations")} violations on clean data"))
    // the FK check machinery must actually catch an orphan
    val orders = Tables(spark, dir, "orders")
      .select("o_orderkey", "o_custkey")
      .union(Seq((-1L, -999999L)).toDF("o_orderkey", "o_custkey"))
    val orphans = orders.join(Tables(spark, dir, "customer"),
      orders("o_custkey") === col("c_custkey"), "left_anti").count()
    assert(orphans == 1L, "planted FK orphan not detected")
  }

  test("q142 rolling peak: bounded by event count, at least 1, and a burst is seen") {
    val rows = SparkEntry.queries("q142_rolling_peak")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, p) = (r.getAs[Long]("n_events"), r.getAs[Long]("peak_hourly"))
      assert(p >= 1 && p <= n, s"user ${r.getLong(0)}: peak $p outside [1, $n]")
    }
    assert(rows.exists(_.getAs[Long]("peak_hourly") > 1), "no user ever had 2 events in an hour")
  }

  test("q136 equi-depth bins: near-equal counts, contiguous non-overlapping ranges") {
    val rows = SparkEntry.queries("q136_equidepth_bins")(spark, dir).collect()
    assert(rows.length == 8)
    val counts = rows.map(_.getAs[Long]("n"))
    val total = counts.sum
    counts.foreach(c => assert(math.abs(c - total / 8.0) <= total * 0.05 + 8,
      s"bin far from equi-depth: $c of $total"))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("hi") <= b.getAs[Double]("lo") + 1e-9,
        "bin ranges overlap or out of order")
    }
  }

  test("q137 regression: per-group OLS matches a driver-side fit") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q137_group_regression")(spark, dir).collect()
    assert(rows.length == 5)
    val raw = Tables(spark, dir, "events")
      .select(col("event_type"), col("event_id").cast("double"), col("value")).collect()
      .groupBy(_.getString(0))
    rows.foreach { r =>
      val pts = raw(r.getString(0)).map(x => (x.getDouble(1), x.getDouble(2)))
      val n = pts.length.toDouble
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum; val sxy = pts.map(p => p._1 * p._2).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      assert(math.abs(r.getAs[Double]("slope") - slope) < 1e-8,
        s"${r.getString(0)}: spark=${r.getAs[Double]("slope")} local=$slope")
      val r2 = r.getAs[Double]("r2")
      assert(r2 >= 0.0 && r2 <= 1.0)
    }
  }

  test("q135 HLL merge: estimate bound holds and batches are all present") {
    val rows = SparkEntry.queries("q135_hll_merge")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_batches") == 4L)
      assert(r.getAs[Boolean]("est_ok"), s"${r.getString(0)}: estimate outside 5%")
      assert(r.getAs[Long]("n_exact") > 0)
    }
  }

  test("q134 MV refresh: merged view is identical to a from-scratch recompute") {
    import org.apache.spark.sql.functions._
    val merged = SparkEntry.queries("q134_mv_refresh")(spark, dir).collect()
    val full = Tables(spark, dir, "orders")
      .select(col("o_custkey"), round(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"), sum("cents").as("sum_cents"))
      .orderBy("o_custkey").collect()
    assert(merged.length == full.length)
    merged.zip(full).foreach { case (m, f) =>
      assert(m.getLong(0) == f.getLong(0) && m.getLong(1) == f.getLong(1) &&
        m.getLong(2) == f.getLong(2), s"merge drift at custkey ${m.getLong(0)}")
    }
  }

  test("q131 inverted index: intersection equals a direct both-terms scan") {
    import org.apache.spark.sql.functions._
    val r = SparkEntry.queries("q131_inverted_index")(spark, dir).collect()(0)
    val direct = Tables(spark, dir, "documents")
      .select(col("doc_id"),
        array_contains(split(lower(col("text")), "\\s+"), "table").as("a"),
        array_contains(split(lower(col("text")), "\\s+"), "window").as("b"))
      .filter(col("a") && col("b"))
      .agg(count(lit(1)).cast("long"), coalesce(sum("doc_id"), lit(0L))).collect()(0)
    assert(r.getAs[Long]("n_hits") == direct.getLong(0))
    assert(r.getAs[Long]("hits_checksum") == direct.getLong(1))
    assert(r.getAs[Long]("n_hits") <= math.min(r.getAs[Long]("df_table"), r.getAs[Long]("df_window")))
  }

  test("q132 SCD2: version counts bounded by events, non-vacuous collapse") {
    val rows = SparkEntry.queries("q132_scd2_history")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (v, e) = (r.getAs[Long]("n_versions"), r.getAs[Long]("n_events"))
      assert(v >= 1 && v <= e, s"user ${r.getLong(0)}: $v versions of $e events")
    }
    // the collapse must actually merge something somewhere
    assert(rows.exists(r => r.getAs[Long]("n_versions") < r.getAs[Long]("n_events")),
      "no user ever repeated an event type — collapse untested")
  }
}
