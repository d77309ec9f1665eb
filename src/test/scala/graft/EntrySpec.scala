package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.KvStore

/** Driver-contract smoke (the t1 analog): entry returns rows, every query
  * name has distinct keys, oracles reference only declared queries. */
class EntrySpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("entry (flagship pipeline) returns per-split counters with rows > 0") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length >= 1 && rows.length <= 3) // train/val/test
    val total = rows.map(_.getAs[Long]("n_slices")).sum
    assert(total == 6 * (6 + 6 + 14), s"expected all oriented slices, got $total")
    assert(rows.map(_.getAs[Long]("n_hr_patches")).sum > 0)
  }

  test("oracleSql keys are a subset of queries keys; names well-formed") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"orphan oracles: ${os.diff(qs)}")
    assert(qs.forall(_.matches("q\\d+[a-z0-9_]*")), "query naming scheme")
    assert(qs.size == SparkEntry.queries.size)
  }

  test("a sample of queries runs non-empty on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    for (name <- Seq("q01_agg_counters", "q23_minhash_sig", "q33_cosine_topk",
      "q42_tiling_grid", "q60_stream_tumbling")) {
      val n = SparkEntry.queries(name)(spark, dir).count()
      assert(n > 0, s"$name empty")
    }
  }

  test("SQ8 quantization contract holds: full code range, half-step bound, cosine ≈ 1") {
    val rows = SparkEntry.queries("q109_sq8_quantize")(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_bound_ok") == r.getAs[Long]("n_vecs"),
        s"reconstruction error exceeded scale/2 in bucket ${r.getAs[Long]("bucket")}")
      assert(r.getAs[Long]("min_code") == 0L && r.getAs[Long]("max_code") == 255L,
        "quantizer does not use the full int8 code range")
      assert(r.getAs[Double]("worst_cos") > 0.999, "quantization destroyed similarity structure")
    }
  }

  test("hashed classifier: exact integer scoring splits the corpus non-vacuously") {
    val rows = SparkEntry.queries("q108_hashed_classifier")(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    val docs = rows.map(_.getAs[Long]("n_docs")).sum
    val pass = rows.map(_.getAs[Long]("n_pass")).sum
    assert(pass > 0 && pass < docs,
      s"classifier is vacuous: $pass of $docs pass — both classes must be exercised")
  }

  test("multimodal ImageIO decode is lossless and K18 area-resize conserves luminance mass") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q84_multimodal_imageio")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pk = r.getAs[Long]("media_id")
      // geometry must mirror Multimodal.pngCorpus: width keys on (pk/8)
      // parity because media ids are all multiples of 8
      val h = 16 + (pk % 3).toInt * 8; val w = 16 + ((pk / 8) % 2).toInt * 8
      assert(r.getAs[Long]("height") == h && r.getAs[Long]("width") == w)
      val sum = Array.tabulate(h * w)(i => ((pk * 31 + i * 7) % 256)).sum
      assert(r.getAs[Long]("sum_lum") == sum, s"media $pk decoded sum mismatch")
      // exact-block area resize preserves total mass bit-for-bit
      assert(r.getAs[Long]("thumb_mass") == sum, s"media $pk resize lost mass")
    }
  }

  test("q143 aHash dedup: planted duplicates collide, singleton majority, hash structure sane") {
    // sf0.01: sf0.001's 13 media hold no two planted seeds with equal dims
    val dir = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("q143_phash_dedup")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getAs[String]("ahash")
      assert(h.length == 64 && h.forall(c => c == '0' || c == '1'), s"malformed hash $h")
    }
    val byId = rows.map(r => r.getAs[Long]("media_id") -> r.getAs[String]("ahash")).toMap
    // planted: media with (pk/8) % 5 == 0 and equal (pk/8) % 6 share pixels
    val planted = byId.keys.filter(pk => (pk / 8) % 5 == 0).groupBy(pk => (pk / 8) % 6)
    planted.values.filter(_.size > 1).foreach { g =>
      val hashes = g.map(byId).toSet
      assert(hashes.size == 1, s"planted duplicate group split across hashes: $g")
    }
    assert(planted.values.exists(_.size > 1), "no planted group present at this sf")
    // unique-seed images must mostly stay singletons (aHash is coarse but not blind)
    val singles = rows.count(_.getAs[Long]("n_same") == 1L)
    assert(singles * 2 > rows.length, s"only $singles of ${rows.length} singletons")
  }

  test("q145 audio fingerprint: planted clip duplicates collide; fingerprints well-formed") {
    val dir = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("q145_audio_fingerprint")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val fp = r.getAs[String]("fp")
      assert(fp.length == 64 && fp.forall(c => c == '0' || c == '1'))
    }
    val byId = rows.map(r => r.getAs[Long]("clip_id") -> r.getAs[String]("fp")).toMap
    val planted = byId.keys.filter(pk => (pk / 16) % 5 == 0).groupBy(pk => (pk / 16) % 6)
    planted.values.filter(_.size > 1).foreach { g =>
      assert(g.map(byId).toSet.size == 1, s"planted clip group split: $g")
    }
    assert(planted.values.exists(_.size > 1), "no planted clip group at this sf")
    val singles = rows.count(_.getAs[Long]("n_same") == 1L)
    assert(singles * 2 > rows.length, s"only $singles of ${rows.length} singleton fingerprints")
  }

  test("multimodal GIF and WAV codecs roundtrip losslessly") {
    val h = 6; val w = 5
    val frames = (0 until 4).map(f => Array.tabulate(h * w)(i => (f * 50 + i * 3) % 256))
    val gif = operators.Multimodal.encodeGifFrames(frames, h, w)
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    val iis = javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(gif))
    reader.setInput(iis)
    assert(reader.getNumImages(true) == 4)
    for (f <- 0 until 4) {
      val img = reader.read(f)
      val got = for (y <- 0 until h; x <- 0 until w) yield img.getRaster.getSample(x, y, 0)
      assert(got == frames(f).toSeq, s"frame $f")
    }
    val samples = Array.tabulate(500)(i => (math.sin(i * 0.1) * 10000).toShort)
    val wav = operators.Multimodal.encodeWavPcm16(samples, 8000)
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val raw = ais.readAllBytes()
    val bb = java.nio.ByteBuffer.wrap(raw).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(raw.length == 1000)
    assert((0 until 500).forall(i => bb.getShort(i * 2) == samples(i)))
  }

  test("bucketed join plan has no exchange on either side") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("bspec_").toString
    Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
      .write.bucketBy(4, "k").sortBy("k").option("path", s"$base/a").saveAsTable("bspec_a")
    Seq((1L, "x"), (2L, "y")).toDF("k", "s")
      .write.bucketBy(4, "k").sortBy("k").option("path", s"$base/b").saveAsTable("bspec_b")
    try {
      // tiny tables broadcast by default (rightly); disable to surface the
      // bucketed sort-merge path this test is about
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("bspec_a").join(spark.table("bspec_b"), Seq("k"))
      val plan = j.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("Bucketed: true"), s"scan must use buckets:\n$plan")
      assert(j.count() == 2)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS bspec_a")
      spark.sql("DROP TABLE IF EXISTS bspec_b")
    }
  }

  test("split queries plan without a single-partition Window (hash-cut)") {
    // A rank-based split funnels every distinct id through ONE task; the
    // hash-cut form must leave no Window operator in the physical plan.
    val dir = "/root/testdata/sf0.001"
    for (name <- Seq("q13_split_by_slice", "q14_split_by_group")) {
      val df = SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString()
      assert(!plan.contains("Window"), s"$name must not use a Window:\n$plan")
      assert(df.count() > 0)
    }
    val entryPlan = SparkEntry.entry(spark).queryExecution.executedPlan.toString()
    assert(!entryPlan.contains("Window"), "flagship must not use a Window")
  }

  test("curation-tier plans keep their scale shape: broadcast eval side, no global windows") {
    val dir = "/root/testdata/sf0.001"
    // q90: the eval-set n-grams must reach the train side as a BROADCAST
    // (shuffling the 100 TB training corpus against them is the failure
    // mode); the semi join must not be sort-merge.
    val p90 = SparkEntry.queries("q90_decontaminate")(spark, dir)
      .queryExecution.executedPlan.toString()
    assert(p90.contains("BroadcastExchange"), s"q90 eval side must broadcast:\n$p90")
    assert(!p90.contains("SortMergeJoin"), s"q90 must not sort-merge:\n$p90")
    // q210 (embedding-space decontamination): same discipline in vector
    // form — the eval set must be a broadcast BUILD side of a nested-loop
    // cross (the intended one-pass corpus scan), and the training corpus
    // must never be exchanged BEFORE that join (its first shuffle is the
    // per-vector aggregate partial AFTER scoring).
    val q210 = SparkEntry.queries("q210_embedding_decontaminate")(spark, dir)
      .queryExecution.executedPlan.toString()
    assert(q210.contains("BroadcastNestedLoopJoin") && q210.contains("BuildRight"),
      s"q210 eval side must be the broadcast build:\n$q210")
    assert(!q210.contains("SortMergeJoin") && !q210.contains("CartesianProduct"),
      s"q210 must not shuffle the corpus into a join:\n$q210")
    // printed tree order: consumers first, then the join, then its two
    // child subtrees — so "no hash exchange after the join marker" pins
    // both the streamed corpus scan and the broadcast build as unshuffled
    val joinSubtree210 = q210.substring(q210.indexOf("BroadcastNestedLoopJoin"))
    assert(!joinSubtree210.contains("Exchange hashpartitioning"),
      s"q210 corpus side must reach the join unshuffled:\n$q210")
    // q94: packing windows by SOURCE — a global (empty-partition-spec)
    // window would funnel the corpus through one task.
    val p94 = SparkEntry.queries("q94_seq_packing")(spark, dir)
      .queryExecution.executedPlan.toString()
    // physical form: `Window [exprs], [partitionCols], [orderCols]` — a
    // partitioned window shows `windowspecdefinition(source#N, ...` while
    // a global one starts the spec directly with the order column
    assert(p94.contains("windowspecdefinition(source#"),
      s"q94's window must partition by source:\n$p94")
    assert(!p94.contains("], [], ["), s"q94 must not use a global window:\n$p94")
    // q93: the totals join must broadcast (one tiny row), never shuffle
    // the per-source aggregate.
    val p93 = SparkEntry.queries("q93_domain_mix")(spark, dir)
      .queryExecution.executedPlan.toString()
    assert(p93.contains("BroadcastNestedLoopJoin") || p93.contains("BroadcastExchange"),
      s"q93 totals must broadcast:\n$p93")
  }

  test("round-5 tier plans keep their scale shape (asserts for the PLANS.md narrative)") {
    val dir = "/root/testdata/sf0.001"
    def plan(name: String): String =
      SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString()
    // q181/q191: the similarity-join family must never fall back to
    // sort-merge — prefix/candidate sides broadcast or hash-join on keys
    for (name <- Seq("q181_prefix_filter_join", "q191_containment_join")) {
      val p = plan(name)
      assert(!p.contains("SortMergeJoin"), s"$name must not sort-merge:\n$p")
    }
    // q189/q192: the iterative graph queries' FINAL plans must stay
    // O(one round) via per-round localCheckpoint (the q70 discipline) —
    // an unrolled loop would embed every round's joins
    for (name <- Seq("q189_shortest_paths", "q192_knn_core")) {
      val p = plan(name)
      val exch = "Exchange".r.findAllIn(p).size
      assert(exch <= 8, s"$name final plan has $exch exchanges — lineage not truncated:\n$p")
    }
    // q199: the MERGE apply must be ONE sort-merge FULL OUTER join on the
    // merge key — the only join strategy that exists at 100 TB for
    // two corpus-sized sides; a broadcast here would OOM, a nested loop
    // would be quadratic
    val p199 = plan("q199_merge_upsert")
    assert("SortMergeJoin".r.findAllIn(p199).size == 1 && p199.contains("FullOuter"),
      s"q199 must apply MERGE as one sort-merge full-outer join:\n$p199")
    // q197: the per-stratum rank must partition by the stratum key, never
    // a global (empty-partition-spec) window
    val p197 = plan("q197_quota_sample")
    assert(p197.contains("windowspecdefinition(source#"),
      s"q197's rank must partition by stratum:\n$p197")
    assert(!p197.contains("], [], ["), s"q197 must not use a global window:\n$p197")
    // q202/q255: the banded kNN candidate join must contain NO
    // cartesian/nested-loop — that is the entire point of the banded
    // form, and Hamming-1 multi-probe must buy recall by adding PROBE
    // ROWS to one leg of the equi-join, never by widening the join.
    // Asserted on the UN-CHECKPOINTED candidate subplan: in the full
    // query everything upstream of the peel's rebase() executes at
    // construction and is a LogicalRDD scan in the final plan, so an
    // assert there would be vacuous (round-10 review find).
    val embDf = Tables(spark, dir, "embeddings")
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding"))
    for (mp <- Seq(false, true)) {
      val pc = operators.VectorOps.knnCandidatePairs(embDf, multiprobe = mp)
        .queryExecution.executedPlan.toString()
      assert(!pc.contains("CartesianProduct") && !pc.contains("BroadcastNestedLoopJoin"),
        s"knnCandidatePairs(mp=$mp) must not contain an all-pairs join:\n$pc")
      assert(pc.contains("Join"), // the equi-join must actually be there
        s"knnCandidatePairs(mp=$mp) lost its candidate join:\n$pc")
    }
    // q256 (and q98's shared plan): the only all-pairs allowed is the
    // K-row centroid broadcast — the expanded candidate join must stay an
    // equi-join on (cid, bk, bv). Same vacuity trap: asserted on the
    // raw (barrier-free, planning-only) variant, where the argmax subtree
    // is textually REPLICATED once per reference (the production form
    // materializes it once via the barrier) — so assert every BNLJ is the
    // broadcast-build cross (the bounded centroid side), not a count of 1.
    for (mp <- Seq(false, true)) {
      val p = operators.VectorOps.semanticDedupRaw(spark, dir, multiprobe = mp)
        .queryExecution.executedPlan.toString()
      assert(!p.contains("CartesianProduct"),
        s"semanticDedup(mp=$mp) must not cartesian:\n$p")
      val bnlj = "BroadcastNestedLoopJoin[^\\n]*".r.findAllIn(p).toSeq
      assert(bnlj.nonEmpty && bnlj.forall(_.contains("BuildRight, Cross")),
        s"semanticDedup(mp=$mp): every BNLJ must be the broadcast centroid build:\n$p")
    }
    // q257 (band-design audit): the whole point is measuring collision
    // mass WITHOUT producing the collisions — one scan, explode(64), two
    // grouped aggs. The ONLY join allowed is the 1-row C(N,2) pair-total
    // scalar broadcast (the lazy-clean replacement for the former
    // construction-time count literals); any equi/merge/cartesian join
    // means the audit degenerated into the pair join it exists to size.
    val p257 = plan("q257_band_entropy")
    assert(!p257.contains("CartesianProduct") && !p257.contains("SortMergeJoin") &&
      !p257.contains("BroadcastHashJoin") && !p257.contains("ShuffledHashJoin"),
      s"q257 must not join rows beyond the scalar total:\n$p257")
    assert("BroadcastNestedLoopJoin".r.findAllIn(p257).length == 1,
      s"q257's only join is the 1-row pair-total broadcast:\n$p257")
  }

  test("round-6/7 tier plans keep their scale shape (q211/q208/q203/q205)") {
    val dir = "/root/testdata/sf0.001"
    // q211 (banded decontamination): the whole point vs q210's exact
    // broadcast scan is that NOTHING is all-pairs — every join is an
    // equi-join on band keys / vec_id
    val p211 = SparkEntry.queries("q211_decontaminate_banded")(spark, dir)
      .queryExecution.executedPlan.toString()
    assert(!p211.contains("CartesianProduct") && !p211.contains("BroadcastNestedLoopJoin"),
      s"q211 must not contain an all-pairs join:\n$p211")
    // q208 (NumPy RNG stream): generation is embarrassingly parallel in
    // the seed — no data shuffle at all. The only exchanges allowed are
    // the explicit round-robin seed spread and the final presentation
    // sort's range partitioning; joins/aggregates/hash exchanges would
    // mean the stream stopped being a pure per-seed projection.
    val p208 = SparkEntry.queries("q208_numpy_rng_stream")(spark, dir)
      .queryExecution.executedPlan.toString()
    assert(!p208.contains("Exchange hashpartitioning") && !p208.contains("Join") &&
      !p208.contains("Aggregate"),
      s"q208 must stay a per-seed projection (no shuffle/join/agg):\n$p208")
    // q203/q205 (LMDB sinks): the corpus must reach the per-partition env
    // build through exactly the caller's explicit hash repartition — a
    // global sort (range partitioning) or any join/agg on the write path
    // would shuffle the 100 TB corpus beyond the partitionBy route. The
    // plans are recorded by LmdbStore at the point of the actual write.
    graft.sinks.LmdbStore.lastWritePlans.clear()
    SparkEntry.queries("q203_lmdb_format_sink")(spark, dir).collect()
    SparkEntry.queries("q205_lmdb_incremental")(spark, dir).collect()
    val writePlans = {
      val it = graft.sinks.LmdbStore.lastWritePlans.iterator()
      val b = Seq.newBuilder[String]
      while (it.hasNext) b += it.next()
      b.result()
    }
    assert(writePlans.size == 3, s"expected 3 sink writes (q203 + q205 write/append), got ${writePlans.size}")
    writePlans.foreach { p =>
      assert(!p.contains("Exchange rangepartitioning") && !p.contains("Join") &&
        !p.contains("Aggregate"),
        s"LMDB sink input must not sort/join/agg the corpus:\n$p")
      val nHash = "Exchange hashpartitioning".r.findAllIn(p).length
      assert(nHash <= 1, s"LMDB sink input shuffled more than the explicit repartition:\n$p")
    }
  }

  test("round-7 additions keep their scale shape (q213/q214)") {
    val dir = "/root/testdata/sf0.001"
    // q213 (epoch shuffle): the permutation runs over the SHARD LIST — the
    // document scan collapses to one partial/final aggregate pair before
    // any window/shuffle, and nothing joins
    val p213 = SparkEntry.queries("q213_epoch_shuffle")(spark, dir)
      .queryExecution.executedPlan.toString()
    assert(!p213.contains("Join"), s"q213 must not join:\n$p213")
    assert("HashAggregate".r.findAllIn(p213).length >= 2,
      s"q213 must pre-aggregate documents to shards before the window:\n$p213")
    // q214 (URL canonicalization): per-row regex work + aggregation only —
    // the text corpus is never joined and never range-shuffled
    val p214 = SparkEntry.queries("q214_url_canonical")(spark, dir)
      .queryExecution.executedPlan.toString()
    assert(!p214.contains("Join") && !p214.contains("Exchange rangepartitioning"),
      s"q214 must stay scan+aggregate:\n$p214")
  }

  test("curation tier plans keep their scale shape (q218/q219/q220/q221)") {
    val dir = "/root/testdata/sf0.001"
    def plan(name: String): String =
      SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString()
    // q218 (Gopher rules): per-row gates + one per-source rollup — the
    // corpus is never joined; the only exchanges are the rollup's hash
    // partitioning and the final presentation sort
    val p218 = plan("q218_gopher_rules")
    assert(!p218.contains("Join"), s"q218 must not join:\n$p218")
    assert("Exchange hashpartitioning".r.findAllIn(p218).length <= 1,
      s"q218 must shuffle only for the per-source rollup:\n$p218")
    // q219 (DSIR): the hashed model is a driver-bounded literal — the
    // scoring pass must contain NO join at all (a join against the bucket
    // table would shuffle gram rows; DSIR's point is the one-pass fold)
    val p219 = plan("q219_dsir_weights")
    assert(!p219.contains("Join"), s"q219 scoring must be join-free:\n$p219")
    // q220 (CCNet buckets): the LM tables join broadcast (vocabulary-
    // bounded build sides), never sort-merge, and the tercile window
    // partitions by language — a global window would serialize the corpus
    val p220 = plan("q220_ccnet_buckets")
    assert(!p220.contains("SortMergeJoin"), s"q220 LM joins must broadcast:\n$p220")
    assert(p220.contains("windowspecdefinition(lang#"),
      s"q220's ntile must partition by lang:\n$p220")
    // q221 (funnel): the dedup stage's min-doc window partitions by the
    // content hash (never a global window), and nothing is all-pairs
    val p221 = plan("q221_curation_funnel")
    assert(!p221.contains("CartesianProduct") && !p221.contains("BroadcastNestedLoopJoin"),
      s"q221 must not contain an all-pairs join:\n$p221")
    assert(p221.contains("windowspecdefinition(_w") || p221.contains("windowspecdefinition(md5"),
      s"q221's dedup window must partition by content hash:\n$p221")
    // q222 (threshold sweep): one scoring pass — the 9-row grid broadcasts
    // (never shuffles the corpus against it) and the only hash exchange is
    // the per-threshold rollup
    val p222 = plan("q222_classifier_sweep")
    assert(!p222.contains("SortMergeJoin") && p222.contains("BroadcastExchange"),
      s"q222's grid must broadcast:\n$p222")
    assert("Exchange hashpartitioning".r.findAllIn(p222).length <= 1,
      s"q222 must shuffle only for the rollup:\n$p222")
    // q223 (quantization recall): probes broadcast (bounded audit set) and
    // BOTH neighbor rankings ride ONE probe_id exchange — a second window
    // shuffle would double the pair-table movement for no reason
    val p223 = plan("q223_quant_recall")
    assert(p223.contains("BroadcastExchange") && !p223.contains("SortMergeJoin"),
      s"q223's probe side must broadcast:\n$p223")
    assert("Exchange hashpartitioning\\(probe_id".r.findAllIn(p223).length == 1,
      s"q223's two rankings must share one probe_id exchange:\n$p223")
    // q224 (survivor selection): the argmax window partitions by component
    // (clustered docs only — singletons never enter the window), the final
    // plan is checkpoint-truncated like q70's, and nothing is all-pairs
    val p224 = plan("q224_cluster_best_keep")
    assert(p224.contains("windowspecdefinition(component#"),
      s"q224's argmax must partition by component:\n$p224")
    assert(!p224.contains("CartesianProduct") && !p224.contains("BroadcastNestedLoopJoin"),
      s"q224 must not contain an all-pairs join:\n$p224")
    val exch224 = "Exchange".r.findAllIn(p224).size
    assert(exch224 <= 12, s"q224 final plan has $exch224 exchanges — lineage not truncated:\n$p224")
    // q225 (LSH recall audit): the exact side is the bounded broadcast-
    // probe build (BNLJ allowed THERE only); the candidate side must stay
    // an equi-join on band keys — a cartesian anywhere else would mean the
    // index audit itself went all-pairs
    val p225 = plan("q225_ann_recall")
    assert(!p225.contains("CartesianProduct"), s"q225 must not cartesian:\n$p225")
    assert("BroadcastNestedLoopJoin".r.findAllIn(p225).length <= 1,
      s"q225's only non-equi join is the bounded exact-probe build:\n$p225")
  }

  test("suffix tier plans keep their scale shape (q215/q216)") {
    val dir = "/root/testdata/sf0.001"
    // q215/q216 (suffix-array tier): every join in the doubling and in the
    // LCP neighbor lookup is an equi-join on (doc_id,pos), (r,r2) or
    // rank±1 — an all-pairs join anywhere would mean the suffix order is
    // being derived by comparison instead of rank doubling. And no
    // single-partition window: the global order comes from range-sort +
    // zipWithIndex, never a partition-less row_number.
    val p215 = SparkEntry.queries("q215_suffix_rank")(spark, dir)
      .queryExecution.executedPlan.toString()
    assert(!p215.contains("CartesianProduct") && !p215.contains("BroadcastNestedLoopJoin"),
      s"q215 must not contain an all-pairs join:\n$p215")
    assert(!p215.contains("Window"), s"q215 must not use a window:\n$p215")
    // the doubling loop itself materializes each round eagerly, so its
    // joins never appear in q215's final plan (the q202 vacuity class) —
    // assert ONE round's un-checkpointed shape on a literal frame
    locally {
      import spark.implicits._
      val cur = Seq((1L, 1, 5L, 7L), (1L, 2, 3L, 2L), (2L, 1, 5L, 0L), (2L, 2, 3L, 2L))
        .toDF("doc_id", "pos", "r", "r2")
      val pr = operators.SuffixOps.denseRankRound(cur)
        .queryExecution.executedPlan.toString()
      assert(!pr.contains("CartesianProduct") && !pr.contains("BroadcastNestedLoopJoin"),
        s"the rank-doubling round must join on (r, r2), never all-pairs:\n$pr")
      assert(!pr.contains("Window"),
        s"the rank-doubling round must not use a window:\n$pr")
      assert(pr.contains("Join"), s"the rank-doubling round lost its join:\n$pr")
    }
    val p216 = SparkEntry.queries("q216_dup_substrings")(spark, dir)
      .queryExecution.executedPlan.toString()
    assert(!p216.contains("CartesianProduct") && !p216.contains("BroadcastNestedLoopJoin"),
      s"q216 must not contain an all-pairs join:\n$p216")
    assert(!p216.contains("Window"), s"q216 must not use a window:\n$p216")
    // q217 merges removal intervals with a window — but it must be the
    // doc-partitioned gaps-and-islands window (per-doc state), never a
    // partition-less global one, and still no all-pairs join anywhere.
    val p217 = SparkEntry.queries("q217_span_removal")(spark, dir)
      .queryExecution.executedPlan.toString()
    assert(!p217.contains("CartesianProduct") && !p217.contains("BroadcastNestedLoopJoin"),
      s"q217 must not contain an all-pairs join:\n$p217")
    val specs = "windowspecdefinition\\(([^,)]*)".r.findAllMatchIn(p217).map(_.group(1)).toList
    assert(specs.nonEmpty, s"q217 should use a window for interval merging:\n$p217")
    specs.foreach { first =>
      assert(first.startsWith("doc_id"),
        s"q217 window must be partitioned by doc_id, got spec starting with '$first':\n$p217")
    }
    // q226 (cross-source spans): assert on the BUILD plan (the cached
    // table the query reads hides it). Every window must carry a
    // partition expression — the run_id running-mins, the pid running
    // sum, and the 32-row lit(0) offset window; a partition-LESS window
    // over corpus rows would be the global scan the runs decomposition
    // exists to avoid. The only nested-loop join allowed is the 1-row
    // max_run broadcast.
    val (crossPlan, crossRanged) = graft.operators.SuffixOps.crossLensPlan(
      spark, graft.operators.SuffixOps.suffixRanks(spark, dir))
    val p226 = crossPlan.queryExecution.executedPlan.toString()
    crossRanged.unpersist()
    assert(!p226.contains("CartesianProduct"), s"q226 must not cartesian:\n$p226")
    assert(!p226.contains("], [], ["), s"q226 must not use a partition-less window:\n$p226")
    assert(p226.contains("windowspecdefinition(run_id#"),
      s"q226's running mins must partition by run_id:\n$p226")
    assert("BroadcastNestedLoopJoin".r.findAllIn(p226).length <= 1,
      s"q226's only nested-loop join is the 1-row max_run broadcast:\n$p226")
  }

  test("q70 final plan is checkpoint-truncated: bounded exchanges, not the unrolled loop") {
    // pre-checkpoint, the component loop's final plan embedded every prior
    // round's join (185 exchanges at this SF; 6693 once pointer doubling
    // squared the growth); per-round localCheckpoint keeps it O(one round)
    val df = SparkEntry.queries("q70_dedup_components")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString()
    val exch = "Exchange".r.findAllIn(plan).size
    assert(exch <= 40, s"q70 final plan has $exch exchanges — lineage not truncated")
    assert(df.count() > 0)
  }

  test("q82's second derivation is cache-independent: no InMemoryRelation under freshShingles") {
    // Spark's CacheManager substitutes a cached InMemoryRelation into any
    // plan whose logical subtree exactly matches the persisted one — so if
    // freshShingles were an identical re-derivation, its "independent"
    // recompute would silently read the shared shingle cache and the K13
    // determinism invariant would exercise nothing (round-3 ADVICE).
    val dir = "/root/testdata/sf0.001"
    // force the shared shingle cache to exist and be materialized
    assert(SparkEntry.queries("q23_minhash_sig")(spark, dir).count() > 0)
    val cachedPlan = SparkEntry.queries("q23_minhash_sig")(spark, dir)
      .queryExecution.withCachedData.toString()
    assert(cachedPlan.contains("InMemoryRelation"),
      s"positive control: q23 should read the shared cache:\n$cachedPlan")
    val freshPlan = graft.operators.TextOps.freshShingles(spark, dir)
      .queryExecution.withCachedData.toString()
    assert(!freshPlan.contains("InMemoryRelation"),
      s"freshShingles must not plan-match the shared cache:\n$freshPlan")
    // and the two derivations agree row-for-row (the invariant q82 relies on)
    val a = graft.operators.TextOps.freshShingles(spark, dir)
    val shared = SparkEntry.queries("q82_minhash_fast")(spark, dir).collect().head
    assert(shared.getAs[Long]("n_docs") == shared.getAs[Long]("n_stable"),
      "fresh vs shared signatures must agree per doc")
    assert(a.count() > 0)
  }

  test("kv store: refuse non-empty dir, point lookup, regex listing") {
    val tmp = java.nio.file.Files.createTempDirectory("kvspec_").toString
    new java.io.File(tmp).delete()
    KvStore.create(tmp)
    val w = new KvStore.ShardWriter(tmp, 0, batchSize = 2)
    w.put("a__s001", Array[Byte](1, 2, 3), Seq(1, 3), "float32")
    w.put("b__s002", Array[Byte](4, 5), Seq(1, 2), "float32")
    w.put("c__other", Array[Byte](9), Seq(1), "float32")
    assert(w.close() == 3)
    KvStore.commit(tmp)
    assert(KvStore.get(tmp, "b__s002").get.toSeq == Seq[Byte](4, 5))
    assert(KvStore.get(tmp, "missing").isEmpty)
    assert(KvStore.listKeys(tmp, Some("__s\\d+"), 10) == Seq("a__s001", "b__s002"))
    assert(KvStore.listKeys(tmp, None, 2).length == 2)
    intercept[IllegalStateException](KvStore.create(tmp))
  }

  test("kvstore DSv2 sink: coordinator-committed manifest, empty partitions excluded, roundtrip") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("kvv2_").toString
    new java.io.File(tmp).delete()
    // 4 partitions, one guaranteed empty after the filter
    val df = (0 until 30).map(i => (f"k$i%03d", Array[Byte](i.toByte), Seq(1), "bytes"))
      .toDF("key", "value", "shape", "dtype")
      .repartition(4, $"key")
      .filter($"key" =!= "nope")
    KvStore.write(df, tmp, batchSize = 8)
    val manifest = KvStore.readText(tmp, "_MANIFEST").split('\n').filter(_.nonEmpty).toSeq
    assert(manifest.nonEmpty && manifest.forall(_.matches("shard-\\d{5}\\.kv")))
    // every manifest entry exists on disk; only manifest shards are read
    manifest.foreach(n => assert(new java.io.File(tmp, n).exists, s"missing $n"))
    assert(KvStore.read(spark, tmp).count() == 30)
    assert(KvStore.listKeys(tmp, None, 1000).length == 30)
    assert(KvStore.get(tmp, "k007").get.toSeq == Seq[Byte](7))
    // second write into the same dir must refuse (non-empty guard)
    intercept[Exception](KvStore.write(df, tmp))
  }

  test("kv store rejects keys that would corrupt the space-delimited index") {
    val tmp = java.nio.file.Files.createTempDirectory("kvspec_keys_").toString
    val w = new KvStore.ShardWriter(tmp, 7)
    intercept[IllegalArgumentException](w.put("has space", Array[Byte](1), Seq(1), "b"))
    intercept[IllegalArgumentException](w.put("naïve", Array[Byte](1), Seq(1), "b"))
    intercept[IllegalArgumentException](w.put("", Array[Byte](1), Seq(1), "b"))
    w.put("ok__key-1.npy", Array[Byte](9), Seq(1), "b")
    assert(w.close() == 1)
  }

  test("round-7 late additions keep their scale shape (q228/q229/q230)") {
    val dir = "/root/testdata/sf0.001"
    def plan(name: String): String =
      SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString()
    // q228 (shard bin-packing): the global size order must come from the
    // range-sort + zipWithIndex idiom, never a single-partition window;
    // the only nested-loop is the broadcast of the 1-row max/min spread
    val p228 = plan("q228_shard_binpack")
    assert(!p228.contains("Window"), s"q228 must not use a window for the global rank:\n$p228")
    assert(!p228.contains("CartesianProduct"), s"q228 must not cartesian:\n$p228")
    // q229 (minhash error audit): every join is an equi-join on a dense
    // doc key over the bounded candidate-pair table — nothing all-pairs
    val p229 = plan("q229_minhash_error_audit")
    assert(!p229.contains("CartesianProduct") && !p229.contains("BroadcastNestedLoopJoin"),
      s"q229 must not contain an all-pairs join:\n$p229")
    // q230 (NFC normalize): per-row map + per-source rollup — the corpus
    // is never joined; graft_nfc must survive into the physical plan
    val p230 = plan("q230_unicode_normalize")
    assert(!p230.contains("Join"), s"q230 must stay scan+aggregate:\n$p230")
    assert(p230.toLowerCase.contains("nfcnormalize") || p230.contains("graft_nfc"),
      s"q230 must run the native graft_nfc expression:\n$p230")
    // q231 (subword tokenize): the segmentation UDF must run on the
    // DISTINCT-word dictionary side only — exactly one equi-join (dict
    // back to the (source, word) counts), nothing all-pairs
    val p231 = plan("q231_wordpiece_tokenize")
    assert(!p231.contains("CartesianProduct") && !p231.contains("BroadcastNestedLoopJoin"),
      s"q231 must not contain an all-pairs join:\n$p231")
    assert("Join".r.findAllIn(p231).length <= 1,
      s"q231 must join the segmented dictionary back exactly once:\n$p231")
    // q232 (gate ablation): per-row gates + 5-way stack + rollups — the
    // only join is the broadcast of the 1-row totals
    val p232 = plan("q232_gate_ablation")
    assert(!p232.contains("SortMergeJoin") && !p232.contains("CartesianProduct"),
      s"q232 must not shuffle-join the corpus:\n$p232")
  }

  test("q235-q241 tier plans keep their scale shape") {
    val dir = "/root/testdata/sf0.001"
    def plan(name: String): String =
      SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString()
    // q235 (AC blocklist): the corpus is scanned once per row; the only
    // join is the broadcast of the 10-row pattern-name table
    val p235 = plan("q235_blocklist_scan")
    assert(!p235.contains("SortMergeJoin") && !p235.contains("CartesianProduct") &&
      !p235.contains("BroadcastNestedLoopJoin"),
      s"q235 must only broadcast the pattern table:\n$p235")
    // q236 (SRHT audit): projection is per-row; probes broadcast; the
    // corpus is never shuffle-joined
    val p236 = plan("q236_jl_projection")
    assert(!p236.contains("SortMergeJoin") && !p236.contains("CartesianProduct"),
      s"q236 must broadcast the probe side:\n$p236")
    // q237 (PassJoin): candidates must come from an EQUI-join on the
    // segment keys — any nested-loop/cartesian means the lossless
    // blocking degenerated to the quadratic oracle form
    val p237 = plan("q237_editdist_join")
    assert(!p237.contains("CartesianProduct") && !p237.contains("BroadcastNestedLoopJoin"),
      s"q237 candidates must be equi-join generated:\n$p237")
    // q238 (rendezvous): both argmaxes are per-row — no join anywhere,
    // and the only hash exchange is the 16-row shard rollup
    val p238 = plan("q238_rendezvous_shards")
    assert(!p238.contains("Join"), s"q238 must not join:\n$p238")
    assert("Exchange hashpartitioning".r.findAllIn(p238).length <= 1,
      s"q238 must shuffle only the 16-row rollup:\n$p238")
    // q239 (AUC): corpus reduces via one groupBy(score); the midrank
    // window must run AFTER aggregation (single-partition over the
    // bounded score table), never over raw documents
    val p239 = plan("q239_classifier_auc")
    assert(!p239.contains("Join"), s"q239 must not join:\n$p239")
    assert("HashAggregate".r.findAllIn(p239).length >= 2,
      s"q239 must pre-aggregate scores before the rank window:\n$p239")
    // q240/q241 (ANN eval): the band-candidate joins and the eval joins
    // are equi-joins; the ONLY nested-loop is the broadcast probe build
    // of the exact ground truth (bounded %100 side)
    Seq("q240_ann_ndcg", "q241_multiprobe_ndcg").foreach { name =>
      val p = plan(name)
      assert(!p.contains("CartesianProduct"),
        s"$name must not contain a cartesian product:\n$p")
      val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).length
      assert(bnlj <= 1,
        s"$name may broadcast-NLJ only the exact ground-truth build:\n$p")
    }
    // q245 (multi-probe decontamination): q211's all-equi-join shape must
    // survive the probe expansion — the ×17 rides the bounded eval side.
    // Round 9 added the recall DENOMINATOR (exhaustive q210-shaped pass),
    // which is the one permitted broadcast-NLJ (bounded eval side) — the
    // q240/q246 ground-truth convention.
    val p245 = plan("q245_decontaminate_multiprobe")
    assert(!p245.contains("CartesianProduct") &&
      "BroadcastNestedLoopJoin".r.findAllIn(p245).length <= 1,
      s"q245 may broadcast-NLJ only the exact recall-denominator build:\n$p245")
    // q246 (multi-probe recall audit): only the exact ground-truth build
    // may broadcast-NLJ; candidates stay band-key equi-joins
    val p246 = plan("q246_ann_recall_multiprobe")
    assert(!p246.contains("CartesianProduct") &&
      "BroadcastNestedLoopJoin".r.findAllIn(p246).length <= 1,
      s"q246 may broadcast-NLJ only the exact ground-truth build:\n$p246")
    // q258/q259 (chart-chosen 8×8 family): the width knob must not change
    // the plan shape — wider recall comes from MORE band keys per vector
    // (8 vs 4 equi-join rows) plus the ×9 Hamming-1 eval expansion, never
    // from a widened join
    val p258 = plan("q258_decontaminate_8x8")
    assert(!p258.contains("CartesianProduct") &&
      "BroadcastNestedLoopJoin".r.findAllIn(p258).length <= 1,
      s"q258 may broadcast-NLJ only the exact recall-denominator build:\n$p258")
    val p259 = plan("q259_ann_recall_8x8")
    assert(!p259.contains("CartesianProduct") &&
      "BroadcastNestedLoopJoin".r.findAllIn(p259).length <= 1,
      s"q259 may broadcast-NLJ only the exact ground-truth build:\n$p259")
    // q260 (audit→config→screen): the SCREEN the chart configures must
    // keep the q245/q258 contract at whatever width the audit picked —
    // the audit itself runs as the documented driver-side planning
    // action at construction and never appears in the screen's plan
    val p260 = plan("q260_autowidth_screen")
    assert(!p260.contains("CartesianProduct") &&
      "BroadcastNestedLoopJoin".r.findAllIn(p260).length <= 1,
      s"q260 may broadcast-NLJ only the exact recall-denominator build:\n$p260")
  }

  test("q242-q244 tier plans keep their scale shape") {
    val dir = "/root/testdata/sf0.001"
    def plan(name: String): String =
      SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString()
    // q242 (sorted neighborhood): candidates come from the rank-bucket
    // EQUI-join — never all-pairs
    val p242 = plan("q242_sorted_neighborhood")
    assert(!p242.contains("CartesianProduct") && !p242.contains("BroadcastNestedLoopJoin"),
      s"q242 candidates must be rank-bucket equi-join generated:\n$p242")
    // q243 (line dedup): the corpus is shuffled exactly once (the df
    // count, whose result is localCheckpointed); the df>T survivors
    // attach back as ONE guarded broadcast hash join — no sort-merge
    // join, and the documents scan appears exactly once in the plan
    val p243 = plan("q243_line_dedup")
    assert(!p243.contains("SortMergeJoin") && !p243.contains("CartesianProduct"),
      s"q243 must not shuffle the corpus a second time for the attach:\n$p243")
    assert("BroadcastHashJoin".r.findAllIn(p243).length == 1,
      s"q243 must attach survivors via exactly one guarded broadcast:\n$p243")
    assert("documents".r.findAllIn(p243).length <= 2, // path + location, 1 scan
      s"q243 must scan documents exactly once (boiler side is checkpointed):\n$p243")
    // q244 (calibration): the corpus folds into the ≤10-row bin table in
    // ONE zero-join scoring pass, which is localCheckpointed — so the
    // final attach plan must contain NO file scan at all, and the only
    // nested-loop is the 1-row ECE/MCE broadcast
    val p244 = plan("q244_calibration_ece")
    assert(!p244.contains("SortMergeJoin") && !p244.contains("CartesianProduct"),
      s"q244 must not shuffle-join the corpus:\n$p244")
    assert("BroadcastNestedLoopJoin".r.findAllIn(p244).length == 1,
      s"q244 may broadcast only the 1-row ECE/MCE total:\n$p244")
    assert(!p244.contains("FileScan") && !p244.contains("Exchange hashpartitioning"),
      s"q244 must fold the corpus once into the checkpointed bin table:\n$p244")
    // q247 (intra-doc line trim): per-row array_distinct algebra — the
    // corpus is NEVER joined or windowed; the only exchange is the
    // per-source rollup
    val p247 = plan("q247_intradoc_line_dedup")
    assert(!p247.contains("Join") && !p247.contains("Window"),
      s"q247 must stay a zero-join per-row projection:\n$p247")
    assert("Exchange hashpartitioning".r.findAllIn(p247).length <= 1,
      s"q247 must shuffle only the per-source rollup:\n$p247")
    // q248 (vocab growth): the 10-row threshold table broadcasts onto
    // the min-doc and per-doc sides (two BNLJ cross joins); the lag
    // window runs over the 10-row joined result — no sort-merge join,
    // no cartesian
    val p248 = plan("q248_vocab_growth")
    assert(!p248.contains("CartesianProduct") && !p248.contains("SortMergeJoin"),
      s"q248 must broadcast the threshold table:\n$p248")
    assert("BroadcastNestedLoopJoin".r.findAllIn(p248).length <= 2,
      s"q248 may cross-join only the 10-row thresholds:\n$p248")
    // q249 (hard negatives): candidates from band-key equi-joins with
    // the multi-probe expansion on the bounded probe side; the only
    // broadcast is the probe embedding/label attach — never all-pairs
    val p249 = plan("q249_hard_negatives")
    assert(!p249.contains("CartesianProduct") && !p249.contains("BroadcastNestedLoopJoin"),
      s"q249 must generate candidates by band equi-joins:\n$p249")
    // q250 (length bucketing): both orderings go through seqIdBy's
    // range-partitioned sort — no single-partition Window over the
    // corpus (the lens table is checkpointed, so the visible plan is
    // the two rank/rollup branches and the 2-row union)
    val p250 = plan("q250_length_bucketing")
    assert(!p250.contains("Window"),
      s"q250 must rank via seqIdBy, not a window:\n$p250")
    assert(!p250.contains("Join"), s"q250 must not join:\n$p250")
    // q251 (postings varint): the gap lag-window partitions by WORD
    // (vocabulary keys, never the single-partition trap) and nothing
    // joins
    val p251 = plan("q251_postings_varint")
    assert(!p251.contains("Join"), s"q251 must not join:\n$p251")
    assert(!p251.contains("Exchange SinglePartition"),
      s"q251's window must partition by word:\n$p251")
    // q252 (Luhn PII): per-row HOF extraction + validation — zero joins,
    // the only exchange is the per-source rollup
    val p252 = plan("q252_luhn_pii")
    assert(!p252.contains("Join"), s"q252 must stay a zero-join scan:\n$p252")
    assert("Exchange hashpartitioning".r.findAllIn(p252).length <= 1,
      s"q252 must shuffle only the per-source rollup:\n$p252")
    // q253 (adaptive thresholds): the per-source cuts come from
    // exactByRank (no per-group sort-agg) and attach as a broadcast —
    // the corpus is never sort-merge-joined
    val p253 = plan("q253_adaptive_threshold")
    assert(!p253.contains("SortMergeJoin") && !p253.contains("CartesianProduct"),
      s"q253 must broadcast the per-source cuts:\n$p253")
    assert(p253.contains("BroadcastHashJoin"),
      s"q253's threshold attach must be a broadcast join:\n$p253")
    // q254 (S-curve): the pair set is candidates (band equi-joins) plus
    // an arithmetic sample — nothing all-pairs anywhere
    val p254 = plan("q254_lsh_scurve")
    assert(!p254.contains("CartesianProduct") && !p254.contains("BroadcastNestedLoopJoin"),
      s"q254 must never go all-pairs:\n$p254")
  }
}
