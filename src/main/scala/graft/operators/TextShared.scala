package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Shared infrastructure of the text tier (split out of the former
  * monolithic TextOps in round 8): the session-scoped cached projections
  * (shingles/minhash/jaccard/simhash/components/srcGrams), the skew-
  * hardened bucket pair generator, the hashed classifier scorer, and the
  * DuckDB CTE prefixes the tier oracles interpolate. Mixed into
  * [[TextOps]]; the dedup/curation/eval query traits reach it through
  * their self-type, so every query body is unchanged from the monolith.
  */
trait TextSharedCore extends Serializable {
  private[operators] def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  /** Session-scoped shared intermediates. The shingle/signature projections
    * feed MANY queries (q23/q24/q25/q26/q70/q82/q88 all start from shingles;
    * q27/q28 from the simhash), and the LSH self-joins reference them on
    * BOTH sides — without sharing, the q26 chain re-derives the shingle set
    * 4-6× per run (the round-2 bench regression). One persisted copy per
    * (session, sfDir) turns every re-derivation into a cache read; Spark's
    * cache manager then substitutes it into any plan that embeds the same
    * logical subtree. At 100 TB this is the "materialize the signature
    * table once" step every production dedup pipeline has. */
  private[operators] def shared(s: SparkSession, dir: String, name: String)(df: => DataFrame): DataFrame =
    graft.SessionCache.getOrBuild(s, s"text|$dir|$name")(df)

  /** Materialize every shared text-tier projection (a production pipeline's
    * "build the signature tables once" step — Bench runs this in its
    * UNTIMED warmup so per-query numbers measure plans, not the cache-build
    * lottery; round-6 verdict #1). Dependency order matters: jaccard builds
    * FROM the shingle/minhash caches, so each tier materializes before the
    * next derives from it. */
  private[graft] def prewarmShared(s: SparkSession, dir: String): Unit = {
    shingles(s, dir).count()
    minhashes(s, dir).count()
    jaccard(s, dir).count()
    components(s, dir).count()
    simhashed(s, dir).count()
    srcGrams(s, dir).count()
    ()
  }

  /** doc_id + whitespace-tokenized words, docs with >= 3 words.
    * Empty tokens are dropped on BOTH the engine and oracle sides: Java's
    * split drops trailing empty strings while DuckDB's regexp_split_to_array
    * keeps them, so any doc with leading/trailing/double whitespace would
    * otherwise tokenize differently across engines (`array_remove` is a
    * codegen'd expression, unlike a `filter` HOF). */
  private[graft] def words(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"), col("text"),
        array_remove(split(col("text"), "\\s+"), "").as("w"))
      .filter(size(col("w")) >= 3)

  /** Distinct 3-word shingles per doc (shared/persisted — see `shared`). */
  private[operators] def shingles(s: SparkSession, dir: String): DataFrame =
    shared(s, dir, "shingles") {
      words(s, dir)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(w)-3), i -> concat_ws(' ', w[i], w[i+1], w[i+2]))")).as("sh"))
        .distinct()
    }

  /** The same shingle set derived through a STRUCTURALLY DISTINCT plan —
    * descending index walk + plain concat instead of ascending +
    * concat_ws — for q82's determinism invariant. Distinctness is the
    * point, not style: Spark's CacheManager substitutes a cached
    * InMemoryRelation into any plan whose logical subtree exactly matches
    * the persisted one (round-3 ADVICE), so an identical re-derivation
    * would silently READ the shared `shingles` cache and the "independent
    * second derivation" would exercise nothing. A different expression
    * tree can never plan-match. EntrySpec asserts no InMemoryRelation
    * appears under this plan even with the shared cache materialized. */
  private[graft] def freshShingles(s: SparkSession, dir: String): DataFrame =
    // repartition before the explode: the independent re-derivation is
    // per-query work (never cached, by design) on a single-split source
    // (q50/q111 rule). An Exchange node cannot plan-match the cached
    // `shingles` subtree, so the distinctness guarantee is unaffected.
    graft.Spread.ifNarrow(s, words(s, dir))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(size(w)-3, 0, -1), i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))")).as("sh"))
      .distinct()

  /** 8 salted MinHash values per doc (min of md5 over salted shingles);
    * shared so the 2-band unpivot and the candidate self-join never re-run
    * the shingle aggregation. */
  private[operators] def minhashes(s: SparkSession, dir: String): DataFrame =
    shared(s, dir, "minhashes") {
      val aggs = (0 until 8).map(j => min(md5(concat(lit(s"$j|"), col("sh")))).as(s"h$j"))
      shingles(s, dir).groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
    }

  /** (doc_id, band k, band hash) — 2 bands of 4 minhashes each. */
  private[operators] def bands(s: SparkSession, dir: String): DataFrame = {
    val m = minhashes(s, dir)
    val b1 = m.select(col("doc_id"), lit(1L).as("k"),
      md5(concat(col("h0"), col("h1"), col("h2"), col("h3"))).as("b"))
    val b2 = m.select(col("doc_id"), lit(2L).as("k"),
      md5(concat(col("h4"), col("h5"), col("h6"), col("h7"))).as("b"))
    b1.union(b2)
  }

  /** LSH candidate pairs: docs sharing any band bucket (a < b). */
  private[operators] def candidates(s: SparkSession, dir: String): DataFrame = {
    val bd = bands(s, dir)
    bd.as("x").join(bd.as("y"),
        col("x.b") === col("y.b") && col("x.k") === col("y.k") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b_id"))
      .distinct()
  }

  /** Exact 3-gram Jaccard for the LSH candidates. Shared/persisted: the
    * verified-pair table is the convergence point of the whole near-dup
    * tier (q25/q26/q70/q88/q89/q102 all start from it) and is tiny —
    * candidate pairs only — so one materialization replaces up to six
    * re-runs of the two shingle self-joins per session. */
  private[graft] def jaccard(s: SparkSession, dir: String): DataFrame =
    shared(s, dir, "jaccard") {
      val sh = shingles(s, dir)
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = candidates(s, dir)
        .join(sh.as("sa"), col("a") === col("sa.doc_id"))
        .join(sh.as("sb"), col("b_id") === col("sb.doc_id") && col("sa.sh") === col("sb.sh"))
        .groupBy("a", "b_id").agg(count(lit(1)).as("inter"))
      inter
        .join(sizes.as("za"), col("a") === col("za.doc_id"))
        .join(sizes.as("zb"), col("b_id") === col("zb.doc_id"))
        .select(col("a"), col("b_id"), col("inter"),
          (col("inter").cast("double") /
            (col("za.n") + col("zb.n") - col("inter")).cast("double")).as("jac"))
    }

  /** Per-row 32-bit SimHash from word-frequency-weighted md5 bits.
    * Compiled Scala UDF rather than nested Catalyst HOFs: higher-order
    * functions evaluate interpreted per element (32 × |words| lambda calls
    * per doc dominated the sf0.1 bench at 32 s); the UDF runs the identical
    * integer arithmetic (first 4 md5 bytes = conv(substr(md5,1,8),16,10))
    * in a tight JVM loop, so the DuckDB oracle is unchanged. */
  private[operators] val simhash32 = udf { (w: Seq[String]) =>
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = new Array[Long](w.length)
    var i = 0
    while (i < w.length) {
      val d = md.digest(w(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      md.reset()
      hs(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      i += 1
    }
    var sim = 0L
    var k = 0
    while (k < 32) {
      var s = 0L
      var j = 0
      while (j < hs.length) { s += 2 * ((hs(j) >> k) & 1L) - 1; j += 1 }
      if (s > 0) sim += 1L << k
      k += 1
    }
    sim
  }

  private[operators] def simhashed(s: SparkSession, dir: String): DataFrame =
    shared(s, dir, "simhashed") {
      // cache only (doc_id, simhash): the blocked self-join reads this twice.
      // repartition BEFORE the kernel: the build plan has no exchange of its
      // own, so without it the cache materializes as ONE partition (the
      // single-split source) — the UDF pass runs serial and every consumer's
      // map side reads a 1-partition cache (round-12; the q50/q111 rule)
      graft.Spread.ifNarrow(s, words(s, dir))
        .select(col("doc_id"), simhash32(col("w")).as("simhash"))
    }

  /** Skew-hardened all-pairs within buckets — the one skew case AQE cannot
    * fix: AQE splits oversized SHUFFLE partitions, but when one bucket VALUE
    * is hot the self-join work inside it is quadratic and still lands in
    * one task. Decomposition instead: members of a bucket larger than `cap`
    * are hash-assigned to ⌈size/cap⌉ cells and the bucket's pair space is
    * covered by the triangle of cell pairs (lo ≤ hi), each a separate join
    * key — so no task ever builds more than ~cap² pairs, while buckets at
    * or under `cap` keep exactly one cell (zero replication overhead).
    * Every pair is emitted exactly once: it matches only under the task key
    * (min(cellA,cellB), max(cellA,cellB)).
    *
    * Returns one row per in-bucket pair: bucketCols, lo, hi, a, b_id, and
    * a_/b_-prefixed payload columns. */
  private[graft] def boundedBucketPairs(df: DataFrame, bucketCols: Seq[String],
      idCol: String, payloadCols: Seq[String], cap: Int): DataFrame = {
    require(cap > 0)
    val sizes = df.groupBy(bucketCols.map(col): _*).agg(count(lit(1)).as("bsz"))
    val replicas = df.join(sizes, bucketCols)
      .withColumn("n_cells", ceil(col("bsz").cast("double") / cap).cast("int"))
      .withColumn("cell", pmod(xxhash64(col(idCol)), col("n_cells").cast("long")))
      .withColumn("peer", explode(expr("sequence(0L, n_cells - 1L)")))
      .withColumn("lo", least(col("cell"), col("peer")))
      .withColumn("hi", greatest(col("cell"), col("peer")))
    val keys = bucketCols ++ Seq("lo", "hi")
    val left = replicas.select(
      keys.map(col) ++ Seq(col(idCol).as("a"), col("cell").as("ca")) ++
        payloadCols.map(c => col(c).as(s"a_$c")): _*)
    val right = replicas.select(
      keys.map(col) ++ Seq(col(idCol).as("b_id"), col("cell").as("cb")) ++
        payloadCols.map(c => col(c).as(s"b_$c")): _*)
    left.join(right, keys)
      .filter(least(col("ca"), col("cb")) === col("lo") &&
        greatest(col("ca"), col("cb")) === col("hi") &&
        col("a") < col("b_id"))
      .drop("ca", "cb")
  }

  /** Session-shared component-label table: q70, q102 and q224 all consume
    * the SAME doc_id→component mapping, and the label loop is the most
    * expensive text-tier build after jaccard itself — one materialization
    * per (session, sfDir) is exactly the production "run dedup clustering
    * once, join its labels everywhere" step. Prewarmed in Bench with the
    * other shared projections. */
  private[operators] def components(s: SparkSession, dir: String): DataFrame =
    shared(s, dir, "components") {
      // the label loop runs on the NARROW loop-session clone (fixed
      // 8-partition width at creation — graft.LoopSession; no session-conf
      // mutation on the caller). dedupEdges is checkpointed, so re-homing
      // it onto the clone — and the rebased result back — is free.
      val ss = graft.LoopSession.narrow(s, 8)
      graft.LoopSession.rehome(
        q70Loop(ss, graft.LoopSession.rehome(dedupEdges(s, dir), ss)), s)
    }

  /** Symmetrized near-dup edge list (jac ≥ 0.8), EAGERLY checkpointed
    * BEFORE any partition narrowing. Two reasons, both from audits:
    *  - checkpoint (vs persist): the logical plan would otherwise embed the
    *    whole jaccard chain into EVERY loop round — with pointer doubling
    *    each round references the previous one TWICE, so an un-truncated
    *    loop plan grows exponentially (round 2: 185 exchanges; a doubling
    *    variant hit 6693). One checkpoint keeps every round's plan O(1) and
    *    bounds executor-loss recovery to the last round.
    *  - eager (vs lazy, round-3 ADVICE): a lazy checkpoint would first
    *    materialize inside the narrowed-partitions loop — and with it the
    *    SHARED shingle/minhash/jaccard caches, which every later query in
    *    the session would then re-read at 8-partition parallelism. Forcing
    *    materialization here runs the corpus-scale work at the session's
    *    full partition count; only the tiny label loop runs narrowed. */
  private[operators] def dedupEdges(s: SparkSession, dir: String): DataFrame = {
    val edges0 = jaccard(s, dir).filter(col("jac") >= 0.8)
      .select(col("a").as("u"), col("b_id").as("v"))
    edges0.union(edges0.select(col("v").as("u"), col("u").as("v")))
      .distinct().localCheckpoint(true)
  }

  /** The label/edge tables are near-dup pairs — orders of magnitude smaller
    * than the corpus — and the loop runs several shuffle rounds with a
    * convergence count per round, so per-round job/task-scheduling overhead
    * dominates at the default partition count (a production run sizes it
    * to the edge count; AQE coalesces tasks but can't merge per-round job
    * overhead — A/B-measured +30% at sf0.1 without the narrowing). The
    * narrow width comes from the caller passing a [[graft.LoopSession]]
    * clone — never a set/restore on a shared session. */
  private[operators] def q70Loop(s: SparkSession, edges: DataFrame): DataFrame = {
    val nodes = edges.select(col("u").as("node")).distinct()
    // Barrier.rebase, not bare localCheckpoint: from round 3 the pointer
    // doubling joins the round's result onto itself, the exponential case
    // of the checkpoint stats blow-up (see graft.Barrier) — at the 20-round
    // cap the bare form would have the driver multiplying million-digit
    // size estimates inside planning
    var labels = graft.Barrier.rebase(nodes.withColumn("label", col("node")))
    var converged = false
    var iter = 0
    while (!converged && iter < 20) {
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("node", "v_node"), col("v") === col("v_node"))
        .select(col("u").as("node"), col("label"))
      val propagated = labels.select(col("node"), col("label")).union(viaNeighbors)
        .groupBy("node").agg(min("label").as("label"))
      // pointer doubling: label ← min(label, label(label)); labels are
      // always node ids, so the self-join resolves one extra hop per round.
      // Only from round 3 on — graphs with diameter ≤ 2 (the common
      // near-dup case) converge before doubling's extra self-join pays.
      val stepped = if (iter < 2) propagated
        else propagated.as("a")
          .join(propagated.select(col("node").as("l_node"), col("label").as("l_label")).as("b"),
            col("a.label") === col("l_node"), "left")
          .select(col("a.node").as("node"),
            least(col("a.label"), coalesce(col("l_label"), col("a.label"))).as("label"))
      val next = graft.Barrier.rebase(stepped)
      val changed = next.as("n").join(labels.as("o"), Seq("node"))
        .filter(col("n.label") =!= col("o.label")).count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    labels.select(col("node").as("doc_id"), col("label").as("component"))
      .orderBy("doc_id")
  }

  /** (source, gram) distinct projection (shared/persisted — q97/q99's
    * corpus-statistics base table). */
  private[operators] def srcGrams(s: SparkSession, dir: String): DataFrame =
    shared(s, dir, "src_grams") {
      shingles(s, dir)
        .join(t(s, dir, "documents").select("doc_id", "source"), Seq("doc_id"))
        .select("source", "sh").distinct()
    }

  /** Hashed-feature linear scorer: unigram+bigram grams → 2^16 buckets via
    * the first 4 md5 bytes, bucket → fixed weight in [−1.000, 1.000] via a
    * Knuth-multiplicative mix — the fastText/"quality classifier" shape
    * every production corpus filter runs, with the model folded into the
    * hash so there is nothing to broadcast. All arithmetic up to the final
    * division is exact integers (weights are integer millis summed as
    * BIGINT), so the score and the pass/fail cut are bit-identical across
    * engines and task retries. Compiled UDF for the md5-per-gram loop (the
    * q27-simhash lesson: interpreted HOF lambdas dominate at sf0.1). */
  private[operators] val hashedScoreRaw = udf { (w: Seq[String]) =>
    val md = java.security.MessageDigest.getInstance("MD5")
    def weight(g: String): Long = {
      val d = md.digest(g.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      md.reset()
      val h4 = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      ((h4 % 65536L) * 2654435761L) % 2001L - 1000L
    }
    var s = 0L
    var i = 0
    while (i < w.length) {
      s += weight(w(i))
      if (i + 1 < w.length) s += weight(w(i) + " " + w(i + 1))
      i += 1
    }
    s
  }

  private[operators] val shingleCte =
    """w AS (SELECT doc_id, lang, source, n_chars, text,
      |        list_filter(regexp_split_to_array(text,'\s+'), t -> t <> '') AS w
      |      FROM documents),
      |wf AS (SELECT * FROM w WHERE len(w) >= 3),
      |sh0 AS (SELECT doc_id, unnest([w[i+1]||' '||w[i+2]||' '||w[i+3] for i in range(len(w)-2)]) AS sh FROM wf),
      |sh AS (SELECT DISTINCT doc_id, sh FROM sh0),
      |m AS (SELECT doc_id,
      |  min(md5('0|'||sh)) AS h0, min(md5('1|'||sh)) AS h1,
      |  min(md5('2|'||sh)) AS h2, min(md5('3|'||sh)) AS h3,
      |  min(md5('4|'||sh)) AS h4, min(md5('5|'||sh)) AS h5,
      |  min(md5('6|'||sh)) AS h6, min(md5('7|'||sh)) AS h7
      | FROM sh GROUP BY 1),
      |bands AS (
      |  SELECT doc_id, 1 AS k, md5(h0||h1||h2||h3) AS b FROM m
      |  UNION ALL
      |  SELECT doc_id, 2 AS k, md5(h4||h5||h6||h7) AS b FROM m),
      |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b_id
      |  FROM bands x JOIN bands y ON x.b = y.b AND x.k = y.k AND x.doc_id < y.doc_id),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |inter AS (SELECT a, b_id, count(*) AS inter
      |  FROM cand JOIN sh sa ON a = sa.doc_id JOIN sh sb ON b_id = sb.doc_id AND sa.sh = sb.sh
      |  GROUP BY 1,2),
      |jac AS (SELECT a, b_id, inter,
      |   CAST(inter AS DOUBLE)/CAST(za.n + zb.n - inter AS DOUBLE) AS jac
      |  FROM inter JOIN sizes za ON a = za.doc_id JOIN sizes zb ON b_id = zb.doc_id)""".stripMargin

  private[operators] val simhashCte =
    """w AS (SELECT doc_id, list_filter(regexp_split_to_array(text,'\s+'), t -> t <> '') AS w
      |     FROM documents),
      |wf AS (SELECT doc_id, w FROM w WHERE len(w) >= 3),
      |hs AS (SELECT doc_id,
      |  [CAST(('0x'||substr(md5(t),1,8)) AS BIGINT) for t in w] AS hs FROM wf),
      |sim AS (SELECT doc_id,
      |  CAST(list_aggregate([CASE WHEN list_aggregate([2*((h >> k) & 1) - 1 for h in hs], 'sum') > 0
      |                       THEN (CAST(1 AS BIGINT) << k) ELSE 0 END for k in range(32)], 'sum')
      |       AS BIGINT) AS simhash
      | FROM hs)""".stripMargin

  /** Shared CTE prefix for the q218/q221 gate family — the integer-exact
    * Gopher rules over the whitespace word array (mirrors `gated`). */
  private[operators] val gopherCte =
    """w AS (SELECT doc_id, source, text,
      |        list_filter(regexp_split_to_array(text,'\s+'), t -> t <> '') AS w
      |      FROM documents),
      |wf AS (SELECT * FROM w WHERE len(w) >= 3),
      |f AS (SELECT doc_id, source, text,
      |  CAST(len(w) AS BIGINT) AS nw,
      |  CAST(list_aggregate([CAST(length(t) AS BIGINT) for t in w], 'sum') AS BIGINT) AS sum_wl,
      |  CAST(len(list_filter(w, t -> t IN ('the','a','of','and','to'))) AS BIGINT) AS n_stop,
      |  CAST(len(list_intersect(list_distinct(w), ['the','a','of','and','to'])) AS BIGINT) AS n_stop_d,
      |  CAST(len(list_distinct(w)) AS BIGINT) AS n_dist
      | FROM wf),
      |r AS (SELECT doc_id, source, text,
      |  (nw >= 50 AND nw <= 100000) AS r1,
      |  (sum_wl >= nw * 3 AND sum_wl <= nw * 10) AS r2,
      |  (n_stop_d >= 2) AS r3,
      |  (n_dist * 2 >= nw) AS r4,
      |  (n_stop * 50 >= nw AND n_stop * 10 <= nw * 3) AS r5
      | FROM f)""".stripMargin
}
