package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CorpusOps

/** Round-4 corpus tier: Count-Min one-sided-error guarantee, span-dedup
  * accounting identities, LM scoring sanity against a hand model, BM25
  * monotonicity, and fuzzy-join symmetry-freeness.
  */
class CorpusOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def run(name: String): Array[Row] =
    CorpusOps.queries(name)(spark, dir).collect()

  test("q125 count-min: estimates never undercount, and hot items stay near-exact") {
    val rows = run("q125_countmin")
    assert(rows.length == 10)
    rows.foreach { r =>
      val (exact, est, ok) = (r.getAs[Long]("exact_n"), r.getAs[Long]("est_n"),
        r.getAs[Boolean]("over_ok"))
      assert(ok && est >= exact, s"${r.getString(0)}: est $est < exact $exact")
    }
    // the 7 hot items dominate the stream; a 4x256 sketch's collision
    // noise is bounded by the cold mass, far below the hot counts
    val hot = rows.filter(_.getString(0).startsWith("hot_"))
    hot.foreach { r =>
      val (exact, est) = (r.getAs[Long]("exact_n"), r.getAs[Long]("est_n"))
      assert(est - exact <= math.max(20L, exact / 2),
        s"hot item overestimate implausibly large: $est vs $exact")
    }
  }

  test("q123 span dedup: accounting identity and a planted duplicate is found") {
    val rows = run("q123_span_dedup")
    rows.foreach { r =>
      val (n, dup, frac) = (r.getAs[Long]("n_spans"), r.getAs[Long]("n_dup_spans"),
        r.getAs[Double]("dup_frac"))
      assert(dup >= 0 && dup < n)
      assert(math.abs(frac - dup.toDouble / n) < 1e-4)
    }
    // directly: two docs sharing an 8-word run must collide on a span hash
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq((1L, s"$base one two three four five six seven eight", "s"),
      (2L, s"$base nine ten eleven twelve thirteen fourteen fifteen sixteen", "s"))
      .toDF("doc_id", "text", "source")
    docs.createOrReplaceTempView("span_probe")
    val spans = docs
      .select(col("doc_id"), array_remove(split(lower(col("text")), "\\s+"), "").as("ws"))
      .withColumn("h", expr(
        "transform(sequence(0, size(ws) div 8 - 1), i -> md5(array_join(slice(ws, i*8+1, 8), ' ')))"))
      .select(explode(col("h")).as("h")).groupBy("h").count()
      .filter(col("count") > 1).count()
    assert(spans == 1L, "the shared leading 8-word span must hash-collide exactly once")
  }

  test("q122 unigram LM: uniform text scores lower cross-entropy than rare-word text") {
    // hand-check the smoothed-LM arithmetic on a 2-doc corpus: doc A uses
    // the corpus's common word, doc B a hapax; H(A) < H(B) by construction
    import spark.implicits._
    val rows = run("q122_unigram_lm")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getAs[Double]("avg_xent")
      // log2(vocab-ish) bounds: sf0.001 corpus vocabulary is ~60 words
      assert(h > 1.0 && h < 16.0, s"cross-entropy $h outside plausible band")
      assert(r.getAs[Long]("n_tokens") > 0)
    }
  }

  test("q126 bm25: scores positive, terms bounded by query size, ordering respected") {
    val rows = run("q126_bm25")
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      assert(r.getAs[Double]("bm25") > 0.0)
      assert(r.getAs[Long]("n_terms") >= 1 && r.getAs[Long]("n_terms") <= 3)
    }
    val scores = rows.map(_.getAs[Double]("bm25"))
    assert(scores.sameElements(scores.sortBy(-_)), "not sorted by score desc")
  }

  test("q127 textrank: ranks form a probability-mass-conserving distribution") {
    val rows = run("q127_textrank")
    assert(rows.nonEmpty && rows.length <= 25)
    rows.foreach(r => assert(r.getAs[Double]("rank") > 0.0))
    // PageRank on a connected symmetric graph conserves total mass ≈ 1;
    // the top-25 cut means the visible sum is ≤ 1 but must carry most of it
    val mass = rows.map(_.getAs[Double]("rank")).sum
    assert(mass > 0.3 && mass <= 1.0 + 1e-6, s"rank mass $mass implausible")
    val ranks = rows.map(_.getAs[Double]("rank"))
    assert(ranks.sameElements(ranks.sortBy(-_)), "not sorted by rank desc")
  }

  test("q130 markov: per-state outgoing probabilities sum to 1") {
    val rows = run("q130_markov_transitions")
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("cur")).foreach { case (cur, rs) =>
      val psum = rs.map(_.getAs[Double]("p")).sum
      assert(math.abs(psum - 1.0) < 1e-4, s"$cur rows sum to $psum")
      val n = rs.map(_.getAs[Long]("n")).sum
      assert(n > 0)
    }
  }

  test("q129 anomaly: every emitted row is beyond the 2-sigma gate") {
    val rows = run("q129_anomaly_hours")
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("z")) > 2.0 - 1e-4,
        s"row inside the gate: z=${r.getAs[Double]("z")}")
    }
  }

  test("q128 bpe merges: pair counts match a hand count on a probe corpus") {
    import spark.implicits._
    // "abab" contributes ab, ba, ab; "abc" contributes ab, bc
    val probe = Seq("abab", "abc").toDF("word")
      .select(explode(expr(
        "transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))")).as("pair"))
      .groupBy("pair").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(probe == Map("ab" -> 3L, "ba" -> 1L, "bc" -> 1L))
    val rows = run("q128_bpe_merges")
    assert(rows.length == 10)
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.sameElements(ns.sortBy(-_)))
  }

  test("q138 entropy: within [0, log2(alphabet)]; uniform text maximizes") {
    val rows = run("q138_char_entropy")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (h, k) = (r.getAs[Double]("entropy_bits"), r.getAs[Long]("n_distinct_chars"))
      assert(h >= 0.0 && h <= math.log(k.toDouble) / math.log(2.0) + 1e-9,
        s"${r.getString(0)}: H=$h outside [0, log2($k)]")
    }
  }

  test("q139 KL divergence: non-negative everywhere (Gibbs), zero only for the corpus itself") {
    val rows = run("q139_source_divergence")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("kl_bits") >= -1e-9,
        s"${r.getString(0)}: negative KL ${r.getAs[Double]("kl_bits")}")
    }
    // sources are distinct slices of the blend, so at least one diverges
    assert(rows.exists(_.getAs[Double]("kl_bits") > 1e-4), "all-zero KL — vacuous")
  }

  test("degenerate inputs: short docs produce no spans/bigrams instead of descending-sequence blowups") {
    import spark.implicits._
    // sequence(1, 0) in Spark STEPS DOWNWARD — the CASE guards in q123/q127
    // exist to keep sub-window docs from exploding into phantom rows
    val short = Seq("one two three four five", "solo", "").toDF("text")
      .select(array_remove(split(lower(col("text")), "\\s+"), "").as("ws"))
    val spans = short.select(expr(
      """CASE WHEN size(ws) >= 8
         THEN transform(sequence(0, size(ws) div 8 - 1), i -> array_join(slice(ws, i*8+1, 8), ' '))
         ELSE array() END""").as("sp"))
      .select(explode(col("sp"))).count()
    assert(spans == 0L, "sub-8-word docs must contribute zero spans")
    val bigrams = short.select(expr(
      """CASE WHEN size(ws) >= 2
         THEN transform(sequence(1, size(ws) - 1), i -> struct(ws[i-1] AS a, ws[i] AS b))
         ELSE array() END""").as("p"))
      .select(explode(col("p"))).count()
    assert(bigrams == 4L, "5-word doc has 4 bigrams; 1- and 0-word docs none")
  }

  test("q124 fuzzy join: pairs are deduped (a<b), distances within [1,2]") {
    val rows = run("q124_fuzzy_join")
    rows.foreach { r =>
      assert(r.getAs[String]("name_a") < r.getAs[String]("name_b"))
      val lev = r.getAs[Int]("lev")
      assert(lev >= 1 && lev <= 2)
    }
    val pairs = rows.map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs.size == rows.length, "duplicate pairs emitted")
  }

  test("q195: RRF fusion matches a driver-side integer recomputation") {
    val got = CorpusOps.queries("q195_rank_fusion")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq

    val docs = Tables(spark, dir, "documents").select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty)))
    val topWord = docs.flatMap(_._2).groupBy(identity)
      .map { case (w, v) => (w, v.length) }.toSeq
      .sortBy { case (w, c) => (-c, w) }.head._1
    val scored = docs.filter(_._2.contains(topWord)).map { case (id, ws) =>
      val tf = ws.count(_ == topWord).toLong
      (id, tf, ws.length.toLong, tf * 1000000L / ws.length)
    }.toSeq
    val rd = scored.sortBy { case (id, _, _, dm) => (-dm, id) }
      .zipWithIndex.map { case (x, i) => x._1 -> (i + 1L) }.toMap
    val rt = scored.sortBy { case (id, tf, _, _) => (-tf, id) }
      .zipWithIndex.map { case (x, i) => x._1 -> (i + 1L) }.toMap
    val want = scored.map { case (id, tf, n, dm) =>
      (id, tf, n, dm, rd(id), rt(id),
        1000000000L / (60L + rd(id)) + 1000000000L / (60L + rt(id)))
    }.sortBy { case (id, _, _, _, _, _, rrf) => (-rrf, id) }.take(20)
    assert(got == want)
  }
}
