package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ScaleOps

/** q131's df-capped inverted index: posting rows must stay bounded under
  * stop-word-heavy corpora (the 100 TB OOM hazard the shard split exists
  * for), shard counts must be powers of two, and the shard-aligned
  * intersection must agree with a brute-force in-JVM recomputation for
  * word pairs with EQUAL and DIFFERENT shard counts.
  */
class ShardedIndexSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** docs: (doc_id, text); returns word -> sorted doc ids, in-JVM. */
  private def brute(docs: Seq[(Long, String)]): Map[String, Seq[Long]] =
    docs.flatMap { case (id, text) =>
      text.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct.map(_ -> id)
    }.groupBy(_._1).map { case (w, xs) => w -> xs.map(_._2).sorted.toSeq }

  test("stop-word fixture: per-row postings bounded by the cap, pow2 shard counts") {
    import spark.implicits._
    val cap = 8L
    // 64 docs, every one contains "the"; "mid" in 20; "rare" in 3
    val docs = (0L until 64L).map { i =>
      val mid = if (i % 3 == 0) " mid" else ""
      val rare = if (i < 3) " rare" else ""
      (i, s"the w$i$mid$rare")
    }
    val idx = ScaleOps.buildInvertedIndex(docs.toDF("doc_id", "text"), cap)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getSeq[Long](4).toSeq))

    // every posting row bounded: dense sequential ids split residue classes
    // exactly evenly, so size == df / nshards <= cap
    assert(idx.forall { case (_, _, _, _, p) => p.size <= cap })
    // nshards is a power of two, uniform per word, and minimal for the df
    for ((w, rows) <- idx.groupBy(_._1)) {
      val ns = rows.map(_._3).distinct
      assert(ns.size == 1, s"$w has mixed nshards")
      val n = ns.head
      assert((n & (n - 1)) == 0, s"$w nshards=$n not pow2")
      val df = rows.head._2
      assert(df <= n * cap, s"$w under-sharded")
      assert(n == 1 || df > (n / 2) * cap, s"$w over-sharded (df=$df n=$n)")
    }
    // "the": df=64, cap=8 -> 8 shards of exactly 8
    val the = idx.filter(_._1 == "the")
    assert(the.length == 8 && the.forall(_._5.size == 8))
    // "rare": df=3 -> single unsharded row
    assert(idx.filter(_._1 == "rare").map(r => (r._3, r._5)).toSeq ==
      Seq((1L, Seq(0L, 1L, 2L))))
    // union of shards reconstructs the full posting list exactly
    val bf = brute(docs)
    for ((w, rows) <- idx.groupBy(_._1))
      assert(rows.flatMap(_._5).sorted.toSeq == bf(w), s"postings($w)")
  }

  test("shard-aligned intersection == brute force across unequal shard counts") {
    import spark.implicits._
    val cap = 8L
    val docs = (0L until 64L).map { i =>
      val mid = if (i % 3 == 0) " mid" else ""
      val rare = if (i < 3) " rare" else ""
      (i, s"the w$i$mid$rare")
    }
    val idx = ScaleOps.buildInvertedIndex(docs.toDF("doc_id", "text"), cap)
    val bf = brute(docs)
    def want(a: String, b: String): (Long, Long, Long, Long) = {
      val hits = bf(a).toSet & bf(b).toSet
      (bf(a).size.toLong, bf(b).size.toLong, hits.size.toLong, hits.sum)
    }
    // the(8 shards) x mid(4 shards), the x rare(1 shard), mid x rare
    for ((a, b) <- Seq(("the", "mid"), ("the", "rare"), ("mid", "rare"))) {
      val got = ScaleOps.intersectPostings(idx, a, b, s"$a AND $b")
        .select("df1", "df2", "n_hits", "hits_checksum")
        .head()
      assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3))
        == want(a, b), s"$a AND $b")
    }
  }

  test("randomized corpora: every pairwise intersection matches brute force") {
    import spark.implicits._
    val rand = new scala.util.Random(20260806L)
    for (round <- 1 to 3) {
      val n = 50 + rand.nextInt(100)
      // sparse non-contiguous doc ids — shard residues must not rely on density
      val ids = new scala.util.Random(round * 7L)
        .shuffle((0L until 4L * n).toList).take(n).sorted
      val vocab = Vector("alpha", "beta", "gamma", "delta", "eps")
      val docs = ids.map { id =>
        val ws = vocab.filter(_ => rand.nextDouble() < 0.55)
        (id, if (ws.isEmpty) "alpha" else ws.mkString(" "))
      }
      val cap = 4L
      val idx = ScaleOps.buildInvertedIndex(docs.toDF("doc_id", "text"), cap)
      val bf = brute(docs)
      for (a <- vocab; b <- vocab if a < b && bf.contains(a) && bf.contains(b)) {
        val hits = bf(a).toSet & bf(b).toSet
        val got = ScaleOps.intersectPostings(idx, a, b, "q")
          .select("n_hits", "hits_checksum").head()
        assert((got.getLong(0), got.getLong(1)) == (hits.size.toLong, hits.sum),
          s"round $round: $a AND $b")
      }
    }
  }
}
