package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SuffixOps

/** Suffix-array tier: the distributed prefix-doubling rank must equal a
  * local brute-force sort of every suffix's capped prefix, and the LCP
  * duplicated-substring counts must equal a local all-neighbor scan —
  * both computed independently here from the raw documents table.
  */
class SuffixOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  /** Local ground truth: every (doc_id, source, pos, prefixCap) sorted by
    * (prefix, doc_id, pos) with 1-based ranks — the definition the
    * distributed doubling must reproduce. */
  private lazy val local: Array[(Long, String, Int, String, Long)] = {
    val docs = Tables(spark, dir, "documents")
      .select("doc_id", "source", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val sufs = docs.flatMap { case (id, src, txt) =>
      (1 to txt.length).map { p =>
        (id, src, p, txt.substring(p - 1, math.min(txt.length, p - 1 + SuffixOps.Cap)))
      }
    }
    val sorted = sufs.sortBy { case (id, _, p, pref) => (pref, id, p) }
    sorted.zipWithIndex.map { case ((id, src, p, pref), i) =>
      (id, src, p, pref, i + 1L)
    }
  }

  test("q215: distributed prefix-doubling rank matches local brute-force suffix sort") {
    val expected = local
      .groupBy(_._2)
      .map { case (src, rows) =>
        val sumRank = rows.map(_._5).sum
        val mix = rows.map { case (_, _, p, _, rk) => (rk % 1000003L) * (p % 1009L) }.sum
        src -> ((rows.length.toLong, sumRank, mix, rows.map(_._5).min))
      }
    val got = SuffixOps.queries("q215_suffix_rank")(spark, dir).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val src = r.getString(0)
      val (n, sumRank, mix, first) = expected(src)
      assert(r.getLong(1) == n, s"$src n_suffixes")
      assert(r.getLong(2) == sumRank, s"$src sum_rank")
      assert(r.getLong(3) == mix, s"$src rank_pos_mix")
      assert(r.getLong(4) == first, s"$src first_rank")
    }
  }

  test("q216: LCP duplicated-substring counts match a local neighbor scan") {
    def cpl(a: String, b: String): Long = {
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n && a.charAt(i) == b.charAt(i)) i += 1
      math.min(i, SuffixOps.Cap).toLong
    }
    // local: dup_len(i) = max(lcp with rank neighbors); per-source counts
    val byRank = local.sortBy(_._5)
    val expected = byRank.indices.map { i =>
      val (_, src, _, pref, _) = byRank(i)
      val lp = if (i > 0) cpl(pref, byRank(i - 1)._4) else 0L
      val ln = if (i < byRank.length - 1) cpl(pref, byRank(i + 1)._4) else 0L
      (src, math.max(lp, ln))
    }.groupBy(_._1).map { case (src, rows) =>
      val lens = rows.map(_._2)
      src -> ((lens.length.toLong, lens.count(_ >= 20).toLong,
        lens.count(_ >= 40).toLong, lens.max, lens.sum))
    }
    val got = SuffixOps.queries("q216_dup_substrings")(spark, dir).collect()
    assert(got.length == expected.size)
    var sawDup = false
    got.foreach { r =>
      val src = r.getString(0)
      val (n, d20, d40, mx, sm) = expected(src)
      assert(r.getLong(1) == n, s"$src n_pos")
      assert(r.getLong(2) == d20, s"$src n_dup20")
      assert(r.getLong(3) == d40, s"$src n_dup40")
      assert(r.getLong(4) == mx, s"$src max_dup_len")
      assert(r.getLong(5) == sm, s"$src sum_dup_len")
      assert(math.abs(r.getDouble(6) - d20.toDouble / n) < 1e-4, s"$src dup_frac20")
      if (d20 > 0) sawDup = true
    }
    // the synthetic corpus's shared vocabulary guarantees ≥20-char repeats
    // somewhere — an all-zero dup column would mean the LCP scan is broken
    assert(sawDup, "no source shows any >=20-char duplicated substring")
  }

  test("q217: span removal matches a local interval-merge replay") {
    def cpl(a: String, b: String): Long = {
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n && a.charAt(i) == b.charAt(i)) i += 1
      math.min(i, SuffixOps.Cap).toLong
    }
    // local dup_len per (doc, pos), as in the q216 replay
    val byRank = local.sortBy(_._5)
    val dup = byRank.indices.map { i =>
      val (id, src, pos, pref, _) = byRank(i)
      val lp = if (i > 0) cpl(pref, byRank(i - 1)._4) else 0L
      val ln = if (i < byRank.length - 1) cpl(pref, byRank(i + 1)._4) else 0L
      (id, src, pos, math.max(lp, ln))
    }
    // merge intervals per doc, count spans/removed
    val perDoc: Map[Long, (Long, Long)] = dup
      .filter(_._4 >= SuffixOps.MinSpan)
      .groupBy(_._1)
      .map { case (id, rows) =>
        val iv = rows.map { case (_, _, p, l) => (p.toLong, p + l) }.sortBy(_._1)
        var spans = 0L; var removed = 0L
        var cs = -1L; var ce = -1L
        iv.foreach { case (s0, e0) =>
          if (cs < 0) { cs = s0; ce = e0 }
          else if (s0 <= ce) { if (e0 > ce) ce = e0 }
          else { spans += 1; removed += ce - cs; cs = s0; ce = e0 }
        }
        if (cs >= 0) { spans += 1; removed += ce - cs }
        id -> ((spans, removed))
      }
    val docs = Tables(spark, dir, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).length.toLong))
    val expected = docs.groupBy(_._2).map { case (src, ds) =>
      val nDocs = ds.length.toLong
      val affected = ds.count(d => perDoc.contains(d._1)).toLong
      val spans = ds.map(d => perDoc.get(d._1).map(_._1).getOrElse(0L)).sum
      val removed = ds.map(d => perDoc.get(d._1).map(_._2).getOrElse(0L)).sum
      val kept = ds.map(_._3).sum - removed
      src -> ((nDocs, affected, spans, removed, kept))
    }
    val got = SuffixOps.queries("q217_span_removal")(spark, dir).collect()
    assert(got.length == expected.size)
    var sawRemoval = false
    got.foreach { r =>
      val src = r.getString(0)
      val (n, aff, spans, removed, kept) = expected(src)
      assert(r.getLong(1) == n, s"$src n_docs")
      assert(r.getLong(2) == aff, s"$src n_docs_affected")
      assert(r.getLong(3) == spans, s"$src n_spans")
      assert(r.getLong(4) == removed, s"$src removed_chars")
      assert(r.getLong(5) == kept, s"$src kept_chars")
      if (removed > 0) sawRemoval = true
    }
    assert(sawRemoval, "no source had any >=MinSpan duplicated span removed")
  }

  test("accounting identity: suffix count equals total corpus characters") {
    val totalChars = Tables(spark, dir, "documents")
      .selectExpr("sum(length(text))").collect()(0).getLong(0)
    val n = SuffixOps.queries("q215_suffix_rank")(spark, dir)
      .selectExpr("sum(n_suffixes)").collect()(0).getLong(0)
    assert(n == totalChars)
  }
}
