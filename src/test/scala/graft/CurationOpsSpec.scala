package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CurationOps

/** Round-5 curation tier: each query checked against an INDEPENDENT
  * driver-side brute-force recomputation on sf0.001 (never against its
  * own plan), so a shared logic error cannot self-confirm.
  */
class CurationOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  /** Reference md5-prefix hash, computed OUTSIDE Spark. */
  private def h32(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    d.take(4).foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL))
  }

  test("q174: checksum is order-independent and matches a JVM-side md5 sum mod 2^32") {
    val got = CurationOps.queries("q174_table_checksum")(spark, dir)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    val orders = Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents")).collect()
    def mask(xs: Seq[Long]): Long =
      (xs.map(BigInt(_)).sum mod BigInt(4294967296L)).toLong
    val hs = orders.map(r => h32(s"${r.getLong(0)}|${r.getLong(1)}|${r.getLong(2)}")).toSeq
    val want = mask(hs)
    // the mask must be LIVE at this SF (raw sum of 32-bit hashes over
    // thousands of rows exceeds 2^32), or the test would pass unmaskeed too
    assert(hs.sum > 4294967296L && want != hs.sum)
    assert(got("orders") == ((orders.length.toLong, want)))
    // order independence: reversing the rows cannot change a masked sum
    assert(mask(hs.reverse) == want)
  }

  test("q174 masking algebra: decimal accumulation cannot wrap where a long sum does, " +
    "and the masked value is partitioning-invariant") {
    import spark.implicits._
    // 4 values of 2^62: the 64-bit long sum wraps to 0 via overflow BY
    // ACCIDENT of 2-adic arithmetic, while the decimal path stays exact;
    // use 5 values so the long sum wraps to a NONZERO wrong value
    // (5*2^62 mod 2^64 = 2^62) whose mod-2^32 image (0) happens to equal
    // the true image — so instead pin the exact decimal total itself.
    val big = Seq.fill(5)(Long.MaxValue / 2 + 1) // 2^62 each
    val masked = big.toDF("h")
      .agg(expr("cast(sum(cast(h as decimal(38,0))) % 4294967296 as bigint)"))
      .head().getLong(0)
    assert(masked == ((BigInt(2).pow(62) * 5) mod BigInt(4294967296L)).toLong)
    val exact = big.toDF("h")
      .agg(sum(col("h").cast("decimal(38,0)")))
      .head().getDecimal(0)
    assert(BigInt(exact.toBigInteger) == BigInt(2).pow(62) * 5) // > Long.MaxValue: long sum would have wrapped
    // partitioning/ordering invariance on realistic 32-bit hash values
    val rnd = new scala.util.Random(174)
    val hs = Seq.fill(5000)(rnd.nextLong().abs % 4294967296L)
    val want = (hs.map(BigInt(_)).sum mod BigInt(4294967296L)).toLong
    for (parts <- Seq(1, 3, 17); xs <- Seq(hs, hs.reverse, hs.sorted)) {
      val got = xs.toDF("h").repartition(parts)
        .agg(expr("cast(sum(cast(h as decimal(38,0))) % 4294967296 as bigint)"))
        .head().getLong(0)
      assert(got == want, s"parts=$parts")
    }
  }

  test("q175: kept set is exactly the per-source top-3 by (n_chars desc, doc_id asc)") {
    val got = CurationOps.queries("q175_domain_cap")(spark, dir)
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val docs = Tables(spark, dir, "documents")
      .select("source", "doc_id", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val bySource = docs.groupBy(_._1)
    assert(got.keySet == bySource.keySet)
    bySource.foreach { case (src, xs) =>
      val kept = xs.sortBy(d => (-d._3, d._2)).take(3)
      val (nDocs, totalChars, nKept, keptChars, keptIdSum) = got(src)
      assert(nDocs == xs.length && totalChars == xs.map(_._3).sum)
      assert(nKept == kept.length && keptChars == kept.map(_._3).sum
        && keptIdSum == kept.map(_._2).sum, s"source $src")
    }
  }

  test("q176: t=0.5 shares follow floor(sqrt(n*1e12)) weights and sum to ~1") {
    val rows = CurationOps.queries("q176_mixture_weights")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val n = rows.map { case (_, nd, _, _) => nd }
    val w = n.map(nd => math.floor(math.sqrt(nd.toDouble * 1.0e12)).toLong)
    val (tw, tn) = (w.sum, n.sum)
    rows.zipWithIndex.foreach { case ((lang, nd, raw, t05), i) =>
      val wantRaw = ((2 * nd * 1000000L + tn) / (2 * tn)).toDouble / 1e6
      val wantT05 = ((2 * w(i) * 1000000L + tw) / (2 * tw)).toDouble / 1e6
      assert(raw == wantRaw && t05 == wantT05, s"lang $lang")
    }
    // temperature flattens: every below-average language is up-weighted
    rows.foreach { case (lang, nd, raw, t05) =>
      if (raw < 1.0 / rows.length) assert(t05 >= raw, s"$lang should be up-weighted")
    }
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-3)
  }

  test("q177: channel revenue equals a driver-side first-touch replay") {
    val got = CurationOps.queries("q177_first_touch")(spark, dir)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val ev = Tables(spark, dir, "events")
      .select(col("user_id"), unix_timestamp(col("ts")).as("es"),
        col("event_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val firstTouch = ev.groupBy(_._1).map { case (u, xs) =>
      (u, xs.minBy(x => (x._2, x._3))._4)
    }
    val orders = Tables(spark, dir, "orders")
      .select(col("o_custkey"), round(col("o_totalprice") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(o => firstTouch.contains(o._1))
    val want = firstTouch.toSeq.groupBy(_._2).map { case (ch, users) =>
      val us = users.map(_._1).toSet
      val os = orders.filter(o => us(o._1))
      (ch, (us.size.toLong, os.length.toLong, os.map(_._2).sum))
    }
    assert(got == want)
  }

  test("q179: phrase matches equal a driver-side scan for the induced trigram") {
    val rows = CurationOps.queries("q179_phrase_search")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val (a, b, c, _, _) = rows.head
    val docs = Tables(spark, dir, "documents").select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty)))
    // the induced trigram is the global most-frequent one, ties broken by
    // the lexicographically smallest phrase (the query's rule)
    val allTris = docs.flatMap { case (_, ws) => ws.sliding(3).filter(_.length == 3).map(_.toSeq) }
    val cnts = allTris.groupBy(identity).view.mapValues(_.length).toSeq
    val maxN = cnts.map(_._2).max
    val want = cnts.filter(_._2 == maxN).map(_._1.mkString(" ")).min.split(" ")
    assert(Seq(a, b, c) == want.toSeq, s"induced ($a $b $c), want ${want.mkString(" ")}")
    // per-doc occurrence counts match a driver-side sliding-window scan
    val wantOcc = docs.map { case (id, ws) =>
      (id, ws.sliding(3).count(t => t.length == 3 && t.sameElements(Array(a, b, c))))
    }.filter(_._2 > 0).sortBy { case (id, n) => (-n, id) }.take(20)
      .map { case (id, n) => (id, n.toLong) }
    assert(rows.map(r => (r._4, r._5)).toSeq == wantOcc.toSeq)
  }

  test("q180: incremental retraction merge equals a full recompute of the post-CDC view") {
    val got = CurationOps.queries("q180_retractable_mv")(spark, dir)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    val docs = Tables(spark, dir, "documents").select("source", "doc_id", "n_chars")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val post = docs.filter(_._2 % 7 != 0)
      .map { case (s, id, nc) => (s, if (id % 5 == 0) nc + 10 else nc) }
    val want = post.groupBy(_._1).map { case (s, xs) =>
      (s, (xs.length.toLong, xs.map(_._2).sum))
    }.filter(_._2._1 > 0)
    assert(got.size == want.size)
    want.foreach { case (s, (n, chars)) => assert(got(s) == ((n, chars)), s"source $s") }
  }

  test("q181: prefix-filtered join equals BRUTE-FORCE all-pairs Jaccard >= 0.6 (no missed pair)") {
    val got = CurationOps.queries("q181_prefix_filter_join")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val docs = Tables(spark, dir, "documents").select("doc_id", "text").collect()
      .map { r =>
        val ws = r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty)
        (r.getLong(0), ws.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet)
      }
      .filter(_._2.nonEmpty)
    val brute = (for {
      (a, sa) <- docs; (b, sb) <- docs if a < b
      inter = (sa & sb).size.toLong
      uni = (sa | sb).size.toLong
      if inter * 5 >= uni * 3
    } yield (a, b, inter, uni, (2 * inter * 1000000L + uni) / (2 * uni)))
      .sortBy { case (a, b, _, _, j) => (-j, a, b) }.take(50)
    assert(got.toSeq == brute.toSeq,
      s"got ${got.length} pairs, brute-force ${brute.length}")
    assert(brute.nonEmpty, "fixture should contain at least one pair at tau=0.6")
  }

  test("q182: rolling 7-day distinct equals a driver-side per-day set union") {
    val got = CurationOps.queries("q182_rolling_distinct")(spark, dir)
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1))).toMap
    val ev = Tables(spark, dir, "events")
      .select(to_date(col("ts")).as("d"), col("user_id")).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val byDay = ev.groupBy(_._1).map { case (d, xs) => (d, xs.map(_._2).toSet) }
    val days = byDay.keySet
    assert(got.keySet == days)
    days.foreach { d =>
      val want = (0 to 6).flatMap(k => byDay.getOrElse(d.minusDays(k), Set.empty)).toSet
      assert(got(d) == want.size.toLong, s"day $d")
      // rolling >= single day (set union can only grow)
      assert(got(d) >= byDay(d).size.toLong)
    }
  }

  test("q183: weighted median satisfies the defining cumulative-weight inequality") {
    val got = CurationOps.queries("q183_weighted_median")(spark, dir)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    val sup = Tables(spark, dir, "supplier").select("s_suppkey", "s_nationkey")
      .collect().map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue)).toMap
    val nat = Tables(spark, dir, "nation").select("n_nationkey", "n_name")
      .collect().map(r => (r.getAs[Number](0).longValue, r.getString(1))).toMap
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_suppkey"), round(col("l_extendedprice") * 100).cast("long"),
        col("l_quantity").cast("long")).collect()
      .map(r => (nat(sup(r.getAs[Number](0).longValue)), r.getLong(1), r.getLong(2)))
    val byNation = li.groupBy(_._1)
    assert(got.keySet == byNation.keySet)
    byNation.foreach { case (nName, xs) =>
      val w = xs.groupBy(_._2).map { case (c, ys) => (c, ys.map(_._3).sum) }
      val tw = w.values.sum
      val (gotTw, med) = got(nName)
      assert(gotTw == tw, s"nation $nName total")
      // defining property: weight at-or-below med reaches half; strictly
      // below does not
      val below = w.filter(_._1 < med).values.sum
      val atOrBelow = w.filter(_._1 <= med).values.sum
      assert(atOrBelow * 2 >= tw && below * 2 < tw, s"nation $nName median $med")
    }
  }

  test("q184: leaf cents reconcile exactly and shares close to ~1 within each parent") {
    val rows = CurationOps.queries("q184_hierarchy_shares")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    // exact reconciliation: sum of leaf cents equals the one-scan total
    val totalWant = Tables(spark, dir, "lineitem")
      .select(round(col("l_extendedprice") * 100).cast("long").as("c"))
      .agg(sum("c")).collect()(0).getLong(0)
    assert(rows.map(_._3).sum == totalWant)
    // shares close within each region (micro rounding: +/- n_children ulp)
    rows.groupBy(_._1).foreach { case (r, xs) =>
      val shareSum = xs.map(_._4).sum
      assert(math.abs(shareSum - 1.0) <= xs.length * 1e-6, s"region $r sum $shareSum")
    }
    // region shares (constant per region) sum to ~1 across regions
    val regShares = rows.groupBy(_._1).map { case (_, xs) => xs.head._5 }
    assert(math.abs(regShares.sum - 1.0) <= regShares.size * 1e-6)
  }

  test("q181 scale property: hot boilerplate shingles never enter prefixes (blocks stay tiny)") {
    import spark.implicits._
    // 200 docs: every one shares the same 10-word boilerplate phrase, and
    // each carries 30 unique words. Word-level blocking on the shared
    // phrase would be quadratic (200 choose 2 = 19900 pairs); rarest-first
    // prefixes must exclude the universal shingles entirely.
    val boiler = (1 to 10).map(i => s"legal$i").mkString(" ")
    val docs = (1 to 200).map { d =>
      (d.toLong, boiler + " " + (1 to 30).map(i => s"u${d}x$i").mkString(" "))
    }.toDF("doc_id", "text")
    val tok = docs
      .select(col("doc_id"),
        array_remove(split(lower(col("text")), "\\s+"), "").as("ws"))
      .withColumn("t1", slice(col("ws"), lit(1), size(col("ws")) - 2))
      .withColumn("t2", slice(col("ws"), lit(2), size(col("ws")) - 2))
      .withColumn("t3", slice(col("ws"), lit(3), size(col("ws")) - 2))
      .select(col("doc_id"),
        explode(array_distinct(expr(
          "transform(arrays_zip(t1, t2, t3), s -> concat_ws(' ', s.t1, s.t2, s.t3))"))).as("w"))
    val dfs = tok.groupBy("w").agg(count(lit(1)).as("df"))
    val n = tok.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val pref = tok.join(dfs, "w").join(n, "doc_id")
      .withColumn("rk", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("df", "w")))
      .filter(col("rk") <= col("n") - expr("(3 * n + 4) div 5") + 1)
    // no prefix shingle is shared by more than 2 docs -> candidate blocks
    // are O(1), pairs ~0 despite 100% of docs sharing the boilerplate
    val maxBlock = pref.groupBy("w").agg(count(lit(1)).as("c"))
      .agg(max("c")).collect()(0).getLong(0)
    assert(maxBlock <= 2L, s"hot shingle leaked into a prefix (block size $maxBlock)")
    val candPairs = pref.as("x").join(pref.as("y"),
        col("x.w") === col("y.w") && col("x.doc_id") < col("y.doc_id")).count()
    assert(candPairs < 50L, s"candidate pairs $candPairs should be << 19900 (quadratic)")
  }

  test("q178: buckets are contiguous, exhaustive, and reasonably balanced") {
    val rows = CurationOps.queries("q178_range_plan")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val nTotal = Tables(spark, dir, "lineitem").count()
    assert(rows.map(_._1).toSeq == (0L until rows.length).toSeq)
    assert(rows.map(_._2).sum == nTotal)
    // ranges are disjoint and ordered: each bucket's hi < next bucket's lo is
    // not required (cut ties share a value), but lo <= hi and lo monotone
    rows.foreach { case (b, n, lo, hi, bal) =>
      assert(lo <= hi, s"bucket $b")
      assert(n > 0, s"bucket $b empty")
    }
    assert(rows.sliding(2).forall { case Array(a, b) => a._4 <= b._3 || a._3 <= b._3 })
    // equal-mass planning: no bucket more than 2x ideal on this data
    rows.foreach { case (b, _, _, _, bal) =>
      assert(bal < 2000000L, s"bucket $b balance $bal")
    }
  }

  test("q193: quotas are the exact Hamilton allocation and sum to 1000") {
    val got = CurationOps.queries("q193_quota_alloc")(spark, dir)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap

    val counts = Tables(spark, dir, "documents").select("source", "lang").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val t = counts.values.sum
    val based = counts.toSeq.map { case ((src, l), n) =>
      (src, l, n, n * 1000L / t, n * 1000L % t)
    }
    val leftover = (1000L - based.map(_._4).sum).toInt
    val bumped = based.sortBy { case (src, l, _, _, rem) => (-rem, src, l) }
      .take(leftover).map(x => (x._1, x._2)).toSet

    assert(got.keySet == based.map(x => (x._1, x._2)).toSet)
    based.foreach { case (src, l, n, base, rem) =>
      val quota = base + (if (bumped((src, l))) 1L else 0L)
      assert(got((src, l)) == ((n, base, rem, quota)), s"stratum ($src,$l)")
    }
    assert(got.values.map(_._4).sum == 1000L, "budget must be hit exactly")
  }

  test("q197: sampled set is exactly the per-stratum md5-order prefix of the Hamilton quotas") {
    val got = CurationOps.queries("q197_quota_sample")(spark, dir)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

    def md5hex(x: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(x.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    val docs = Tables(spark, dir, "documents").select("doc_id", "source", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val counts = docs.groupBy(d => (d._2, d._3)).map { case (k, v) => k -> v.length.toLong }
    val t = counts.values.sum
    val based = counts.toSeq.map { case ((src, l), n) => (src, l, n, n * 1000L / t, n * 1000L % t) }
    val leftover = (1000L - based.map(_._4).sum).toInt
    val bumped = based.sortBy { case (src, l, _, _, rem) => (-rem, src, l) }
      .take(leftover).map(x => (x._1, x._2)).toSet
    val quotas = based.map { case (src, l, _, base, _) =>
      (src, l) -> (base + (if (bumped((src, l))) 1L else 0L))
    }.toMap

    var totalSampled = 0L
    docs.groupBy(d => (d._2, d._3)).foreach { case (k, xs) =>
      val kept = xs.map(d => (md5hex(d._1.toString), d._1))
        .sortBy(identity).take(quotas(k).toInt)
      val want = (kept.length.toLong, kept.map(_._2).sum,
        kept.map(x => java.lang.Long.parseLong(x._1.take(8), 16)).sum)
      if (quotas(k) > 0L) assert(got(k) == want, s"stratum $k")
      else assert(!got.contains(k), s"zero-quota stratum $k must not appear")
      totalSampled += kept.length.toLong
    }
    // a stratum can hold fewer docs than its quota only when the budget
    // exceeds the corpus (sf0.001 has 500 docs for the 1000 budget) —
    // then every doc is sampled; with T >= N the budget is hit exactly
    val expected = quotas.map { case (k, q) => math.min(q, counts(k)) }.sum
    assert(totalSampled == expected)
    assert(got.values.map(_._1).sum == expected)
    if (t >= 1000L) assert(expected == 1000L)
  }
}
