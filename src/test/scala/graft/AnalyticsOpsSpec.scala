package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AnalyticsOps

/** Round-4 analytics tier: each query checked against an INDEPENDENT
  * driver-side brute-force recomputation on sf0.001 (not against its own
  * plan), so a shared logic error cannot self-confirm.
  */
class AnalyticsOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("q146: covered seconds match a driver-side interval sweep") {
    val got = AnalyticsOps.queries("q146_interval_merge")(spark, dir)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val raw = Tables(spark, dir, "events")
      .select(col("user_id"), unix_timestamp(col("ts")).as("es"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (u, xs) => (u, xs.map(_._2).sorted) }
    raw.foreach { case (u, starts) =>
      // brute-force merge of [s, s+1800) intervals
      var islands = 0; var covered = 0L
      var curStart = -1L; var curEnd = -1L
      starts.foreach { s =>
        if (s > curEnd) { // strict: touching intervals merge
          if (islands > 0) covered += curEnd - curStart
          islands += 1; curStart = s; curEnd = s + 1800
        } else curEnd = math.max(curEnd, s + 1800)
      }
      covered += curEnd - curStart
      val (nEv, nIsl, cov) = got(u)
      assert(nEv == starts.length && nIsl == islands && cov == covered,
        s"user $u: got ${got(u)}, want (${starts.length}, $islands, $covered)")
    }
  }

  test("q147: every purchase resolves to the latest dim version at or before it (no leakage)") {
    val ev = Tables(spark, dir, "events")
      .select("user_id", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val dimByUser = ev.filter(e => e._3 == "signup" || e._3 == "error")
      .groupBy(_._1).map { case (u, xs) => (u, xs.sortBy(_._2)) }
    val got = AnalyticsOps.queries("q147_pit_join")(spark, dir)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getString(2), r.getLong(3))))
    assert(got.nonEmpty)
    got.foreach { case (pid, (u, state, vn)) =>
      val prior = dimByUser.getOrElse(u, Array.empty[(Long, Long, String)])
        .filter(_._2 <= pid)
      if (prior.isEmpty) assert(state == "none" && vn == 0L, s"probe $pid")
      else {
        assert(vn == prior.length, s"probe $pid: version $vn != ${prior.length}")
        assert(state == prior.last._3, s"probe $pid: state $state != ${prior.last._3}")
      }
    }
  }

  test("q148: per-word counts sum to 3x a brute-force triangle enumeration") {
    val texts = Tables(spark, dir, "documents").select("text").collect().map(_.getString(0))
    val edges = scala.collection.mutable.Set[(String, String)]()
    texts.foreach { t =>
      val ws = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
      ws.sliding(2).foreach {
        case Array(a, b) if a != b =>
          edges += ((if (a < b) a else b, if (a < b) b else a))
        case _ =>
      }
    }
    val adj = edges.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (k, xs) => (k, xs.map(_._2).toSet) }
    var nTri = 0L
    val nodes = adj.keys.toSeq.sorted
    for (a <- nodes; b <- adj(a) if a < b; c <- adj(a) if b < c && adj(b).contains(c))
      nTri += 1
    val got = AnalyticsOps.queries("q148_triangle_count")(spark, dir)
      .agg(sum("n_triangles")).collect()(0).getLong(0)
    assert(nTri > 0, "fixture produced no triangles — vacuous")
    assert(got == 3 * nTri, s"sum of per-word counts $got != 3 * $nTri")
  }

  test("q149: segments partition all customers, scores within 1..4") {
    val df = AnalyticsOps.queries("q149_rfm_segments")(spark, dir)
    val rows = df.collect()
    val total = rows.map(_.getLong(1)).sum
    val nCust = Tables(spark, dir, "orders").select("o_custkey").distinct().count()
    assert(total == nCust, s"segment counts $total != $nCust customers")
    rows.foreach { r =>
      val seg = r.getString(0)
      assert(seg.length == 3 && seg.forall(c => c >= '1' && c <= '4'), seg)
    }
  }

  test("q150: returned cosines match a dense driver-side recomputation") {
    val docs = Tables(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty)))
    val n = docs.length.toDouble
    val tf = docs.map { case (id, ws) =>
      (id, ws.groupBy(identity).map { case (w, xs) => (w, xs.length.toDouble) })
    }.toMap
    val dfm = docs.flatMap(_._2.distinct).groupBy(identity).map { case (w, xs) =>
      (w, xs.length.toDouble)
    }
    def vec(id: Long): Map[String, Double] =
      tf(id).map { case (w, f) => (w, f * (math.log((n + 1) / (dfm(w) + 1)) + 1)) }
    def cos(a: Long, b: Long): Double = {
      val (va, vb) = (vec(a), vec(b))
      val dot = va.keysIterator.filter(vb.contains).map(w => va(w) * vb(w)).sum
      val na = math.sqrt(va.values.map(x => x * x).sum)
      val nb = math.sqrt(vb.values.map(x => x * x).sum)
      dot / (na * nb)
    }
    val got = AnalyticsOps.queries("q150_lexical_topk")(spark, dir).collect()
    assert(got.length > 0)
    got.foreach { r =>
      val (a, b, c) = (r.getLong(0), r.getLong(1), r.getDouble(3))
      assert(math.abs(c - cos(a, b)) < 1e-5, s"pair ($a,$b): $c vs ${cos(a, b)}")
    }
    // per-probe: exactly 5 ranked hits, ranks 1..5
    got.groupBy(_.getLong(0)).foreach { case (p, xs) =>
      assert(xs.map(_.getLong(4)).sorted.sameElements(1L to 5L), s"probe $p ranks")
    }
  }

  test("q151: predicted label is the true majority of the 5 nearest by brute force") {
    val emb = Tables(spark, dir, "embeddings")
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2).toLong))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      }
      dot / math.sqrt(na * nb)
    }
    val got = AnalyticsOps.queries("q151_knn_classify")(spark, dir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val pid = r.getLong(0)
      val pe = emb.find(_._1 == pid).get._2
      val top5 = emb.filter(_._1 != pid)
        .map { case (id, v, l) =>
          (math.rint(cos(pe, v) * 1e6) / 1e6, id, l)
        }
        .sortBy { case (c, id, _) => (-c, id) }.take(5)
      val want = top5.groupBy(_._3).map { case (l, xs) => (l, xs.length) }
        .toSeq.sortBy { case (l, n) => (-n, l) }.head._1
      assert(r.getLong(2) == want, s"probe $pid: pred ${r.getLong(2)} != $want")
    }
  }

  test("q152: two-hop excludes self and direct neighbors (brute force)") {
    val texts = Tables(spark, dir, "documents").select("text").collect().map(_.getString(0))
    val adj = scala.collection.mutable.Map[String, Set[String]]().withDefaultValue(Set())
    texts.foreach { t =>
      t.toLowerCase.split("\\s+").filter(_.nonEmpty).sliding(2).foreach {
        case Array(a, b) if a != b => adj(a) += b; adj(b) += a
        case _ =>
      }
    }
    val got = AnalyticsOps.queries("q152_two_hop")(spark, dir)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    adj.foreach { case (w, ns) =>
      val twoHop = ns.flatMap(adj(_)) - w -- ns
      val (d, th) = got(w)
      assert(d == ns.size && th == twoHop.size, s"$w: got ($d,$th) want (${ns.size},${twoHop.size})")
    }
  }

  test("q153: keepers + absorbed = total docs; one keeper per fingerprint") {
    val rows = AnalyticsOps.queries("q153_survivorship")(spark, dir).collect()
    val nDocs = rows.map(_.getLong(1)).sum
    val nKeep = rows.map(_.getLong(2)).sum
    val nAbs = rows.map(_.getLong(3)).sum
    assert(nKeep + nAbs == nDocs, s"$nKeep + $nAbs != $nDocs")
    val nFp = Tables(spark, dir, "documents")
      .select(md5(lower(col("text")))).distinct().count()
    assert(nKeep == nFp, s"keepers $nKeep != fingerprint groups $nFp")
  }

  test("q154: profile counts are exact per column") {
    val rows = AnalyticsOps.queries("q154_column_profile")(spark, dir)
      .collect().map(r => (r.getString(0), r)).toMap
    val li = Tables(spark, dir, "lineitem")
    val n = li.count()
    assert(rows.size == 7)
    rows.values.foreach(r => assert(r.getLong(1) == n))
    assert(rows("l_returnflag").getLong(3) ==
      li.select("l_returnflag").distinct().count())
    val minQty = li.agg(min("l_quantity")).collect()(0).getDouble(0)
    assert(rows("l_quantity").getDouble(4) == minQty)
  }

  test("q155: the dt filter prunes to exactly the 3 selected partition dirs") {
    val out = AnalyticsOps.partitionedEventsStore(spark, dir)
    val files = spark.read.parquet(out)
      .filter(col("dt") >= "2024-01-10" && col("dt") <= "2024-01-12")
      .select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty, "pruned scan read no files — vacuous")
    val allowed = Set("dt=2024-01-10", "dt=2024-01-11", "dt=2024-01-12")
    files.foreach { f =>
      assert(allowed.exists(f.contains), s"scan touched un-pruned file: $f")
    }
    // and the full store really has more partitions than the pruned read
    val allParts = spark.read.parquet(out).select("dt").distinct().count()
    assert(allParts > 3, s"store has only $allParts partitions — prune proof vacuous")
  }

  test("q156: interpolated values sit between anchors; fills match brute force") {
    val rows = AnalyticsOps.queries("q156_interpolate")(spark, dir).collect()
    assert(rows.nonEmpty)
    val methods = rows.map(_.getString(2)).toSet
    assert(methods.contains("interp"), "no interpolated rows — vacuous")
    val ev = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"), unix_timestamp(col("ts")).as("es"),
        round(col("value") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byUser = ev.groupBy(_._1).map { case (u, xs) => (u, xs.sortBy(x => (x._3, x._2))) }
    rows.foreach { r =>
      val (eid, u, method) = (r.getLong(0), r.getLong(1), r.getString(2))
      val series = byUser(u)
      val idx = series.indexWhere(_._2 == eid)
      val prev = series.take(idx).reverse.find(_._2 % 7 != 0)
      val next = series.drop(idx + 1).find(_._2 % 7 != 0)
      val want = (prev, next) match {
        case (Some(p), Some(nx)) =>
          val frac = (series(idx)._3 - p._3).toDouble / (nx._3 - p._3).toDouble
          Some((p._4 + (nx._4 - p._4) * frac) / 100.0)
        case (Some(p), None) => Some(p._4 / 100.0)
        case (None, Some(nx)) => Some(nx._4 / 100.0)
        case _ => None
      }
      want match {
        case Some(w) =>
          assert(math.abs(r.getDouble(3) - w) < 1e-6, s"event $eid: ${r.getDouble(3)} vs $w")
        case None => assert(method == "none")
      }
    }
  }

  test("q157: PMI matches a driver-side recomputation for every emitted pair") {
    val texts = Tables(spark, dir, "documents").select("text").collect().map(_.getString(0))
    val docs = texts.map(_.toLowerCase.split("\\s+").filter(_.nonEmpty))
    val nTok = docs.map(_.length).sum.toDouble
    val nPairs = docs.map(ws => math.max(ws.length - 1, 0)).sum.toDouble
    val cw = docs.flatten.groupBy(identity).map { case (w, xs) => (w, xs.length) }
    val cab = docs.flatMap(_.sliding(2).filter(_.length == 2).map(p => (p(0), p(1))))
      .groupBy(identity).map { case (p, xs) => (p, xs.length) }
    val got = AnalyticsOps.queries("q157_pmi_collocations")(spark, dir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (a, b, c, pmi) = (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))
      assert(c == cab((a, b)).toLong)
      val want = math.log((c / nPairs) / ((cw(a) / nTok) * (cw(b) / nTok)))
      assert(math.abs(pmi - want) < 1e-5, s"($a,$b): $pmi vs $want")
    }
    // gate is real: some pair exists below the threshold
    assert(cab.values.exists(_ < 5), "no pair under the noise gate — vacuous")
  }

  test("q158: z-score matches the closed form on exact counts") {
    val r = AnalyticsOps.queries("q158_ab_test")(spark, dir).collect()(0)
    val (n0, c0, n1, c1) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val (p0, p1) = (c0.toDouble / n0, c1.toDouble / n1)
    val pp = (c0 + c1).toDouble / (n0 + n1)
    val z = (p0 - p1) / math.sqrt(pp * (1 - pp) * (1.0 / n0 + 1.0 / n1))
    assert(math.abs(r.getDouble(6) - z) < 1e-5)
    assert(r.getBoolean(7) == (math.abs(r.getDouble(6)) > 1.96))
  }

  test("q159: deciles partition customers; cumulative share ends at 1") {
    val rows = AnalyticsOps.queries("q159_pareto_deciles")(spark, dir).collect()
    assert(rows.length == 10)
    val nCust = Tables(spark, dir, "orders").select("o_custkey").distinct().count()
    assert(rows.map(_.getLong(1)).sum == nCust)
    assert(math.abs(rows.last.getDouble(3) - 1.0) < 1e-9)
    // shares are non-increasing down the ranking
    val shares = rows.map(_.getDouble(2))
    shares.sliding(2).foreach { case Array(hi, lo) => assert(hi >= lo - 1e-9) }
  }

  test("q160: support/confidence/lift match brute force for every emitted pair") {
    val itm = Tables(spark, dir, "lineitem")
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nOrders = itm.map(_._1).distinct.length
    val cp = itm.groupBy(_._2).map { case (p, xs) => (p, xs.length) }
    val byOrder = itm.groupBy(_._1).map { case (_, xs) => xs.map(_._2).sorted }
    val support = scala.collection.mutable.Map[(Long, Long), Int]().withDefaultValue(0)
    byOrder.foreach { ps =>
      for (i <- ps.indices; j <- i + 1 until ps.length)
        support((ps(i), ps(j))) += 1
    }
    val got = AnalyticsOps.queries("q160_market_basket")(spark, dir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (pa, pb, sup) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(sup == support((pa, pb)), s"($pa,$pb)")
      val lift = sup.toDouble * nOrders / (cp(pa).toDouble * cp(pb))
      assert(math.abs(r.getDouble(4) - lift) < 1e-5)
    }
  }

  test("q161: path counts cover every user; paths have at most 3 hops") {
    val rows = AnalyticsOps.queries("q161_user_paths")(spark, dir).collect()
    val nUsers = Tables(spark, dir, "events").select("user_id").distinct().count()
    assert(rows.map(_.getLong(1)).sum == nUsers)
    rows.foreach(r => assert(r.getString(0).split(">").length <= 3))
  }

  test("q162: gini matches brute force and sits in [0,1)") {
    val spend = Tables(spark, dir, "orders")
      .groupBy("o_custkey")
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (k, c) => (c, k) }
    val n = spend.length.toLong
    val tot = spend.map(_._2).sum
    val iwx = spend.zipWithIndex.map { case ((_, c), i) => (i + 1) * c }.sum
    val want = (2.0 * iwx - (n + 1).toDouble * tot) / (n.toDouble * tot)
    val r = AnalyticsOps.queries("q162_gini")(spark, dir).collect()(0)
    assert(r.getLong(0) == n && r.getLong(1) == tot)
    assert(math.abs(r.getDouble(2) - want) < 1e-5)
    assert(r.getDouble(2) >= 0.0 && r.getDouble(2) < 1.0)
  }

  test("q163: card stats are internally consistent") {
    val card = AnalyticsOps.queries("q163_dataset_card")(spark, dir)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    val nDocs = Tables(spark, dir, "documents").count().toDouble
    assert(card("docs_total") == nDocs)
    assert(card("chars_p50") <= card("chars_p90"))
    assert(card("dup_rate") >= 0.0 && card("dup_rate") < 1.0)
    assert(card("chars_mean") > 0)
    assert(card.size == 7)
  }

  test("q164: trapezoid TWA matches brute force per user") {
    val ev = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"), unix_timestamp(col("ts")).as("es"),
        round(col("value") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val got = AnalyticsOps.queries("q164_time_weighted_avg")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    ev.groupBy(_._1).foreach { case (u, xs) =>
      val s = xs.sortBy(x => (x._3, x._2))
      val span = s.last._3 - s.head._3
      val want =
        if (span > 0) {
          val area2 = s.sliding(2).collect { case Array(a, b) =>
            (b._3 - a._3) * (a._4 + b._4)
          }.sum
          area2.toDouble / (2.0 * span) / 100.0
        } else s.map(_._4).min / 100.0
      assert(math.abs(got(u) - want) < 1e-5, s"user $u: ${got(u)} vs $want")
    }
  }

  test("q165: bitmap prune is EXACT — pruned set equals the semi join, no residual") {
    import graft.operators.AnalyticsOps.{bitmapSemi, bitmapWords}
    val keys = Tables(spark, dir, "customer")
      .filter(col("c_acctbal") > 9000).select("c_custkey")
    val maxKey = Tables(spark, dir, "customer")
      .agg(max("c_custkey")).collect()(0).getLong(0)
    val orders = Tables(spark, dir, "orders")
    val pruned = bitmapSemi(orders, "o_custkey", bitmapWords(keys, "c_custkey", maxKey))
    val exact = orders.join(keys, orders("o_custkey") === keys("c_custkey"), "left_semi")
    assert(pruned.count() == exact.count())
    assert(pruned.count() > 0, "nothing survived the bitmap — vacuous")
    assert(pruned.count() < orders.count(), "bitmap pruned nothing — vacuous")
    // row-level identity, not just cardinality
    assert(pruned.select("o_orderkey").except(exact.select("o_orderkey")).count() == 0)
  }

  test("q166: skyline points are mutually non-dominated and nothing dominates them") {
    val spend = Tables(spark, dir, "orders").groupBy("o_custkey")
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("c"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val pts = spend.distinct
    def dominates(a: (Long, Long), b: (Long, Long)): Boolean =
      a._1 >= b._1 && a._2 >= b._2 && (a._1 > b._1 || a._2 > b._2)
    val wantSkyline = pts.filter(p => !pts.exists(q => dominates(q, p))).toSet
    val got = AnalyticsOps.queries("q166_skyline")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == wantSkyline, s"got ${got.size} vs want ${wantSkyline.size}")
    assert(got.nonEmpty)
  }

  test("q167: BFS levels match driver-side BFS; diameter under the oracle cap") {
    val texts = Tables(spark, dir, "documents").select("text").collect().map(_.getString(0))
    val adj = scala.collection.mutable.Map[String, Set[String]]().withDefaultValue(Set())
    texts.foreach { t =>
      t.toLowerCase.split("\\s+").filter(_.nonEmpty).sliding(2).foreach {
        case Array(a, b) if a != b => adj(a) += b; adj(b) += a
        case _ =>
      }
    }
    val want = scala.collection.mutable.Map("table" -> 0L)
    var frontier = Set("table"); var d = 0L
    while (frontier.nonEmpty) {
      d += 1
      frontier = frontier.flatMap(adj(_)).filterNot(want.contains)
      frontier.foreach(w => want(w) = d)
    }
    assert(d - 1 < 12, s"graph diameter ${d - 1} reached the oracle's recursion cap")
    val got = AnalyticsOps.queries("q167_bfs_levels")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == want.toMap, s"got ${got.size} vs want ${want.size}")
    assert(got.values.max >= 1, "seed has no neighbors — vacuous")
  }

  test("q168: negatives never share the anchor label and match brute-force priorities") {
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("label").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val got = AnalyticsOps.queries("q168_negative_sampling")(spark, dir).collect()
    assert(got.nonEmpty)
    val anchors = emb.filter(_._1 % 100 == 25)
    assert(got.length == anchors.length * 5)
    anchors.foreach { case (aid, albl) =>
      val want = emb.filter(_._2 != albl)
        .map { case (nid, nlbl) => (md5hex(s"${aid}_$nid"), nid, nlbl) }
        .sortBy(x => (x._1, x._2)).take(5).map(_._2)
      val mine = got.filter(_.getLong(0) == aid).sortBy(_.getLong(2))
      assert(mine.map(_.getLong(3)).toSeq == want.toSeq, s"anchor $aid")
      mine.foreach(r => assert(r.getLong(4) != albl, s"anchor $aid drew same-label negative"))
    }
  }

  test("q169: OOV rate matches a brute-force top-20 vocabulary") {
    val docs = Tables(spark, dir, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty)))
    val counts = docs.flatMap(_._2).groupBy(identity).map { case (w, xs) => (w, xs.length) }
    val vocab = counts.toSeq.sortBy { case (w, c) => (-c, w) }.take(20).map(_._1).toSet
    val got = AnalyticsOps.queries("q169_oov_rate")(spark, dir)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    docs.groupBy(_._1).foreach { case (src, xs) =>
      val toks = xs.flatMap(_._2)
      val oov = toks.count(!vocab.contains(_))
      val (n, o) = got(src)
      assert(n == toks.length && o == oov, s"$src: got ($n,$o) want (${toks.length},$oov)")
    }
    assert(got.values.exists(_._2 > 0), "no OOV tokens anywhere — vacuous")
  }

  test("q170: chunk counts and overlap dedup match brute force") {
    val docs = Tables(spark, dir, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty)))
      .filter(_._2.nonEmpty)
    val chunks = docs.flatMap { case (src, ws) =>
      (0 until ws.length by 16).map(st => (src, ws.slice(st, st + 32)))
    }
    val got = AnalyticsOps.queries("q170_window_chunks")(spark, dir)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    chunks.groupBy(_._1).foreach { case (src, xs) =>
      val (n, sum, dist) = got(src)
      assert(n == xs.length, s"$src chunk count")
      assert(sum == xs.map(_._2.length.toLong).sum, s"$src token sum")
      assert(dist == xs.map(_._2.mkString(" ")).distinct.length, s"$src distinct")
      // overlap is real: some adjacent chunks share tokens
      assert(xs.exists(_._2.length == 32), s"$src has no full window — vacuous")
    }
  }

  test("q171: deciles match the type-7 interpolation brute force per half") {
    val ev = Tables(spark, dir, "events")
      .select("event_id", "value").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    def deciles(xs: Array[Double]): Map[Double, Double] = {
      val s = xs.sorted
      (1 to 9).map { i =>
        val p = i / 10.0
        val h = (s.length - 1) * p
        val lo = math.floor(h).toInt
        val v = if (lo + 1 < s.length) s(lo) + (h - lo) * (s(lo + 1) - s(lo)) else s(lo)
        (p, math.rint(v * 100) / 100)
      }.toMap
    }
    val wantA = deciles(ev.filter(_._1 % 2 == 0).map(_._2))
    val wantB = deciles(ev.filter(_._1 % 2 != 0).map(_._2))
    val got = AnalyticsOps.queries("q171_numeric_drift")(spark, dir).collect()
    assert(got.length == 9)
    got.foreach { r =>
      val p = r.getDouble(0)
      assert(math.abs(r.getDouble(1) - wantA(p)) < 0.011, s"p=$p va")
      assert(math.abs(r.getDouble(2) - wantB(p)) < 0.011, s"p=$p vb")
    }
  }

  test("q172: backfill intervals exactly cover the per-type gap hours, maximally merged") {
    val ev = Tables(spark, dir, "events")
      .select(date_trunc("hour", col("ts")).as("h"), col("event_type")).distinct()
      .collect().map(r => (r.getString(1), r.getTimestamp(0).getTime / 1000))
    val types = ev.map(_._1).distinct
    val lo = ev.map(_._2).min; val hi = ev.map(_._2).max
    val present = ev.groupBy(_._1).map { case (t, xs) => (t, xs.map(_._2).toSet) }
    val rows = AnalyticsOps.queries("q172_backfill_plan")(spark, dir).collect()
    assert(rows.nonEmpty, "no gaps at this SF — vacuous")
    types.foreach { t =>
      val gapHours = (lo to hi by 3600).filterNot(present(t).contains).toSet
      val mine = rows.filter(_.getString(0) == t).map { r =>
        (r.getTimestamp(1).getTime / 1000, r.getTimestamp(2).getTime / 1000, r.getLong(3))
      }
      // intervals cover exactly the gap hours
      val covered = mine.flatMap { case (s, e, _) => s to e by 3600 }.toSet
      assert(covered == gapHours, s"$t: covered ${covered.size} vs ${gapHours.size}")
      mine.foreach { case (s, e, n) => assert((e - s) / 3600 + 1 == n, s"$t n_hours") }
      // maximally merged: no two intervals are adjacent
      val sorted = mine.sortBy(_._1)
      sorted.sliding(2).foreach {
        case Array((_, e1, _), (s2, _, _)) => assert(s2 - e1 > 3600, s"$t unmerged adjacency")
        case _ =>
      }
    }
  }

  test("q194: longest consecutive-day streaks match a driver-side scan") {
    val rows = AnalyticsOps.queries("q194_activity_streak")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val got = rows.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // emitted order: longest desc, user asc
    assert(rows.map(r => (-r._2, r._1)).toSeq == rows.map(r => (-r._2, r._1)).sorted.toSeq)

    val days = Tables(spark, dir, "events")
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.expr("unix_micros(ts) div 86400000000").as("day"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val byUser = days.groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).sorted }
    assert(got.keySet == byUser.keySet)
    byUser.foreach { case (u, ds) =>
      var bestLen = 0L; var bestStart = 0L; var curLen = 0L; var curStart = 0L
      var prev = Long.MinValue
      for (d <- ds) {
        if (prev != Long.MinValue && d == prev + 1) curLen += 1
        else { curLen = 1; curStart = d }
        if (curLen > bestLen) { bestLen = curLen; bestStart = curStart } // > keeps the EARLIEST maximal streak
        prev = d
      }
      assert(got(u) == ((bestLen, bestStart, ds.length.toLong)), s"user $u")
    }
  }

  test("q199: merge resolution matches a driver-side row-by-row MERGE") {
    val got = AnalyticsOps.queries("q199_merge_upsert")(spark, dir)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

    def h32(x: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(x.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    val tgt = Tables(spark, dir, "customer")
      .select(col("c_custkey"), round(col("c_acctbal") * 100).cast("long"), col("c_mktsegment"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    val ordCents = Tables(spark, dir, "orders")
      .select(col("o_custkey"), round(col("o_totalprice") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    val maxKey = tgt.keys.max
    val nations = Tables(spark, dir, "nation").select("n_nationkey").collect().map(_.getInt(0).toLong)

    // replay the merge per key
    val out = scala.collection.mutable.Map[String, List[(Long, Long, String)]]().withDefaultValue(Nil)
    tgt.foreach { case (k, (cents, seg)) =>
      val action =
        if (k % 97 == 0) "deleted"
        else if (k % 101 == 0) "kept_conflict"
        else if (k % 3 != 0 && ordCents.contains(k)) "updated"
        else "kept"
      val (fc, fs) = if (action == "updated") (ordCents(k), "UPDATED") else (cents, seg)
      out(action) = (k, fc, fs) :: out(action)
    }
    nations.foreach { n =>
      out("inserted") = (maxKey + n + 1, (n + 1) * 1000L, "NEW") :: out("inserted")
    }
    val want = out.map { case (a, rows) =>
      a -> ((rows.length.toLong, rows.map(_._2).sum,
        rows.map { case (k, c, sg) => h32(s"$k|$c|$sg") }.sum))
    }.toMap
    assert(got == want)
  }

  test("q198: VARIANT path extraction agrees with a driver-side JSON parse") {
    val got = operators.Relational.queries("q198_variant_json")(spark, dir)
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getString(6), r.getString(7)))).toMap
    val kRe = """\{\s*"k"\s*:\s*(-?\d+)\s*\}""".r
    val rows = Tables(spark, dir, "events").select("event_type", "props").collect()
      .map { r =>
        val kRe(k) = r.getString(1): @unchecked
        (r.getString(0), k.toLong)
      }
    val want = rows.groupBy(_._1).map { case (et, xs) =>
      val ks = xs.map(_._2)
      et -> ((ks.length.toLong, ks.sum, ks.min, ks.max, ks.distinct.length.toLong,
        "OBJECT<k: BIGINT>", "OBJECT<k: BIGINT>"))
    }
    assert(got == want)
  }
}
