package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the round-7 curation additions that the DuckDB oracle
  * cannot express directly: the DSIR enrichment algebra (integer test ≡
  * sign of the log-ratio), CCNet tercile balance/monotonicity, and the
  * q224 survivor ledger's consistency with q70's own component table.
  */
class CurationTierSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("DSIR enrichment: integer cross-multiplication agrees with the log-ratio sign") {
    // (ct+1)(Nr+B) > (cr+1)(Nt+B)  ⟺  λ = ln((ct+1)/(Nt+B)) − ln((cr+1)/(Nr+B)) > 0
    // — mathematically identical, but a misplaced smoothing term or base
    // on either side of the implementation/oracle pair would break the
    // equivalence on some count combination. Exercise 10k random ones,
    // deciding the log side in exact BigDecimal arithmetic.
    val rnd = new scala.util.Random(7)
    val B = 1024
    for (_ <- 1 to 10000) {
      val cr = rnd.nextInt(1000000)
      val ct = if (cr == 0) 0 else rnd.nextInt(cr + 1) // target ⊆ raw
      val nr = cr + rnd.nextInt(1000000)
      val nt = ct + (if (nr - ct == 0) 0 else rnd.nextInt(nr - ct))
      val intTest = (ct + 1L) * (nr + B) > (cr + 1L) * (nt + B)
      // exact rational comparison (the λ>0 condition cleared of logs)
      val lhs = BigInt(ct + 1L) * BigInt(nr + B.toLong)
      val rhs = BigInt(cr + 1L) * BigInt(nt + B.toLong)
      assert(intTest == (lhs > rhs))
      // and the double λ the engine actually ships agrees except exactly
      // at the tie (where λ == 0 and the strict test is false)
      val lam = math.log(ct + 1.0) - math.log(nt + B.toDouble) -
        math.log(cr + 1.0) + math.log(nr + B.toDouble)
      if (lhs != rhs) assert(intTest == (lam > 0) || math.abs(lam) < 1e-12)
    }
  }

  test("q220: per-language terciles balance within 1 and scores are monotone across tiers") {
    val rows = SparkEntry.queries("q220_ccnet_buckets")(spark, dir).collect()
    rows.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      assert(rs.length == 3, s"$lang must have exactly 3 buckets")
      val byB = rs.sortBy(_.getLong(rs.head.fieldIndex("bucket")))
      val sizes = byB.map(_.getLong(rs.head.fieldIndex("n_docs")))
      assert(sizes.max - sizes.min <= 1, s"$lang terciles unbalanced: ${sizes.toSeq}")
      val avgs = byB.map(_.getDouble(rs.head.fieldIndex("avg_h")))
      assert(avgs.zip(avgs.tail).forall { case (a, b) => a <= b },
        s"$lang tier scores must be non-decreasing head→tail: ${avgs.toSeq}")
      val tiers = byB.map(_.getString(rs.head.fieldIndex("tier")))
      assert(tiers.toSeq == Seq("head", "middle", "tail"))
    }
  }

  test("q224 ledger is consistent with q70's component table") {
    val ledger = SparkEntry.queries("q224_cluster_best_keep")(spark, dir).collect()
    def sumOf(c: String) = ledger.map(r => r.getLong(r.fieldIndex(c))).sum
    // per-source identities
    ledger.foreach { r =>
      def g(c: String) = r.getLong(r.fieldIndex(c))
      assert(g("n_clustered") == g("n_reps") + g("n_dropped"))
      assert(g("n_kept") == g("n_docs") - g("n_dropped"))
    }
    // cross-query: total clustered docs == q70's node count, and total
    // representatives == q70's distinct component count (exactly one
    // survivor per cluster — the whole point of the query)
    val comp = SparkEntry.queries("q70_dedup_components")(spark, dir).collect()
    assert(sumOf("n_clustered") == comp.length.toLong)
    val nComponents = comp.map(r => r.getLong(r.fieldIndex("component"))).distinct.length
    assert(sumOf("n_reps") == nComponents.toLong,
      s"every component must keep exactly one representative")
  }
}
