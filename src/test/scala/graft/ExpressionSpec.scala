package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.expressions.{CosineSimilarity, GraftExtensions}

class ExpressionSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .withExtensions(new GraftExtensions) // exercises the injectFunction path
    .getOrCreate()

  test("graft_cosine native expression: correct value, SQL-callable, null-safe") {
    // explicit register: if another suite created the session first,
    // getOrCreate ignores withExtensions and the injected fn is absent
    CosineSimilarity.register(spark)
    import spark.implicits._
    val df = Seq(
      (1L, Array(1f, 0f, 0f), Array(1f, 0f, 0f)),
      (2L, Array(1f, 0f, 0f), Array(0f, 1f, 0f)),
      (3L, Array(1f, 2f, 3f), Array(4f, 5f, 6f))
    ).toDF("id", "a", "b")
    df.createOrReplaceTempView("vecs")
    val rows = spark.sql("SELECT id, graft_cosine(a, b) AS c FROM vecs ORDER BY id").collect()
    assert(math.abs(rows(0).getDouble(1) - 1.0) < 1e-12)
    assert(math.abs(rows(1).getDouble(1) - 0.0) < 1e-12)
    val expected = 32.0 / math.sqrt(14.0 * 77.0)
    assert(math.abs(rows(2).getDouble(1) - expected) < 1e-12)

    val withNull = spark.sql("SELECT graft_cosine(a, NULL) AS c FROM vecs LIMIT 1").collect()
    assert(withNull(0).isNullAt(0))
  }

  test("graft_cpl: char-level common prefix, multi-byte safety, null-safe, SQL-callable") {
    graft.functions.expressions.CommonPrefixLen.register(spark)
    import spark.implicits._
    val df = Seq(
      (1L, "abcdef", "abcxyz"),   // plain ASCII: 3
      (2L, "same", "same"),       // identical: 4
      (3L, "", "anything"),       // empty: 0
      (4L, "abc", "abcdef"),      // proper prefix: 3
      (5L, "héllo", "hèllo"), // é vs è share the lead UTF-8 byte 0xC3:
                                  // a byte-prefix count would credit a
                                  // partial char; char-level answer is 1
      (6L, "éa", "éb")  // multi-byte char fully matches: 1
    ).toDF("id", "a", "b")
    df.createOrReplaceTempView("cpl_t")
    val got = spark.sql("SELECT id, graft_cpl(a, b) AS c FROM cpl_t ORDER BY id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 4L, 3L -> 0L, 4L -> 3L, 5L -> 1L, 6L -> 1L))
    val withNull = spark.sql("SELECT graft_cpl(a, NULL) FROM cpl_t LIMIT 1").collect()
    assert(withNull(0).isNullAt(0))
    // interpreted eval agrees with the SQL (codegen) path
    import org.apache.spark.sql.catalyst.expressions.Literal
    val v = graft.functions.expressions.CommonPrefixLen(
      Literal("héllo"), Literal("hèllo")).eval(null)
    assert(v == 1L)
  }

  test("graft_cosine interpreted eval matches codegen path") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val a = Literal.create(ArrayData.toArrayData(Array(1f, 2f, 3f)), ArrayType(FloatType))
    val b = Literal.create(ArrayData.toArrayData(Array(4f, 5f, 6f)), ArrayType(FloatType))
    val v = CosineSimilarity(a, b).eval(null).asInstanceOf[Double]
    assert(math.abs(v - 32.0 / math.sqrt(14.0 * 77.0)) < 1e-12)
  }

  test("type check rejects non-float arrays") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val bad = CosineSimilarity(Literal(1), Literal(2))
    assert(!bad.checkInputDataTypes().isSuccess)
  }

  test("graft_zorder: bit interleave correct, SQL-callable, monotone-in-rectangle") {
    import graft.functions.expressions.ZOrder
    // exact bit patterns: x fills even positions, y odd
    assert(ZOrder.interleave16(0xffffL, 0L) == 0x55555555L)
    assert(ZOrder.interleave16(0L, 0xffffL) == 0xaaaaaaaaL)
    assert(ZOrder.interleave16(0xffffL, 0xffffL) == 0xffffffffL)
    assert(ZOrder.interleave16(1L, 0L) == 1L)
    assert(ZOrder.interleave16(0L, 1L) == 2L)
    // 16-bit masking: inputs above 2^16 wrap to their low bits
    assert(ZOrder.interleave16(0x1_0003L, 0L) == ZOrder.interleave16(3L, 0L))
    // SQL path through the registered function; codegen agrees with eval.
    // Explicit register: when another suite created the session first,
    // getOrCreate ignores withExtensions and the injected fn is absent.
    ZOrder.register(spark)
    import spark.implicits._
    val df = Seq((3L, 5L), (1000L, 40000L), (65535L, 65535L)).toDF("x", "y")
    df.createOrReplaceTempView("zin")
    val got = spark.sql("SELECT graft_zorder(x, y) AS z FROM zin ORDER BY x").collect().map(_.getLong(0))
    assert(got.toSeq == Seq(
      ZOrder.interleave16(3, 5), ZOrder.interleave16(1000, 40000),
      0xffffffffL))
    // null propagation (BinaryExpression null-safe contract)
    assert(spark.sql("SELECT graft_zorder(NULL, 5L) AS z").collect()(0).isNullAt(0))
    assert(spark.sql("SELECT graft_zorder(5L, NULL) AS z").collect()(0).isNullAt(0))
    // locality: any aligned 2^2k-sized z-range is a rectangle — check the
    // defining property z(x,y) bits decompose, via a brute 8-bit quadrant
    for (x <- 0 until 16; y <- 0 until 16) {
      val z = ZOrder.interleave16(x.toLong, y.toLong)
      assert((z >> 2) == ZOrder.interleave16(x.toLong >> 1, y.toLong >> 1),
        s"quadrant property failed at ($x,$y)")
    }
  }

  test("RegexCountToRLike rule: fires through projection inlining, preserves values and nulls") {
    import graft.functions.expressions.RegexCountToRLike
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr}
    RegexCountToRLike.register(spark)
    RegexCountToRLike.register(spark) // idempotent
    assert(spark.experimental.extraOptimizations.count(_ == RegexCountToRLike) == 1)
    // parquet source, not a local Seq: ConvertToLocalRelation would
    // otherwise evaluate the whole projection at optimization time and
    // leave nothing for the rule to rewrite
    val dir = java.nio.file.Files.createTempDirectory("rlike_rule_").toString
    Seq(Some("a b c@d.io e"), Some("no match"), None).toDF("s")
      .write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
      .withColumn("n", expr("size(regexp_extract_all(s, '[a-z]+@[a-z.]+', 0))").cast("long"))
      .withColumn("hit", col("n") > 0)
      .select("s", "hit")
    val opt = df.queryExecution.optimizedPlan.toString()
    assert(opt.contains("RLIKE"), s"rule did not fire:\n$opt")
    assert(!opt.toLowerCase.contains("regexp_extract_all"),
      s"extract_all survived in the predicate:\n$opt")
    val got = df.collect().map(r => (r.getAs[String]("s"), if (r.isNullAt(1)) null else r.getBoolean(1)))
    assert(got.toMap == Map("a b c@d.io e" -> true, "no match" -> false, (null: String) -> null),
      s"values diverged: ${got.mkString(",")}")
  }

  test("graft_lev_within: parity with built-in levenshtein inside the band, sentinel beyond, null-safe") {
    import spark.implicits._
    graft.functions.expressions.LevenshteinWithin.register(spark)
    val rnd = new scala.util.Random(7)
    def word() = (0 until 1 + rnd.nextInt(12)).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    val pairs = Seq.fill(400)((word(), word())) ++
      Seq(("", ""), ("", "ab"), ("abc", "abc"), ("kitten", "sitting"))
    val df = pairs.toDF("a", "b")
      .selectExpr("a", "b", "levenshtein(a, b) AS ref", "graft_lev_within(a, b, 2) AS band")
    // codegen path (whole-stage over the projection)
    df.collect().foreach { r =>
      val (ref, band) = (r.getAs[Int]("ref"), r.getAs[Int]("band"))
      if (ref <= 2) assert(band == ref, s"${r.getString(0)}/${r.getString(1)}: band=$band ref=$ref")
      else assert(band == 3, s"${r.getString(0)}/${r.getString(1)}: band=$band for ref=$ref")
    }
    // interpreted eval path must agree with codegen
    val e = graft.functions.expressions.LevenshteinWithin(
      org.apache.spark.sql.catalyst.expressions.Literal("cold anvil"),
      org.apache.spark.sql.catalyst.expressions.Literal("old anvil"), 2)
    assert(e.eval(null) == 1)
    assert(spark.sql("SELECT graft_lev_within(NULL, 'x', 2)").collect()(0).isNullAt(0))
  }

  test("IVF recall@3 sweep: nprobe in {1,3,5} x kCells in {16,64} — monotone in nprobe, floor at the default") {
    val dir = "/root/testdata/sf0.01"
    // brute-force exact top-3 per probe, computed directly over the vectors
    val rows = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[scala.collection.Seq[Float]]("embedding").toArray)
    val byId = rows.toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
        i += 1
      }
      d / math.sqrt(na * nb)
    }
    val exact = byId.keys.filter(_ % 100 == 0).flatMap { p =>
      rows.iterator.filter(_._1 != p)
        .map { case (v, e) => (math.rint(cos(byId(p), e) * 1e6) / 1e6, v) }
        .toSeq.sortBy { case (c, v) => (-c, v) }.take(3).map { case (_, v) => (p, v) }
    }.toSet

    def recallOf(nprobe: Int, kCells: Int): Double = {
      val got = graft.operators.VectorOps
        .ivfTopK(spark, dir, nprobe = nprobe, topK = 3, kCells = kCells)
        .collect().map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("vec_id"))).toSet
      (got & exact).size.toDouble / exact.size
    }

    // the recall/latency curve: more cells = cheaper scans (nprobe/kCells of
    // the corpus per probe) but lower recall at fixed nprobe; more probes =
    // monotonically better recall (candidate set is a superset)
    val curve = for (k <- Seq(16, 64)) yield {
      val byProbe = Seq(1, 3, 5).map(np => np -> recallOf(np, k))
      info(s"kCells=$k recall@3: " + byProbe.map { case (np, r) => f"nprobe=$np:$r%.2f" }.mkString(" "))
      byProbe.sliding(2).foreach { case Seq((npA, rA), (npB, rB)) =>
        assert(rA <= rB + 1e-9, s"recall not monotone in nprobe at kCells=$k: $npA:$rA > $npB:$rB")
      }
      k -> byProbe.toMap
    }
    val m = curve.toMap
    // 0.7 is the floor at the shipped default (nprobe=5, kCells=16), not a
    // target. nprobe moved 3 → 5 in round 4: at sf0.1 (5000 near-uniform
    // synthetic vectors — ANN's worst case) nprobe=3 recall sagged to 0.60
    // while nprobe=5 holds 0.77, and the q77 oracle pins the floor at BOTH
    // scale factors.
    assert(m(16)(5) >= 0.7, s"default IVF recall@3 = ${m(16)(5)}")
    assert(m(16)(5) >= m(16)(3) - 1e-9)
  }

  test("graft_nfc: NFC composition, ASCII identity fast path, null-safe, SQL-callable") {
    graft.functions.expressions.NfcNormalize.register(spark)
    import spark.implicits._
    val composed = "caf\u00e9 r\u00e9sum\u00e9"
    val decomposed = "cafe\u0301 re\u0301sume\u0301"
    val df = Seq(
      (1L, decomposed),          // NFD input -> composed output
      (2L, composed),            // already-NFC input -> unchanged
      (3L, "plain ascii text"),  // ASCII fast path -> unchanged
      (4L, ""),                  // empty
      (5L, "mix \u0041\u030a ring") // A + combining ring -> U+00C5
    ).toDF("id", "s")
    df.createOrReplaceTempView("nfc_t")
    val rows = spark.sql("SELECT id, graft_nfc(s) AS n FROM nfc_t ORDER BY id").collect()
    assert(rows(0).getString(1) == composed, "NFD must compose to NFC")
    assert(rows(1).getString(1) == composed)
    assert(rows(2).getString(1) == "plain ascii text")
    assert(rows(3).getString(1) == "")
    assert(rows(4).getString(1) == "mix \u00c5 ring")
    assert(rows(0).getString(1).length == composed.length &&
      decomposed.length == composed.length + 3, "char counts must reflect composition")
    val withNull = spark.sql("SELECT graft_nfc(NULL)").collect()
    assert(withNull(0).isNullAt(0))
    // fast path: pure-ASCII and already-normalized inputs return the SAME
    // UTF8String instance (no allocation on the dominant path)
    import org.apache.spark.unsafe.types.UTF8String
    val ascii = UTF8String.fromString("abc def")
    assert(graft.functions.expressions.NfcNormalize.nfc(ascii) eq ascii)
    val already = UTF8String.fromString(composed)
    assert(graft.functions.expressions.NfcNormalize.nfc(already) eq already)
    // interpreted (non-codegen) path computes the same value
    val interp = graft.functions.expressions.NfcNormalize(
      org.apache.spark.sql.catalyst.expressions.Literal(UTF8String.fromString(decomposed),
        org.apache.spark.sql.types.StringType)).eval(null)
    assert(interp.toString == composed)
  }
}
