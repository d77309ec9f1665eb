package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Property specs for the q251/q252 integer kernels:
  *  - the 9-level 128^k CASE chain must equal the true LEB128 varint
  *    byte length on every power-of-128 boundary and on seeded random
  *    longs across the full magnitude range;
  *  - the SQL Luhn lambda (right-index parity algebra) must agree with
  *    a plain-Scala reference implementation on seeded random 16-digit
  *    strings, and the q252 injection identities must hold: a base +
  *    computed check digit is ALWAYS valid, and shifting the check by 5
  *    is ALWAYS invalid (5 ≠ 0 mod 10, so the near-miss can never
  *    accidentally pass).
  */
class VarintLuhnPropSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // true LEB128 length: 7 payload bits per byte
  private def varintLen(x: Long): Int = {
    require(x >= 1)
    var v = x; var n = 0
    while (v != 0) { v >>>= 7; n += 1 }
    n
  }

  private val caseChain = "CASE WHEN g < 128 THEN 1 WHEN g < 16384 THEN 2" +
    " WHEN g < 2097152 THEN 3 WHEN g < 268435456 THEN 4" +
    " WHEN g < 34359738368 THEN 5 WHEN g < 4398046511104 THEN 6" +
    " WHEN g < 562949953421312 THEN 7 WHEN g < 72057594037927936 THEN 8" +
    " ELSE 9 END"

  test("varint CASE chain equals LEB128 length at every boundary and on seeded longs") {
    import spark.implicits._
    val boundaries = (1 to 8).map(k => math.pow(128, k).toLong)
      .flatMap(b => Seq(b - 1, b, b + 1))
    val rnd = new scala.util.Random(251L)
    val randoms = (1 to 500).map { _ =>
      // spread across magnitudes: random bit width 1..62
      val bits = 1 + rnd.nextInt(62)
      (rnd.nextLong().abs % (1L << bits)) + 1
    }
    val vals = (Seq(1L, 2L, Long.MaxValue) ++ boundaries ++ randoms).distinct
    val got = vals.toDF("g")
      .selectExpr("g", s"CAST($caseChain AS INT) AS n")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    vals.foreach { v =>
      assert(got(v) == varintLen(v), s"varint length of $v: ${got(v)} vs ${varintLen(v)}")
    }
  }

  private def luhnValid(digits: String): Boolean = {
    val s = digits.reverse.zipWithIndex.map { case (ch, i) =>
      val d = ch - '0'
      if (i % 2 == 1) { val t = 2 * d; if (t > 9) t - 9 else t } else d
    }.sum
    s % 10 == 0
  }

  test("SQL Luhn lambda matches the Scala reference on 400 seeded candidates") {
    import spark.implicits._
    val rnd = new scala.util.Random(252L)
    val cands = (1 to 400).map(_ => (1 to 16).map(_ => rnd.nextInt(10)).mkString)
    val luhn16 = "aggregate(sequence(1, 16), CAST(0 AS BIGINT), (a, j) -> a +" +
      " CASE WHEN j % 2 = 0 THEN" +
      "   IF(2 * CAST(substring(c, 17 - j, 1) AS BIGINT) > 9," +
      "      2 * CAST(substring(c, 17 - j, 1) AS BIGINT) - 9," +
      "      2 * CAST(substring(c, 17 - j, 1) AS BIGINT))" +
      " ELSE CAST(substring(c, 17 - j, 1) AS BIGINT) END)"
    val got = cands.toDF("c")
      .selectExpr("c", s"($luhn16) % 10 = 0 AS ok")
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    cands.foreach { c =>
      assert(got(c) == luhnValid(c), s"Luhn($c): ${got(c)} vs ${luhnValid(c)}")
    }
    // sanity vectors: a known-valid card-shaped number and its +1 twin
    assert(luhnValid("4532015112830366"))
    assert(!luhnValid("4532015112830367"))
  }

  test("q252 injection identities: computed check always valid, +5 shift never") {
    import spark.implicits._
    (0L until 300L).foreach { id =>
      val base = ("%015d".format(id * 7919 % 999999999L)).replace(' ', '7')
      val padded = base.reverse.padTo(15, '7').reverse.takeRight(15)
      val chk = (0 to 9).find(c => luhnValid(padded + c)).get
      assert(luhnValid(padded + chk))
      assert(!luhnValid(padded + ((chk + 5) % 10)),
        s"near-miss must fail: $padded chk=$chk")
    }
  }
}
