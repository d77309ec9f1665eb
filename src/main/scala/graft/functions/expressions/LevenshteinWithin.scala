package graft.functions.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: banded (Ukkonen) Levenshtein distance with
  * early exit at threshold `k` — returns the EXACT distance when it is
  * ≤ k, and the sentinel k+1 otherwise.
  *
  * Why not the built-in `levenshtein`: a threshold fuzzy join (q124) only
  * needs to KNOW whether d ≤ k, but the built-in fills the full O(m·n) DP
  * matrix before the comparison discards it. The banded form touches only
  * the 2k+1 diagonal band — O(k·m) — rejects on length difference alone
  * without touching either string's contents, and abandons a pair the
  * first time an entire band row exceeds k. At k=2 that is the difference
  * between ~m·n and ~5·m cell updates per candidate pair, which is the
  * difference between a feasible and an infeasible residual verify at
  * 100 TB block sizes.
  *
  * Distances are byte-level over UTF-8 (identical to character-level for
  * ASCII inputs, which is what entity keys are); inputs where the two
  * differ would need a decode pass first.
  */
case class LevenshteinWithin(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  require(k >= 0, s"graft_lev_within threshold must be >= 0, got $k")

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt == StringType ||
      dt == org.apache.spark.sql.types.NullType // NULL literal → null result
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_lev_within expects (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any =
    LevenshteinWithin.banded(
      a.asInstanceOf[UTF8String].getBytes,
      b.asInstanceOf[UTF8String].getBytes, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.expressions.LevenshteinWithin$$.MODULE$$" +
        s".banded($a.getBytes(), $b.getBytes(), $k);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LevenshteinWithin {
  val name = "graft_lev_within"

  val info = new ExpressionInfo(classOf[LevenshteinWithin].getName, name)

  val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 3, s"$name expects 3 arguments (a, b, k-literal)")
    val k = exprs(2) match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"$name: third argument must be an integer literal, got $other")
    }
    LevenshteinWithin(exprs.head, exprs(1), k)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")

  /** Banded DP. Exact distance if ≤ k, else k+1. Called from both the
    * interpreted eval and the generated code (static dispatch — the JIT
    * inlines it; keeping one implementation also keeps the two paths
    * bit-identical by construction). */
  def banded(a: Array[Byte], b: Array[Byte], k: Int): Int = {
    val m = a.length
    val n = b.length
    val inf = k + 1
    if (math.abs(m - n) > k) return inf
    if (m == 0) return n // n <= k here
    var prev = new Array[Int](n + 1)
    var cur = new Array[Int](n + 1)
    var j = 0
    while (j <= n) { prev(j) = if (j <= k) j else inf; j += 1 }
    var i = 1
    while (i <= m) {
      cur(0) = if (i <= k) i else inf
      val lo = math.max(1, i - k)
      val hi = math.min(n, i + k)
      if (lo > 1) cur(lo - 1) = inf // out-of-band left neighbor
      var rowMin = cur(0)
      j = lo
      while (j <= hi) {
        val cost = if (a(i - 1) == b(j - 1)) 0 else 1
        // prev(j) is out of the previous row's band when j == i + k
        val del = if (j == i + k) inf else prev(j) + 1
        val ins = cur(j - 1) + 1
        val sub = prev(j - 1) + cost
        var d = if (del < ins) del else ins
        if (sub < d) d = sub
        cur(j) = if (d > inf) inf else d
        if (cur(j) < rowMin) rowMin = cur(j)
        j += 1
      }
      if (rowMin >= inf) return inf // the whole band exceeded k — bail
      val t = prev; prev = cur; cur = t
      i += 1
    }
    if (prev(n) > inf) inf else prev(n)
  }
}
