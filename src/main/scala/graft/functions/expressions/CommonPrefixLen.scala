package graft.functions.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: length (in characters) of the longest
  * common prefix of two strings.
  *
  * The suffix tier's LCP scan (SuffixOps q216/q217) evaluates this on
  * every corpus position twice; the HOF formulation
  * (`array_position(transform(sequence(1, 64), ...), false)`) allocates a
  * 64-element array per row per neighbor, which dominated the dupLens
  * build. This expression is a single fused byte-walk — no allocation,
  * participates in whole-stage codegen.
  *
  * Semantics: byte-wise compare that only credits COMPLETE matching
  * characters (a mismatch inside a multi-byte char does not count that
  * char), so the result equals the character-level common prefix the SQL
  * oracle derives via per-char substr comparison — for ASCII and for any
  * well-formed UTF-8.
  */
case class CommonPrefixLen(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt == StringType || dt == org.apache.spark.sql.types.NullType
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cpl expects (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[UTF8String]
    val y = b.asInstanceOf[UTF8String]
    CommonPrefixLen.commonChars(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.expressions.CommonPrefixLen.commonChars($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CommonPrefixLen {
  /** Shared by interpreted eval and codegen (the loop is the whole cost;
    * a static call keeps the generated method small). */
  def commonChars(a: UTF8String, b: UTF8String): Long = {
    val la = a.numBytes()
    val lb = b.numBytes()
    var i = 0
    var chars = 0L
    var mismatch = false
    while (!mismatch && i < la && i < lb) {
      val ba = a.getByte(i)
      if (ba != b.getByte(i)) mismatch = true
      else {
        val w = UTF8String.numBytesForFirstByte(ba)
        if (i + w > la || i + w > lb) mismatch = true
        else {
          var j = 1
          while (!mismatch && j < w) {
            if (a.getByte(i + j) != b.getByte(i + j)) mismatch = true
            j += 1
          }
          if (!mismatch) { i += w; chars += 1 }
        }
      }
    }
    chars
  }

  val name = "graft_cpl"

  val info = new ExpressionInfo(classOf[CommonPrefixLen].getName, name)

  val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, s"$name expects 2 arguments")
    CommonPrefixLen(exprs.head, exprs(1))
  }

  /** Idempotent per-session SQL registration (used by SuffixOps). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
