package graft.functions.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Native Catalyst expression: 2-D Z-order (Morton) value — the bits of two
  * 16-bit coordinates interleaved into one 32-bit key (returned as LONG).
  *
  * Tier (b) custom operator (SURVEY.md §2.12 policy): sorting or
  * range-partitioning a 100 TB table by `graft_zorder(a, b)` co-locates rows
  * that are close in BOTH dimensions, so min/max column statistics on the
  * resulting files prune 2-D range predicates — the standard data-skipping
  * layout trick (Delta/Iceberg OPTIMIZE ZORDER) expressed as a codegen'd
  * expression Catalyst can push into any sort/exchange.
  *
  * Inputs are masked to 16 bits (the caller chooses the quantization); the
  * bit-spread uses the classic shift-or-mask ladder, identical in the
  * interpreted and codegen paths, so results are deterministic across
  * retries and engines.
  */
case class ZOrder(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt == LongType || dt == IntegerType ||
      dt == org.apache.spark.sql.types.NullType
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_zorder expects two integral arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = LongType

  private def toLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    ZOrder.interleave16(toLong(a), toLong(b))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cls = ZOrder.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.interleave16((long) $a, (long) $b);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrder {
  /** Spread the low 16 bits of v to the even bit positions of a 32-bit word. */
  private def part1by1(v: Long): Long = {
    var a = v & 0xffffL
    a = (a | (a << 8)) & 0x00ff00ffL
    a = (a | (a << 4)) & 0x0f0f0f0fL
    a = (a | (a << 2)) & 0x33333333L
    a = (a | (a << 1)) & 0x55555555L
    a
  }

  /** Morton interleave of two 16-bit values: x on even bits, y on odd. */
  def interleave16(x: Long, y: Long): Long =
    part1by1(x) | (part1by1(y) << 1)

  val name = "graft_zorder"

  val info = new ExpressionInfo(classOf[ZOrder].getName, name)

  val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, s"$name expects 2 arguments")
    ZOrder(exprs.head, exprs(1))
  }

  /** Idempotent per-session SQL registration. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
