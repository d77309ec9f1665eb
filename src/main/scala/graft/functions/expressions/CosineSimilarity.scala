package graft.functions.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst expression: cosine similarity between two float vectors.
  *
  * Tier (b) of the engine's custom-operator policy (SURVEY.md §2.12): a
  * codegen'd `Expression` beats a Scala UDF (no Row boxing, participates in
  * whole-stage codegen) beats interpreted HOF lambdas. The accumulation
  * order is the plain sequential loop, identical to the DuckDB oracle
  * expression, so results are bitwise stable across engines and retries.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case org.apache.spark.sql.types.NullType => true // NULL literal → null result
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cosine expects (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  /** Contract: both arrays must have the same length (a mismatch is a data
    * error — raise, don't silently truncate); a zero-norm input yields NaN
    * (0/0), matching the SQL-oracle expression on both engines. */
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements())
      throw new IllegalArgumentException(
        s"graft_cosine: vector length mismatch ($n vs ${y.numElements()})")
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / math.sqrt(na * nb) // zero norm → 0/0 = NaN by contract
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "graft_cosine: vector length mismatch (" + $a.numElements() +
         |    " vs " + $b.numElements() + ")");
         |}
         |double ${ev.value}_dot = 0.0, ${ev.value}_na = 0.0, ${ev.value}_nb = 0.0;
         |int ${ev.value}_n = $a.numElements();
         |for (int i = 0; i < ${ev.value}_n; i++) {
         |  double xv = (double) $a.getFloat(i);
         |  double yv = (double) $b.getFloat(i);
         |  ${ev.value}_dot += xv * yv;
         |  ${ev.value}_na += xv * xv;
         |  ${ev.value}_nb += yv * yv;
         |}
         |${ev.value} = ${ev.value}_dot /
         |  java.lang.Math.sqrt(${ev.value}_na * ${ev.value}_nb);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  val name = "graft_cosine"

  val info = new ExpressionInfo(classOf[CosineSimilarity].getName, name)

  val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, s"$name expects 2 arguments")
    CosineSimilarity(exprs.head, exprs(1))
  }

  /** Idempotent per-session SQL registration (used by VectorOps). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}

/** SparkSessionExtensions wiring: enables
  * `SparkSession.builder().withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=graft.functions.expressions.GraftExtensions`) to
  * expose the engine's native functions in plain SQL sessions. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier(CosineSimilarity.name),
      CosineSimilarity.info, CosineSimilarity.builder))
    e.injectFunction((FunctionIdentifier(ZOrder.name),
      ZOrder.info, ZOrder.builder))
    e.injectFunction((FunctionIdentifier(LevenshteinWithin.name),
      LevenshteinWithin.info, LevenshteinWithin.builder))
    e.injectFunction((FunctionIdentifier(CommonPrefixLen.name),
      CommonPrefixLen.info, CommonPrefixLen.builder))
    e.injectOptimizerRule(_ => RegexCountToRLike)
  }
}
