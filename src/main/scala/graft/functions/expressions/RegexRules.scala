package graft.functions.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, GreaterThan, Literal, RLike, Size}
import org.apache.spark.sql.catalyst.expressions.RegExpExtractAll
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule (the §2.12 `Rule[LogicalPlan]` tier): rewrite
  * `size(regexp_extract_all(s, p[, g])) > 0` to `s RLIKE p`.
  *
  * The left form materializes EVERY match into an array just to test
  * emptiness; RLIKE stops at the first match and allocates nothing — on a
  * 100 TB text scan that is the difference between a full-regex sweep per
  * row and an early-exit probe. The count of extract_all results is
  * positive iff the pattern matches at least once (the group index only
  * changes WHAT is extracted per match, never how many), so the rewrite
  * holds for any literal-pattern call.
  *
  * Null semantics are preserved: a null subject makes both sides null
  * (size(null) is null under the modern non-legacy config — the match
  * guards on `legacySizeOfNull = false` — and `null > 0` is null, exactly
  * like RLIKE's null). Registered per-session via
  * `spark.experimental.extraOptimizations` (idempotent) and through
  * GraftExtensions for SQL-conf wiring.
  */
object RegexCountToRLike extends Rule[LogicalPlan] {

  private def rewrite(e: Expression): Option[Expression] = e match {
    case GreaterThan(Size(rea: RegExpExtractAll, false), Literal(v, _))
        if isZero(v) && rea.regexp.foldable =>
      Some(RLike(rea.subject, rea.regexp))
    case GreaterThan(Cast(Size(rea: RegExpExtractAll, false), _, _, _), Literal(v, _))
        if isZero(v) && rea.regexp.foldable =>
      Some(RLike(rea.subject, rea.regexp))
    case _ => None
  }

  private def isZero(v: Any): Boolean = v match {
    case i: Int => i == 0
    case l: Long => l == 0L
    case s: Short => s == 0
    case b: Byte => b == 0
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case e if rewrite(e).isDefined => rewrite(e).get
    }

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(this))
      spark.experimental.extraOptimizations = cur :+ this
  }
}
