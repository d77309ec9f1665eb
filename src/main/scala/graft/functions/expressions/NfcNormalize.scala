package graft.functions.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode NFC (canonical composition)
  * normalization — the text-cleaning primitive Spark SQL does not ship
  * (DuckDB: `nfc_normalize`; Trino: `normalize`). A corpus crawled from
  * the web mixes composed ("café", U+00E9) and decomposed ("cafe" + U+0301)
  * spellings of the SAME text; every downstream content hash, exact-dedup
  * group, shingle, and suffix rank treats them as different documents
  * unless a normalization pass runs first — which is why every public
  * curation stack normalizes before hashing.
  *
  * Implementation: `java.text.Normalizer` (the JDK's ICU-derived
  * implementation of UAX #15 — the same algorithm utf8proc implements for
  * DuckDB, so oracle parity is by shared spec, not shared code), behind a
  * pure-ASCII fast path: NFC is the identity on ASCII, so a byte scan
  * that finds no high bit returns the input UTF8String UNCHANGED — no
  * String materialization, no allocation — and web-scale corpora are
  * overwhelmingly ASCII-dominated. Participates in whole-stage codegen
  * via a static call.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val dt = child.dataType
    if (dt == StringType || dt == org.apache.spark.sql.types.NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_nfc expects string, got ${dt.simpleString}")
  }

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {

  /** Shared by interpreted eval and codegen. ASCII fast path first: NFC
    * is the identity on pure-ASCII input, and `Normalizer.isNormalized`
    * short-circuits the already-composed non-ASCII case without building
    * the output string. */
  def nfc(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      if ((s.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) s
    else {
      val str = s.toString
      if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
      else UTF8String.fromString(
        java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
    }
  }

  val name = "graft_nfc"

  val info = new ExpressionInfo(classOf[NfcNormalize].getName, name)

  val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1, s"$name expects 1 argument")
    NfcNormalize(exprs.head)
  }

  /** Idempotent per-session SQL registration. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
