package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a native Catalyst expression.
  *
  * Text dedup at corpus scale is only as good as its canonical form:
  * `é` written as U+00E9 and as `e` + U+0301 are different byte strings,
  * so hash-based exact dedup misses them unless every document is brought
  * to one normalization form first. Spark has no built-in NFC/NFD/NFKC/NFKD
  * function (DuckDB ships `nfc_normalize`; ICU collations address sorting,
  * not projection), so this wraps `java.text.Normalizer` — the JDK's
  * implementation of the Unicode standard forms — as a codegen'd unary
  * expression: no UDF serialization, stays inside whole-stage codegen,
  * and the per-row fast path (`Normalizer.isNormalized`) makes the common
  * already-normalized case a cheap scan.
  */
object TextExpressions {

  /** `unicode_normalize(s, form)` with form ∈ NFC | NFD | NFKC | NFKD
    * (plan-time constant). Null propagates.
    */
  case class UnicodeNormalize(child: Expression, form: String)
      extends UnaryExpression {
    require(Set("NFC", "NFD", "NFKC", "NFKD").contains(form),
      s"unsupported normalization form $form (use NFC/NFD/NFKC/NFKD)")
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${other.simpleString}")
    }
    override def dataType: DataType = StringType
    override def prettyName: String = "unicode_normalize"

    override def nullSafeEval(a: Any): Any =
      TextExpressions.normalize(a.asInstanceOf[UTF8String], form)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"""${ev.value} = graft.functions.TextExpressions.normalize($a, "$form");""")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  // form is a plan-time constant; resolve the enum once, not per row
  private val forms: Map[String, Normalizer.Form] =
    Normalizer.Form.values().map(f => f.name -> f).toMap

  /** Shared by interpreted eval and generated code (static call target). */
  def normalize(s: UTF8String, form: String): UTF8String = {
    val f = forms(form)
    val str = s.toString
    if (Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(Normalizer.normalize(str, f))
  }
}

/** Column-level API + SQL registration for the text kernels. */
object TextFunctions {
  import TextExpressions._

  def unicodeNormalize(text: Column, form: String = "NFC"): Column =
    GraftExpressionBridge.column(
      UnicodeNormalize(GraftExpressionBridge.expression(text), form))

  /** SQL surface: `unicode_normalize(s, 'NFC')`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "unicode_normalize",
      es => UnicodeNormalize(es(0), graft.GraftExtensions.litString(es(1), "form")),
      "scala_udf")
}
