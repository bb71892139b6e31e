package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression (X42).
  *
  * Text corpora mix composed and decomposed codepoint sequences ("é" vs
  * "e"+U+0301); every dedup/fingerprint/token operator upstream assumes a
  * canonical form, so normalization is the first pass of a text pipeline.
  * Spark has no built-in; the usual Scala-UDF route boxes every row
  * through a serialization boundary and blocks whole-stage codegen. This
  * is the (b)-tier answer: a `UnaryExpression` whose generated code is
  * one static call into `java.text.Normalizer`, staying inside the
  * codegen'd stage (pinned in ScrubSpec).
  *
  * DuckDB's `nfc_normalize` implements the same Unicode canonical
  * composition, which is what makes `q_text_normalize` oracle-able.
  */
object TextNorm {

  def nfc(s: UTF8String): UTF8String =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFC))

  /** `nfc_norm(string) -> string` Column builder. */
  def nfc_norm(c: Column): Column =
    GraftShim.column(NfcNormalize(GraftShim.expression(c)))
}

case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = child.dataType
  override def prettyName: String = "nfc_norm"

  override protected def nullSafeEval(input: Any): Any =
    TextNorm.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNorm.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
