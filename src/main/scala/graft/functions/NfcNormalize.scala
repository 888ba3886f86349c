package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen expression — the
  * canonical-composition step of text cleaning (é as one codepoint, not
  * e + combining acute), so downstream exact dedup / fingerprints /
  * tokenization see one byte sequence per canonically-equal string.
  *
  * Same extension rationale as [[DotProduct]] (SURVEY §7.3): a scalar
  * `Expression` with `doGenCode`, not a UDF, so the per-row call stays
  * inside whole-stage codegen. The generated code is one static call —
  * exactly how Spark's own regexp/date expressions bind their helpers.
  *
  * 100 TB shape: web-scale corpora are overwhelmingly ASCII after
  * filtering, and NFC is the identity on ASCII — `isFullAscii()` checks
  * bytes without decoding and returns the INPUT UTF8String unchanged (no
  * copy, no java.lang.String round trip). Non-ASCII rows take the
  * `Normalizer.isNormalized` scan (already-NFC → no allocation) before
  * paying for an actual normalization pass.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_nfc requires a string argument, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  override def prettyName: String = "graft_nfc"
}

object NfcNormalize {
  /** Static helper the generated code binds to. Must stay public. */
  def nfc(s: UTF8String): UTF8String = {
    if (s.isFullAscii) return s
    val j = s.toString
    if (Normalizer.isNormalized(j, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(j, Normalizer.Form.NFC))
  }
}
