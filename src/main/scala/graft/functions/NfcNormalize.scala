package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen expression — the text
  * canonicalization every dedup/fingerprint pipeline needs before
  * hashing (the same visible string can arrive composed U+00E9 or
  * decomposed e + U+0301; unnormalized, they hash apart and duplicates
  * survive). Spark has no built-in normalizer; the JDK's
  * java.text.Normalizer is the platform implementation of UAX #15 and
  * matches DuckDB's `nfc_normalize`, keeping the operator
  * oracle-checkable.
  *
  * The quick-check fast path returns the INPUT UTF8String untouched
  * when the text is already NFC (true for ~all web text, and always
  * for pure ASCII) — no String materialization, no copy; only strings
  * that actually need recomposition pay the conversion.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {

  /** Static entry point shared by interpreted eval and generated code. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
