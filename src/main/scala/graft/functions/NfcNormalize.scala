package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode NFC normalization of a string
  * column — the canonical-composition step every real ingest pipeline
  * runs BEFORE content hashing (NFD "é" = e + U+0301 and NFC "é" =
  * U+00E9 are byte-different, md5-different, and the same text; a dedup
  * tier hashing raw bytes silently keeps both). Spark has no built-in
  * NFC function, so this wraps `java.text.Normalizer` (ICU-free JDK
  * implementation of UAX #15); DuckDB's `nfc_normalize` implements the
  * same standard, so the normalization chain is fully oracled.
  *
  * Already-NFC input (the overwhelming case — UTF-8 corpora are almost
  * always composed) short-circuits through `Normalizer.isNormalized`, a
  * scan without allocation, and returns the input UTF8String untouched.
  * `doGenCode` emits a direct static call, keeping the enclosing
  * whole-stage-codegen function intact.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.NfcNormalize$$.MODULE$$.nfc($s);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
