package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: polynomial rolling-hash fingerprint of a
  * string — h = (h·31 + codepoint) mod 1e9+7, folded left to right.
  *
  * Replaces the declarative `aggregate(split(text, ""), ...)` chain in
  * [[graft.operators.TextAnalysis.docFingerprint]], which the ×10
  * stress flagged at per-row ratio 0.91 (≈ linear in rows — the
  * interpreted-HOF signature): `split` materializes one single-char
  * string PER CHARACTER and the fold then evaluates a boxed lambda per
  * element. This expression streams the code points of the value in
  * one codegen'd loop (the [[SimHash64]] idiom) — no array, no lambda,
  * no serialization boundary; the ASCII-only fast path walks raw UTF-8
  * bytes and defers to a code-point walk only when a multi-byte
  * character appears.
  *
  * Semantics replicate the declarative chain EXACTLY (the spec pins
  * row identity against it): Spark's `split(text, "")` emits one
  * element per code point (an empty text yields [""] whose ascii() is
  * 0 — h stays 0, same as the empty fold here), and `ascii(c)` is the
  * element's code point. The DuckDB oracle replays the same fold over
  * `regexp_extract_all(text, '.')`. */
case class Fingerprint64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(Fingerprint64.evalString(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.Fingerprint64$$.MODULE$$.evalString($s);")

  override protected def withNewChildInternal(newChild: Expression): Fingerprint64 =
    copy(child = newChild)
}

object Fingerprint64 {
  val Mod = 1000000007L

  /** The rolling fold, shared by the interpreted and generated paths.
    * acc stays in [0, 1e9+7): acc·31 + cp < 3.2e10, far from Long
    * overflow, and both operands are non-negative so `%` is the true
    * modulus. */
  def evalString(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      if (b < 0x80) {
        h = (h * 31 + b) % Mod
        i += 1
      } else {
        // multi-byte character: restart on the code-point walk (rare
        // path; correctness over micro-speed)
        return evalCodePoints(s.toString)
      }
    }
    h
  }

  private def evalCodePoints(str: String): Long = {
    var h = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      h = (h * 31 + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }
}
