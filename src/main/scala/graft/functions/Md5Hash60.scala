package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the first 60 bits of md5(utf8(input)) as
  * a long — the PORTABLE hash primitive behind the oracled *_md5 dedup
  * pipelines. Exactly equals the declarative formulation
  * `conv(substring(md5(s), 1, 15), 16, 10)` (15 hex chars = the first
  * 7.5 digest bytes, big-endian) but skips materializing the 32-char
  * hex string and the string-based radix parse — the digest bytes go
  * straight to a long. 60 (not 64) bits so downstream seed arithmetic
  * (h1 + j·h2) can never overflow engines that trap on int64 overflow.
  *
  * `doGenCode` emits a direct static call, keeping the enclosing
  * whole-stage-codegen function intact; the MessageDigest instance is
  * thread-local (one per executor thread, reset per row).
  */
case class Md5Hash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(Md5Hash60.eval60(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.Md5Hash60$$.MODULE$$.eval60($s);")

  override protected def withNewChildInternal(newChild: Expression): Md5Hash60 =
    copy(child = newChild)
}

object Md5Hash60 {
  private val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  def eval60(s: UTF8String): Long = {
    val d = digests.get()
    d.reset()
    val h = d.digest(s.getBytes)
    var acc = 0L
    var i = 0
    while (i < 8) { acc = (acc << 8) | (h(i) & 0xffL); i += 1 }
    acc >>> 4 // keep the leading 15 nibbles = 60 bits
  }
}
