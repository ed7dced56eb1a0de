package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: 64-bit SimHash of a token array.
  *
  * Classic Charikar scheme: each token hashes to 64 bits (FNV-1a +
  * splitmix64 finalizer — public-domain mixers); each bit votes ±1;
  * the signature's bit b is the sign of vote b. Near-duplicate documents
  * differ in few bits, so Hamming distance on the 8-byte signature
  * approximates token-multiset similarity (used by Dedup.simhash with a
  * banded self-join).
  *
  * A native expression (not a UDF) keeps the per-row loop in the
  * operator's tight path with no serialization boundary; `doGenCode`
  * emits a direct static call, so the enclosing whole-stage-codegen
  * function stays intact (no CodegenFallback row materialization).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(SimHash64.evalArray(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SimHash64$$.MODULE$$.evalArray($a);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** The signature loop, shared by the interpreted and generated paths
    * (the generated code calls this directly — it is the hot loop, not
    * the dispatch around it). */
  def evalArray(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = hash64(arr.getUTF8String(i).getBytes)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** FNV-1a over the bytes, then a splitmix64 finalizer for avalanche. */
  def hash64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    var z = h + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}
