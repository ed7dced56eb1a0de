package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Native Catalyst expression: 8-bin byte-value histogram of a binary
  * payload (bin = unsigned byte mod 8).
  *
  * The content-signature primitive for payload-level (multimodal)
  * dedup: two identical payloads share the histogram exactly, and the
  * 8-int signature costs one sequential pass over the bytes — no
  * decode, no copy. Used by `q_media_histdup` as the bucketing key the
  * way SimHash buckets token sets.
  *
  * Native expression, not a UDF: `doGenCode` emits a static call so the
  * byte loop stays inside the enclosing whole-stage-codegen function
  * with no serialization boundary (same rationale as [[SimHash64]]).
  */
case class ByteHistogram(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ByteHistogram.evalBytes(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = graft.functions.ByteHistogram$$.MODULE$$.evalBytes($b);")

  override protected def withNewChildInternal(newChild: Expression): ByteHistogram =
    copy(child = newChild)
}

object ByteHistogram {
  def evalBytes(bytes: Array[Byte]): GenericArrayData = {
    val bins = new Array[Int](8)
    var i = 0
    while (i < bytes.length) {
      bins((bytes(i) & 0xff) % 8) += 1
      i += 1
    }
    new GenericArrayData(bins.map(Integer.valueOf))
  }
}
