package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: PQ-code a 1e6-scaled long vector against
  * a FROZEN trained codebook, in one codegen'd pass.
  *
  * Value-identical to the batch coding chain (ProductQuant — integer
  * squared-L2 argmin per subspace, ties d2 ASC then code ASC): for
  * subspace `sb`, code = argmin over the codebook entries of
  * Σ_{i<dsub} (xs[sb·dsub+i] − c_i)². The codebook rides the expression
  * as flattened candidate layouts (`offsets` delimits each subspace's
  * candidate range in `ids`/`cents`), shipped once per task via the
  * codegen reference array — NOT inlined into the expression tree.
  *
  * The codebook fields are `IndexedSeq`s, NOT primitive arrays: case-
  * class equals/hashCode over Array fields is reference identity, so
  * two value-identical coder instances would never compare equal —
  * safe, but it defeats Catalyst canonicalization/semanticEquals and
  * hence common-subexpression elimination. Structural Seq equality
  * restores them; the hot loop still runs on primitive arrays via the
  * `@transient lazy` mirrors below (built once per task, excluded from
  * equality).
  *
  * Why native (the [[MinhashSig60]] lesson, third instance): the
  * round-6 form unrolled the codebook into ~10k literal scalar nodes —
  * fastest per row but ~1.3 s of re-analysis + re-codegen EVERY
  * micro-batch (a streaming runtime rebuilds its plan per trigger);
  * the round-8 compact higher-order form planned instantly but
  * evaluated its lambdas INTERPRETED — linear per-row cost that the
  * ×10 stress flagged at ratio 1.0 (74.9 s: the worst absolute row in
  * the table). This expression is small in the TREE (one node) and
  * compiled in the LOOP (one static call inside whole-stage codegen):
  * cheap per trigger AND per row — the only shape that wins both
  * regimes.
  */
case class PqEncode(
    child: Expression,
    ids: IndexedSeq[Long],
    offsets: IndexedSeq[Int],
    cents: IndexedSeq[Long],
    dsub: Int) extends UnaryExpression {

  @transient private lazy val idsArr: Array[Long] = ids.toArray
  @transient private lazy val offsetsArr: Array[Int] = offsets.toArray
  @transient private lazy val centsArr: Array[Long] = cents.toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    PqEncode.evalArray(input.asInstanceOf[ArrayData], idsArr, offsetsArr, centsArr, dsub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("pqIds", idsArr, "long[]")
    val offRef = ctx.addReferenceObj("pqOffsets", offsetsArr, "int[]")
    val cenRef = ctx.addReferenceObj("pqCents", centsArr, "long[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.PqEncode$$.MODULE$$.evalArray(" +
        s"$a, $idsRef, $offRef, $cenRef, $dsub);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {

  /** Flatten (sub, code, components) rows into the layout the
    * expression carries: candidates sorted (sub ASC, code ASC) so the
    * in-loop `<` tie-break reproduces (d2 ASC, code ASC) exactly.
    * Every subspace holds at least one candidate BY CONSTRUCTION here:
    * offsets are counted from the rows themselves, so a subspace with
    * an entry in `subs` has ≥ 1 row, and a subspace with none already
    * fails the contiguity require — an empty range (which would make
    * [[evalArray]] emit Long.MaxValue as that subspace's "code",
    * silently) cannot reach the expression through this constructor,
    * the only public path to one. */
  def fromRows(rows: Seq[(Int, Long, Seq[Long])], dsub: Int): (IndexedSeq[Long], IndexedSeq[Int], IndexedSeq[Long]) = {
    require(rows.nonEmpty, "empty codebook")
    val sorted = rows.sortBy(r => (r._1, r._2))
    val subs = sorted.map(_._1).distinct.sorted
    require(subs == (0 until subs.length), s"non-contiguous subspaces: $subs")
    val offsets = new Array[Int](subs.length + 1)
    sorted.foreach { case (sb, _, _) => offsets(sb + 1) += 1 }
    for (i <- 1 to subs.length) offsets(i) += offsets(i - 1)
    val ids = sorted.map(_._2).toArray
    val cents = sorted.flatMap { case (_, _, c) =>
      require(c.length == dsub); c
    }.toArray
    (ids.toIndexedSeq, offsets.toIndexedSeq, cents.toIndexedSeq)
  }

  def evalArray(xs: ArrayData, ids: Array[Long], offsets: Array[Int],
      cents: Array[Long], dsub: Int): ArrayData = {
    val subs = offsets.length - 1
    val out = new Array[Long](subs)
    var sb = 0
    while (sb < subs) {
      var bestD2 = Long.MaxValue
      var bestCode = Long.MaxValue
      var cand = offsets(sb)
      while (cand < offsets(sb + 1)) {
        var d2 = 0L
        var i = 0
        val cBase = cand * dsub
        val xBase = sb * dsub
        while (i < dsub) {
          val diff = xs.getLong(xBase + i) - cents(cBase + i)
          d2 += diff * diff
          i += 1
        }
        // candidates arrive code-ASC within the subspace, so strict <
        // keeps the LOWEST code on a d2 tie — the batch chain's order
        if (d2 < bestD2) { bestD2 = d2; bestCode = ids(cand) }
        cand += 1
      }
      out(sb) = bestCode
      sb += 1
    }
    new GenericArrayData(out)
  }
}
