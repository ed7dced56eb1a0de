package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, IdentityBroadcastMode, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** A second whole-operator Catalyst extension (SURVEY.md §7.2
  * preference (c), alongside [[TopKPerKeyPlan]]): an inner band join
  * `probe.key ∈ [build.lo, build.hi)` executed as a BINARY-SEARCH probe
  * into the broadcast build side instead of the
  * BroadcastNestedLoopJoin Spark plans for every non-equi predicate.
  *
  *  - BNLJ tests every (probe row × build row) pair: O(n·m) predicate
  *    evaluations;
  *  - this operator sorts the build side by `lo` once (m log m, build
  *    is broadcast-small), then each probe row binary-searches the last
  *    band with `lo ≤ v` and walks left only while a running
  *    prefix-max of `hi` says a cover is still possible: O(n·(log m +
  *    matches)) for arbitrary OVERLAPPING bands — the interval-join
  *    shape (time validity windows, value bands, IP ranges) at 100 TB,
  *    where the probe side never shuffles at all.
  *
  * The physical node declares `BroadcastDistribution(Identity...)` on
  * the build child, so EnsureRequirements inserts the broadcast
  * exchange — same planner contract as the built-in broadcast joins.
  * Null keys and null band edges match nothing (inner-join semantics);
  * lo is inclusive, hi exclusive (pinned by BandJoinSpec).
  */
case class BandJoinPlan(
    keyExpr: Expression,
    loExpr: Expression,
    hiExpr: Expression,
    left: LogicalPlan,
    right: LogicalPlan) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): BandJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: BandJoinPlan → BandJoinExec. */
object BandJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case BandJoinPlan(k, lo, hi, l, r) =>
      BandJoinExec(k, lo, hi, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class BandJoinExec(
    keyExpr: Expression,
    loExpr: Expression,
    hiExpr: Expression,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  /** Probe side flows through unpartitioned; build side broadcasts —
    * the planner inserts the BroadcastExchange. */
  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val buildBc = right.executeBroadcast[Array[InternalRow]]()
    val leftOutput = left.output
    val rightOutput = right.output
    val keyBound = BindReferences.bindReference(keyExpr, leftOutput)
    val loBound = BindReferences.bindReference(loExpr, rightOutput)
    val hiBound = BindReferences.bindReference(hiExpr, rightOutput)
    val allOutput = output
    left.execute().mapPartitions { iter =>
      // sort the (small) build side by lo once per task; rows with a
      // null edge can never match and are dropped here
      val bands = buildBc.value.flatMap { r =>
        (loBound.eval(r), hiBound.eval(r)) match {
          case (lo: java.lang.Double, hi: java.lang.Double) =>
            Some((lo.doubleValue(), hi.doubleValue(), r))
          case _ => None
        }
      }.sortBy(_._1)
      val m = bands.length
      val los = bands.map(_._1)
      val his = bands.map(_._2)
      val rows = bands.map(_._3)
      // maxHi(i) = max of his(0..i): the backward walk stops as soon as
      // no earlier band can still cover v
      val maxHi = new Array[Double](m)
      var i = 0
      var run = Double.NegativeInfinity
      while (i < m) { run = math.max(run, his(i)); maxHi(i) = run; i += 1 }
      val outProj = UnsafeProjection.create(allOutput, allOutput)
      val joined = new JoinedRow
      iter.flatMap { probeRow =>
        keyBound.eval(probeRow) match {
          case v: java.lang.Double =>
            val key = v.doubleValue()
            // last index with lo <= key
            var lo = 0; var hi = m
            while (lo < hi) {
              val mid = (lo + hi) >>> 1
              if (los(mid) <= key) lo = mid + 1 else hi = mid
            }
            var j = lo - 1
            val out = Seq.newBuilder[InternalRow]
            while (j >= 0 && maxHi(j) > key) {
              if (his(j) > key) out += outProj(joined(probeRow, rows(j))).copy()
              j -= 1
            }
            out.result()
          case _ => Nil
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BandJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Column-API wrapper. */
object BandJoin {
  /** Inner band join: rows of `probe` paired with every `build` row
    * whose [lo, hi) interval contains the probe's key column. All
    * three columns are cast to double before planning. */
  def bandJoin(probe: DataFrame, build: DataFrame,
      keyCol: String, loCol: String, hiCol: String): DataFrame = {
    val spark = probe.sparkSession
    if (!spark.experimental.extraStrategies.contains(BandJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ BandJoinStrategy
    }
    import org.apache.spark.sql.functions.col
    val p = probe.withColumn(keyCol, col(keyCol).cast("double"))
      .queryExecution.analyzed
    val b = build.withColumn(loCol, col(loCol).cast("double"))
      .withColumn(hiCol, col(hiCol).cast("double"))
      .queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no column $name in ${plan.output.map(_.name)}"))
    GraftColumnBridge.ofRows(spark,
      BandJoinPlan(attr(p, keyCol), attr(b, loCol), attr(b, hiCol), p, b))
  }
}
