package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.Tables

/** The user-extension surface: scalar UDF and typed Aggregator-as-UDAF
  * registration (≙ the reference's Processor API being its only
  * extension point, SURVEY.md §2.2).
  *
  * Posture: a scalar UDF is OPAQUE to Catalyst — no pushdown through
  * it, no codegen fusion — so the library's own operators use native
  * functions/expressions instead (see graft.functions); these queries
  * exist to prove the extension APIs work end-to-end, with the UDF kept
  * off the scan path so pruning still happens. */
object UdfSurface {

  /** q_udf_demo — scalar Scala UDFs: parse the priority's numeric rank,
    * build an order label. Deterministic string/int logic only. */
  def udfDemo(s: SparkSession, d: String): DataFrame = {
    val prioRank = udf((p: String) => p.split('-')(0).trim.toInt)
    val orderTag = udf((k: Long, st: String) => s"$st-${k % 1000}")
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        prioRank(col("o_orderpriority")).as("prio_rank"),
        orderTag(col("o_orderkey"), col("o_orderstatus")).as("order_tag"))
      .orderBy("o_orderkey")
  }

  /** Weighted-average-price Aggregator: Σ(price·qty)/Σ(qty), both sums
    * carried as 1e-4 fixed-point longs (the [[Det]] determinism scheme
    * inside a custom aggregate — order-independent on any partitioning). */
  private case class WSums(num: Long, den: Long)
  private val weightedAvg: Aggregator[(Double, Double), WSums, Double] =
    new Aggregator[(Double, Double), WSums, Double] {
      override def zero: WSums = WSums(0L, 0L)
      override def reduce(b: WSums, a: (Double, Double)): WSums =
        WSums(b.num + math.floor(a._1 * a._2 * 10000 + 0.5).toLong,
          b.den + math.floor(a._2 * 10000 + 0.5).toLong)
      override def merge(x: WSums, y: WSums): WSums =
        WSums(x.num + y.num, x.den + y.den)
      override def finish(r: WSums): Double =
        (r.num.toDouble / 10000.0) / (r.den.toDouble / 10000.0)
      override def bufferEncoder = Encoders.product[WSums]
      override def outputEncoder = Encoders.scalaDouble
    }

  /** q_udaf_demo — the Aggregator registered as an UNTYPED UDAF
    * (`functions.udaf`) and used from plain DataFrame `agg`: quantity-
    * weighted average price per return flag. Partial aggregation still
    * applies (reduce map-side, merge after the shuffle). */
  def udafDemo(s: SparkSession, d: String): DataFrame = {
    val wavg = udaf(weightedAvg, Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble))
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(wavg(col("l_extendedprice"), col("l_quantity")).as("weighted_avg_price"),
        count(lit(1)).as("n_lines"))
      .orderBy("l_returnflag")
  }
}
