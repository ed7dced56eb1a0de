package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.Tables
import graft.streaming.{PairEvent, PairState}
import Det._

/** The pairing operator through Spark's TYPED aggregation surface
  * (SURVEY.md §2.2 "UDF/UDAF/UDTF": `Aggregator[IN, BUF, OUT]`) — the
  * third formulation of O7 next to the conditional-agg (Pairing.pairs)
  * and the stateful-streaming (EventPairing) ones. Same answer, same
  * oracle: the three must agree.
  *
  * An Aggregator gets compile-time state/input types and composes with
  * Catalyst's partial aggregation — reduce runs map-side per partition,
  * merge combines partials after the exchange, exactly like a built-in. */
object TypedPairing {

  /** min-wins merge of placed/fulfilled halves (associative +
    * commutative, as partial aggregation requires). */
  object PairAgg extends Aggregator[PairEvent, PairState, PairState] {
    override def zero: PairState = PairState(None, None)
    private def mn(a: Option[Long], b: Option[Long]): Option[Long] =
      (a, b) match {
        case (Some(x), Some(y)) => Some(math.min(x, y))
        case _ => a.orElse(b)
      }
    override def reduce(b: PairState, e: PairEvent): PairState =
      e.event_type match {
        case Pairing.PlacedType => b.copy(placedMs = mn(b.placedMs, Some(e.ts_ms)))
        case Pairing.FulfilledType => b.copy(fulfilledMs = mn(b.fulfilledMs, Some(e.ts_ms)))
        case _ => b
      }
    override def merge(a: PairState, b: PairState): PairState =
      PairState(mn(a.placedMs, b.placedMs), mn(a.fulfilledMs, b.fulfilledMs))
    override def finish(r: PairState): PairState = r
    override def bufferEncoder: Encoder[PairState] = Encoders.product[PairState]
    override def outputEncoder: Encoder[PairState] = Encoders.product[PairState]
  }

  /** q_pair_typed — typed Dataset pipeline: `as[PairEvent]` →
    * `groupByKey` → the Aggregator → back to the wire shape. Shares
    * q_pair_match's oracle. */
  def pairTyped(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"), millis(col("ts")).as("ts_ms"))
      .as[PairEvent]
      .groupByKey(_.user_id)
      .agg(PairAgg.toColumn.name("p"))
      .toDF("user_id", "p")
      .select(col("user_id"), col("p.placedMs").as("placed_ms"),
        col("p.fulfilledMs").as("fulfilled_ms"))
      .filter(col("placed_ms").isNotNull && col("fulfilled_ms").isNotNull)
      .withColumn("processing_ms", col("fulfilled_ms") - col("placed_ms"))
      .orderBy("user_id")
  }
}
