package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.Tables

/** The reference's custom stateful processor (OrderProcessor.java:99-257)
  * on Spark 4's `transformWithState` — the arbitrary-state API the
  * ecosystem is converging on, and the closest surface to the reference's
  * Processor API:
  *
  *  - `init` ≙ `Processor.init` (OrderProcessor.java:90): acquires the
  *    named state ("pair" ≙ `order-state-store`);
  *  - `handleInputRows` ≙ `process` (:99-152): get/merge/put-or-delete;
  *  - a NAMED TIMER per incomplete key ≙ the wall-clock punctuator
  *    (:161-206) — but where the reference sweeps the whole store every
  *    30 s, a timer fires per expired key only: O(expired), not O(store),
  *    which is the difference that matters at 100 TB of keyed state;
  *  - `handleExpiredTimer` closes the reference's dead-letter TODO
  *    (:184,200): the expired half-pair is EMITTED with `expired = true`
  *    instead of silently dropped.
  *
  * Requires the RocksDB state store provider (a `transformWithState`
  * constraint — and the right provider for large keyed state anyway).
  * Merge policy and TTL semantics are shared with
  * [[EventPairing.pairFn]], so the two formulations stay in lockstep.
  */
class PairProcessor(policy: EventPairing.MergePolicy, ttlMs: Option[Long],
    deadLetter: Boolean)
    extends StatefulProcessor[Long, PairEvent, PairOutcome] {

  @transient private var pair: ValueState[PairState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    pair = getHandle.getValueState[PairState]("pair",
      Encoders.product[PairState], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[PairEvent],
      timers: TimerValues): Iterator[PairOutcome] = {
    val prior = if (pair.exists()) pair.get() else PairState(None, None)
    var placed = prior.placedMs
    var fulfilled = prior.fulfilledMs
    def merge(old: Option[Long], ts: Long): Option[Long] = policy match {
      case EventPairing.MinWins  => Some(old.fold(ts)(math.min(_, ts)))
      case EventPairing.LastWins => Some(ts)
    }
    rows.foreach { e =>
      if (e.event_type == EventPairing.PlacedType) placed = merge(placed, e.ts_ms)
      else if (e.event_type == EventPairing.FulfilledType)
        fulfilled = merge(fulfilled, e.ts_ms)
      // unknown event.type: ignored (OrderProcessor.java:121-124)
    }
    (placed, fulfilled) match {
      case (Some(p), Some(f)) =>
        // completion deletes state (OrderProcessor.java:149) and cancels
        // the pending expiry timer — the punctuator analog of skipping a
        // completed order
        pair.clear()
        // timer ops are illegal under TimeMode.None — only touch them
        // when a TTL (and thus ProcessingTime mode) is configured
        if (ttlMs.isDefined) getHandle.listTimers().foreach(getHandle.deleteTimer)
        Iterator.single(PairOutcome(key, p, f, f - p, expired = false))
      case _ =>
        pair.update(PairState(placed, fulfilled))
        // sliding TTL: re-arm the single named timer on every update,
        // matching GroupState.setTimeoutDuration semantics
        ttlMs.foreach { t =>
          getHandle.listTimers().foreach(getHandle.deleteTimer)
          getHandle.registerTimer(timers.getCurrentProcessingTimeInMs + t)
        }
        Iterator.empty
    }
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[PairOutcome] = {
    val prior = if (pair.exists()) Some(pair.get()) else None
    pair.clear()
    prior match {
      case Some(p) if deadLetter =>
        Iterator.single(PairOutcome(key, p.placedMs.getOrElse(-1L),
          p.fulfilledMs.getOrElse(-1L), -1L, expired = true))
      case _ => Iterator.empty
    }
  }
}

/** Per-user output row of [[UserStatsProcessor]]. */
case class UserStats(user_id: Long, n_events: Long, first_ms: Long,
    last_ms: Long, n_types: Int)

/** ListState + MapState coverage of the arbitrary-state API through the
  * real runtime: a per-user event history (ListState — the buffer shape
  * sessionization and replay features need) plus a per-type counter
  * (MapState — keyed sub-state without serializing the whole map per
  * update, which is exactly what a Value[Map] would do wrong at scale).
  * Emits the refreshed aggregate for every key touched in the batch. */
class UserStatsProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, PairEvent, UserStats] {
  import org.apache.spark.sql.Encoders

  @transient private var history: org.apache.spark.sql.streaming.ListState[Long] = _
  @transient private var typeCounts: org.apache.spark.sql.streaming.MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    history = getHandle.getListState[Long]("history",
      Encoders.scalaLong, TTLConfig.NONE)
    typeCounts = getHandle.getMapState[String, Long]("type_counts",
      Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[PairEvent],
      timers: TimerValues): Iterator[UserStats] = {
    rows.foreach { e =>
      history.appendValue(e.ts_ms)
      val prior = if (typeCounts.containsKey(e.event_type))
        typeCounts.getValue(e.event_type) else 0L
      typeCounts.updateValue(e.event_type, prior + 1L)
    }
    val ts = history.get().toArray
    var n = 0L; var lo = Long.MaxValue; var hi = Long.MinValue
    ts.foreach { t => n += 1; if (t < lo) lo = t; if (t > hi) hi = t }
    Iterator.single(UserStats(key, n, lo, hi, typeCounts.keys().length))
  }
}

object PairingTws {
  private val nameCounter = new java.util.concurrent.atomic.AtomicInteger

  /** Runs `body` with the RocksDB state store provider (required by
    * `transformWithState`), row-count tracking off, restoring prior conf
    * after. */
  private[graft] def withRocksDb[T](s: SparkSession)(body: => T): T = {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val trackKey = "spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows"
    val prevProvider = s.conf.getOption(providerKey)
    val prevTrack = s.conf.getOption(trackKey)
    s.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s.conf.set(trackKey, "false")
    try body finally {
      prevProvider.fold(s.conf.unset(providerKey))(s.conf.set(providerKey, _))
      prevTrack.fold(s.conf.unset(trackKey))(s.conf.set(trackKey, _))
    }
  }

  /** s_pair_match_tws — the pairing operator as a REAL streaming query on
    * `transformWithState`: MemoryStream → [[PairProcessor]] (append mode,
    * RocksDB) → memory sink, executed synchronously. One input batch +
    * MinWins ⇒ identical results to the batch analog, so it shares
    * `s_pair_match`'s SQL oracle. (The driver-side collect only feeds the
    * in-memory test source; production swaps in the Kafka source
    * wrapper.) */
  /** s_user_stats_tws — per-user history/typed-counter stats through
    * [[UserStatsProcessor]] (ListState + MapState on RocksDB). One input
    * batch ⇒ one refreshed aggregate per user, so the plain per-user
    * GROUP BY oracle applies. */
  def sUserStatsTws(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val events = StreamingIndex.pinnedFeed(s, d, "feed_pair_all") {
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          unix_millis(col("ts")).as("ts_ms"))
        .as[PairEvent]
        .collect().toSeq
    }

    implicit val sqlCtx = s.sqlContext
    withRocksDb(s) {
      EventPairing.withStreamingPartitions(s) {
        val input = MemoryStream[PairEvent]
        input.addData(events.toSeq)
        val stats = input.toDS()
          .groupByKey(_.user_id)
          .transformWithState(new UserStatsProcessor,
            TimeMode.None(), OutputMode.Append())
        val name = s"s_user_stats_tws_${nameCounter.incrementAndGet()}"
        val q = stats.writeStream.format("memory").queryName(name)
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
        s.table(name).orderBy("user_id")
      }
    }
  }

  def sPairMatchTws(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val events = StreamingIndex.pinnedFeed(s, d, "feed_pair_filtered") {
      Tables.events(s, d)
        .filter(col("event_type").isin(
          EventPairing.PlacedType, EventPairing.FulfilledType))
        .select(col("user_id"), col("event_type"),
          unix_millis(col("ts")).as("ts_ms"))
        .as[PairEvent]
        .collect().toSeq
    }

    implicit val sqlCtx = s.sqlContext
    withRocksDb(s) {
      EventPairing.withStreamingPartitions(s) {
        val input = MemoryStream[PairEvent]
        input.addData(events.toSeq)

        val paired = input.toDS()
          .groupByKey(_.user_id)
          .transformWithState(
            new PairProcessor(EventPairing.MinWins, None, deadLetter = false),
            TimeMode.None(), OutputMode.Append())

        val name = s"s_pair_match_tws_${nameCounter.incrementAndGet()}"
        val q = paired.writeStream.format("memory").queryName(name)
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
        s.table(name)
          .select(col("user_id"), col("placed_ms"), col("fulfilled_ms"),
            col("processing_ms"))
          .orderBy("user_id")
      }
    }
  }
}
