package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.Tables

/** One placed/fulfilled half-pair event on the stream. */
case class PairEvent(user_id: Long, event_type: String, ts_ms: Long)

/** Buffered half-pair state (≙ the reference's per-order partial
  * aggregate in `order-state-store`, OrderProcessor.java:56,104-152). */
case class PairState(placedMs: Option[Long], fulfilledMs: Option[Long])

/** Completed pair (≙ the `order.info` record, OrderProcessor.java:139-143;
  * processing_ms may be negative — the reference takes no abs, :136). */
case class PairResult(user_id: Long, placed_ms: Long, fulfilled_ms: Long,
    processing_ms: Long)

/** Pair outcome including the dead-letter channel the reference leaves
  * as a TODO (OrderProcessor.java:184,200): `expired = true` rows are
  * TTL'd half-pairs (one side -1), routed downstream instead of
  * silently dropped. */
case class PairOutcome(user_id: Long, placed_ms: Long, fulfilled_ms: Long,
    processing_ms: Long, expired: Boolean)

/** The reference's custom stateful processor (O7/O8/O12,
  * OrderProcessor.java:99-257) re-expressed as
  * `flatMapGroupsWithState` — Spark's keyed-state surface:
  *
  *  - the RocksDB KeyValueStore get/put/delete (O8) becomes
  *    `GroupState.getOption/update/remove`;
  *  - the wall-clock punctuator full-store sweep (O12) becomes a per-key
  *    `ProcessingTimeTimeout` — Spark delivers the timeout as an extra
  *    function invocation with `state.hasTimedOut`, so expiry is O(expired
  *    keys), not O(store);
  *  - emission (O11) is the returned iterator.
  *
  * Two merge policies for duplicate halves:
  *  - [[MinWins]] — deterministic (matches the batch analog / SQL oracle);
  *  - [[LastWins]] — reference parity (`JsonObject.add` overwrites,
  *    OrderProcessor.java:114-118).
  */
object EventPairing {
  val PlacedType = "signup"
  val FulfilledType = "purchase"

  sealed trait MergePolicy
  case object MinWins extends MergePolicy
  case object LastWins extends MergePolicy

  /** The keyed pairing function. Pure — unit-testable with
    * TestGroupState, shared by the streaming query and the specs. */
  def pairFn(policy: MergePolicy, ttl: Option[java.time.Duration])(
      key: Long, events: Iterator[PairEvent],
      state: GroupState[PairState]): Iterator[PairResult] = {
    if (state.hasTimedOut) {
      // O12: expired half-pair is dropped (dead-letter topic is a
      // declared TODO in the reference too, OrderProcessor.java:184,200).
      state.remove()
      Iterator.empty
    } else {
      val prior = state.getOption.getOrElse(PairState(None, None))
      var placed = prior.placedMs
      var fulfilled = prior.fulfilledMs
      def merge(old: Option[Long], ts: Long): Option[Long] = policy match {
        case MinWins => Some(old.fold(ts)(math.min(_, ts)))
        case LastWins => Some(ts)
      }
      events.foreach { e =>
        if (e.event_type == PlacedType) placed = merge(placed, e.ts_ms)
        else if (e.event_type == FulfilledType) fulfilled = merge(fulfilled, e.ts_ms)
        // unknown event.type: ignored (OrderProcessor.java:121-124)
      }
      (placed, fulfilled) match {
        case (Some(p), Some(f)) =>
          state.remove() // completion deletes state (OrderProcessor.java:149)
          Iterator.single(PairResult(key, p, f, f - p))
        case _ =>
          state.update(PairState(placed, fulfilled))
          ttl.foreach(t => state.setTimeoutDuration(t.toMillis))
          Iterator.empty
      }
    }
  }

  /** pairFn variant that CLOSES the reference's dead-letter TODO: on
    * timeout the expired half-pair is emitted with `expired = true`
    * (missing side = -1) instead of vanishing — in production this
    * output splits into the results sink and a dead-letter topic via
    * two filtered writers on the same query. */
  def pairFnDeadLetter(policy: MergePolicy, ttl: java.time.Duration)(
      key: Long, events: Iterator[PairEvent],
      state: GroupState[PairState]): Iterator[PairOutcome] = {
    if (state.hasTimedOut) {
      val prior = state.getOption.getOrElse(PairState(None, None))
      state.remove()
      Iterator.single(PairOutcome(key,
        prior.placedMs.getOrElse(-1L), prior.fulfilledMs.getOrElse(-1L),
        -1L, expired = true))
    } else {
      pairFn(policy, Some(ttl))(key, events, state).map(r =>
        PairOutcome(r.user_id, r.placed_ms, r.fulfilled_ms,
          r.processing_ms, expired = false))
    }
  }

  private val nameCounter = new java.util.concurrent.atomic.AtomicInteger

  /** Runs `body` with a reduced shuffle-partition count: streaming state
    * store commits scale with partitions × stateful-ops × batches, and
    * these synchronous demo queries carry little data per partition —
    * 4 partitions cuts the fixed commit cost ~8× vs 32 (a production
    * deployment sizes this to state volume, not CPU count). Also swaps
    * the checkpoint file manager to the FileSystem-based one: the
    * default FileContext manager's local-FS rename path forks a
    * subprocess per file (Hadoop Shell readLink), which dominates
    * micro-batch commit cost on local disk (measured −21 % on the
    * chained-stateful flagship); on a real cluster checkpoints live on
    * HDFS/object storage where the default is fine and this conf is
    * simply not set. Both restored after. */
  private[streaming] def withStreamingPartitions[T](s: SparkSession)(body: => T): T = {
    val mgrKey = "spark.sql.streaming.checkpointFileManagerClass"
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    val prevMgr = s.conf.getOption(mgrKey)
    // 4 state partitions keep the tiny test rigs' micro-batch startup
    // cheap; a real deployment sizes this to the cluster — the skew
    // stress (tools/NeardupSkew) overrides it to the core count so the
    // hot-key contrast isn't artificially capped at 4-way parallelism.
    s.conf.set("spark.sql.shuffle.partitions",
      s.conf.getOption("graft.streaming.shufflePartitions").getOrElse("4"))
    s.conf.set(mgrKey, "org.apache.spark.sql.execution.streaming." +
      "checkpointing.FileSystemBasedCheckpointFileManager")
    try body finally {
      s.conf.set("spark.sql.shuffle.partitions", prev)
      prevMgr.fold(s.conf.unset(mgrKey))(s.conf.set(mgrKey, _))
    }
  }

  /** s_pair_match — the pairing operator run as a REAL streaming query:
    * MemoryStream source → flatMapGroupsWithState (append mode) → memory
    * sink, executed synchronously. Feeding all events as one batch makes
    * MinWins equal to the batch analog, so the same SQL oracle applies.
    * (The driver-side collect only feeds the in-memory test source; a
    * production run swaps MemoryStream for the Kafka source wrapper.) */
  def sPairMatch(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val events = StreamingIndex.pinnedFeed(s, d, "feed_pair_filtered") {
      Tables.events(s, d)
        .filter(col("event_type").isin(PlacedType, FulfilledType))
        .select(col("user_id"), col("event_type"),
          unix_millis(col("ts")).as("ts_ms"))
        .as[PairEvent]
        .collect().toSeq
    }

    implicit val sqlCtx = s.sqlContext
    withStreamingPartitions(s) {
      val input = MemoryStream[PairEvent]
      input.addData(events.toSeq)

      val paired = input.toDS()
        .groupByKey(_.user_id)
        .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
          pairFn(MinWins, None))

      val name = s"s_pair_match_${nameCounter.incrementAndGet()}"
      val q = paired.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      s.table(name).orderBy("user_id")
    }
  }
}
