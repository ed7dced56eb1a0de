package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Det._

/** The reference pipeline as ONE fully-streaming query with CHAINED
  * stateful operators — the shape SURVEY.md §2.2 identifies O7 as
  * ("semantically a stream-stream inner equi-join of two event subtypes
  * with a ±24 h validity window"), then the O15/O16 windowed rollup:
  *
  *   placed stream ⋈ fulfilled stream          (watermarked interval join:
  *     ON user AND placed ≤ fulfilled ≤ placed+24h — the time bound is
  *     what lets Spark expire join state)
  *   → tumbling 1-min window per facility      (chained stateful agg)
  *   → append mode                             (emit-once on close)
  *
  * Join state is bounded by the interval condition + watermark (the
  * reference's store grows with all in-flight orders and needs the
  * punctuator sweep; here expiry falls out of the watermark math).
  * Spark ≥3.4 supports this stateful-operator chain in append mode.
  */
object JoinedPipeline {

  private val nameCounter = new java.util.concurrent.atomic.AtomicInteger

  case class RawEvent(user_id: Long, event_type: String, ts_ms: Long)

  /** s_pipeline — per facility per 1-min window: count + total gap of
    * (placed, fulfilled) pairs joined within 24 h, emitted once per
    * closed window. All-pairs join semantics (each qualifying
    * combination counts), so the SQL oracle is a plain join + window. */
  def sPipeline(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val events = StreamingIndex.pinnedFeed(s, d, "feed_raw_filtered") {
      Tables.events(s, d)
        .filter(col("event_type").isin(EventPairing.PlacedType, EventPairing.FulfilledType))
        .select(col("user_id"), col("event_type"), unix_millis(col("ts")).as("ts_ms"))
        .as[RawEvent]
        .collect().toSeq
    }
    val maxTs = if (events.isEmpty) 0L else events.map(_.ts_ms).max

    implicit val sqlCtx = s.sqlContext
    // RocksDB state store: the 100 TB backend (bounded heap, native
    // memtables, changelog checkpointing on a real cluster) — exercised
    // here on the engine's heaviest stateful query, then restored so
    // the lighter demos keep the default provider
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = s.conf.getOption(providerKey)
    val trackKey = "spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows"
    val prevTrack = s.conf.getOption(trackKey)
    s.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // write-heavy state: skip per-commit row counting (the standard
    // RocksDB tuning for ingest-dominated stores)
    s.conf.set(trackKey, "false")
    try EventPairing.withStreamingPartitions(s) {
    val input = MemoryStream[RawEvent]

    val placed = input.toDF()
      .filter(col("event_type") === EventPairing.PlacedType)
      .select(col("user_id").as("p_user"), timestamp_millis(col("ts_ms")).as("p_ts"))
      .withWatermark("p_ts", "60 seconds")
    val fulfilled = input.toDF()
      .filter(col("event_type") === EventPairing.FulfilledType)
      .select(col("user_id").as("f_user"), timestamp_millis(col("ts_ms")).as("f_ts"))
      .withWatermark("f_ts", "60 seconds")

    val joined = placed.join(fulfilled,
      col("p_user") === col("f_user") &&
        col("f_ts") >= col("p_ts") &&
        col("f_ts") <= col("p_ts") + expr("INTERVAL 24 HOURS"))

    val agg = joined
      .withColumn("facility_id", col("f_user") % 10)
      .groupBy(window(col("f_ts"), "60 seconds"), col("facility_id"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(unix_millis(col("f_ts")) - unix_millis(col("p_ts"))).as("total_gap_ms"))
      .select(col("facility_id"), millis(col("window.end")).as("event_timestamp"),
        col("n_pairs"), col("total_gap_ms"))

    val name = s"s_pipeline_${nameCounter.incrementAndGet()}"
    // NO lazy eviction here: this is a TWO-stateful-operator chain
    // (stream-stream join → windowed agg), and the agg's input
    // watermark is the join's OUTPUT watermark — one batch behind the
    // source watermark. The final window therefore emits only on the
    // batch AFTER the second sentinel's, which with no-data batches
    // disabled never runs (measured: the sf0.001 oracle lost the last
    // window's row). Single-stateful-operator rigs don't have this lag.
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      // sentinels use distinct negative users so they never join; each
      // advances one side's watermark past every real window
      input.addData(events.toSeq ++ Seq(
        RawEvent(-1L, EventPairing.PlacedType, maxTs + 86400000L),
        RawEvent(-2L, EventPairing.FulfilledType, maxTs + 86400000L)))
      q.processAllAvailable()
      input.addData(
        RawEvent(-1L, EventPairing.PlacedType, maxTs + 90000000L),
        RawEvent(-2L, EventPairing.FulfilledType, maxTs + 90000000L))
      q.processAllAvailable()
    } finally q.stop()
    s.table(name)
      .filter(col("facility_id") >= 0)
      .orderBy("facility_id", "event_timestamp")
    } finally {
      prevProvider match {
        case Some(p) => s.conf.set(providerKey, p)
        case None => s.conf.unset(providerKey)
      }
      prevTrack match {
        case Some(p) => s.conf.set(trackKey, p)
        case None => s.conf.unset(trackKey)
      }
    }
  }

  /** s_join_outer — stream-stream LEFT OUTER interval join: every
    * signup pairs with each purchase inside its 24 h window; signups
    * with NO purchase in the window surface with nulls — but only once
    * BOTH watermarks pass the window end (before that, a match could
    * still arrive; the null row would be a retraction append mode can't
    * make). That outer-emission discipline is the semantic this query
    * exists to pin; state stays bounded by the same interval + watermark
    * math as [[sPipeline]]'s inner join. Oracle: the plain batch LEFT
    * JOIN — outer rows emitted late are still exactly the batch outer
    * rows. */
  def sJoinOuter(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val events = StreamingIndex.pinnedFeed(s, d, "feed_raw_filtered") {
      Tables.events(s, d)
        .filter(col("event_type").isin(EventPairing.PlacedType, EventPairing.FulfilledType))
        .select(col("user_id"), col("event_type"), unix_millis(col("ts")).as("ts_ms"))
        .as[RawEvent]
        .collect().toSeq
    }
    val maxTs = if (events.isEmpty) 0L else events.map(_.ts_ms).max

    implicit val sqlCtx = s.sqlContext
    EventPairing.withStreamingPartitions(s) {
      val input = MemoryStream[RawEvent]

      val placed = input.toDF()
        .filter(col("event_type") === EventPairing.PlacedType)
        .select(col("user_id").as("p_user"), timestamp_millis(col("ts_ms")).as("p_ts"))
        .withWatermark("p_ts", "60 seconds")
      val fulfilled = input.toDF()
        .filter(col("event_type") === EventPairing.FulfilledType)
        .select(col("user_id").as("f_user"), timestamp_millis(col("ts_ms")).as("f_ts"))
        .withWatermark("f_ts", "60 seconds")

      val joined = placed.join(fulfilled,
        col("p_user") === col("f_user") &&
          col("f_ts") >= col("p_ts") &&
          col("f_ts") <= col("p_ts") + expr("INTERVAL 24 HOURS"),
        "leftOuter")
        .select(col("p_user").as("user_id"),
          unix_millis(col("p_ts")).as("placed_ms"),
          unix_millis(col("f_ts")).as("fulfilled_ms"))

      val name = s"s_join_outer_${nameCounter.incrementAndGet()}"
      // NO lazy eviction: the outer join's null-row emission is an
      // EVICTION, and batch k evicts with the watermark computed at
      // batch k-1's end. After the sentinel-1 batch the watermark is
      // maxTs + 24h - 60s, which is BELOW the window end of any
      // unmatched signup placed in the last 60 s before maxTs — those
      // rows flush only in the eviction batch AFTER sentinel 2, i.e. a
      // no-data batch (measured: sf0.01 lost exactly one such row).
      val q = joined.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        // distinct negative sentinel users (never join); the second,
        // further-future pair pushes both watermarks past every real
        // signup's window end so unmatched rows actually flush
        input.addData(events.toSeq ++ Seq(
          RawEvent(-1L, EventPairing.PlacedType, maxTs + 86400000L),
          RawEvent(-2L, EventPairing.FulfilledType, maxTs + 86400000L)))
        q.processAllAvailable()
        input.addData(
          RawEvent(-1L, EventPairing.PlacedType, maxTs + 2 * 86400000L + 120000L),
          RawEvent(-2L, EventPairing.FulfilledType, maxTs + 2 * 86400000L + 120000L))
        q.processAllAvailable()
      } finally q.stop()
      s.table(name)
        .filter(col("user_id") >= 0)
        .orderBy(col("user_id"), col("placed_ms"),
          col("fulfilled_ms").asc_nulls_first)
    }
  }
}
