package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Det._

/** Round-2 streaming variants: the rest of the window family plus
  * streaming dedup and the stream-static join — each a REAL Structured
  * Streaming query over a MemoryStream, run synchronously with the
  * sentinel-watermark pattern (see [[WindowedAgg]]) and sharing its
  * batch twin's DuckDB oracle. */
object MoreStreaming {

  private val nameCounter = new java.util.concurrent.atomic.AtomicInteger
  private val Sentinel = "__sentinel__"

  /** One keyed event for the session/dedup variants. */
  case class KeyedEvent(user_id: Long, event_type: String, ts_ms: Long)

  /** One valued event for the stream-static join variant. */
  case class ValuedEvent(event_id: Long, value: Double)

  /** Builds + runs an append-mode memory-sink query over a KeyedEvent
    * MemoryStream; `feed` gets the stream and a drain thunk so it can
    * interleave addData / processAllAvailable rounds (the sentinel
    * watermark pattern needs at least two). */
  private def run(s: SparkSession, prefix: String)(
      build: DataFrame => DataFrame,
      feed: (MemoryStream[KeyedEvent], () => Unit) => Unit,
      mode: String = "append"): DataFrame = {
    implicit val sqlCtx = s.sqlContext
    import s.implicits._
    EventPairing.withStreamingPartitions(s) {
      val input = MemoryStream[KeyedEvent]
      val out = build(input.toDF())
      val name = s"${prefix}_${nameCounter.incrementAndGet()}"
      // every caller flushes via the two-sentinel DATA batches, so the
      // eviction-only no-data batches buy nothing (see withLazyEviction)
      val q = StreamingIndex.withLazyEviction(s) {
        out.writeStream.format("memory").queryName(name)
          .outputMode(mode).start()
      }
      try feed(input, () => q.processAllAvailable()) finally q.stop()
      s.table(name)
    }
  }

  private def keyedEvents(s: SparkSession, d: String): (Seq[KeyedEvent], Long) = {
    import s.implicits._
    val events = StreamingIndex.pinnedFeed(s, d, "feed_keyed_events") {
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"), unix_millis(col("ts")).as("ts_ms"))
        .as[KeyedEvent]
        .collect().toSeq
    }
    (events, if (events.isEmpty) 0L else events.map(_.ts_ms).max)
  }

  /** s_sliding_agg — 2-min/1-min sliding windows as an append-mode
    * streaming aggregation (each event lands in two window states);
    * same oracle as the batch q_window_sliding. */
  def sSlidingAgg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val events = StreamingIndex.pinnedFeed(s, d, "feed_stream_events") {
      Tables.events(s, d)
        .select(col("event_type"), unix_millis(col("ts")).as("ts_ms"), col("value"))
        .as[StreamEvent].collect().toSeq
    }
    val maxTs = if (events.isEmpty) 0L else events.map(_.ts_ms).max
    EventPairing.withStreamingPartitions(s) {
      val input = MemoryStream[StreamEvent]
      val agg = input.toDF()
        .withColumn("ts", timestamp_millis(col("ts_ms")))
        .withWatermark("ts", "60 seconds")
        .groupBy(window(col("ts"), "120 seconds", "60 seconds"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(col("event_type"), millis(col("window.start")).as("window_start_ms"),
          col("n"), col("sum_value"))
      val name = s"s_sliding_agg_${nameCounter.incrementAndGet()}"
      // same two-sentinel flush as s_tumbling_agg: sentinel 1 puts the
      // watermark a day past every real window, sentinel 2's data batch
      // emits them — the trailing no-data batch buys nothing
      val q = StreamingIndex.withLazyEviction(s) {
        agg.writeStream.format("memory").queryName(name)
          .outputMode("append").start()
      }
      try {
        input.addData(events.toSeq :+ StreamEvent(Sentinel, maxTs + 86400000L, 0.0))
        q.processAllAvailable()
        input.addData(StreamEvent(Sentinel, maxTs + 90000000L, 0.0))
        q.processAllAvailable()
      } finally q.stop()
      s.table(name)
        .filter(col("event_type") =!= Sentinel)
        .orderBy("event_type", "window_start_ms")
    }
  }

  /** s_session — 5-minute-gap session windows per user as an append-mode
    * streaming aggregation (sessions merge in state as events arrive;
    * a closed session emits once the watermark passes its end). Same
    * session_window expression → same oracle as q_window_session. */
  def sSession(s: SparkSession, d: String): DataFrame = {
    val (events, maxTs) = keyedEvents(s, d)
    run(s, "s_session")(
      df => df
        .withColumn("ts", timestamp_millis(col("ts_ms")))
        .withWatermark("ts", "60 seconds")
        .groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          millis(col("session_window.start")).as("session_start_ms"),
          col("n_events"),
          (millis(col("session_window.end")) - lit(300000L)).as("last_ms")),
      (input, drain) => {
        input.addData(events :+ KeyedEvent(-1L, Sentinel, maxTs + 86400000L))
        drain()
        input.addData(KeyedEvent(-1L, Sentinel, maxTs + 90000000L))
        drain()
      })
      .filter(col("user_id") >= 0)
      .orderBy("user_id", "session_start_ms")
  }

  /** s_dedup — streaming exact dedup: dropDuplicatesWithinWatermark
    * keeps one state entry per (user, type) key and expires it with the
    * watermark — the unbounded-stream form of `SELECT DISTINCT`. Only
    * the key columns are emitted, so the result is order-independent.
    *
    * Deliberately fed as ONE burst, unlike the StreamingIndex rigs'
    * staggered feeds: the events table spans ~30 days and many keys
    * recur more than the 1-hour delay apart, so under a multi-batch
    * feed an expired key re-emits — correct within-watermark semantics,
    * but WHICH keys re-emit depends on chunk boundaries, and the
    * deterministic DISTINCT oracle can't replay that. Watermark
    * eviction is instead observed on the staggered serve rigs, whose
    * id-derived stamps make expiry deterministic
    * (IndexLifecycleSpec's state-decay test). */
  def sDedup(s: SparkSession, d: String): DataFrame = {
    val (events, maxTs) = keyedEvents(s, d)
    run(s, "s_dedup")(
      df => df
        .withColumn("ts", timestamp_millis(col("ts_ms")))
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark("user_id", "event_type")
        .select(col("user_id"), col("event_type")),
      (input, drain) => { input.addData(events :+ KeyedEvent(-1L, Sentinel, maxTs)); drain() })
      .filter(col("user_id") >= 0)
      .orderBy("user_id", "event_type")
  }

  /** s_complete_agg — COMPLETE output mode: a non-windowed running
    * aggregation whose full result re-emits every batch (the reference's
    * cache-disabled KTable behavior, Main.java:64, is the UPDATE-mode
    * sibling). No watermark needed — state is one row per group key. */
  def sCompleteAgg(s: SparkSession, d: String): DataFrame = {
    val (events, _) = keyedEvents(s, d)
    run(s, "s_complete_agg")(
      df => df
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          min(col("ts_ms")).as("first_ms"), max(col("ts_ms")).as("last_ms")),
      (input, drain) => { input.addData(events); drain() },
      mode = "complete")
      .orderBy("event_type")
  }

  /** s_update_mode — UPDATE output mode: only keys whose aggregate
    * changed in the batch re-emit (the reference's
    * `cache.max.bytes.buffering=0` forward-every-update behavior,
    * Main.java:64,85 — C4). One ingest batch ⇒ each key emits exactly
    * once, so the batch oracle applies. */
  def sUpdateMode(s: SparkSession, d: String): DataFrame = {
    val (events, _) = keyedEvents(s, d)
    run(s, "s_update_mode")(
      df => df
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), min(col("ts_ms")).as("first_ms"),
          max(col("ts_ms")).as("last_ms")),
      (input, drain) => { input.addData(events); drain() },
      mode = "update")
      .orderBy("event_type")
  }

  /** s_foreach_sink — the production sink pattern: foreachBatch hands
    * each micro-batch DataFrame to arbitrary batch-writer code (here an
    * append-mode parquet write — in production: JDBC upserts, multi-sink
    * fan-out, MERGE INTO). The result is read back from the files the
    * sink produced, proving the loop end-to-end. */
  def sForeachSink(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val events = StreamingIndex.pinnedFeed(s, d, "feed_valued_events") {
      Tables.events(s, d)
        .select(col("event_id"), col("value"))
        .as[ValuedEvent].collect().toSeq
    }
    val dir = java.nio.file.Files
      .createTempDirectory("graft_foreach_sink").toString
    EventPairing.withStreamingPartitions(s) {
      val input = MemoryStream[ValuedEvent]
      val filtered = input.toDF().filter(col("value") > 100.0)
      val q = filtered.writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("append").parquet(dir)
        }
        .outputMode("append").start()
      try { input.addData(events.toSeq); q.processAllAvailable() } finally q.stop()
      // empty-result guard: with zero qualifying rows the sink never
      // wrote a file and a bare parquet read of the dir cannot infer a
      // schema. (The dir itself outlives the call — the returned frame
      // reads it lazily.)
      val parts = Option(new java.io.File(dir)
        .listFiles((_, n) => n.endsWith(".parquet"))).fold(0)(_.length)
      if (parts == 0) {
        import s.implicits._
        Seq.empty[(Long, Double)].toDF("event_id", "value")
      } else {
        s.read.parquet(dir).select(col("event_id"), col("value"))
          .orderBy("event_id")
      }
    }
  }

  /** s_file_source — a REAL file-based streaming source: the events
    * table is staged as json files, `readStream` tails the directory
    * with an explicit schema (file sources never infer), and a
    * watermarked tumbling aggregation drains with Trigger.AvailableNow.
    * This is the no-broker twin of the Kafka source (same wire shape,
    * see KafkaWire): at scale the directory is the landing zone and
    * maxFilesPerTrigger paces ingestion. */
  def sFileSource(s: SparkSession, d: String): DataFrame = {
    val stage = java.nio.file.Files
      .createTempDirectory("graft_file_source").toString
    Tables.events(s, d)
      .select(col("event_id"), col("event_type"),
        unix_millis(col("ts")).as("ts_ms"), col("value"))
      .write.mode("overwrite").json(stage)
    EventPairing.withStreamingPartitions(s) {
      val schema = "event_id BIGINT, event_type STRING, ts_ms BIGINT, value DOUBLE"
      val stream = s.readStream.schema(schema).json(stage)
        .withColumn("ts", timestamp_millis(col("ts_ms")))
        .withWatermark("ts", "60 seconds")
        .groupBy(window(col("ts"), "60 seconds"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(col("event_type"), millis(col("window.start")).as("window_start_ms"),
          col("n"), col("sum_value"))
      val name = s"s_file_source_${nameCounter.incrementAndGet()}"
      // AvailableNow + COMPLETE mode: drain all staged files in one run
      // and emit every window (no sentinel needed to push the watermark)
      val q = stream.writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
      s.table(name).orderBy("event_type", "window_start_ms")
    }
  }

  /** s_quality_gate — the corpus-ingestion quality filter as a LIVE
    * stream: documents land as json files, `readStream` tails the
    * directory, and each document passes or drops on the SAME exact
    * integer z-gate as the batch classifier
    * ([[graft.operators.TextAnalysis.logitZ]] — one code path, two
    * execution modes). Stateless map+filter: no watermark, no state
    * store, append mode — at scale this is the first hop of the
    * ingestion topology, pacing with maxFilesPerTrigger, and the gate
    * decision is reproducible batch-vs-stream because it is integer
    * arithmetic. Oracle: the batch relation of kept documents. */
  def sQualityGate(s: SparkSession, d: String): DataFrame = {
    val stage = java.nio.file.Files
      .createTempDirectory("graft_quality_gate").toString
    Tables.documents(s, d).select(col("doc_id"), col("text"))
      .write.mode("overwrite").json(stage)
    EventPairing.withStreamingPartitions(s) {
      val (n, zFp) = graft.operators.TextAnalysis.logitZ
      val gated = s.readStream.schema("doc_id BIGINT, text STRING").json(stage)
        .select(col("doc_id"), n.as("n_tokens"), zFp.as("z_fp"))
        .filter(col("z_fp") >= 0)
      val name = s"s_quality_gate_${nameCounter.incrementAndGet()}"
      val q = gated.writeStream.format("memory").queryName(name)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
      s.table(name).orderBy("doc_id")
    }
  }

  /** One change record for the streaming upsert sink. */
  case class ChangeRow(k: Long, op: String, new_price: Double)

  /** s_upsert_sink — streaming CDC apply (the lakehouse MERGE INTO
    * loop): each micro-batch of change rows full-outer-merges into a
    * VERSIONED parquet snapshot inside `foreachBatch` — updates win,
    * tombstones drop, inserts append — and the next batch reads the
    * version the previous one produced. Writing snapshot v(batchId+1)
    * rather than appending makes replay idempotent: a re-delivered
    * batch overwrites its own version instead of double-applying (the
    * exactly-once recipe for non-transactional sinks). Shares
    * q_upsert_merge's changeset; the oracle checks the FINAL snapshot
    * state, so the two-batch streaming apply must converge to exactly
    * the one-shot batch merge. At 100 TB the snapshot is a table format
    * with file-level pruning and the merge joins only touched
    * partitions; the per-batch shape here (one co-partitionable join,
    * one rewrite) is that loop's kernel. */
  def sUpsertSink(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val root = java.nio.file.Files
      .createTempDirectory("graft_upsert_sink").toString
    Tables.orders(s, d)
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("price"))
      .write.mode("overwrite").parquet(s"$root/v0")
    @volatile var latest = s"$root/v0"
    val changes = StreamingIndex.pinnedFeed(s, d, "feed_change_rows") {
      Tables.orders(s, d)
        .filter(col("o_orderkey") % 10 <= 2)
        .select(
          when(col("o_orderkey") % 10 === 2,
            col("o_orderkey") + lit(100000000L)).otherwise(col("o_orderkey")).as("k"),
          when(col("o_orderkey") % 10 === 1, lit("D")).otherwise(lit("U")).as("op"),
          (col("o_totalprice") + lit(100.0)).as("new_price"))
        .as[ChangeRow].collect().sortBy(_.k).toSeq
    }
    EventPairing.withStreamingPartitions(s) {
      val input = MemoryStream[ChangeRow]
      val q = input.toDF().writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val snap = s.read.parquet(latest)
          val next = s"$root/v${batchId + 1}"
          snap.join(batch, Seq("k"), "full_outer")
            .filter(col("op").isNull || col("op") =!= "D")
            .select(col("k"),
              coalesce(col("new_price"), col("price")).as("price"))
            .write.mode("overwrite").parquet(next)
          latest = next
        }
        .outputMode("append").start()
      try {
        val (first, second) = changes.splitAt(changes.length / 2)
        input.addData(first.toSeq); q.processAllAvailable()
        input.addData(second.toSeq); q.processAllAvailable()
      } finally q.stop()
    }
    s.read.parquet(latest)
      .agg(count(lit(1)).as("n_rows"),
        dsum(col("price")).as("sum_price"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
  }

  /** s_stream_static — stateless stream-static join: the streaming side
    * probes a broadcast static band dimension with a range predicate
    * (the streaming twin of q_range_join's theta join). No state, no
    * watermark — rows emit in the arriving micro-batch. */
  def sStreamStatic(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val events = StreamingIndex.pinnedFeed(s, d, "feed_valued_events") {
      Tables.events(s, d)
        .select(col("event_id"), col("value"))
        .as[ValuedEvent].collect().toSeq
    }
    val bands = Seq(
      ("p00_small", 0.0, 100.0),
      ("p01_mid", 100.0, 250.0),
      ("p02_large", 250.0, 500.0),
      ("p03_huge", 500.0, 1e9)).toDF("band", "lo", "hi")
    EventPairing.withStreamingPartitions(s) {
      val input = MemoryStream[ValuedEvent]
      val joined = input.toDF()
        .join(broadcast(bands),
          col("value") >= col("lo") && col("value") < col("hi"))
        .select(col("event_id"), col("band"), col("value"))
      val name = s"s_stream_static_${nameCounter.incrementAndGet()}"
      val q = joined.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try { input.addData(events.toSeq); q.processAllAvailable() } finally q.stop()
      s.table(name).orderBy("event_id")
    }
  }
}
