package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Det._

/** One event as it crosses the ingestion boundary: the wire payload plus
  * the arrival timestamp the ingestion layer stamped on it. */
case class IngestEvent(event_type: String, ts_ms: Long, value: Double,
    ingest_ms: Long)

/** C1 — the reference's PROCESSING-TIME windowing. The reference
  * configures `WallclockTimestampExtractor` (Main.java:83): every record
  * is windowed by when it ARRIVES, not by its embedded `event.timestamp`.
  * The engine's other queries window on event time (deterministic,
  * replayable — SURVEY.md §7.3.1 documents the divergence); this query
  * demonstrates the reference's semantics on Spark: stamp an ingestion
  * timestamp column at the source and window on THAT.
  *
  *  - production shape: `readStream … .withColumn("ingest_ts",
  *    current_timestamp())` — Spark evaluates it per micro-batch at
  *    arrival, which IS the wall-clock extractor;
  *  - test rig: arrival times are injected deterministically (three
  *    60-second "arrival waves", wave = event_id mod 3) so the query is
  *    oracle-checkable — the semantics under test (the window key comes
  *    from the arrival column, the event timestamp is ignored) are
  *    identical;
  *  - a record whose event time is days old still lands in the window of
  *    the wave it ARRIVES in (pinned by spec) — exactly what
  *    `WallclockTimestampExtractor` does with late data, and exactly what
  *    event-time windowing does not;
  *  - ingestion time is monotone per source, so the watermark delay is 0:
  *    arrival-time windows close as soon as the clock passes them, which
  *    is the reference's emit-on-wall-clock-advance.
  */
object IngestTime {

  /** Fixed arrival epoch for the deterministic rig: 2026-01-01T00:00Z. */
  val IngestEpochMs = 1767225600000L
  private val WaveMs = 60000L

  private val nameCounter = new java.util.concurrent.atomic.AtomicInteger
  private val Sentinel = "__sentinel__"

  /** s_ingest_time — per event_type per 1-minute ARRIVAL window count+sum
    * as a real append-mode streaming query (emit on window close). */
  def sIngestTime(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val events = StreamingIndex.pinnedFeed(s, d, "feed_ingest_time") {
      Tables.events(s, d)
        .select(col("event_type"), unix_millis(col("ts")).as("ts_ms"),
          col("value"),
          // the rig's deterministic "wall clock": wave = event_id mod 3
          (lit(IngestEpochMs) + (col("event_id") % 3) * WaveMs).as("ingest_ms"))
        .as[IngestEvent]
        .collect().toSeq
    }

    implicit val sqlCtx = s.sqlContext
    EventPairing.withStreamingPartitions(s) {
      val input = MemoryStream[IngestEvent]

      val agg = input.toDF()
        // production: current_timestamp() here instead of the rig column
        .withColumn("ingest_ts", timestamp_millis(col("ingest_ms")))
        .withWatermark("ingest_ts", "0 seconds")
        .groupBy(window(col("ingest_ts"), "60 seconds"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        // window END timestamp on the output record (Main.java:201)
        .select(col("event_type"), millis(col("window.end")).as("window_end_ms"),
          col("n"), col("sum_value"))

      val name = s"s_ingest_time_${nameCounter.incrementAndGet()}"
      // emission rides the two sentinel DATA batches
      val q = StreamingIndex.withLazyEviction(s) {
        agg.writeStream.format("memory").queryName(name)
          .outputMode("append").start()
      }
      try {
        // sentinel 1 rides with the data: its arrival time pushes the
        // watermark past every real arrival window at batch 1's end
        input.addData(events.toSeq :+
          IngestEvent(Sentinel, 0L, 0.0, IngestEpochMs + 86400000L))
        q.processAllAvailable()
        // sentinel 2 triggers the batch that emits the closed windows
        input.addData(IngestEvent(Sentinel, 0L, 0.0, IngestEpochMs + 90000000L))
        q.processAllAvailable()
      } finally q.stop()
      s.table(name)
        .filter(col("event_type") =!= Sentinel)
        .orderBy("event_type", "window_end_ms")
    }
  }
}
