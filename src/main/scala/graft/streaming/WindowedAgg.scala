package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Det._

/** One raw event on the stream (wire shape: epoch-ms long). */
case class StreamEvent(event_type: String, ts_ms: Long, value: Double)

/** The reference's windowed aggregation + suppress (O15+O16,
  * Main.java:168-199) as a watermarked Structured Streaming query:
  *
  *  - 60 s tumbling window + 60 s grace ≙ `window(ts, "60 seconds")` +
  *    `withWatermark(ts, "60 seconds")`;
  *  - `suppress(untilWindowCloses)` ≙ `outputMode("append")` — append on
  *    a watermarked aggregation IS emit-once-on-window-close, with state
  *    bounded by the watermark instead of the reference's unbounded
  *    suppress buffer (SURVEY.md §7.3.2);
  *  - late data beyond the grace is dropped (Spark) vs silently merged
  *    but never re-emitted (Kafka Streams) — same observable output.
  */
object WindowedAgg {

  private val nameCounter = new java.util.concurrent.atomic.AtomicInteger
  private val Sentinel = "__sentinel__"

  /** s_tumbling_agg — per event_type per 1-minute window count+sum as a
    * REAL append-mode streaming query over a MemoryStream. Two batches:
    * the data plus a far-future sentinel ride together (the sentinel
    * pushes the watermark computed at batch 1's end past every real
    * window), then one trivial sentinel batch triggers the emission —
    * each closed window exactly once, with only two passes over the
    * window state instead of three. Sentinel rows are filtered from the
    * result; same SQL oracle as the batch q_tumbling_agg. */
  def sTumblingAgg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val events = StreamingIndex.pinnedFeed(s, d, "feed_stream_events") {
      Tables.events(s, d)
        .select(col("event_type"), unix_millis(col("ts")).as("ts_ms"),
          col("value"))
        .as[StreamEvent]
        .collect().toSeq
    }
    val maxTs = events.map(_.ts_ms).max

    implicit val sqlCtx = s.sqlContext
    EventPairing.withStreamingPartitions(s) {
    val input = MemoryStream[StreamEvent]

    val agg = input.toDF()
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .withWatermark("ts", "60 seconds")
      .groupBy(window(col("ts"), "60 seconds"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("event_type"), millis(col("window.start")).as("window_start_ms"),
        col("n"), col("sum_value"))

    val name = s"s_tumbling_agg_${nameCounter.incrementAndGet()}"
    // emission rides the two sentinel DATA batches below — the
    // eviction-only no-data batches buy nothing (see withLazyEviction)
    val q = StreamingIndex.withLazyEviction(s) {
      agg.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
    }
    try {
      // sentinel 1 rides with the data: the watermark computed at this
      // batch's end already clears every real window
      input.addData(events.toSeq :+ StreamEvent(Sentinel, maxTs + 86400000L, 0.0))
      q.processAllAvailable()
      // sentinel 2: triggers the batch that emits all real windows
      input.addData(StreamEvent(Sentinel, maxTs + 90000000L, 0.0))
      q.processAllAvailable()
    } finally q.stop()
    s.table(name)
      .filter(col("event_type") =!= Sentinel)
      .orderBy("event_type", "window_start_ms")
    }
  }
}
