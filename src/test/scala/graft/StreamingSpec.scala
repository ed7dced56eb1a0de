package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, TestGroupState}

import graft.streaming._
import graft.streaming.EventPairing.{pairFn, LastWins, MinWins}

/** Streaming semantics (SURVEY.md §5.3 + §7.3): state transitions of the
  * pairing function (via TestGroupState — no cluster needed), multi-batch
  * incremental pairing, duplicate re-open parity, and append-mode window
  * finals with late data inside/outside the grace. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  import org.apache.spark.api.java.Optional

  private def state(s: Option[PairState]): TestGroupState[PairState] =
    TestGroupState.create[PairState](
      s.fold(Optional.empty[PairState]())(Optional.of),
      GroupStateTimeout.NoTimeout, 0L, Optional.empty(), false)

  test("pairFn buffers a half, emits on completion, deletes state") {
    val s1 = state(None)
    val out1 = pairFn(MinWins, None)(7L,
      Iterator(PairEvent(7, "signup", 100L)), s1).toList
    assert(out1.isEmpty && s1.get == PairState(Some(100L), None))

    val s2 = state(Some(PairState(Some(100L), None)))
    val out2 = pairFn(MinWins, None)(7L,
      Iterator(PairEvent(7, "purchase", 250L)), s2).toList
    assert(out2 == List(PairResult(7, 100L, 250L, 150L)))
    assert(s2.isRemoved) // completion deletes state (OrderProcessor.java:149)
  }

  test("LastWins reproduces the reference's duplicate overwrite (JsonObject.add)") {
    val s = state(Some(PairState(Some(100L), None)))
    val out = pairFn(LastWins, None)(7L,
      Iterator(PairEvent(7, "signup", 500L), PairEvent(7, "purchase", 900L)), s).toList
    assert(out == List(PairResult(7, 500L, 900L, 400L))) // 500 overwrote 100
  }

  test("MinWins keeps the earliest duplicate (batch-analog parity)") {
    val s = state(Some(PairState(Some(100L), None)))
    val out = pairFn(MinWins, None)(7L,
      Iterator(PairEvent(7, "signup", 500L), PairEvent(7, "purchase", 900L)), s).toList
    assert(out == List(PairResult(7, 100L, 900L, 800L)))
  }

  test("timeout branch drops the expired half-pair (O12 TTL)") {
    val s = TestGroupState.create[PairState](
      Optional.of(PairState(Some(100L), None)),
      GroupStateTimeout.ProcessingTimeTimeout, 0L,
      Optional.empty(), true) // hasTimedOut = true
    val out = pairFn(MinWins, Some(java.time.Duration.ofHours(24)))(
      7L, Iterator.empty, s).toList
    assert(out.isEmpty && s.isRemoved)
  }

  test("dead-letter variant emits the expired half-pair instead of dropping it") {
    val s = TestGroupState.create[PairState](
      Optional.of(PairState(Some(100L), None)),
      GroupStateTimeout.ProcessingTimeTimeout, 0L,
      Optional.empty(), true)
    val out = EventPairing.pairFnDeadLetter(MinWins, java.time.Duration.ofHours(24))(
      7L, Iterator.empty, s).toList
    assert(out == List(PairOutcome(7L, 100L, -1L, -1L, expired = true)))
    assert(s.isRemoved)
    // the happy path still pairs normally through the same function
    val s2 = state(None)
    val out2 = EventPairing.pairFnDeadLetter(MinWins, java.time.Duration.ofHours(24))(
      7L, Iterator(PairEvent(7, "signup", 10L), PairEvent(7, "purchase", 30L)), s2).toList
    assert(out2 == List(PairOutcome(7L, 10L, 30L, 20L, expired = false)))
  }

  test("unknown event.type is ignored (OrderProcessor.java:121-124)") {
    val s = state(None)
    val out = pairFn(MinWins, None)(7L,
      Iterator(PairEvent(7, "view", 100L)), s).toList
    assert(out.isEmpty && s.get == PairState(None, None))
  }

  test("a duplicate arriving after completion re-opens a half-pair (§7.3.5)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[PairEvent]
    val q = input.toDS().groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        pairFn(LastWins, None))
      .writeStream.format("memory").queryName("reopen").outputMode("append").start()
    try {
      input.addData(PairEvent(1, "signup", 10L), PairEvent(1, "purchase", 20L))
      q.processAllAvailable()
      input.addData(PairEvent(1, "purchase", 30L)) // after completion
      q.processAllAvailable()
      input.addData(PairEvent(1, "signup", 40L)) // its twin re-arrives
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("reopen").orderBy("placed_ms").collect()
    assert(out.length == 2) // first pair + the re-opened pair (40,30) → -10
    assert(out.last.getLong(3) == -10L)
  }

  test("append-mode window agg emits a closed window once; late-beyond-grace is dropped") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamEvent]
    val agg = input.toDF()
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .withWatermark("ts", "60 seconds")
      .groupBy(window(col("ts"), "60 seconds"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("event_type"), unix_millis(col("window.start")).as("w"), col("n"))
    val q = agg.writeStream.format("memory").queryName("winlate")
      .outputMode("append").start()
    try {
      input.addData(StreamEvent("a", 10000L, 1.0), StreamEvent("a", 20000L, 1.0))
      q.processAllAvailable() // watermark after batch: 20000-60000 < 0
      input.addData(StreamEvent("a", 15000L, 1.0)) // late, inside grace → merged
      q.processAllAvailable()
      input.addData(StreamEvent("b", 200000L, 1.0)) // advances watermark to 140s
      q.processAllAvailable()
      input.addData(StreamEvent("a", 30000L, 1.0)) // late, BEYOND grace → dropped
      input.addData(StreamEvent("b", 400000L, 1.0))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("winlate").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // window [0,60s) of 'a' emitted exactly once with the merged late row
    assert(out.contains(("a", 0L, 3L)))
    assert(!out.exists(t => t._1 == "a" && t._2 == 0L && t._3 != 3L))
  }

  test("checkpoint restart resumes exactly-once (no reprocessing, no loss)") {
    import java.nio.file.Files
    val stage = Files.createTempDirectory("graft_ckpt_stage").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_dir").toString
    val out = Files.createTempDirectory("graft_ckpt_out").toString
    val schema = "id BIGINT, v DOUBLE"

    // parquet sink: recoverable (its _spark_metadata log IS the
    // exactly-once mechanism; the memory sink can't recover)
    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema).json(stage)
        .filter(col("v") > 10.0)
        .select(col("id"))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
    }
    def sunk(): Seq[Long] =
      spark.read.parquet(out).collect().map(_.getLong(0)).sorted.toSeq

    Seq((1L, 5.0), (2L, 20.0), (3L, 30.0)).toDF("id", "v")
      .write.mode("append").json(stage)
    runOnce()
    assert(sunk() == Seq(2L, 3L))

    Seq((4L, 40.0), (5L, 1.0)).toDF("id", "v")
      .write.mode("append").json(stage)
    runOnce()
    // the restarted query resumed from committed offsets: the new file's
    // qualifying row appended exactly once, nothing reprocessed
    assert(sunk() == Seq(2L, 3L, 4L))
  }

  test("PairProcessor (transformWithState): pairs complete, cancel timers; expired timers dead-letter") {
    // Direct unit drive of the StatefulProcessor against a fake handle —
    // the TWS analog of the TestGroupState specs above. (Wall-clock timer
    // DELIVERY belongs to the runtime; what's ours is the state/timer
    // protocol: arm on half-pair, re-arm on update, cancel on completion,
    // dead-letter on expiry.)
    val h = new FakeTwsHandle
    val p = new PairProcessor(MinWins, Some(1000L), deadLetter = true)
    p.setHandle(h)
    p.init(OutputMode.Append(), org.apache.spark.sql.streaming.TimeMode.ProcessingTime())
    def tv(now: Long) = new org.apache.spark.sql.streaming.TimerValues {
      def getCurrentProcessingTimeInMs: Long = now
      def getCurrentWatermarkInMs: Long = 0L
    }
    // half-pair arrives → state buffered, timer armed at now+ttl
    assert(p.handleInputRows(2L, Iterator(PairEvent(2, "signup", 100L)), tv(5000L)).isEmpty)
    assert(h.state.get() == PairState(Some(100L), None) && h.timers.toList == List(6000L))
    // duplicate half re-arms the timer (sliding TTL, one live timer)
    assert(p.handleInputRows(2L, Iterator(PairEvent(2, "signup", 70L)), tv(5500L)).isEmpty)
    assert(h.timers.toList == List(6500L)) // old timer deleted, new armed
    // completion emits, deletes state, CANCELS the timer (punctuator skip)
    val done = p.handleInputRows(2L, Iterator(PairEvent(2, "purchase", 90L)), tv(5600L)).toList
    assert(done == List(PairOutcome(2L, 70L, 90L, 20L, expired = false)))
    assert(!h.state.exists() && h.timers.isEmpty)
    // a fresh half-pair whose timer expires → dead-letter row (O12 TTL,
    // the reference's TODO'd dead-letter topic, closed)
    assert(p.handleInputRows(3L, Iterator(PairEvent(3, "signup", 200L)), tv(7000L)).isEmpty)
    val expiredOut = p.handleExpiredTimer(3L, tv(9000L),
      new org.apache.spark.sql.streaming.ExpiredTimerInfo {
        def getExpiryTimeInMs: Long = 8000L
      }).toList
    assert(expiredOut == List(PairOutcome(3L, 200L, -1L, -1L, expired = true)))
    assert(!h.state.exists())
    // an already-fired timer for a completed key emits nothing
    assert(p.handleExpiredTimer(3L, tv(9500L),
      new org.apache.spark.sql.streaming.ExpiredTimerInfo {
        def getExpiryTimeInMs: Long = 9000L
      }).isEmpty)
  }

  test("s_ingest_time windows by ARRIVAL time, not event time (C1 wall-clock semantics)") {
    import IngestTime.IngestEpochMs
    // event 1 carries an event timestamp a full DAY before its arrival
    // wave; under the reference's WallclockTimestampExtractor it must be
    // counted in the window it ARRIVES in (wave 1), and no window may
    // exist anywhere near its event time.
    val dayOld = IngestEpochMs - 86400000L
    val dir = fixtureDir("events" -> Seq(
      (1L, new Timestamp(dayOld), 10L, "signup", 1.0, ""), // wave 1 (1 % 3)
      (3L, new Timestamp(IngestEpochMs), 11L, "signup", 2.0, ""), // wave 0
      (4L, new Timestamp(IngestEpochMs), 12L, "signup", 4.0, "")) // wave 1
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val rows = IngestTime.sIngestTime(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toList
    assert(rows == List(
      (IngestEpochMs + 60000L, 1L, 2.0), // wave 0: event 3
      (IngestEpochMs + 120000L, 2L, 5.0))) // wave 1: the stale event 1 + event 4
    // nothing landed near the day-old event timestamp
    assert(rows.forall(_._1 >= IngestEpochMs + 60000L))
  }

  test("KafkaWire round-trips the dotted-name wire format with log-and-continue") {
    val wire = Seq(
      ("k1", """{"event.type":"order.placed","event.timestamp":100,"facility.id":"f1","order.id":"o1"}"""),
      ("k2", "not json at all"))
      .toDF("key", "value")
      .select(col("key").cast("binary"), col("value").cast("binary"))
    val parsed = KafkaWire.parse(wire)
    val rows = parsed.collect()
    assert(rows.length == 1) // garbage dropped, query alive (C2)
    assert(rows.head.getString(1) == "order.placed" && rows.head.getLong(2) == 100L)
    val back = KafkaWire.emit(parsed).collect().head
    assert(back.getString(0) == "o1")
    assert(back.getString(1).contains("\"event.type\":\"order.placed\""))
  }

  test("s_join_outer: null row ONLY for signups with no purchase inside 24 h") {
    def t(s: String): Timestamp = Timestamp.valueOf(s)
    val d = fixtureDir("events" -> Seq(
      (1L, t("2024-01-01 00:00:00"), 1L, "signup", 0.0, "{}"),
      (2L, t("2024-01-01 01:00:00"), 1L, "purchase", 0.0, "{}"),   // in window
      (3L, t("2024-01-01 00:00:00"), 2L, "signup", 0.0, "{}"),     // never purchases
      (4L, t("2024-01-01 00:00:00"), 3L, "signup", 0.0, "{}"),
      (5L, t("2024-01-02 01:00:00"), 3L, "purchase", 0.0, "{}"),   // 25 h: OUTSIDE
      (6L, t("2024-01-01 00:00:00"), 4L, "signup", 0.0, "{}"),
      (7L, t("2024-01-01 01:00:00"), 4L, "purchase", 0.0, "{}"),   // two matches:
      (8L, t("2024-01-01 02:00:00"), 4L, "purchase", 0.0, "{}")    // all-pairs, no null
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val r = JoinedPipeline.sJoinOuter(spark, d).collect()
      .map(x => (x.getLong(0), x.isNullAt(2)))
    assert(r.toSeq == Seq(
      (1L, false),          // matched pair, no null row
      (2L, true),           // no purchase at all → exactly one null row
      (3L, true),           // purchase exists but outside the window → null
      (4L, false), (4L, false))) // both in-window purchases, no null row
  }
}
