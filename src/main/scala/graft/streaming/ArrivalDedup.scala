package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.Tables

/** One arrival keyed for the content-dedup tier: content hash, the
  * arriving doc id, and the arrival's event-time stamp. */
case class ArrivalEvent(doc_id: Long, key: String, ts: java.sql.Timestamp)

/** A flagged later arrival: the duplicate and the arrival it repeats.
  * `ts` is the flagged arrival's own stamp — declared as the output's
  * event-time column so downstream stateful operators can consume the
  * tier without redefining the watermark. */
case class ArrivalFlag(doc_id: Long, first_doc: Long, ts: java.sql.Timestamp)

/** Keep-first state per content hash: the first arrival's id and the
  * last same-content arrival's event time (the horizon anchor). */
case class ArrivalState(firstDoc: Long, lastTouchMs: Long)

/** The CROSS-ARRIVAL content-dedup tier of the streaming ingest path —
  * the batch increment's `exact_delta` rule (keep-first among arrivals,
  * `Corpus.corpusIncrement`) as keyed streaming state. The admission
  * gates screen every arrival against PRE-RUN session-pinned indexes,
  * which are frozen for the run: an arrival duplicating an earlier
  * same-run ADMITTED arrival passed every screen (the round-12 gap —
  * re-sent documents inside one ingest window are the case a real
  * pipeline hits daily). This processor closes it: key = content md5,
  * state = (first arrival, last touch); a same-content arrival within
  * `horizonSec` of the state's last touch is flagged against the first,
  * and extends the horizon (sliding — the reference's own per-key TTL
  * discipline, OrderProcessor.java:161-206 / O12, on event time).
  *
  * Expiry is enforced IN THE HANDLER on the row's own event time, not
  * by the timer: an event-time timer only fires once the watermark
  * passes it, so a row that itself advances the watermark past the
  * horizon would still see the stale state (measured — the timer-only
  * formulation mis-flagged the first post-expiry arrival). The single
  * re-armed named timer is pure state GC: it frees expired keys the
  * moment the watermark passes last-touch + horizon, bounding the store
  * at O(distinct content within the horizon) — never O(stream
  * lifetime). Late firing is harmless: the handler re-checks.
  *
  * Within a batch, rows sort by (ts, doc_id) so keep-first is the
  * arrival order, deterministic under Spark's unordered group iterator.
  */
class ArrivalDedupProcessor(horizonSec: Long)
    extends StatefulProcessor[String, ArrivalEvent, ArrivalFlag] {

  @transient private var st: ValueState[ArrivalState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[ArrivalState]("first",
      Encoders.product[ArrivalState], TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[ArrivalEvent],
      timers: TimerValues): Iterator[ArrivalFlag] = {
    val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.doc_id))
    val out = Vector.newBuilder[ArrivalFlag]
    sorted.foreach { e =>
      val cur = if (st.exists()) Some(st.get()) else None
      cur match {
        case Some(s0) if e.ts.getTime <= s0.lastTouchMs + horizonSec * 1000 =>
          out += ArrivalFlag(e.doc_id, s0.firstDoc, e.ts)
          st.update(ArrivalState(s0.firstDoc, e.ts.getTime))
        case _ => // no state, or horizon passed: fresh first, no flag
          st.update(ArrivalState(e.doc_id, e.ts.getTime))
      }
    }
    getHandle.listTimers().foreach(getHandle.deleteTimer)
    getHandle.registerTimer(sorted.last.ts.getTime + horizonSec * 1000)
    out.result().iterator
  }

  override def handleExpiredTimer(key: String, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[ArrivalFlag] = {
    st.clear() // GC only — the handler's event-time check owns semantics
    Iterator.empty
  }
}

/** s_arrival_dedup — the cross-arrival tier in isolation (the way
  * s_neardup_gate isolates the sketch tier): the corpus replays as an
  * ingest run PLUS a deterministic re-sent block — every doc whose
  * md5(doc_id) bucket is '0' (1/16, the dataSplit idiom) arrives a
  * second time at the end of the window under a fresh id
  * ([[ArrivalDedup.ResentBase]] + doc_id, same bytes) — the re-sent-
  * document population the gap is about. Every arrival whose content
  * matched an EARLIER arrival emits (doc_id, first_doc). Stamps derive
  * from the id's (block, original) split so arrival order is id order
  * and the feed stays watermark-monotone; the rig's horizon covers its
  * own replayed window (production sets wall-clock — a week of ingest —
  * via the same constructor), so the oracle is plain global keep-first:
  * min(doc_id) per md5 group over the arrival set. The only state is
  * the keyed keep-first store, horizon-bounded; the probe is map-side
  * md5 — no join, no shuffle at any corpus scale. */
object ArrivalDedup {

  /** Id offset separating re-sent copies from originals (and arrival
    * blocks from each other in the composed feed): blocks sort after
    * originals and ids can never collide while the corpus stays under
    * 1e8 docs per ingest window. */
  private[graft] val ResentBase = 100000000L

  /** First md5 hex nibble of the id's decimal string — the driver-side
    * twin of the oracle's `md5(CAST(doc_id AS VARCHAR))[1:1]`. */
  private[graft] def md5Nibble(id: Long): Char = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    "0123456789abcdef".charAt((d(0) >> 4) & 0xf)
  }

  /** Event-time seconds for an arrival id: 86400 (epoch-0 guard, see
    * sNeardupGate) + block·span + original — arrival order is id order
    * and blocks sit `span` apart, so a horizon of a few spans covers
    * the whole replayed window. */
  private[graft] def tsSeconds(id: Long, span: Long): Long =
    86400L + (id / ResentBase) * span + (id % ResentBase)

  def sArrivalDedup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val docs = StreamingIndex.docEvents(s, d).map(e => (e.doc_id, e.text))
    val span = docs.lastOption.fold(1L)(_._1 + 1)
    val resent = docs.filter { case (id, _) => md5Nibble(id) == '0' }
      .map { case (id, t) => (id + ResentBase, t) }
    val arrivals = (docs ++ resent).map { case (id, t) =>
      StreamingIndex.DocEvent(id, t)
    }
    PairingTws.withRocksDb(s) {
      EventPairing.withStreamingPartitions(s) {
        val input = MemoryStream[StreamingIndex.DocEvent]
        val flags = input.toDF()
          .select(col("doc_id"),
            md5(col("text").cast("binary")).as("key"),
            timestamp_seconds(lit(86400L) +
              expr(s"doc_id div $ResentBase") * lit(span) +
              pmod(col("doc_id"), lit(ResentBase))).as("ts"))
          .withWatermark("ts", "10 minutes")
          .as[ArrivalEvent]
          .groupByKey(_.key)
          .transformWithState(new ArrivalDedupProcessor(3 * span),
            "ts", OutputMode.Append())
          .select(col("doc_id"), col("first_doc"))
        val name = s"s_arrival_dedup_${StreamingIndex.nameCounter.incrementAndGet()}"
        // per-arrival emission + event-time-owned re-admission: safe to
        // skip the eviction-only no-data batches (see withLazyEviction)
        val q = StreamingIndex.withLazyEviction(s) {
          flags.writeStream.format("memory").queryName(name)
            .outputMode("append").start()
        }
        try {
          StreamingIndex.feedStaggered(input, arrivals, q)
          StreamingIndex.record("s_arrival_dedup", q)
        } finally q.stop()
        s.table(name).orderBy("doc_id")
      }
    }
  }
}
