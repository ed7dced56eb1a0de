package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Det.millis

/** s_lm_drift — the DISTRIBUTION-SHIFT alarm a production ingest runs
  * beside the quality gate: every arriving document's bigrams are
  * scored MAP-SIDE against the pinned corpus bigram LM
  * ([[graft.operators.Corpus.bigramLmIndex]] — vocabulary²-sized,
  * broadcast; the same relation q_doc_perplexity filters with, so the
  * batch gate and the streaming alarm cannot drift from each other),
  * and one watermarked tumbling window rolls the scores up per ingest
  * minute: gram volume, the UNSEEN-bigram count (the out-of-vocabulary
  * rate — the leading indicator that the arriving distribution has
  * left the corpus the LM was trained on), and the mean snapped
  * −ln P(w2|w1) over the seen grams (the docPerplexity fixed-point
  * scheme at window grain — order-independent, engine-portable).
  *
  * Shape: stateless gram explode → ONE stream-static broadcast left
  * join (unseen grams survive as null-p rows — an inner join would
  * silently hide exactly the signal this monitor exists for) → one
  * windowed aggregation under a watermark (append mode: each window
  * emits once, closed; state is watermark-bounded). At 100 TB/day the
  * LM stays broadcast-sized and the per-trigger work is linear in the
  * batch's grams. */
object LmDrift {

  /** The arrival bigram stream: (ts, w1, w2) per adjacent token pair. */
  private def gramsOf(arrivals: DataFrame): DataFrame =
    arrivals
      .select(col("ts"), split(col("text"), " ").as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(col("ts"), explode(expr(
        "transform(sequence(1, size(tk) - 1), i -> struct(tk[i-1] AS w1, tk[i] AS w2))"))
        .as("g"))
      .select(col("ts"), col("g.w1").as("w1"), col("g.w2").as("w2"))

  /** The windowed drift rollup over a scored gram stream — `scored`
    * carries (ts, w1, w2, p) with p null on unseen grams. */
  private def rollup(scored: DataFrame): DataFrame =
    scored
      .groupBy(window(col("ts"), "60 seconds"))
      .agg(count(lit(1)).as("n_grams"),
        count(when(col("p").isNull, 1)).as("n_unseen"),
        (sum(when(col("p").isNotNull,
          floor(-log(col("p")) * 1000000 + 0.5))).cast("double") / 1000000.0
          / count(when(col("p").isNotNull, 1))).as("avg_neg_logp"))
      .select(millis(col("window.start")).as("window_start_ms"),
        col("n_grams"), col("n_unseen"), col("avg_neg_logp"))

  /** The drift chain over explicit LM and arrival relations — the spec
    * hook (a crafted LM vs novel-bigram arrivals pins the unseen-count
    * and empty-seen-window semantics the organic rig cannot reach).
    * `arrivals` must carry (doc_id, text, ts) with a watermark on ts. */
  private[graft] def driftOver(lm: DataFrame, arrivals: DataFrame): DataFrame =
    rollup(gramsOf(arrivals).join(broadcast(lm), Seq("w1", "w2"), "left"))

  def sLmDrift(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val lm = graft.operators.Corpus.bigramLmIndex(s, d)
    val docs = StreamingIndex.docEvents(s, d)
    val maxId = docs.lastOption.fold(0L)(_.doc_id)
    EventPairing.withStreamingPartitions(s) {
      val input = MemoryStream[StreamingIndex.DocEvent]
      val arrivals = input.toDF()
        // +1 day: epoch-0 guard (see sNeardupGate); one arrival per
        // second, so each window covers 60 arrivals
        .select(col("doc_id"), col("text"),
          timestamp_seconds(col("doc_id") + lit(86400L)).as("ts"))
        .withWatermark("ts", "60 seconds")
      // MEASURED NON-WIN (kept as the join, deliberately): replacing
      // this per-trigger LM BroadcastExchange with a once-per-pin map
      // probe (the gate-map move, via an interpreted (w1, w2) → p udf)
      // made the rig SLOWER — addBatch 2.6 → 3.4-4.3 s over 11 batches
      // — because the ratio is inverted vs the gates: the LM rebuild is
      // small (vocab²-bounded) while the probe side is EVERY arrival
      // bigram (~600k interpreted udf calls with string-concat keys vs
      // codegen'd hash-join probes). The gates win the trade because
      // their build side is the multi-MB posting pin and their probe
      // side a few hundred gram rows per trigger.
      val drift = driftOver(lm, arrivals)
      val name = s"s_lm_drift_${StreamingIndex.nameCounter.incrementAndGet()}"
      // emission rides the two-sentinel flush below (data batches)
      val q = StreamingIndex.withLazyEviction(s) {
        drift.writeStream.format("memory").queryName(name)
          .outputMode("append").start()
      }
      try {
        // TWO-token sentinels push the watermark past every real window
        // (the WindowedAgg two-sentinel flush). They must survive the
        // ≥2-token gram filter: the optimizer pushes that filter BELOW
        // the watermark node (it doesn't reference the event-time
        // column), so a single-token sentinel would be dropped before
        // the event-time stats and the last real windows would never
        // close (measured — the spec fixture caught it). Their own
        // late windows are sliced off the result by the time bound.
        StreamingIndex.feedStaggered(input,
          docs :+ StreamingIndex.DocEvent(maxId + 86400, "zz__flush__ zz__flush__"), q)
        input.addData(StreamingIndex.DocEvent(maxId + 172800, "zz__flush__ zz__flush__"))
        q.processAllAvailable()
        StreamingIndex.record("s_lm_drift", q)
      } finally q.stop()
      s.table(name)
        .filter(col("window_start_ms") <= (86400L + maxId) * 1000)
        .orderBy("window_start_ms")
    }
  }
}
