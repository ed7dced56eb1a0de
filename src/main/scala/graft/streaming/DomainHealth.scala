package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Det.millis

/** One arriving document with its origin tag — the per-source grain
  * [[DomainHealth.sDomainStats]] monitors. */
case class SourceDoc(doc_id: Long, source: String, text: String)

/** s_domain_stats — the per-SOURCE ingest health monitor as a live
  * stream: q_domain_stats' RefinedWeb-style rollup (docs, tokens,
  * quality-gate pass rate per origin) at ingest-window grain, beside
  * [[LmDrift]]'s distribution alarm. A source whose pass rate drops in
  * one window localizes blame to the feed that changed — the alert a
  * corpus operator pages on, hours before the nightly batch rollup
  * would see it.
  *
  * Shape: the gate score is the SAME exact-integer
  * [[graft.operators.TextAnalysis.logitZ]] expression the batch
  * classifier, the streaming quality gate, and the composed ingest
  * screen share (one definition — batch and stream decisions are
  * bit-identical), computed MAP-SIDE per arrival; ONE watermarked
  * tumbling window keyed (window, source) rolls it up in append mode
  * (each window emits once, closed; state watermark-bounded). The
  * pass rate is one IEEE division of exact longs rounded at the edge.
  * At 100 TB/day the per-trigger work is linear in the batch and the
  * state is O(sources × open windows). */
object DomainHealth {

  /** The rollup over an explicit arrival relation — the spec hook.
    * `arrivals` must carry (doc_id, source, text, ts) with a watermark
    * on ts. */
  private[graft] def statsOver(arrivals: DataFrame): DataFrame = {
    val (n, zFp) = graft.operators.TextAnalysis.logitZ
    arrivals
      .select(col("ts"), col("source"), n.as("n_tokens"),
        (zFp >= 0).as("pass"))
      .groupBy(window(col("ts"), "60 seconds"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("n_tokens"),
        count(when(col("pass"), 1)).as("n_pass"))
      .select(millis(col("window.start")).as("window_start_ms"),
        col("source"), col("n_docs"), col("n_tokens"), col("n_pass"),
        round(col("n_pass").cast("double") / col("n_docs"), 6).as("pass_rate"))
  }

  def sDomainStats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val docs = StreamingIndex.pinnedFeed(s, d, "feed_source_docs") {
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("text"))
        .as[SourceDoc].collect().toSeq.sortBy(_.doc_id)
    }
    val maxId = docs.lastOption.fold(0L)(_.doc_id)
    EventPairing.withStreamingPartitions(s) {
      val input = MemoryStream[SourceDoc]
      val arrivals = input.toDF()
        // +1 day: epoch-0 guard (see sNeardupGate); one arrival per
        // second, so each window covers 60 arrivals
        .select(col("doc_id"), col("source"), col("text"),
          timestamp_seconds(col("doc_id") + lit(86400L)).as("ts"))
        .withWatermark("ts", "60 seconds")
      val stats = statsOver(arrivals)
      val name = s"s_domain_stats_${StreamingIndex.nameCounter.incrementAndGet()}"
      // emission rides the two-sentinel flush below (data batches)
      val q = StreamingIndex.withLazyEviction(s) {
        stats.writeStream.format("memory").queryName(name)
          .outputMode("append").start()
      }
      try {
        // the WindowedAgg two-sentinel flush: push the watermark past
        // every real window; sentinel windows are sliced off below
        StreamingIndex.feedStaggered(input,
          docs :+ SourceDoc(maxId + 86400, "zz__flush__", "zz"), q)
        input.addData(SourceDoc(maxId + 172800, "zz__flush__", "zz"))
        q.processAllAvailable()
        StreamingIndex.record("s_domain_stats", q)
      } finally q.stop()
      s.table(name)
        .filter(col("window_start_ms") <= (86400L + maxId) * 1000)
        .orderBy("window_start_ms", "source")
    }
  }
}
