package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The ONE freeing policy behind every session-keyed pinned-relation
  * cache (StreamingIndex.pinnedCorpus, Corpus.pinnedVocab/gramIndex,
  * Similarity.bqIndex) and the job-scoped stage pins (Corpus.corpusBuild).
  *
  * A pinned relation is a `localCheckpoint` — truncated lineage — so
  * unpersisting it under a consumer does not trigger recompute, it
  * triggers missing-block failures. The displacement invariant ("a pin
  * must not be freed while a query over it is in flight") was previously
  * documented at each cache and satisfied entirely by caller convention;
  * this object ENFORCES it for both consumer kinds:
  *
  *  - STREAMING: a displaced pin parks with the id set of the streaming
  *    queries ACTIVE AT PARK TIME — the only queries whose compiled
  *    plans can reference the old blocks (a query started later builds
  *    from the cache, which already holds the replacement). The pin is
  *    released once every one of THOSE queries has stopped. Scoping the
  *    release to the pin (round-12 advice) means a deployment with one
  *    long-lived serving query that cycles OTHER corpora still frees
  *    each displaced pin as soon as its own holders stop, instead of
  *    retaining everything until the session goes fully quiet.
  *  - BATCH: release additionally waits for a moment with NO active job
  *    on the owning SparkContext (`statusTracker.getActiveJobIds`), so a
  *    displacement racing an in-flight batch action from another driver
  *    thread cannot pull blocks out from under it. The gate is
  *    conservative (any job defers, not just consumers of this pin) and
  *    carries the status tracker's listener-bus latency (~ms) as its one
  *    residual window — single-threaded drivers, every declared query
  *    here, displace only between their own actions and never see it.
  *
  * The list is drained on every cache access and on explicit
  * [[free]]/[[drain]] calls, so a long session cycling corpora cannot
  * stack corpus-sized block-manager entries. Stopped sessions never park
  * (their blocks died with the context), and drain drops their entries,
  * so the queue cannot retain dead session graphs past the next access.
  */
private[graft] object Pins {

  private val toFree = new java.util.concurrent.ConcurrentLinkedQueue[
    (SparkSession, Set[java.util.UUID], org.apache.spark.rdd.RDD[_])]

  private def checkpointRdds(df: DataFrame): Seq[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }

  /** Park a displaced pin for deferred release, then [[drain]]. The
    * holder set is the streaming queries active NOW — the release is
    * scoped to them, not to the session going idle. */
  def park(s: SparkSession, df: DataFrame): Unit = {
    if (!s.sparkContext.isStopped) {
      val holders = s.streams.active.map(_.id).toSet
      checkpointRdds(df).foreach(r => toFree.add((s, holders, r)))
    }
    drain()
  }

  /** Release a pin whose consumers are KNOWN finished (e.g. a batch
    * job's internal stage pins after its write action completed). */
  def free(df: DataFrame): Unit =
    checkpointRdds(df).foreach(_.unpersist(false))

  /** Release every parked pin whose session is stopped, or whose
    * park-time streaming holders have all stopped AND whose context has
    * no job in flight (the batch half of the displacement invariant). */
  def drain(): Unit = {
    val it = toFree.iterator()
    while (it.hasNext) {
      val (s, holders, rdd) = it.next()
      val stopped = s.sparkContext.isStopped
      if (stopped) it.remove()
      else {
        val live = s.streams.active.map(_.id).toSet
        val streamingDone = holders.forall(id => !live.contains(id))
        val batchQuiet = s.sparkContext.statusTracker.getActiveJobIds().isEmpty
        if (streamingDone && batchQuiet) {
          rdd.unpersist(false)
          it.remove()
        }
      }
    }
  }

  /** Test hook: number of parked (not yet released) pins. */
  private[graft] def parkedCount: Int = toFree.size()
}
