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
  * this object ENFORCES it for both consumer kinds, scoping the release
  * to the consumers ACTIVE AT PARK TIME — the only ones whose compiled
  * plans can reference the old blocks (anything started later builds
  * from the cache, which already holds the replacement):
  *
  *  - STREAMING: a displaced pin parks with the id set of the streaming
  *    queries active at park time and is released once every one of
  *    THOSE queries has stopped (round-12 advice: a deployment with one
  *    long-lived serving query that cycles OTHER corpora still frees
  *    each displaced pin as soon as its own holders stop).
  *  - BATCH: the pin also parks with the ACTIVE JOB IDS at park time
  *    (`statusTracker.getActiveJobIds`) and waits for those jobs — and
  *    only those — to finish. The round-13 form instead waited for a
  *    moment with NO job on the context, which under constant job churn
  *    (a busy multi-tenant driver) could defer a parked pin
  *    indefinitely and grow the queue without bound; scoping to
  *    park-time jobs makes every pin's release a finite wait (its
  *    holders each terminate) regardless of later traffic — the churn
  *    spec pins this. The status tracker's listener-bus latency (~ms)
  *    remains the one residual window on the BATCH side: a job
  *    submitted-but-not-yet-listed at park is not captured.
  *    Single-threaded drivers, every declared query here, displace only
  *    between their own actions and never see it.
  *
  * The list is drained on every cache access and on explicit
  * [[free]]/[[drain]] calls, so a long session cycling corpora cannot
  * stack corpus-sized block-manager entries. Stopped sessions never park
  * (their blocks died with the context), and drain drops their entries,
  * so the queue cannot retain dead session graphs past the next access.
  */
private[graft] object Pins {

  private val toFree = new java.util.concurrent.ConcurrentLinkedQueue[
    (SparkSession, Set[java.util.UUID], Set[Int], org.apache.spark.rdd.RDD[_])]

  private def checkpointRdds(df: DataFrame): Seq[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }

  /** Park a displaced pin for deferred release, then [[drain]]. The
    * holder sets are the streaming queries and batch jobs active NOW —
    * the release is scoped to them, not to the session going idle. */
  def park(s: SparkSession, df: DataFrame): Unit = {
    if (!s.sparkContext.isStopped) {
      val holders = s.streams.active.map(_.id).toSet
      val jobs = s.sparkContext.statusTracker.getActiveJobIds().toSet
      checkpointRdds(df).foreach(r => toFree.add((s, holders, jobs, r)))
    }
    drain()
  }

  /** Release a pin whose consumers are KNOWN finished (e.g. a batch
    * job's internal stage pins after its write action completed). */
  def free(df: DataFrame): Unit =
    checkpointRdds(df).foreach(_.unpersist(false))

  /** Release every parked pin whose session is stopped, or whose
    * park-time streaming holders have all stopped AND whose park-time
    * batch jobs have all finished (jobs started AFTER the park never
    * defer it — their plans were built from the replacement pin). */
  def drain(): Unit = {
    val it = toFree.iterator()
    while (it.hasNext) {
      val (s, holders, jobs, rdd) = it.next()
      val stopped = s.sparkContext.isStopped
      if (stopped) it.remove()
      else {
        val live = s.streams.active.map(_.id).toSet
        val streamingDone = holders.forall(id => !live.contains(id))
        val liveJobs = s.sparkContext.statusTracker.getActiveJobIds().toSet
        val batchDone = (jobs & liveJobs).isEmpty
        if (streamingDone && batchDone) {
          rdd.unpersist(false)
          it.remove()
        }
      }
    }
  }

  /** Test hook: number of parked (not yet released) pins. */
  private[graft] def parkedCount: Int = toFree.size()
}
