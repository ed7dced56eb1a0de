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
  *    used to be a residual window on the BATCH side: a job
  *    submitted-but-not-yet-listed at park was never in the holder
  *    set, so its pinned blocks could be unpersisted under it
  *    (round-14 advice). Closed by the SETTLED-DRAIN rule: a parked
  *    pin may only release after one drain that runs at least
  *    [[SettleNanos]] after the park (the bus is caught up by then)
  *    has UNIONED the then-active job ids into the holder set — the
  *    racing job is live at that drain and gets captured, or has
  *    already finished and release is safe. The widened set is a fixed
  *    finite set of jobs, each of which terminates, so the finite-wait
  *    property is kept (a post-park job can defer a release by at most
  *    its own runtime).
  *
  * The list is drained on every cache access and on explicit
  * [[free]]/[[drain]] calls, so a long session cycling corpora cannot
  * stack corpus-sized block-manager entries. Stopped sessions never park
  * (their blocks died with the context), and drain drops their entries,
  * so the queue cannot retain dead session graphs past the next access.
  */
private[graft] object Pins {

  /** The listener-bus settle bound: a drain younger than this since the
    * park cannot widen or release — the statusTracker may not yet list
    * a job submitted just before the park. ~ms bus latency; 25 ms gives
    * a wide margin while staying invisible next to any real job. */
  private val SettleNanos = 25L * 1000 * 1000

  /** One parked pin. `jobs` is widened ONCE, at the first settled
    * drain, with the then-active job ids (see scaladoc above). */
  private final class Parked(
      val s: SparkSession,
      val holders: Set[java.util.UUID],
      @volatile var jobs: Set[Int],
      val rdd: org.apache.spark.rdd.RDD[_],
      val parkedAt: Long) {
    @volatile var widened = false
  }

  private val toFree = new java.util.concurrent.ConcurrentLinkedQueue[Parked]

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
      checkpointRdds(df).foreach(r =>
        toFree.add(new Parked(s, holders, jobs, r, System.nanoTime())))
    }
    drain()
  }

  /** Release a pin whose consumers are KNOWN finished (e.g. a batch
    * job's internal stage pins after its write action completed). */
  def free(df: DataFrame): Unit =
    checkpointRdds(df).foreach(_.unpersist(false))

  /** Release every parked pin whose session is stopped, or whose
    * park-time streaming holders have all stopped AND whose (widened)
    * batch-job holder set has fully finished. A pin must first be
    * WIDENED by a settled drain (≥ [[SettleNanos]] after park) that
    * unions the then-active job ids into the holder set — the
    * listener-bus closure; an unsettled drain leaves it parked. Jobs
    * started after the widening never defer a release — their plans
    * were built from the replacement pin. */
  def drain(): Unit = {
    val it = toFree.iterator()
    while (it.hasNext) {
      val p = it.next()
      val stopped = p.s.sparkContext.isStopped
      if (stopped) it.remove()
      else {
        val liveJobs = p.s.sparkContext.statusTracker.getActiveJobIds().toSet
        if (!p.widened &&
          System.nanoTime() - p.parkedAt >= SettleNanos) {
          p.jobs = p.jobs ++ liveJobs
          p.widened = true
        }
        if (p.widened) {
          val live = p.s.streams.active.map(_.id).toSet
          val streamingDone = p.holders.forall(id => !live.contains(id))
          val batchDone = (p.jobs & liveJobs).isEmpty
          if (streamingDone && batchDone) {
            p.rdd.unpersist(false)
            it.remove()
          }
        }
      }
    }
  }

  /** Test hook: number of parked (not yet released) pins. */
  private[graft] def parkedCount: Int = toFree.size()
}
