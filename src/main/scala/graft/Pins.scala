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
  * this object ENFORCES its STREAMING half: a displaced pin parks in a
  * to-free list and its blocks are released only once the owning session
  * has no active streaming query — the holders that outlive a
  * displacement in every rig this repo runs. The BATCH half stays a
  * caller contract, exactly as it was under the eager-unpersist scheme
  * this replaces: a batch action over a pin racing a displacement from
  * ANOTHER driver thread could still lose its blocks (single-threaded
  * drivers — every declared query here — displace only between their own
  * actions). The list is drained on every cache access and on explicit
  * [[free]]/[[drain]] calls, so a long session cycling corpora cannot
  * stack corpus-sized block-manager entries — they go at the next access
  * after the last streaming query stops. Stopped sessions never park
  * (their blocks died with the context), and drain drops their entries,
  * so the queue cannot retain dead session graphs past the next access.
  */
private[graft] object Pins {

  private val toFree = new java.util.concurrent.ConcurrentLinkedQueue[
    (SparkSession, org.apache.spark.rdd.RDD[_])]

  private def checkpointRdds(df: DataFrame): Seq[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }

  /** Park a displaced pin for deferred release, then [[drain]]. */
  def park(s: SparkSession, df: DataFrame): Unit = {
    if (!s.sparkContext.isStopped)
      checkpointRdds(df).foreach(r => toFree.add((s, r)))
    drain()
  }

  /** Release a pin whose consumers are KNOWN finished (e.g. a batch
    * job's internal stage pins after its write action completed). */
  def free(df: DataFrame): Unit =
    checkpointRdds(df).foreach(_.unpersist(false))

  /** Release every parked pin whose session is stopped or has no active
    * streaming query left to be holding it. */
  def drain(): Unit = {
    val it = toFree.iterator()
    while (it.hasNext) {
      val (s, rdd) = it.next()
      val stopped = s.sparkContext.isStopped
      if (stopped || s.streams.active.isEmpty) {
        if (!stopped) rdd.unpersist(false)
        it.remove()
      }
    }
  }

  /** Test hook: number of parked (not yet released) pins. */
  private[graft] def parkedCount: Int = toFree.size()
}
