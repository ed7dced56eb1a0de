package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Det._

/** O5 — the reference's `peek` (Main.java:138,140,148,152,156,164,168:
  * log every record flowing past a stage). A per-record driver-side
  * callback is an anti-pattern on a distributed engine (it either
  * serializes the stream through one process or hides a side effect in an
  * executor closure); the Spark idiom is an [[org.apache.spark.sql.Observation]]:
  * named aggregate metrics ride the SAME job as the query — zero extra
  * passes, zero shuffles, collected on the driver when the action
  * finishes. At 100 TB a peek-as-log is physically impossible;
  * peek-as-metrics is free.
  */
object Observe {

  private val nameCounter = new java.util.concurrent.atomic.AtomicInteger

  /** q_observe_metrics — runs a pass-through scan of `events` with an
    * Observation attached and RETURNS THE OBSERVED METRICS as the query
    * result, so the driver's oracle hash-checks the numbers that came out
    * of the observe channel itself (records seen, per-type counts, value
    * mass — the reference's peek counters). */
  def observeMetrics(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val obs = new org.apache.spark.sql.Observation(
      s"graft_peek_${nameCounter.incrementAndGet()}")
    Tables.events(s, d)
      .observe(obs,
        count(lit(1)).as("records"),
        count(when(col("event_type") === "signup", 1)).as("n_signup"),
        count(when(col("event_type") === "purchase", 1)).as("n_purchase"),
        dsum(col("value")).as("sum_value"))
      .write.format("noop").mode("overwrite").save()
    val m = obs.get
    Seq((m("records").asInstanceOf[Long], m("n_signup").asInstanceOf[Long],
      m("n_purchase").asInstanceOf[Long], m("sum_value").asInstanceOf[Double]))
      .toDF("records", "n_signup", "n_purchase", "sum_value")
  }
}
