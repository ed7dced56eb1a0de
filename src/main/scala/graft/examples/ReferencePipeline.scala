package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.KafkaWire

/** Migration demo: the reference's EXACT workflow, end to end, through
  * this library — what a `dhoard/orders-kafka-streams` user runs after
  * switching.
  *
  * Input is the reference's wire format (UTF-8 JSON, dotted member
  * names, README.md:26-46) — here materialized as JSON-lines files
  * standing in for the `order` topic; on a cluster the two `.format`
  * calls flip to the Kafka source/sink wrappers and the same plan runs
  * as a streaming query (KafkaWire.source / sinkOptions).
  *
  * Stages mirror Main.java:131-207 one-to-one:
  *   parse (O3+C2) → re-key (O6) → pair per order (O7) → facility
  *   re-type (O13) → 1-minute tumbling rollup (O15) → window-end
  *   timestamp (O18) → wire JSON out (O4).
  */
object ReferencePipeline {

  /** The whole topology as one declarative plan over parsed events. */
  def pipeline(parsed: DataFrame): DataFrame =
    parsed
      .groupBy(col("order_id")) // O6's re-key is the grouping key here
      .agg(
        min(when(col("event_type") === "order.placed", col("event_timestamp")))
          .as("placed_ms"),
        min(when(col("event_type") === "order.fulfilled", col("event_timestamp")))
          .as("fulfilled_ms"),
        first(col("facility_id"), ignoreNulls = true).as("facility_id"))
      .filter(col("placed_ms").isNotNull && col("fulfilled_ms").isNotNull)
      .withColumn("processing_ms", col("fulfilled_ms") - col("placed_ms"))
      .groupBy(window(timestamp_millis(col("fulfilled_ms")), "60 seconds"),
        col("facility_id"))
      .agg(count(lit(1)).as("processing_count"),
        sum(col("processing_ms")).as("processing_ms"))
      .select(
        to_json(struct(
          lit("facility.info").as("event.type"),
          col("facility_id").as("facility.id"),
          col("processing_count").as("processing.count"),
          col("processing_ms").as("processing.ms"),
          unix_millis(col("window.end")).as("event.timestamp"))).as("value"))

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Materialize the reference's input topic: order.placed/fulfilled
    // wire records derived from the events table (+ one garbage line to
    // show C2 log-and-continue).
    val dir = java.nio.file.Files.createTempDirectory("graft_wire").toString
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("event_type").isin("signup", "purchase"))
      .select(to_json(struct(
        when(col("event_type") === "signup", "order.placed")
          .otherwise("order.fulfilled").as("event.type"),
        unix_millis(col("ts")).as("event.timestamp"),
        concat(lit("facility-"), col("user_id") % 10).as("facility.id"),
        col("user_id").cast("string").as("order.id"))).as("value"))
    ev.union(spark.sql("SELECT 'not json at all' AS value"))
      .write.mode("overwrite").text(dir)

    // topic-shaped input: (key, value) binary — same shape the Kafka
    // source yields; parse with the engine's wire layer
    val topicShaped = spark.read.text(dir)
      .select(lit(null).cast("binary").as("key"),
        col("value").cast("binary").as("value"))
    // O5 (peek) parity: the reference logs every record pass-through
    // (Main.java:138,140,...); the Spark idiom is an Observation — the
    // metrics ride the job instead of a per-record side effect.
    val obs = new org.apache.spark.sql.Observation("parsed")
    val parsed = KafkaWire.parse(topicShaped).observe(obs,
      count(lit(1)).as("records"),
      count(when(col("event_type") === "order.placed", 1)).as("placed"))
    val out = pipeline(parsed)

    val rows = out.collect()
    println(s"[reference-pipeline] parsed=${obs.get("records")} " +
      s"placed=${obs.get("placed")} (peek ≙ observe)")
    println(s"[reference-pipeline] emitted ${rows.length} facility.info windows, e.g.:")
    rows.take(3).foreach(r => println("  " + r.getString(0)))
    spark.stop()
  }
}
