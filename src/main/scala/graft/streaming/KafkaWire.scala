package graft.streaming

import org.apache.spark.internal.Logging
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.types._

/** The reference's wire layer (O1-O4): Kafka topics carrying UTF-8 JSON
  * values with dotted member names (README.md:26-61,
  * JsonObjectSerializer.java:37-59, JsonObjectDeserializer.java:39-48)
  * — re-expressed as `from_json`/`to_json` plan builders. No custom
  * serde code: the JSON codec is a codegen'd expression inside the scan
  * projection.
  *
  * The Kafka connector jar isn't present in this container, so
  * [[source]]/[[sink]] build the plans for a cluster run while
  * [[parse]]/[[emit]] (pure column logic) are exercised in tests and
  * through the MemoryStream-backed queries.
  */
object KafkaWire {

  /** Wire schema of `order.placed`/`order.fulfilled` (README.md:28-46).
    * Dotted names are literal JSON member names, not nesting. */
  val orderEventSchema: StructType = StructType(Seq(
    StructField("event.type", StringType),
    StructField("event.timestamp", LongType),
    StructField("facility.id", StringType),
    StructField("order.id", StringType)))

  /** O3 + C2: bytes → typed columns. PERMISSIVE `from_json` yields null
    * on garbage, and the null filter reproduces the reference's
    * log-and-continue deserialization handler (Main.java:88) — bad
    * payloads drop, the query keeps running. Output is snake_case. */
  def parse(kafkaShaped: DataFrame): DataFrame =
    kafkaShaped
      .select(
        col("key").cast("string").as("key"),
        from_json(col("value").cast("string"), orderEventSchema).as("p"))
      // PERMISSIVE from_json yields an all-null struct (not a null
      // struct) on garbage — test the required field, not the struct.
      .filter(col("p").getField("event.type").isNotNull)
      .select(
        col("key"),
        col("p").getField("event.type").as("event_type"),
        col("p").getField("event.timestamp").as("event_timestamp"),
        col("p").getField("facility.id").as("facility_id"),
        col("p").getField("order.id").as("order_id"))

  /** O4: typed columns → the exact wire JSON (dotted member names),
    * keyed by order.id (≙ the re-key at Main.java:139). */
  def emit(events: DataFrame): DataFrame =
    events.select(
      col("order_id").as("key"),
      to_json(struct(
        col("event_type").as("event.type"),
        col("event_timestamp").as("event.timestamp"),
        col("facility_id").as("facility.id"),
        col("order_id").as("order.id"))).as("value"))

  /** O1: streaming source plan for a cluster with the Kafka connector on
    * the classpath (`spark-sql-kafka-0-10`). */
  def source(s: SparkSession, servers: String, topic: String): DataFrame =
    parse(
      s.readStream.format("kafka")
        .option("kafka.bootstrap.servers", servers)
        .option("subscribe", topic)
        .load())

  /** O2: sink options for `df.writeStream.format("kafka")`; the caller
    * supplies checkpointLocation (C5). */
  def sinkOptions(servers: String, topic: String): Map[String, String] =
    Map("kafka.bootstrap.servers" -> servers, "topic" -> topic)

  /** C5/C7 parity: progress + lifecycle logging (the reference logs a
    * restore listener and `topology.describe()`, Main.java:91,96-126). */
  final class LoggingListener extends StreamingQueryListener with Logging {
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
      logInfo(s"streaming query started: ${e.name} (${e.id})")
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
      logInfo(s"progress: ${e.progress.name} batch=${e.progress.batchId} " +
        s"rows/s=${e.progress.processedRowsPerSecond}")
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
      logInfo(s"streaming query terminated: ${e.id}" +
        e.exception.map(x => s" exception=$x").getOrElse(""))
  }
}
