package graft

import org.apache.spark.sql.functions._

import graft.examples.ReferencePipeline
import graft.streaming.KafkaWire

/** The migration demo, spec-covered end to end: the reference's wire
  * format (UTF-8 JSON, dotted member names) in, `facility.info` wire
  * JSON out — the artifact a `dhoard/orders-kafka-streams` user judges
  * the switch by. Previously exercised only by the runnable main. */
class ReferencePipelineSpec extends SparkSpec {
  import spark.implicits._

  test("wire JSON in → pipeline → facility.info wire JSON out; garbage and half-pairs tolerated") {
    val wire = Seq(
      // order A: placed at 60 s, fulfilled at 65 s → processing 5000 ms,
      // landing in the [60s, 120s) tumbling window
      """{"event.type":"order.placed","event.timestamp":60000,"facility.id":"f1","order.id":"A"}""",
      """{"event.type":"order.fulfilled","event.timestamp":65000,"facility.id":"f1","order.id":"A"}""",
      // order B: never fulfilled → an open half-pair, emits nothing
      """{"event.type":"order.placed","event.timestamp":61000,"facility.id":"f2","order.id":"B"}""",
      // C2: a garbage record drops, the pipeline keeps running
      "not json at all")
    val topicShaped = wire.toDF("v")
      .select(lit(null).cast("binary").as("key"),
        col("v").cast("binary").as("value"))
    val parsed = KafkaWire.parse(topicShaped)
    // the garbage line is already gone at the parse layer
    assert(parsed.count() == 3)
    val out = ReferencePipeline.pipeline(parsed).collect().map(_.getString(0))
    assert(out.length == 1, out.toSeq)
    val json = out.head
    // the wire contract, field by field: dotted member names, the
    // derived metric, the count, and O18's window-END event timestamp
    assert(json.contains("\"event.type\":\"facility.info\""), json)
    assert(json.contains("\"facility.id\":\"f1\""), json)
    assert(json.contains("\"processing.count\":1"), json)
    assert(json.contains("\"processing.ms\":5000"), json)
    assert(json.contains("\"event.timestamp\":120000"), json)
  }

  test("duplicate events: first placed/fulfilled stamp wins and a pair emits once") {
    // the reference's JsonObject.add overwrite quirk (OrderProcessor
    // .java:114-118) is last-wins per record hop; the batch analog
    // pins FIRST-stamp-wins via min() — dedupe-first, documented in
    // SURVEY §7.3 trap 5. Either way the pair must emit exactly once.
    val wire = Seq(
      """{"event.type":"order.placed","event.timestamp":60000,"facility.id":"f1","order.id":"A"}""",
      """{"event.type":"order.placed","event.timestamp":62000,"facility.id":"f1","order.id":"A"}""",
      """{"event.type":"order.fulfilled","event.timestamp":65000,"facility.id":"f1","order.id":"A"}""")
    val topicShaped = wire.toDF("v")
      .select(lit(null).cast("binary").as("key"),
        col("v").cast("binary").as("value"))
    val out = ReferencePipeline.pipeline(KafkaWire.parse(topicShaped))
      .collect().map(_.getString(0))
    assert(out.length == 1, out.toSeq)
    assert(out.head.contains("\"processing.ms\":5000"), out.head) // min placed = 60000
  }
}
