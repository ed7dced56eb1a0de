// Scratch profiler (tools/): what does a streaming rig's SCAFFOLDING
// cost, phase by phase? Times each step of a minimal MemoryStream rig —
// stream creation, writeStream.start(), the staggered feed, stop, and
// the final memory-table read — for a stateless map, a windowed
// aggregation (one state store), and the serve-top1 shape (stream-static
// join + windowed agg), so the rig_setup_sec block in bench_full.json
// can be attributed before optimizing it (optimization guide §1).
package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

object ProfileStartStop {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"    $label%-28s ${(System.nanoTime() - t0) / 1e6}%8.1f ms")
      r
    }

    def runRig(name: String, shape: DataFrame => DataFrame): Unit = {
      println(s"  rig $name")
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      try {
        val input = t("MemoryStream create") { MemoryStream[Long] }
        val df = shape(input.toDF())
        val qname = s"pss_${name}_${System.nanoTime()}"
        val q = t("writeStream.start") {
          df.writeStream.format("memory").queryName(qname)
            .outputMode("update").start()
        }
        t("first drain (no data)") { q.processAllAvailable() }
        val events = (1L to 100L).toSeq
        events.grouped(10).zipWithIndex.foreach { case (g, i) =>
          t(s"feed+drain batch $i") { input.addData(g); q.processAllAvailable() }
        }
        t("stop") { q.stop() }
        val prog = q.recentProgress
        println(s"    triggers total=${prog.length} data=${prog.count(_.numInputRows > 0)} " +
          s"nodata_ms=${prog.filter(_.numInputRows == 0).flatMap(p => Option(p.durationMs.get("triggerExecution")).map(_.toLong)).sum} " +
          s"data_ms=${prog.filter(_.numInputRows > 0).flatMap(p => Option(p.durationMs.get("triggerExecution")).map(_.toLong)).sum}")
        t("table read + noop") {
          spark.table(qname).write.format("noop").mode("overwrite").save()
        }
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }

    // run everything twice: rep 1 is codegen/classload warmup
    for (rep <- 1 to 2) {
      println(s"rep $rep")
      runRig("stateless", df => df.select((col("value") * 2).as("v")))
      runRig("windowed_agg", df => df
        .select(col("value"), timestamp_seconds(col("value") + 86400L).as("ts"))
        .withWatermark("ts", "1 minute")
        .groupBy(window(col("ts"), "1 minute"), (col("value") % 7).as("k"))
        .agg(sum(col("value")).as("s")))
      val corpus = spark.range(0, 10000)
        .select((col("id") % 50).as("cell"), col("id").as("vec_id"))
        .localCheckpoint()
      runRig("join_plus_agg", df => df
        .select(col("value"), (col("value") % 50).as("cell"),
          timestamp_seconds(col("value") + 86400L).as("ts"))
        .withWatermark("ts", "1 minute")
        .join(corpus, Seq("cell"))
        .groupBy(window(col("ts"), "1 minute"), col("value"))
        .agg(max(col("vec_id")).as("top")))
    }
    spark.stop()
  }
}
