// Scratch profiler (tools/): per-micro-batch duration breakdown of the
// PQ streaming rigs — separates query planning from data work to show
// where the staggered feed's per-batch cost actually goes.
package graft.tools

import org.apache.spark.sql.SparkSession

object ProfileServe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (codegen <- Seq("true", "false"); q <- Seq("s_pq_ingest", "s_ivfpq_serve")) {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, d)
        .write.format("noop").mode("overwrite").save()
      println(f"$q codegen=$codegen total ${(System.nanoTime() - t0) / 1e9}%.1f s")
      graft.streaming.StreamingIndex.lastProgressDurations.get(q) match {
        case null => println("  (no duration records)")
        case ds =>
          val ab = ds.flatMap(_.get("addBatch"))
          println(s"  addBatch ms: ${ab.mkString(",")}")
      }
    }
    spark.stop()
  }
}
