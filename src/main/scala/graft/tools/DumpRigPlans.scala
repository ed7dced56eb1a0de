// Scratch tool (tools/): dump the EXECUTED micro-batch plan of named
// streaming rigs to files (plans/r16 evidence). A streaming DataFrame
// cannot be .explain'ed standalone — the plan that matters is the one
// the last micro-batch actually ran (StreamingIndex.lastExec), which is
// where the per-trigger join/broadcast/probe shape shows.
package graft.tools

import org.apache.spark.sql.SparkSession

object DumpRigPlans {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val outDir = args.headOption.getOrElse("/tmp/rig_plans")
    val keys: Seq[String] =
      if (args.length > 1) args(1).split(",").toSeq
      else Seq("s_substring_gate", "s_neardup_gate", "s_corpus_ingest")
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    keys.foreach { k =>
      try {
        graft.SparkEntry.queries(k)(spark, d)
          .write.format("noop").mode("overwrite").save()
        val plan = Option(graft.streaming.StreamingIndex.lastExec.get(k))
          .map(_.toString).getOrElse("(no executed plan recorded)")
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/$k.txt"),
          plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        println(s"[plans] wrote $outDir/$k.txt")
      } catch { case e: Throwable =>
        println(s"[plans] $k FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
