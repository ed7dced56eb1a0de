// Scratch tool (tools/): dump the EXECUTED plan of corpusBuild's
// corpus.parquet product write (plans/r16 evidence). The build's heavy
// stages run as write side effects inside corpusBuild — the declared
// row's .explain only shows the loaded-store summary — so the write
// plan is captured via a QueryExecutionListener, the same observable
// the CorpusSpec plan guard asserts on.
package graft.tools

import org.apache.spark.sql.SparkSession

object DumpBuildPlan {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val out = args.headOption.getOrElse("/tmp/q_corpus_build_product_write.txt")
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val captured = new java.util.concurrent.ConcurrentLinkedQueue[String]
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = captured.add(qe.executedPlan.toString)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    })
    graft.SparkEntry.queries("q_corpus_build")(spark, d)
      .write.format("noop").mode("overwrite").save()
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    def plan(): Option[String] = {
      import scala.jdk.CollectionConverters._
      captured.asScala.find(p => p.contains("corpus.parquet") && p.contains("text"))
    }
    var p = plan()
    while (p.isEmpty && System.nanoTime() < deadline) { Thread.sleep(100); p = plan() }
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      p.getOrElse("NOT CAPTURED").getBytes("UTF-8"))
    println(s"wrote $out (${p.map(_.length).getOrElse(0)} chars)")
    spark.stop()
  }
}
