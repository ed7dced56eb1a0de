// Scratch profiler (tools/): one corpusBuild invocation with a
// SparkListener recording every job's wall time + call site, so the
// 7-stage build's cost decomposes job by job (guide §1: measure first).
package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import scala.collection.concurrent.TrieMap

object ProfileBuild {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val name = if (args.length > 1) args(1) else "q_corpus_build"
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val starts = TrieMap.empty[Int, (Long, String)]
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties).flatMap(p =>
          Option(p.getProperty("spark.job.description"))
            .orElse(Option(p.getProperty("callSite.short")))).getOrElse("?")
        starts.put(js.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        starts.remove(je.jobId).foreach { case (t0, site) =>
          rows.add((je.jobId, (System.nanoTime() - t0) / 1e9, site))
        }
    })
    // warmup
    graft.SparkEntry.queries("q_facility_info_by_minute")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    (1 to reps).foreach { r =>
      rows.clear()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener drain
      import scala.jdk.CollectionConverters._
      val all = rows.asScala.toSeq.sortBy(_._1)
      println(f"== rep $r: $name total=$total%.2f s, jobs=${all.size} (sum ${all.map(_._2).sum}%.2f s)")
      all.foreach { case (id, sec, site) => println(f"  job $id%4d  $sec%7.3f s  $site") }
    }
    spark.stop()
  }
}
