// Scratch profiler (tools/, not part of the library surface): runs the
// named SparkEntry queries N times at a given sf dir and prints per-run
// and min seconds — min isolates real plan cost from host noise.
package graft.tools

import org.apache.spark.sql.SparkSession

object ProfileQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q_dedup_ngram", "q_dedup_embedding", "q_dedup_minhash",
        "q_salted_join", "s_pipeline", "s_tumbling_agg")
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    // A/B experiments: pass extra spark confs as K=V in env
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(';').foreach { kv =>
      val Array(k, v) = kv.split("=", 2); builder.config(k, v)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warmup
    graft.SparkEntry.queries("q_facility_info_by_minute")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    names.foreach { n =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$n%-24s min=${times.min}%.3f  runs=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
