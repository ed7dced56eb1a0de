// Scratch profiler (tools/): where does each streaming rig's second
// actually go? Runs the named rigs once (noop sink, same methodology as
// Bench) and prints the per-micro-batch duration breakdown that
// StreamingIndex records (queryPlanning / addBatch / walCommit /
// commitOffsets / getBatch / latestOffset), summed across batches, plus
// the rig's total elapsed — so plan-time, state-commit and data work can
// be attributed separately per rig before optimizing any of them
// (optimization guide §1: measure first).
package graft.tools

import org.apache.spark.sql.SparkSession

object ProfileRigs {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val keys: Seq[String] =
      if (args.nonEmpty) args(0).split(",").toSeq
      else Seq("s_substring_gate", "s_substring_gate_upd", "s_substring_gate_upd2",
        "s_corpus_ingest", "s_index_swap", "s_swap_inflight",
        "s_neardup_gate", "s_ivfpq_serve", "s_ann_serve", "s_filtered_serve",
        "s_lm_drift", "s_arrival_dedup", "s_domain_stats")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt.max(1)
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sys.env.get("SPARK_GRAFT_CONF").foreach { raw =>
      raw.split(if (raw.contains(";")) ";" else ",").foreach { kv =>
        val i = kv.indexOf('=')
        if (i > 0) spark.conf.set(kv.take(i), kv.drop(i + 1))
      }
    }
    for (k <- keys; r <- 1 to reps) {
      val t0 = System.nanoTime()
      try {
        graft.SparkEntry.queries(k)(spark, d)
          .write.format("noop").mode("overwrite").save()
        val total = (System.nanoTime() - t0) / 1e9
        val ds = Option(graft.streaming.StreamingIndex.lastProgressDurations.get(k))
          .getOrElse(Seq.empty)
        val comps = ds.flatMap(_.keys).distinct.sorted
        val sums = comps.map(c => c -> ds.flatMap(_.get(c)).sum)
        val trig = sums.find(_._1 == "triggerExecution").map(_._2).getOrElse(0L)
        println(f"$k rep$r total=$total%.2fs servedBatches=${ds.size} trigSum=${trig}ms")
        println("  " + sums.map { case (c, v) => s"$c=${v}ms" }.mkString(" "))
        val ab = ds.flatMap(_.get("addBatch"))
        if (ab.nonEmpty) println("  addBatch per-batch ms: " + ab.mkString(","))
      } catch {
        case e: Throwable =>
          println(s"$k rep$r FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
