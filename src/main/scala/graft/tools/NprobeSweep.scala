// Measurement harness (tools/, not part of the library surface): the
// IVF operating curve — recall vs probe cost as nprobe widens.
package graft.tools

import org.apache.spark.sql.SparkSession

/** Sweeps nprobe ∈ {1, 2, 4, 8} over the shared seed-disjoint recall
  * panel (Similarity.annRecallAt) and prints recall@10 + eval wall-time
  * per setting, plus the one-time index-build cost. nprobe is the
  * primary operating knob of a deployed IVF index — it trades probe
  * cost (nprobe/nlist of the corpus read per query) against recall —
  * and this harness produces the curve a deployment reads before
  * picking its setting (recorded in PLANS.md). The declared
  * q_similarity_ivf / q_ann_recall stay pinned at nprobe=2. */
object NprobeSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // pay the one-time build (and JVM/codegen warmup) outside the sweep
    val tb0 = System.nanoTime()
    graft.operators.Similarity.ivfIndex(spark, sfDir)
    val buildSec = (System.nanoTime() - tb0) / 1e9
    println(f"[nprobe] index build (train + assign, once per corpus): $buildSec%.2f s")

    println("| nprobe | recall@10 | n_hit/n_exact | eval sec |")
    println("|---|---|---|---|")
    for (np <- Seq(1, 2, 4, 8)) {
      // min of 2 reps, like Bench: one sample is hostage to a GC pause
      val (row, sec) = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val r = graft.operators.Similarity.annRecallAt(spark, sfDir, np)
          .collect().head
        (r, (System.nanoTime() - t0) / 1e9)
      }.minBy(_._2)
      println(f"| $np | ${row.getDouble(4)}%.4f | ${row.getLong(3)}/${row.getLong(2)} | $sec%.2f |")
    }
    spark.stop()
  }
}
