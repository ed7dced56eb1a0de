// Measurement harness (tools/, not part of the library surface): the
// filtered-search operating surface — recall vs (selectivity, nprobe).
package graft.tools

import org.apache.spark.sql.SparkSession

/** Sweeps the filtered-ANN eval (Similarity.annFilteredAt) over the
  * filter's selectivity (label-set size: ~10/20/40/80 % of the ~uniform
  * 10-class corpus) × nprobe ∈ {1, 2, 4, 8} and prints the recall
  * surface. This is THE decision table for filtered vector search: how
  * much probe widening a given filter selectivity demands to hold
  * recall (the standard deployment rule of thumb — "widen the probe by
  * ~1/selectivity" — read off measured numbers instead of folklore).
  * The declared q_ann_filtered stays pinned at ({3}, nprobe {2, 4});
  * results are recorded in PLANS.md. */
object FilteredSweep {
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
    graft.operators.Similarity.ivfIndex(spark, sfDir)

    val selectivities = Seq(
      Seq(3),                               // ~10 %
      Seq(1, 3),                            // ~20 %
      Seq(1, 3, 5, 7),                      // ~40 %
      Seq(0, 1, 2, 3, 4, 5, 6, 8))          // ~80 %
    println("| labels | ~sel | nprobe | recall@10 | n_hit/n_exact | eval sec |")
    println("|---|---|---|---|---|---|")
    for (ls <- selectivities; np <- Seq(1, 2, 4, 8)) {
      // min of 2 reps, like Bench: one sample is hostage to a GC pause
      val (row, sec) = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val r = graft.operators.Similarity
          .annFilteredAt(spark, sfDir, ls, Seq(np)).collect().head
        (r, (System.nanoTime() - t0) / 1e9)
      }.minBy(_._2)
      println(f"| ${ls.mkString(",")} | ${ls.size * 10}%% | $np " +
        f"| ${row.getDouble(5)}%.4f | ${row.getLong(4)}/${row.getLong(3)} | $sec%.2f |")
    }
    spark.stop()
  }
}
