// Measurement harness (tools/, not part of the library surface): the
// binary-quantization rescore operating curve — recall vs shortlist
// depth R.
package graft.tools

import org.apache.spark.sql.SparkSession

/** Sweeps the BQ exact-rescore depth R ∈ {10, 25, 50, 100, 200}
  * through Similarity.bqRecallAt on the shared seed-disjoint panel and
  * prints recall@10 + eval wall-time per setting. R is the knob a
  * deployed BQ tier turns: the Hamming scan always reads the full
  * 16 B/vector code table, so R prices ONLY the float reads per query
  * (R of them) against recall. Because hits ≡ |shortlist ∩ true
  * top-10| exactly, the curve is the Hamming shortlist-quality
  * function — it climbs while the 64-bit codes still separate true
  * neighbors from the noise floor and saturates once the remaining
  * misses are vectors the 1-bit geometry cannot rank into the top R.
  * Recorded in PLANS.md; the declared q_bq_recall stays at R=50. */
object BqSweep {
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

    println("| R | recall@10 | n_hit/n_exact | eval sec |")
    println("|---|---|---|---|")
    for (r <- Seq(10, 25, 50, 100, 200)) {
      // min of 2 reps, like Bench: one sample is hostage to a GC pause
      val (row, sec) = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val x = graft.operators.Similarity.bqRecallAt(spark, sfDir, r)
          .collect().head
        (x, (System.nanoTime() - t0) / 1e9)
      }.minBy(_._2)
      println(f"| $r | ${row.getDouble(6)}%.4f | ${row.getLong(5)}/${row.getLong(4)} | $sec%.2f |")
    }
    spark.stop()
  }
}
