// Measurement harness (tools/, not part of the library surface): the
// IVFPQ refine-stage operating curve — recall vs shortlist depth R.
package graft.tools

import org.apache.spark.sql.SparkSession

/** Sweeps the ADC shortlist depth R ∈ {10, 25, 50, 100, 200} through
  * ProductQuant.ivfPqRerankAt on the shared seed-disjoint panel and
  * prints recall@10 + eval wall-time per setting. R is the knob a
  * deployed IVFPQ refine stage turns: exact-distance cost is R
  * reads/query against the float (or subvector) store, and since
  * hits ≡ |shortlist ∩ true top-10| exactly, the curve IS the
  * shortlist-quality function — it saturates at the cell ceiling
  * (every true neighbor the probe read) and no R can pass that.
  * Recorded in PLANS.md; the declared q_ivfpq_rerank stays at R=50. */
object RerankSweep {
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

    // pay both one-time builds (and JVM warmup) outside the sweep
    val tb0 = System.nanoTime()
    graft.operators.Similarity.ivfIndex(spark, sfDir)
    graft.operators.ProductQuant.pqIndex(spark, sfDir)
    println(f"[rerank] index builds (IVF + PQ, once per corpus): ${(System.nanoTime() - tb0) / 1e9}%.2f s")

    println("| R | recall@10 | n_hit/n_exact | eval sec |")
    println("|---|---|---|---|")
    for (r <- Seq(10, 25, 50, 100, 200)) {
      val (row, sec) = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val out = graft.operators.ProductQuant.ivfPqRerankAt(spark, sfDir, r)
          .collect().head
        (out, (System.nanoTime() - t0) / 1e9)
      }.minBy(_._2)
      println(f"| $r | ${row.getDouble(4)}%.4f | ${row.getLong(3)}/${row.getLong(2)} | $sec%.2f |")
    }
    spark.stop()
  }
}
