package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Corpus, Dedup, TextAnalysis}

/** Demo: the training-corpus preparation flow, end to end, as ONE
  * composition of the library's operators — the pipeline a data team
  * runs nightly over a raw 100 TB crawl, here on the synthetic
  * `documents` table.
  *
  * Stages (each individually oracle-verified as a declared query; this
  * main shows they COMPOSE — outputs feed inputs with no conversion):
  *
  *   1. exact dedup        (Dedup.exact → survivors)
  *   2. near-dup clusters  (Dedup.minhashLshMd5 + connectedComponents
  *                          → one representative per cluster)
  *   3. quality gates      (TextAnalysis.qualityScore ≥ threshold)
  *   4. language ID        (TextAnalysis.langId — replaces the stored
  *                          lang label with the detected one)
  *   5. mixture weighting  (Corpus.mixWeights — per-source sampling)
  *   6. capped sampling    (Corpus.cappedSample-style md5 rank quota)
  *   7. sequence packing   (Corpus.seqPack — per-lang token bins)
  *
  * Every stage is a shuffle-bounded DataFrame transform: the corpus
  * shuffles once per keyed stage (hash, cluster label, lang) and the
  * small relations (weights, rates) broadcast. Nothing collects to the
  * driver; the same composition runs unchanged on a 1000-executor
  * cluster with the scale knobs (AQE, shuffle partitions) in the
  * session config.
  */
object CorpusPipeline {

  /** Survivor doc ids after exact + near-dup dedup: keep the minimum
    * doc_id per md5 group, then the minimum per near-dup cluster. */
  def dedupSurvivors(s: SparkSession, d: String): DataFrame = {
    val exactReps = Tables.documents(s, d)
      .groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val nearPairs = Dedup.minhashLshMd5(s, d)
      .select(col("doc_a"), col("doc_b"))
    val clusters = Dedup.connectedComponents(nearPairs)
    exactReps
      .join(clusters, exactReps("doc_id") === clusters("doc_id"), "left")
      .select(exactReps("doc_id"),
        coalesce(clusters("cluster_rep"), exactReps("doc_id")).as("rep"))
      .filter(col("doc_id") === col("rep"))
      .select(col("doc_id"))
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the packaged survivor ledger (near-dup clusters → one rep each);
    // dedupSurvivors below shows the same thing composed by hand from
    // the pair generator + connectedComponents
    val ledger = Dedup.neardupPurge(spark, dir)
    println("[corpus-pipeline] purge ledger (first 5):")
    ledger.filter(col("purged")).show(5, truncate = false)

    // sub-document pass: repeated 16-token blocks keep one owner
    val blockStats = Corpus.blockDedup(spark, dir)
      .agg(sum(col("n_blocks")).as("blocks"), sum(col("n_dropped")).as("dropped"))
    println("[corpus-pipeline] block dedup totals:")
    blockStats.show(truncate = false)

    // tokenizer stages: learned merges + vocab coverage per language
    println("[corpus-pipeline] first BPE merges:")
    Corpus.bpeMerges(spark, dir).show(truncate = false)
    println("[corpus-pipeline] vocab coverage:")
    Corpus.vocabCoverage(spark, dir).show(truncate = false)

    val survivors = dedupSurvivors(spark, dir)
    val quality = TextAnalysis.qualityScore(spark, dir)
      .select(col("doc_id"), col("quality"))
    val lang = TextAnalysis.langId(spark, dir)
      .select(col("doc_id"), col("lang_pred"))

    val kept = Tables.documents(spark, dir)
      .join(survivors, Seq("doc_id"))            // dedup gate
      .join(quality, Seq("doc_id"))
      .filter(col("quality") >= 0.5)             // quality gate
      .join(lang, Seq("doc_id"))                 // detected language

    val n = kept.count()
    println(s"[corpus-pipeline] survivors after dedup+quality: $n")

    val weights = Corpus.mixWeights(spark, dir)
    println("[corpus-pipeline] mixture weights:")
    weights.show(5, truncate = false)

    val packed = Corpus.seqPack(spark, dir)
    println("[corpus-pipeline] packing bins (first 5):")
    packed.show(5, truncate = false)

    spark.stop()
  }
}
