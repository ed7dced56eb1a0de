// Scale-stress harness (tools/, not part of the library surface): bounds
// the dedup family's growth beyond the largest staged testdata.
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Replicates the sf0.1 corpus K× (default 10 ≈ "sf1") with DECORRELATED
  * copies, runs the dedup/similarity family on both scales in one JVM,
  * and prints per-row cost ratios — the signal that catches a
  * super-linear operator before it meets 100 TB.
  *
  * Decorrelation matters: naive replication would make every copy a
  * near-duplicate of its siblings, inflating the true pair count K²× and
  * measuring output explosion, not operator scaling. Instead:
  *  - documents: copy c suffixes every TOKEN with `~c` — all shingles
  *    differ across copies (no cross-copy candidates), while each copy
  *    preserves the original corpus's internal near-dup structure;
  *  - embeddings: copy c ROTATES the vector by c dimensions — cosine
  *    between rotated copies of typical vectors is near 0, while
  *    within-copy geometry (and thus true near-dup pairs) is preserved
  *    exactly (rotation is an isometry).
  * So the TRUE result set scales exactly K× and any super-linear runtime
  * is the operator's own doing.
  */
object StressDedup {
  private val Fam = Seq("q_dedup_exact", "q_dedup_ngram", "q_dedup_minhash",
    "q_dedup_minhash_md5", "q_dedup_simhash", "q_dedup_simhash_md5",
    "q_dedup_cluster", "q_dedup_embedding", "q_similarity_knn",
    "q_similarity_lsh", "q_similarity_ivf",
    // corpus-analysis family (round-3 additions): the gram-explode ops
    // are the ones with super-linear potential (vocab² LM join,
    // shingle join vs the bench split)
    "q_repetition_stats", "q_contamination", "q_doc_perplexity",
    "q_inverted_index", "q_bigram_lm", "q_seq_pack", "q_vec_quantize",
    // round-4 additions. q_knn_join is deliberately ABSENT: it is the
    // declared-quadratic exact baseline (per-LSH/IVF-bucket rerank
    // shape) and its per-row cost grows ~K by design — the banded
    // variants own the full-corpus regime.
    "q_ccnet_bucket", "q_mix_weights", "q_heavy_hitters",
    "q_upsert_merge", "q_incremental_agg",
    // round-4 session 2. q_nullsafe_join is ABSENT by design: its
    // 7-value bucket key makes pair counts quadratic by construction —
    // it is a semantics demo, not a scale operator. q_tpch_q5 needs the
    // dim tables the harness doesn't replicate (dims broadcast; the
    // fact side's scaling is covered by the other join queries).
    "q_interpolate", "q_media_histdup", "q_pmi_phrases",
    "q_capped_sample", "q_anomaly_zscore", "q_pagerank",
    // round-4 session 3: block dedup shuffles on block text (copies
    // share no blocks — suffixed tokens); semdedup's cells multiply K×
    // (1e8 ≡ 0 mod 50 keeps every copy's centroid stride) with per-cell
    // size constant; the purge ledger adds one linear join+agg over CC.
    "q_block_dedup", "q_semdedup", "q_neardup_purge",
    // round-4 session 4: bpe's vocab relation grows ~K× (suffixed
    // tokens are new words sharing the same characters); coverage and
    // the band-join probe are single-pass linear.
    "q_bpe_merges", "q_vocab_coverage", "q_range_join_custom",
    "q_quality_logit")

  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 10
    val base = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val out = s"/tmp/graft_stress_x$k"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val copies = spark.range(k).select(col("id").cast("int").as("copy"))

    val docs = spark.read.parquet(s"$base/documents.parquet")
    docs.crossJoin(copies)
      .select(
        (col("doc_id") + col("copy").cast("long") * 100000000L).as("doc_id"),
        when(col("copy") === 0, col("text"))
          .otherwise(array_join(
            transform(split(col("text"), " "),
              t => concat(t, lit("~"), col("copy"))), " ")).as("text"),
        col("lang"), col("source"), col("n_chars"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$base/embeddings.parquet")
    emb.crossJoin(copies)
      .select(
        (col("vec_id") + col("copy").cast("long") * 100000000L).as("vec_id"),
        when(col("copy") === 0, col("embedding"))
          .otherwise(concat(
            slice(col("embedding"), col("copy") + 1, size(col("embedding")) - col("copy")),
            slice(col("embedding"), lit(1), col("copy")))).as("embedding"),
        col("label"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    // orders/events: offset the keys so copies stay disjoint. The orders
    // offset is 1e10, clear of q_upsert_merge's 1e8 insert range; the
    // user_id offset decorrelates any per-user grouping across copies.
    val orders = spark.read.parquet(s"$base/orders.parquet")
    orders.crossJoin(copies)
      .withColumn("o_orderkey",
        col("o_orderkey") + col("copy").cast("long") * 10000000000L)
      // custkey offset decorrelates the pagerank graph across copies
      .withColumn("o_custkey",
        col("o_custkey") + col("copy").cast("long") * 1000000L)
      .drop("copy")
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/orders.parquet")

    // lineitem: keys follow orders' offsets; suppkey offset keeps the
    // bipartite customer↔supplier graph disjoint per copy
    val lineitem = spark.read.parquet(s"$base/lineitem.parquet")
    lineitem.crossJoin(copies)
      .withColumn("l_orderkey",
        col("l_orderkey") + col("copy").cast("long") * 10000000000L)
      .withColumn("l_suppkey",
        col("l_suppkey") + col("copy").cast("long") * 1000000L)
      .drop("copy")
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")

    // events.ts is TIMESTAMP(NANOS): read as long (legacy conf), the
    // replica is then written with a plain long ts — Tables.events
    // handles both encodings.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = spark.read.parquet(s"$base/events.parquet")
    events.crossJoin(copies)
      .withColumn("event_id",
        col("event_id") + col("copy").cast("long") * 1000000000L)
      .withColumn("user_id",
        col("user_id") + col("copy").cast("long") * 10000000L)
      .drop("copy")
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/events.parquet")

    val nBase = spark.read.parquet(s"$base/documents.parquet").count().toDouble

    def time(name: String, dir: String): Double =
      (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min

    // warmup both paths
    time("q_dedup_exact", base)

    val rows = Fam.map { q =>
      val tb = time(q, base)
      val ts = time(q, out)
      // per-row cost ratio: >1 = super-linear in corpus size
      val ratio = (ts / (nBase * k)) / (tb / nBase)
      println(f"[stress] $q%-22s base=$tb%6.2fs  x$k=$ts%7.2fs  perRowRatio=$ratio%5.2f")
      q -> (tb, ts, ratio)
    }
    val json = rows.map { case (q, (tb, ts, r)) =>
      s""""$q":{"base_sec":$tb,"x${k}_sec":$ts,"per_row_ratio":$r}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"stress_x$k","k":$k,"base":"$base","queries":$json}""")
    spark.stop()
  }
}
