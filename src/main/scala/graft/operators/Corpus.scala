package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Training-corpus preparation operators — the steps between "raw
  * documents land" and "tokens reach the trainer" that every large-scale
  * LLM data pipeline runs, expressed as single declarative plans:
  * context-window chunking, PII scrubbing, per-class embedding centroids
  * (mean pooling), and the staged quality/dedup funnel. All pure
  * map/agg shapes: no driver participation, codegen-friendly, shuffle
  * only where a groupBy genuinely re-keys.
  */
object Corpus {

  /** Chunk size / stride (tokens): 32-token windows every 24 tokens —
    * 8-token overlap, the standard sliding-context shape. */
  private val ChunkTokens = 32
  private val ChunkStride = 24

  /** q_doc_chunks — overlapping token-window chunking of every document:
    * one output row per (doc, window), with the reassembled chunk text
    * and its token count. Pure per-row explode (no shuffle at all until
    * the output sort): at 100 TB chunking is a map-side operation and
    * must stay one. */
  def docChunks(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .select(col("doc_id"), col("tk"),
        posexplode(sequence(lit(0), size(col("tk")) - 1, lit(ChunkStride)))
          .as(Seq("chunk_id", "start")))
      .select(col("doc_id"), col("chunk_id"),
        array_join(slice(col("tk"), col("start") + 1, lit(ChunkTokens)), " ")
          .as("chunk_text"),
        least(lit(ChunkTokens), size(col("tk")) - col("start"))
          .as("n_tokens"))
      .orderBy("doc_id", "chunk_id")

  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val NumRe = "[0-9]+"

  /** q_pii_scrub — masking pass over the event payloads: email-shaped
    * spans → `<EMAIL>`, digit runs → `<NUM>`, with per-row match counts.
    * Pure codegen'd map (regexp_replace / regexp_extract_all) — the
    * shape a 100 TB scrub must have; patterns are deliberately in the
    * RE2-compatible subset so the same scrub runs on any engine.
    * (Email masking never fires on this synthetic corpus — the behavior
    * is pinned by a crafted fixture in the spec, per the project's
    * boundary-semantics rule.) */
  def piiScrub(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(col("props").isNotNull)
      .select(col("event_id"),
        regexp_replace(regexp_replace(col("props"), EmailRe, "<EMAIL>"),
          NumRe, "<NUM>").as("scrubbed"),
        size(regexp_extract_all(col("props"), lit(EmailRe), lit(0)))
          .as("n_emails"),
        size(regexp_extract_all(col("props"), lit(NumRe), lit(0)))
          .as("n_nums"))
      .orderBy("event_id")

  /** q_vec_centroid — per-label mean embedding (mean pooling / class
    * prototypes): posexplode to (label, dim, x), one keyed aggregation.
    * The sum is exact fixed-point at 1e-6 granularity (components are
    * O(1) floats; long headroom ~1e12 rows/dim) so the centroid is
    * order-independent and engine-portable — the [[Det]] scheme at the
    * precision vectors actually carry. */
  def vecCentroid(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy(col("label"), col("dim"))
      .agg(
        (sum(floor(col("x").cast("double") * 1000000 + 0.5)).cast("double")
          / 1000000.0).as("centroid"),
        count(lit(1)).as("n"))
      .orderBy("label", "dim")

  /** q_stratified_sample — per-stratum deterministic sampling: the
    * dominant language is downsampled hard (1/16) while the long-tail
    * languages keep 1/4 — the class-rebalancing move every multilingual
    * corpus makes. Selection is an md5-prefix threshold on the doc id
    * (engine/run/cluster-size independent, like [[Analytics.hashSample]]);
    * rates are hex-digit prefixes so the predicate is a pure codegen'd
    * string compare. */
  def stratifiedSample(s: SparkSession, d: String): DataFrame = {
    val h = substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1)
    Tables.documents(s, d)
      .filter(when(col("lang") === "en", h === "0") // 1/16
        .otherwise(h.isin("0", "1", "2", "3"))) // 1/4
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sampled"), min(col("doc_id")).as("first_doc_id"))
      .orderBy("lang")
  }

  /** q_data_split — deterministic train/valid/test assignment: the md5
    * bucket of the doc id maps 14/16 → train, 1/16 → valid, 1/16 → test,
    * stable under re-runs, engine changes, and repartitioning (the
    * property rand()-based splits lack). Rolled up per (split, lang) so
    * leakage-free disjointness is oracle-checked in aggregate. */
  def dataSplit(s: SparkSession, d: String): DataFrame = {
    val h = substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1)
    Tables.documents(s, d)
      .withColumn("split",
        when(h === "e", "valid").when(h === "f", "test").otherwise("train"))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy("split", "lang")
  }

  /** q_corpus_funnel — the staged corpus-prep funnel as ONE scan:
    * total → length gate → token gate → exact-dedup survivors, each
    * stage a conditional aggregate over the previous stage's predicate.
    * At 100 TB this is the daily health metric of a data pipeline and
    * must cost one pass, not four. */
  def corpusFunnel(s: SparkSession, d: String): DataFrame = {
    val lenOk = col("n_chars") >= 100
    val tokOk = lenOk && size(split(col("text"), " ")) >= 20
    Tables.documents(s, d)
      .agg(
        count(lit(1)).as("n_total"),
        count(when(lenOk, 1)).as("n_minlen"),
        count(when(tokOk, 1)).as("n_tokenized"),
        countDistinct(when(tokOk, md5(col("text").cast("binary"))))
          .as("n_deduped"))
  }
}
