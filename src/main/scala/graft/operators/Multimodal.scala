package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * frame-sample operators.
  *
  * The container has no media codecs, so the decode step is a
  * clearly-marked deterministic STUB (see [[decodeStub]]) — the
  * Spark-side plumbing (schema, binary payloads, batch-wise
  * mapPartitions, frame slicing) is real and tested. In production the
  * stub body is replaced by the actual codec call; nothing else changes.
  */
object Multimodal {

  /** One media row: opaque payload + typed metadata. */
  case class Media(doc_id: Long, media_type: String, width: Long,
      height: Long, payload: Array[Byte])

  /** STUB output: deterministic fake features standing in for a decoded
    * image/audio feature vector. */
  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Int,
      mean_byte: Double, n_distinct_bytes: Int)

  /** The media table derived from `documents`: utf-8 payload bytes play
    * the raw media blob; width/height are deterministic synthetic
    * metadata. At scale this is exactly the layout for real media —
    * parquet binary column + metadata columns, partitioned by type. */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      when(col("source") === "src0", "image")
        .when(col("source") === "src1", "audio")
        .otherwise("video").as("media_type"),
      (col("doc_id") % 640 + 32).as("width"),
      (col("doc_id") % 480 + 32).as("height"),
      encode(col("text"), "utf-8").as("payload"))

  /** q_media_meta — metadata + payload-size scan: never touches payload
    * content, so Parquet reads only the projected columns. */
  def mediaMeta(s: SparkSession, d: String): DataFrame =
    mediaTable(s, d)
      .select(col("doc_id"), col("media_type"), length(col("payload")).as("n_bytes"),
        col("width"), col("height"))
      .orderBy("doc_id")

  /** q_media_frames — frame sampling: 4 fixed-stride 64-byte slices of
    * the payload, fingerprinted with md5. Byte-based substring on the
    * binary column — a per-row map, no shuffle. (Real video frame
    * extraction replaces the slice arithmetic; the plumbing is the same.) */
  def mediaFrames(s: SparkSession, d: String): DataFrame =
    mediaTable(s, d)
      .select(col("doc_id"), col("payload"),
        explode(sequence(lit(0), lit(3))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        md5(expr("substring(payload, frame_idx * 64 + 1, 64)")).as("frame_md5"))
      .orderBy("doc_id", "frame_idx")

  /** STUB: deterministic fake "decode + feature extract". A real
    * implementation decodes `m.payload` with an image/audio codec
    * (unavailable in this container) and emits model features; this
    * stand-in derives deterministic stats from the raw bytes so the
    * pipeline is testable end-to-end. */
  def decodeStub(m: Media): MediaFeatures = {
    val bytes = m.payload
    var sum = 0L
    val seen = new java.util.BitSet(256)
    var i = 0
    while (i < bytes.length) {
      sum += bytes(i) & 0xff
      seen.set(bytes(i) & 0xff)
      i += 1
    }
    MediaFeatures(m.doc_id, m.media_type, bytes.length,
      if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length,
      seen.cardinality())
  }

  /** q_media_features — batch decode via typed mapPartitions (the Scala
    * analog of Python's mapInPandas: one iterator per partition, so a
    * real codec would amortize init per-batch, not per-row). */
  def mediaFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media: Dataset[Media] = mediaTable(s, d).as[Media]
    media.mapPartitions(_.map(decodeStub))
      .toDF()
      .orderBy("doc_id")
  }

  /** q_media_histdup — payload-signature dedup without decoding: the
    * native [[graft.functions.ByteHistogram]] expression folds each
    * binary payload into an 8-bin byte histogram in one codegen'd pass
    * (no decode, no copy), the joined counts become the bucket key, and
    * buckets with ≥ 2 members are the candidate duplicate groups —
    * SimHash-style bucketing at the raw-byte level, the first-pass
    * filter a multimodal dedup pipeline runs before any expensive
    * perceptual hash. One keyed aggregation on the signature; at 100 TB
    * the signature is the shuffle key and candidate groups rerank with
    * a real content hash inside the bucket. */
  def mediaHistDup(s: SparkSession, d: String): DataFrame =
    mediaTable(s, d)
      .select(col("doc_id"),
        array_join(graft.functions.byte_histogram(col("payload"))
          .cast("array<string>"), ",").as("sig"))
      .groupBy(col("sig"))
      .agg(count(lit(1)).as("n_media"),
        min(col("doc_id")).as("first_doc_id"),
        array_join(slice(sort_array(collect_set(col("doc_id"))), 1, 8)
          .cast("array<string>"), ",").as("members"))
      .filter(col("n_media") >= 2)
      .orderBy("sig")

  /** q_media_dedup — exact payload dedup with STORAGE ACCOUNTING, per
    * media type: the first pass a media corpus runs before any decode
    * (raw-byte md5 over the binary column — content-addressable-store
    * semantics), rolled up to the numbers an operator budgets with:
    * distinct payloads, total media rows, duplicate groups, and the
    * bytes a dedup'd store saves (Σ (copies − 1) · size). Two keyed
    * aggregations — (type, md5) then type — both map-side combined;
    * the payload bytes are hashed once and never shuffled (only the
    * 16-byte digest travels). The beside-it [[mediaHistDup]] is the
    * NEAR-dup first pass; this is the exact tier of the same ladder. */
  def mediaDedup(s: SparkSession, d: String): DataFrame =
    mediaTable(s, d)
      .select(col("media_type"), col("doc_id"),
        md5(col("payload")).as("h"),
        length(col("payload")).cast("long").as("n_bytes"))
      .groupBy(col("media_type"), col("h"))
      .agg(count(lit(1)).as("n_copies"), max(col("n_bytes")).as("n_bytes"))
      .groupBy(col("media_type"))
      .agg(count(lit(1)).as("n_distinct_payloads"),
        sum(col("n_copies")).as("n_media"),
        count(when(col("n_copies") >= 2, 1)).as("n_dup_groups"),
        sum((col("n_copies") - 1) * col("n_bytes")).as("bytes_saved"))
      .orderBy("media_type")
}
