package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deduplication operators over the `documents` / `embeddings` tables —
  * the LLM-training-data staples: exact hash dedup, n-gram Jaccard,
  * MinHash+LSH, SimHash, and embedding-cosine near-dup.
  *
  * Scale posture: exact + minhash are the 100 TB paths (one keyed
  * aggregation / a banded self-join on short signatures); the all-pairs
  * shingle and cosine joins are exact baselines meant for inside-bucket
  * re-ranking, and are documented as such.
  */
object Dedup {

  private def toks: Column = split(col("text"), " ")

  /** Word 3-shingles of the document (empty below 3 tokens; Spark's
    * `sequence(1,0)` would count DOWN, so the size guard is required). */
  private def shingles: Column =
    when(size(toks) >= 3,
      transform(sequence(lit(1), size(toks) - 2), i =>
        concat_ws(" ", element_at(toks, i), element_at(toks, i + 1),
          element_at(toks, i + 2))))
      .otherwise(array())

  /** q_dedup_exact — exact duplicate groups by content hash: ONE keyed
    * aggregation on md5(text); at 100 TB this is the cheapest dedup and
    * the hash key shards perfectly. */
  def exact(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(md5(col("text").cast("binary")).as("text_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc_id"))
      .orderBy("text_hash")

  /** Distinct (doc_id, shingle) pairs — shingles carried as xxhash64
    * longs, not strings: the distinct + self-join shuffle 8-byte keys
    * instead of ~20-byte text (≈2× shuffle bytes saved; collision odds
    * at 64 bits are ~1e-8 even at 1e5× this scale, and any collision
    * only perturbs one Jaccard count). */
  private def shingleSet(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), explode(shingles).as("sh"))
      .select(col("doc_id"), xxhash64(col("sh")).as("shingle"))
      .distinct()

  /** q_dedup_ngram — n-gram Jaccard near-dup pairs (≥ 0.5): distinct
    * shingles per doc, self-join on shingle, |∩| / |∪|. Exact but
    * quadratic in co-bucketed docs — the baseline the MinHash variant
    * approximates; at scale you run this only on LSH candidates. */
  def ngramJaccard(s: SparkSession, d: String): DataFrame = {
    val sh = shingleSet(s, d)
    val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = sh.as("a")
      .join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    val jaccard = col("n_common").cast("double") /
      (col("na") + col("nb") - col("n_common"))
    inter
      .join(cnt.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(cnt.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .filter(jaccard >= 0.5)
      .select(col("doc_a"), col("doc_b"), round(jaccard, 6).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** MinHash signature: k independent permutations approximated by
    * xxhash64(shingle, seed k) — all k mins computed in ONE pass over the
    * exploded shingles (one aggregation, no per-seed re-scan). */
  private[operators] def minhashSig(sh: DataFrame, k: Int): DataFrame =
    sh.groupBy(col("doc_id"))
      .agg(
        min(xxhash64(col("shingle"), lit(0))).as("m0"),
        (1 until k).map(j =>
          min(xxhash64(col("shingle"), lit(j))).as(s"m$j")): _*)

  /** q_dedup_minhash — MinHash + LSH banding (k=16 hashes, 4 bands × 4
    * rows): docs sharing a band bucket are candidate near-dups. The
    * 100 TB dedup path: signature is 16 longs per doc; the self-join is
    * on (band, band_hash) buckets only — never all-pairs. No SQL oracle
    * (xxhash64 is Spark-specific); deterministic for the rows-only check
    * and pinned by the Jaccard baseline in tests. */
  def minhashLsh(s: SparkSession, d: String): DataFrame = {
    val k = 16
    val sig = minhashSig(shingleSet(s, d), k)
    val bands = sig.select(
      col("doc_id"),
      posexplode(array((0 until 4).map(b =>
        xxhash64((b * 4 until (b + 1) * 4).map(j => col(s"m$j")): _*)): _*))
        .as(Seq("band", "band_hash")))
    bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_bands"))
      .orderBy("doc_a", "doc_b")
  }

  /** q_dedup_simhash — 64-bit SimHash near-dup pairs: per-doc signature
    * via the native [[graft.functions.SimHash64]] expression, then a
    * banded self-join on 16-bit chunks + Hamming ≤ 3 verification
    * (bit_count(xor)). Signature is 8 bytes/doc → the join ships almost
    * nothing at scale. No SQL oracle (hash is engine-specific). */
  def simhash(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), graft.functions.simhash64(toks).as("sig"))
    val chunks = docs.select(
      col("doc_id"), col("sig"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("sig"), c * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("chunk", "chunk_val")))
    chunks.as("a")
      .join(chunks.as("b"),
        col("a.chunk") === col("b.chunk") &&
          col("a.chunk_val") === col("b.chunk_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
      .orderBy("doc_a", "doc_b")
  }

  /** q_dedup_embedding — embedding-cosine near-dup pairs (≥ 0.9,
    * vec_id_a < vec_id_b). Exact all-pairs baseline (the LSH variant in
    * Similarity is the scale path); norms are precomputed once per side
    * so the join does one fold per pair. */
  def embeddingCosine(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"),
        sqrt(Similarity.norm2(col("embedding"))).as("nrm"))
    val pairs = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
    val cos = round(
      Similarity.dot(col("a.embedding"), col("b.embedding")) /
        (col("a.nrm") * col("b.nrm")), 6)
    pairs
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        cos.as("cos_sim"))
      .filter(col("cos_sim") >= 0.9)
      .orderBy("vec_a", "vec_b")
  }
}
