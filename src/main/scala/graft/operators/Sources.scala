package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import Det._

/** Source/sink format coverage beyond parquet (SURVEY.md §2.2
  * "scans/sources/sinks" — the reference speaks only Kafka; a drop-in
  * engine needs the file-format surface too): JSON and CSV write→read
  * round trips with explicit schemas.
  *
  * Timestamps cross text formats as epoch-ms longs (format-independent);
  * doubles survive because both writers emit shortest-round-trip
  * representations that parse back to the identical IEEE value.
  */
object Sources {

  private val wireSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("ts_ms", LongType),
    StructField("value", DoubleType)))

  private def wireEvents(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      col("event_id"), col("user_id"), col("event_type"),
      millis(col("ts")).as("ts_ms"), col("value"))

  /** Deterministic per-(tag, dataset) scratch dir: re-runs (Bench runs
    * every query SPARK_GRAFT_REPS times) overwrite in place instead of
    * leaking a fresh temp dir per invocation. */
  private def scratchDir(tag: String, d: String): String = {
    val safe = d.replaceAll("[^A-Za-z0-9]", "_")
    val p = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_scratch", s"${tag}_$safe")
    Files.createDirectories(p.getParent)
    p.toString
  }

  private def roundtrip(s: SparkSession, d: String, format: String): DataFrame = {
    val dir = scratchDir(format, d)
    wireEvents(s, d).write.mode("overwrite").format(format)
      .option("header", "true").save(dir)
    s.read.format(format).schema(wireSchema)
      .option("header", "true").load(dir)
      .orderBy("event_id")
  }

  /** q_source_json — JSON lines sink → source round trip. */
  def jsonRoundtrip(s: SparkSession, d: String): DataFrame =
    roundtrip(s, d, "json")

  /** q_source_csv — CSV sink → source round trip (explicit schema: no
    * inference pass, which at 100 TB would be a full extra scan). */
  def csvRoundtrip(s: SparkSession, d: String): DataFrame =
    roundtrip(s, d, "csv")

  /** q_source_orc — ORC sink → source round trip (the other columnar
    * format; same pushdown/pruning machinery as parquet). */
  def orcRoundtrip(s: SparkSession, d: String): DataFrame =
    roundtrip(s, d, "orc")

  /** q_source_merge_schema — schema evolution on read: two parquet
    * batches written with DIFFERENT schemas (the later one grew a
    * `value` column — the normal life of a long-lived dataset), read
    * back as one relation via `mergeSchema` with the missing column
    * null-filled. At 100 TB schema evolution happens in place; a reader
    * that can't merge footers forces a full rewrite. (mergeSchema costs
    * a footer pass per file — enable it per-read like here, not
    * globally.) */
  def mergeSchemaRoundtrip(s: SparkSession, d: String): DataFrame = {
    val dir = scratchDir("merge", d)
    val ev = wireEvents(s, d)
    ev.filter(col("event_id") % 2 === 0)
      .select("event_id", "user_id")
      .write.mode("overwrite").parquet(s"$dir/batch=0")
    ev.filter(col("event_id") % 2 === 1)
      .select("event_id", "user_id", "value")
      .write.mode("overwrite").parquet(s"$dir/batch=1")
    s.read.option("mergeSchema", "true")
      .parquet(s"$dir/batch=0", s"$dir/batch=1")
      .select("event_id", "user_id", "value")
      .orderBy("event_id")
  }

  /** q_source_text — raw text-lines round trip: the 100 TB raw-corpus
    * entry point (web dumps, logs) is line-oriented text, not a typed
    * format. Documents go out as `id<TAB>text` lines and come back
    * through the `text` source as a single `value` column, re-parsed
    * with one split (the corpus tokens are space-separated, so the
    * first TAB is an unambiguous delimiter). Parsing is a codegen'd
    * per-line map — exactly what a 1000-executor ingest does per
    * split. */
  def textRoundtrip(s: SparkSession, d: String): DataFrame = {
    val dir = scratchDir("text", d)
    Tables.documents(s, d)
      // the TAB-delimited line format is only unambiguous if text is
      // non-null and TAB/newline-free — fail loudly at write time if a
      // future corpus breaks that, instead of round-tripping wrong rows
      .select(when(col("text").isNull
          .or(col("text").contains("\t")).or(col("text").contains("\n")),
          raise_error(concat(lit("textRoundtrip: doc_id="), col("doc_id"),
            lit(" has null text or embedded tab/newline"))))
        .otherwise(concat_ws("\t", col("doc_id"), col("text"))).as("line"))
      .write.mode("overwrite").text(dir)
    s.read.text(dir)
      .select(
        substring_index(col("value"), "\t", 1).cast("long").as("doc_id"),
        substring(col("value"), instr(col("value"), "\t") + 1, lit(1000000))
          .as("text"))
      .orderBy("doc_id")
  }
}
