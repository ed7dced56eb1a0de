package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import Det._

/** Scalar-function catalogs beyond the q_scalar_funcs basics: conditional
  * expressions, regular expressions, calendar arithmetic, and bitwise
  * ops. All pure per-row projections — embarrassingly parallel,
  * whole-stage-codegen'd, nothing here ever shuffles except the final
  * demo aggregation/sort.
  *
  * Cross-engine notes (the oracle is DuckDB): Spark `regexp_replace`
  * replaces ALL matches ≙ DuckDB needs the `'g'` flag; Spark
  * `weekday` (Monday=0) ≙ DuckDB `isodow - 1`; DuckDB `quarter`/`week`/
  * `bit_count` return wider ints than Spark — the oracle casts to
  * Spark's type.
  */
object Catalog {

  /** q_case_when — conditional expression catalog: multi-arm CASE WHEN
    * tiering + a boolean-to-long flag, rolled up per tier. */
  def caseWhen(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        when(col("o_totalprice") < 50000.0, "small")
          .when(col("o_totalprice") < 150000.0, "medium")
          .otherwise("large").as("tier"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("is_final"),
        col("o_totalprice"))
      .groupBy(col("tier"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("is_final")).as("n_final"),
        dsum(col("o_totalprice")).as("revenue"))
      .orderBy("tier")

  /** q_regex_funcs — regexp catalog on customer names: capture-group
    * extraction, global replacement, boolean match, match counting. */
  def regexFuncs(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(
        col("c_custkey"),
        regexp_extract(col("c_name"), "([0-9]+)$", 1).cast("int").as("cust_num"),
        regexp_replace(col("c_name"), "[0-9]", "#").as("masked_name"),
        col("c_name").rlike("^Customer#").as("is_canonical"),
        regexp_count(col("c_mktsegment"), lit("[AEIOU]")).as("seg_vowels"))
      .orderBy("c_custkey")

  /** q_date_funcs — calendar arithmetic catalog: quarter / ISO week /
    * weekday extraction, month-end snapping, month and day offsets
    * (add_months clamps to the target month's last day in both
    * engines). */
  def dateFuncs(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        quarter(col("o_orderdate")).as("order_quarter"),
        weekofyear(col("o_orderdate")).as("order_week"),
        expr("weekday(o_orderdate)").as("order_wd"),
        unix_millis(last_day(col("o_orderdate")).cast("timestamp")).as("month_end_ms"),
        unix_millis(add_months(col("o_orderdate"), 3).cast("timestamp")).as("plus3m_ms"),
        unix_millis(date_add(col("o_orderdate"), 30).cast("timestamp")).as("plus30d_ms"))
      .orderBy("o_orderkey")

  /** q_bitwise — bitwise catalog on the order key: and/or/xor masks,
    * shifts, popcount. */
  def bitwise(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        col("o_orderkey").bitwiseAND(lit(255L)).as("low_byte"),
        col("o_orderkey").bitwiseOR(lit(4096L)).as("with_flag"),
        col("o_orderkey").bitwiseXOR(lit(255L)).as("flipped"),
        shiftleft(col("o_orderkey"), 3).as("shl3"),
        shiftright(col("o_orderkey"), 2).as("shr2"),
        bit_count(col("o_orderkey")).as("popcount"))
      .orderBy("o_orderkey")

  /** q_map_funcs — MapType catalog: build a map from columns, extract by
    * key, count entries. (The oracle engine returns a LIST from map
    * extraction, so its side unwraps with `[1]` — the values compare
    * equal.) */
  def mapFuncs(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_id"),
        map(lit("t"), col("event_type"),
          lit("u"), col("user_id").cast("string")).as("m"))
      .select(
        col("event_id"),
        element_at(col("m"), "t").as("t_val"),
        element_at(col("m"), "u").as("u_val"),
        size(col("m")).as("n_keys"))
      .orderBy("event_id")

  /** q_array_lambda — higher-order array functions over the embedding
    * column: filter (positive components), transform+max (max |x|), and
    * a sequential aggregate fold (sum). The fold order is identical in
    * both engines, so the double sum needs no edge rounding. */
  def arrayLambda(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(
        col("vec_id"),
        size(filter(col("embedding"), x => x > 0.0f)).as("n_pos"),
        array_max(transform(col("embedding"), x => abs(x))).as("max_abs"),
        aggregate(col("embedding"), lit(0.0),
          (acc, x) => acc + x.cast("double")).as("sum_all"))
      .orderBy("vec_id")

  /** q_explode_outer — null-preserving lateral explode: rows whose array
    * is empty survive with a NULL slot (plain explode would drop them),
    * the outer-join flavor of the lateral view. */
  def explodeOuter(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_id"),
        when(col("event_id") % 3 === 0, array().cast("array<bigint>"))
          .otherwise(sequence(lit(1L), col("event_id") % 3)).as("slots"))
      .select(col("event_id"), explode_outer(col("slots")).as("slot0"))
      .select(col("event_id"), col("slot0").cast("int").as("slot"))
      .orderBy(col("event_id"), col("slot").asc_nulls_first)

  /** q_array_setops — array set algebra: union / intersect / except /
    * overlap / element-wise zip over two derived integer arrays. Spark's
    * set functions preserve first-array order — the outputs are
    * array_sort'ed so the contract is the SET, matching any engine's
    * ordering (DuckDB mirrors with list comprehensions + list_sort).
    * Each array is emitted as a canonical comma-joined string: the
    * driver's comparator sorts/hashes output cells, and raw array
    * cells are unhashable there — the string form is the portable
    * wire contract (DuckDB mirrors with array_to_string). */
  def arraySetOps(s: SparkSession, d: String): DataFrame = {
    val a = sequence(col("o_orderkey") % 4, col("o_orderkey") % 4 + 3)
    val b = sequence(col("o_orderkey") % 7, col("o_orderkey") % 7 + 3)
    def joined(c: Column): Column = array_join(c.cast("array<string>"), ",")
    Tables.orders(s, d)
      // materialize the two arrays once per row: inlined into the next
      // select, each sequence() would be rebuilt for every one of the
      // five set operations (CollapseProject keeps multi-referenced
      // non-cheap aliases materialized, so this projection survives).
      .select(col("o_orderkey"), a.as("arr_a"), b.as("arr_b"))
      .select(col("o_orderkey"),
        joined(array_sort(array_union(col("arr_a"), col("arr_b")))).as("u"),
        joined(array_sort(array_intersect(col("arr_a"), col("arr_b")))).as("i"),
        joined(array_sort(array_except(col("arr_a"), col("arr_b")))).as("e"),
        arrays_overlap(col("arr_a"), col("arr_b")).as("overlaps"),
        joined(zip_with(col("arr_a"), col("arr_b"), (x, y) => x + y)).as("z"))
      .orderBy("o_orderkey")
  }

  /** q_hash_encode — cryptographic digests and binary-text encodings:
    * md5 / sha-256 content hashes (the fingerprints every data-lake
    * manifest and dedup ledger carries), base64 round trip, and integer
    * hex. All codegen'd per-row projections; digests are the two with
    * cross-engine coverage (DuckDB lacks sha1/crc32). */
  def hashEncode(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        md5(col("text").cast("binary")).as("md5_hex"),
        sha2(col("text").cast("binary"), 256).as("sha256_hex"),
        base64(substring(col("text"), 1, 12).cast("binary")).as("prefix_b64"),
        decode(unbase64(base64(substring(col("text"), 1, 12).cast("binary"))),
          "UTF-8").as("prefix_roundtrip"),
        hex(col("doc_id")).as("id_hex"))
      .orderBy("doc_id")

  /** q_variant_json — Spark 4 VARIANT ingestion: `parse_json` once into
    * the binary variant encoding, then typed `variant_get` path
    * extraction. At scale this is the schema-on-read answer for
    * heterogeneous JSON: parse once, store the variant column, extract
    * many times without re-parsing text (the reference parses gson trees
    * per record per hop — O3, Main.java:137). `try_`-flavors make
    * garbage payloads nulls, not failures (C2). */
  def variantJson(s: SparkSession, d: String): DataFrame = {
    val v = try_parse_json(col("props"))
    Tables.events(s, d)
      .filter(col("props").isNotNull)
      .select(col("event_id"),
        try_variant_get(v, "$.k", "int").as("k_int"),
        try_variant_get(v, "$.k", "string").as("k_str"),
        try_variant_get(v, "$.missing", "int").as("missing_int"),
        is_variant_null(v).as("is_null_variant"))
      .orderBy("event_id")
  }
}
