package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import Det._

/** Batch analogs of the reference's four-stage event pipeline
  * (`/root/reference/src/main/java/.../Main.java:131-207` +
  * `OrderProcessor.java:99-257`): re-key → pair placed/fulfilled halves per
  * order → derive `processing.ms` → tumbling 1-minute per-facility window
  * aggregate emitted once per closed window.
  *
  * On the driver's `events` table the roles map as: `user_id` plays
  * order.id, `user_id % 10` plays facility.id, `signup` ≙ `order.placed`,
  * `purchase` ≙ `order.fulfilled` (SURVEY.md §2.3).
  *
  * Scale posture: every transform is a declarative DataFrame op — the
  * pairing is ONE hash-partitioned aggregation on the join key (map-side
  * partial min/when, then a single shuffle on user_id), not a stateful
  * per-record processor; the windowed rollup re-uses the same shuffled
  * partitioning when Catalyst can, and nothing touches the driver.
  */
object Pairing {
  /** event_type playing `order.placed` (README.md:28-36). */
  val PlacedType = "signup"
  /** event_type playing `order.fulfilled` (README.md:38-46). */
  val FulfilledType = "purchase"
  /** Pairing validity window ≙ PROCESSING_WINDOW_MILLISECONDS = 24 h
    * (OrderProcessor.java:62). */
  val TtlMs: Long = 24L * 3600 * 1000

  /** O7 batch analog (OrderProcessor.java:99-154): one conditional-min
    * aggregation per key pairs the two halves — a single shuffle, no state
    * store, no punctuator. Duplicate halves collapse via min() (the
    * streaming layer reproduces last-write-wins instead; see
    * graft.streaming.EventPairing). */
  def pairs(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === PlacedType, col("ts"))).as("placed_ts"),
        min(when(col("event_type") === FulfilledType, col("ts"))).as("fulfilled_ts"))
      .filter(col("placed_ts").isNotNull && col("fulfilled_ts").isNotNull)
      .withColumn("processing_ms",
        millis(col("fulfilled_ts")) - millis(col("placed_ts")))

  /** Pairs projected to the wire shape (epoch-ms longs, FIXTURES.md §1). */
  private def pairsWire(events: DataFrame): DataFrame =
    pairs(events).select(
      col("user_id"),
      millis(col("placed_ts")).as("placed_ms"),
      millis(col("fulfilled_ts")).as("fulfilled_ms"),
      col("processing_ms"))

  /** q_rekey_project — O6 (Main.java:139): project + re-key by the order
    * id. Keyed-ness in Spark is just a column; the shuffle happens at the
    * first keyed operator downstream. */
  def rekeyProject(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      col("user_id").cast("string").as("key"),
      col("event_id"), col("event_type"),
      millis(col("ts")).as("ts_ms"),
      col("value"), col("props"))
      .orderBy("event_id")

  /** q_filter_notnull — O14 (Main.java:197): drop nulls / non-positive. */
  def filterNotNull(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(col("props").isNotNull && col("value") > 100.0)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy("event_id")

  /** q_pair_match — O7 batch analog, see [[pairs]]. */
  def pairMatch(s: SparkSession, d: String): DataFrame =
    pairsWire(Tables.events(s, d)).orderBy("user_id")

  /** q_pair_match_join — O7 re-expressed as the explicit stream-stream
    * inner equi-join it semantically is (SURVEY.md §2.2 "joins"): every
    * (placed, fulfilled) event pair per user with fulfilled ≥ placed.
    * At scale this is a plain hash-shuffle join on user_id. */
  def pairMatchJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val placed = ev.filter(col("event_type") === PlacedType).select(
      col("user_id"), col("event_id").as("placed_event_id"),
      col("ts").as("placed_ts"))
    val fulfilled = ev.filter(col("event_type") === FulfilledType).select(
      col("user_id"), col("event_id").as("fulfilled_event_id"),
      col("ts").as("fulfilled_ts"))
    placed.join(fulfilled, "user_id")
      .filter(col("fulfilled_ts") >= col("placed_ts"))
      .select(col("user_id"), col("placed_event_id"), col("fulfilled_event_id"),
        (millis(col("fulfilled_ts")) - millis(col("placed_ts"))).as("gap_ms"))
      .orderBy("user_id", "placed_event_id", "fulfilled_event_id")
  }

  /** q_pair_ttl — O12's 24 h validity window as an event-time predicate
    * (|fulfilled − placed| ≤ 24 h; abs mirrors OrderProcessor.java:181,197
    * — future-dated events also survive). Documented analog, not a replica
    * of the wall-clock sweep (SURVEY.md §7.3.3). */
  def pairTtl(s: SparkSession, d: String): DataFrame =
    pairsWire(Tables.events(s, d))
      .filter(abs(col("processing_ms")) <= TtlMs)
      .orderBy("user_id")

  /** q_facility_info_by_minute — the FLAGSHIP: the whole reference
    * pipeline as one declarative query (O6→O7→O13→O15→O16→O18,
    * Main.java:131-207). Pair per user, roll up per facility per 1-minute
    * tumbling window of the fulfillment time, emit
    * {processing.count, processing.ms, event.timestamp = window end}
    * exactly once per window (README.md:48-65). */
  def facilityInfoByMinute(s: SparkSession, d: String): DataFrame =
    pairs(Tables.events(s, d))
      .withColumn("facility_id", col("user_id") % 10)
      .groupBy(window(col("fulfilled_ts"), "60 seconds"), col("facility_id"))
      .agg(
        count(lit(1)).as("processing_count"),
        sum(col("processing_ms")).as("processing_ms"))
      .select(
        col("facility_id"),
        millis(col("window.end")).as("event_timestamp"),
        col("processing_count"), col("processing_ms"))
      .orderBy("facility_id", "event_timestamp")

  /** q_tumbling_agg — O15 alone (Main.java:168-196): per event_type per
    * 1-minute tumbling window: count + sum(value). */
  def tumblingAgg(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "60 seconds"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("event_type"), millis(col("window.start")).as("window_start_ms"),
        col("n"), col("sum_value"))
      .orderBy("event_type", "window_start_ms")

  /** q_json_get — O3's field access as typed JSON extraction
    * (JsonObjectDeserializer.java:39-48; Main.java:139). */
  def jsonGet(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      col("event_id"),
      get_json_object(col("props"), "$.k").cast("int").as("k"))
      .orderBy("event_id")

  /** q_json_emit — O4's canonical row serialization
    * (JsonObjectSerializer.java:37-59). */
  def jsonEmit(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      col("event_id"),
      to_json(struct(col("event_id"), col("event_type"), col("user_id"))).as("js"))
      .orderBy("event_id")

  /** q_from_json — O3 as a FULL schema parse (vs q_json_get's scalar
    * path extraction): `from_json` with an explicit struct schema in
    * PERMISSIVE mode. Malformed input yields an ALL-NULL STRUCT (not a
    * null struct, and never a query failure — C2 log-and-continue;
    * pinned by the crafted-garbage fixture in AnalyticsSpec). The
    * `props_missing` flag reports SQL-NULL input, the only
    * distinguishable degradation at this schema. */
  def fromJson(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("parsed", from_json(col("props"), org.apache.spark.sql.types.StructType(
        Seq(org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.IntegerType)))))
      .select(col("event_id"), col("parsed.k").as("k"),
        col("props").isNull.as("props_missing"))
      .orderBy("event_id")

  /** q_pair_groups — O7 through the typed per-group iterator surface
    * (`groupByKey.flatMapGroups`): arbitrary Scala over each key's
    * events, the batch sibling of the streaming flatMapGroupsWithState
    * (same shuffle-by-key plan, no state store). Agrees row-for-row
    * with the declarative [[pairs]] formulation and shares its oracle.
    * Use this surface only when the logic genuinely can't be expressed
    * as aggregates — it opts the group out of whole-stage codegen. */
  def pairGroups(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .filter(col("event_type").isin(PlacedType, FulfilledType))
      .select(col("user_id"), col("event_type"), millis(col("ts")).as("ts_ms"))
      .as[graft.streaming.PairEvent]
      .groupByKey(_.user_id)
      .flatMapGroups { (uid: Long, it: Iterator[graft.streaming.PairEvent]) =>
        var placed = Long.MaxValue
        var fulfilled = Long.MaxValue
        it.foreach { e =>
          if (e.event_type == PlacedType) placed = math.min(placed, e.ts_ms)
          else fulfilled = math.min(fulfilled, e.ts_ms)
        }
        if (placed != Long.MaxValue && fulfilled != Long.MaxValue)
          Iterator.single(graft.streaming.PairResult(
            uid, placed, fulfilled, fulfilled - placed))
        else Iterator.empty
      }
      .toDF()
      .orderBy("user_id")
  }
}
