package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import Det._

/** Temporal operators beyond the reference's single tumbling window:
  * as-of join, sliding windows, session windows (the full streaming
  * window family, SURVEY.md §2.2 "streaming: windows").
  */
object Temporal {

  /** q_asof_join — each purchase paired with the LATEST signup at-or-
    * before it per user. Implemented as the union+running-last trick:
    * one sort-within-partition over the unioned stream instead of a
    * range join — a single hash exchange on user_id, no join explosion,
    * O(n log n) per partition. (A custom LogicalPlan/Strategy could do a
    * merge-pass; the built-in composition already yields that plan shape,
    * so per the extension policy no custom node is warranted.)
    * Oracle: DuckDB's native ASOF JOIN. */
  def asofJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .filter(col("event_type").isin(Pairing.PlacedType, Pairing.FulfilledType))
      .select(col("user_id"), col("event_id"), col("event_type"),
        millis(col("ts")).as("ts_ms"))
    // within one timestamp, signups sort first so an equal-ts signup is
    // visible to the purchase (ASOF's >= semantics)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms").asc,
        when(col("event_type") === Pairing.PlacedType, 0).otherwise(1).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("last_signup_ms",
        last(when(col("event_type") === Pairing.PlacedType, col("ts_ms")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === Pairing.FulfilledType &&
        col("last_signup_ms").isNotNull)
      .select(col("user_id"), col("event_id").as("purchase_event_id"),
        col("ts_ms").as("purchase_ms"), col("last_signup_ms"),
        (col("ts_ms") - col("last_signup_ms")).as("since_signup_ms"))
      .orderBy("user_id", "purchase_event_id")
  }

  /** q_window_sliding — 2-minute windows sliding by 1 minute: every event
    * lands in exactly 2 windows. Spark plans this as a generate+agg (no
    * self-union); partial aggregation still applies. */
  def slidingWindow(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "120 seconds", "60 seconds"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("event_type"), millis(col("window.start")).as("window_start_ms"),
        col("n"), col("sum_value"))
      .orderBy("event_type", "window_start_ms")

  /** q_window_session — 5-minute-gap session windows per user.
    * Boundary semantics (pinned by TemporalSpec): an event at EXACTLY
    * the gap distance still merges — Spark unions sessions whose ranges
    * touch (start ≤ prevEnd), so the islands oracle breaks on gap >
    * 5 min, not ≥. Oracle: gaps-and-islands SQL.
    * Session end in Spark is last-event + gap, so the last-event time is
    * recovered by subtracting the gap at the edge. */
  def sessionWindow(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        millis(col("session_window.start")).as("session_start_ms"),
        col("n_events"),
        (millis(col("session_window.end")) - lit(300000L)).as("last_ms"))
      .orderBy("user_id", "session_start_ms")

  /** q_recursive_cte — recursive date-spine generation (Spark 4
    * `WITH RECURSIVE`, SPARK-24497): the anchor seeds (first month,
    * last month) and the recursive step walks one month at a time,
    * carrying the bound AS A COLUMN — fully declarative, NO driver
    * participation, and crucially the bound is scanned ONCE: a scalar
    * subquery in the step's WHERE re-executes the max() scan on every
    * iteration (~80 full scans; measured 10.8 s → 1.1 s at sf0.1).
    * Orders are aggregated to per-month counts FIRST, so the LEFT JOIN
    * that keeps gap months visible (n_orders = 0) runs over two
    * month-cardinality relations — at 100 TB the only full-data passes
    * are the anchor min/max and the map-side-combined monthly
    * aggregation; the recursion itself is one 1-row step per month and
    * costs nothing at any scale. Oracle: DuckDB WITH RECURSIVE. */
  def recursiveCte(s: SparkSession, d: String): DataFrame = {
    // isolated child session: the raised recursion limit and the temp
    // view must not leak into every later query of the shared session
    // (Bench/Verify run the whole inventory in one JVM) — same pattern
    // as withStreamingPartitions / aggPushdown.
    val iso = s.newSession()
    // depth = #months in the data (~80 here); the 100-step default
    // would silently cap a wider date range, so raise it explicitly
    iso.conf.set("spark.sql.cteRecursionLevelLimit", "10000")
    Tables.orders(iso, d).createOrReplaceTempView("graft_orders")
    iso.sql("""
      WITH RECURSIVE spine(month_start, last_month) AS (
        SELECT CAST(date_trunc('MONTH', min(o_orderdate)) AS DATE),
               CAST(date_trunc('MONTH', max(o_orderdate)) AS DATE)
        FROM graft_orders
        UNION ALL
        SELECT add_months(month_start, 1), last_month FROM spine
        WHERE month_start < last_month
      ),
      monthly AS (
        SELECT CAST(date_trunc('MONTH', o_orderdate) AS DATE) AS m,
               count(*) AS c
        FROM graft_orders GROUP BY 1
      )
      SELECT sp.month_start, CAST(coalesce(m.c, 0) AS BIGINT) AS n_orders
      FROM spine sp LEFT JOIN monthly m ON m.m = sp.month_start
      ORDER BY sp.month_start
    """)
  }

  /** Resample grid step for [[interpolate]]: hourly. */
  private val GridMs = 3600000L

  /** q_interpolate — time-series resampling with linear interpolation:
    * every user's irregular event series becomes an hourly grid, each
    * grid point valued by straight-line interpolation between its
    * bracketing events. The classic one-pass formulation: interleave
    * grid points with events, ONE window per user ordered by (ts, kind)
    * carries the last event back (running last_value ignore-nulls) and
    * the next event forward — no self-join, no per-point probe.
    * Determinism: same-ts events reduce via min_by on the unique
    * event_id; the interpolation ratio is one fixed association-order
    * double expression over exact longs, rounded at the edge. At scale
    * each user's series sorts independently inside its window
    * partition; grid size is bounded by span/step, not event count. */
  def interpolate(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .groupBy(col("user_id"), millis(col("ts")).as("ts_ms"))
      .agg(expr("min_by(value, event_id)").as("v"))
    val grid = ev.groupBy(col("user_id"))
      .agg(min(col("ts_ms")).as("mn"), max(col("ts_ms")).as("mx"))
      .select(col("user_id"),
        expr(s"(mn + ${GridMs - 1}) div $GridMs").as("kmin"),
        expr(s"mx div $GridMs").as("kmax"))
      // sequence(a, b) runs DESCENDING when a > b — a span shorter than
      // one grid step must yield zero points, not a reversed ramp
      .filter(col("kmax") >= col("kmin"))
      .select(col("user_id"),
        explode(sequence(col("kmin"), col("kmax"))).as("k"))
      .select(col("user_id"), (col("k") * GridMs).as("ts_ms"),
        lit(1).as("kind"), lit(null).cast("double").as("v"))
    val pts = ev.select(col("user_id"), col("ts_ms"), lit(0).as("kind"), col("v"))
      .unionByName(grid)
    // BOTH directions as running (growing) frames: Spark's WindowExec
    // recomputes non-invertible aggregates from scratch per row in a
    // shrinking (currentRow → unboundedFollowing) frame — O(n²) per
    // partition (measured 5.6 s at sf0.1); the same "next event" is a
    // running last_value over the REVERSED ordering — O(n), two sorts.
    val back = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms").asc, col("kind").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms").desc, col("kind").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val evTs = when(col("kind") === 0, col("ts_ms"))
    pts
      .withColumn("prev_v", last(col("v"), ignoreNulls = true).over(back))
      .withColumn("prev_t", last(evTs, ignoreNulls = true).over(back))
      .withColumn("next_v", last(col("v"), ignoreNulls = true).over(fwd))
      .withColumn("next_t", last(evTs, ignoreNulls = true).over(fwd))
      // a grid point landing exactly on its prev event needs no forward
      // bracket (events sort before the grid row at equal ts, so the
      // forward window can't see them)
      .filter(col("kind") === 1 && col("prev_t").isNotNull &&
        (col("next_t").isNotNull || col("prev_t") === col("ts_ms")))
      .select(col("user_id"), col("ts_ms"),
        round(when(col("prev_t") === col("ts_ms"), col("prev_v"))
          .otherwise(col("prev_v") + (col("next_v") - col("prev_v")) *
            (col("ts_ms") - col("prev_t")) / (col("next_t") - col("prev_t"))), 6)
          .as("v_interp"))
      .orderBy("user_id", "ts_ms")
  }

  /** q_scd2_history — slowly-changing-dimension TYPE 2 history build,
    * the warehouse-maintenance staple next to q_upsert_merge: each
    * user's event_type stream collapses into versioned validity
    * intervals — a new version opens exactly when the attribute
    * CHANGES (consecutive repeats collapse; a value RE-appearing
    * later opens a fresh version — SCD2 tracks history, not distinct
    * values), valid_to = the next version's valid_from (half-open
    * intervals, NULL ⇒ is_current). Change detection is one lag()
    * and interval closing one lead(), both over (user_id | ts,
    * event_id) — the deterministic total order; every window is
    * partitioned by the dimension's natural key, so the build is two
    * narrow keyed shuffles at any scale (no global sort, no
    * self-join). Collapse/reopen/current-row/equal-ts-tie semantics
    * pinned by TemporalSpec. */
  def scd2History(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      .withColumn("version", row_number().over(w).cast("int"))
      .withColumn("valid_to_ts", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("version"), col("event_type").as("attr"),
        millis(col("ts")).as("valid_from_ms"),
        millis(col("valid_to_ts")).as("valid_to_ms"),
        col("valid_to_ts").isNull.as("is_current"))
      .orderBy("user_id", "version")
  }
}
