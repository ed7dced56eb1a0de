package graft

import graft.operators.Temporal

/** Boundary semantics of the temporal operators: as-of tie handling,
  * session-window gap edges, sliding-window membership. */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, tsMs: Long, user: Long, typ: String) =
    (id, new java.sql.Timestamp(tsMs), user, typ, 1.0, "{}")

  private lazy val dir = fixtureDir(
    "events" -> Seq(
      // user 1: signup at 1000, purchases at 1000 (tie), 5000; later signup 4000
      ev(0, 1000L, 1, "signup"),
      ev(1, 1000L, 1, "purchase"),
      ev(2, 5000L, 1, "purchase"),
      ev(3, 4000L, 1, "signup"),
      // user 2: purchase before ANY signup → excluded from asof
      ev(4, 100L, 2, "purchase"),
      ev(5, 200L, 2, "signup"),
      // user 3: session gaps — 0, +299999 (merge), +300000 exactly
      // (still merges: ranges touch), then +300001 (new session)
      ev(6, 0L, 3, "click"),
      ev(7, 299999L, 3, "click"),
      ev(8, 599999L, 3, "click"),
      ev(9, 900000L, 3, "click"),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props"))

  test("asof picks the latest signup ≤ purchase; equal-ts signup counts; no-prior excluded") {
    val rows = Temporal.asofJoin(spark, dir).collect()
      .map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(rows(1L) == 1000L) // tie: signup at the same ms is eligible (>= semantics)
    assert(rows(2L) == 4000L) // latest signup before 5000, not the first one
    assert(!rows.contains(4L)) // purchase with no prior signup drops
  }

  test("session window merges at exactly the gap (touching ranges), splits past it") {
    val rows = Temporal.sessionWindow(spark, dir).collect()
      .filter(_.getLong(0) == 3L)
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSet == Set(
      (0L, 3L, 599999L),     // 0, 299999, and exactly-gap 599999 all merge
      (900000L, 1L, 900000L) // 300001ms after → new session
    ))
  }

  test("sliding 2m/1m windows: every event appears in exactly 2 windows") {
    val total = Temporal.slidingWindow(spark, dir).collect().map(_.getLong(2)).sum
    assert(total == 2L * 10) // 10 events, each in 2 windows
  }

  test("recursive CTE date spine: gap months surface with zero orders") {
    val d = fixtureDir("orders" -> Seq(
      java.sql.Timestamp.valueOf("1995-01-15 00:00:00"),
      java.sql.Timestamp.valueOf("1995-01-20 00:00:00"),
      java.sql.Timestamp.valueOf("1995-04-02 00:00:00"))
      .map(Tuple1(_)).toDF("o_orderdate"))
    val rows = Temporal.recursiveCte(spark, d).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1))).toSeq
    assert(rows == Seq( // Feb/Mar exist ONLY via the recursion — zero rows
      ("1995-01-01", 2L), ("1995-02-01", 0L),
      ("1995-03-01", 0L), ("1995-04-01", 1L)))
  }

  test("interpolate: exact-at-event grid uses the event; interior is linear; short span empty") {
    val H = 3600000L
    val d = fixtureDir("events" -> Seq(
      // user 1: events at 0h (v=10) and 2h (v=30) → grid 0h,1h,2h
      (10L, new java.sql.Timestamp(0L), 1L, "x", 10.0, "{}"),
      (11L, new java.sql.Timestamp(2 * H), 1L, "x", 30.0, "{}"),
      // user 2: 30-minute span straddling no grid point → zero rows
      (20L, new java.sql.Timestamp(H + 1), 2L, "x", 1.0, "{}"),
      (21L, new java.sql.Timestamp(H + 1800000L), 2L, "x", 2.0, "{}"),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val r = Temporal.interpolate(spark, d).collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> x.getDouble(2)).toMap
    assert(r == Map(
      (1L, 0L) -> 10.0,       // event exactly on the grid: its own value
      (1L, H) -> 20.0,        // interior midpoint: straight line
      (1L, 2 * H) -> 30.0))   // other endpoint
    assert(!r.keySet.exists(_._1 == 2L)) // sub-step span yields no grid
  }

  test("scd2: repeats collapse, reappearing value reopens, half-open chain, equal-ts tie by event_id") {
    // user 7: A@10, A@20 (collapse), B@30, A@40 (REOPENS — history, not
    // distinct values), current. user 8: two values at the SAME ts —
    // event_id breaks the tie, so X(id 20) precedes Y(id 21): two
    // versions from one timestamp, Y's interval [100, NULL).
    val d = fixtureDir("events" -> Seq(
      ev(10, 10L, 7, "A"), ev(11, 20L, 7, "A"),
      ev(12, 30L, 7, "B"), ev(13, 40L, 7, "A"),
      ev(20, 100L, 8, "X"), ev(21, 100L, 8, "Y"),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val r = Temporal.scd2History(spark, d).collect()
      .map(x => (x.getLong(0), x.getInt(1)) ->
        ((x.getString(2), x.getLong(3),
          if (x.isNullAt(4)) -1L else x.getLong(4), x.getBoolean(5)))).toMap
    assert(r((7L, 1)) == (("A", 10L, 30L, false))) // repeat at 20 collapsed
    assert(r((7L, 2)) == (("B", 30L, 40L, false)))
    assert(r((7L, 3)) == (("A", 40L, -1L, true)))  // reopened version, current
    assert(r((8L, 1)) == (("X", 100L, 100L, false))) // zero-length but ordered
    assert(r((8L, 2)) == (("Y", 100L, -1L, true)))
    assert(r.size == 5)
  }
}
