package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.Pairing

/** Edge cases from FIXTURES.md / SURVEY.md §5.2: unmatched halves,
  * fulfilled-before-placed (negative processing.ms emitted as-is,
  * OrderProcessor.java:136), duplicate halves, TTL validity window. */
class PairingSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, tsMs: Long, user: Long, typ: String): (Long, java.sql.Timestamp, Long, String, Double, String) =
    (id, new java.sql.Timestamp(tsMs), user, typ, 1.0, """{"k": 1}""")

  private lazy val dir = fixtureDir(
    "events" -> Seq(
      ev(0, 1000L, 1, "signup"),
      ev(1, 61000L, 1, "purchase"),         // user 1: normal pair, 60s
      ev(2, 5000L, 2, "purchase"),
      ev(3, 9000L, 2, "signup"),            // user 2: fulfilled BEFORE placed → negative
      ev(4, 1000L, 3, "signup"),            // user 3: half-pair only → excluded
      ev(5, 1000L, 4, "signup"),
      ev(6, 2000L, 4, "signup"),            // user 4: duplicate placed (min wins) …
      ev(7, 90000000L, 4, "purchase"),      // … gap > 24h → TTL-filtered
      ev(8, 500L, 5, "click"),              // unknown type: ignored
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props"))

  test("pair_match pairs min halves, keeps negative latency, drops half-pairs") {
    val rows = SparkEntry.queries("q_pair_match")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(rows == Map(1L -> 60000L, 2L -> -4000L, 4L -> 89999000L))
  }

  test("pair_ttl drops pairs beyond the 24h validity window, keeps |negative|") {
    val rows = SparkEntry.queries("q_pair_ttl")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    assert(rows == Set(1L, 2L)) // user 4's 25h gap is out; user 2's -4s is in (abs)
  }

  test("flagship rolls pairs into per-facility 1-minute windows with window-end timestamps") {
    val rows = SparkEntry.queries("q_facility_info_by_minute")(spark, dir).collect()
    // user 1 fulfilled at 61000 → window [60000,120000) → end 120000; facility 1%10=1
    val u1 = rows.find(_.getLong(0) == 1L).get
    assert(u1.getLong(1) == 120000L && u1.getLong(2) == 1L && u1.getLong(3) == 60000L)
    // every emitted window end is aligned to the minute
    assert(rows.forall(_.getLong(1) % 60000 == 0))
  }

  test("pair_match_join produces every ordered (placed, fulfilled) combination") {
    val n = SparkEntry.queries("q_pair_match_join")(spark, dir).count()
    // user1: 1 pair; user2: none (purchase before signup); user4: 2 signups × 1 purchase
    assert(n == 3)
  }

  test("tumbling_agg buckets by event-time minute with exact sums") {
    val rows = SparkEntry.queries("q_tumbling_agg")(spark, dir).collect()
    val click = rows.filter(_.getString(0) == "click")
    assert(click.length == 1 && click.head.getLong(1) == 0L && click.head.getLong(2) == 1L)
  }
}
