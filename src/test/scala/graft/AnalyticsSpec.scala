package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Analytics, Catalog, Pairing, Relational}

/** Crafted-fixture specs for the round-2 analytics surface — boundary
  * semantics the organic testdata can't be trusted to exercise (exact
  * threshold hits, ties, RANGE-frame peers, island adjacency). */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def ordersDir(rows: (Long, Long, String, Double, String, String)*): String =
    fixtureDir("orders" -> rows.toSeq
      .map { case (k, c, st, p, dt, pr) => (k, c, st, p, ts(dt), pr) }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority"))

  test("minmax_by: exact price tie breaks to the higher/lower key injectively") {
    val d = ordersDir(
      (1L, 1L, "O", 500.0, "1995-01-01 00:00:00", "1-URGENT"),
      (2L, 1L, "O", 500.0, "1995-01-02 00:00:00", "1-URGENT"), // tie with 1
      (3L, 1L, "O", 100.0, "1995-01-03 00:00:00", "1-URGENT"),
      (4L, 1L, "O", 100.0, "1995-01-04 00:00:00", "1-URGENT")) // tie with 3
    val r = Analytics.minmaxBy(spark, d).collect()
    assert(r.length == 1)
    assert(r(0).getLong(1) == 2L) // best_order: tie at 500 → max key
    assert(r(0).getDouble(2) == 500.0)
    assert(r(0).getLong(3) == 3L) // worst_order: tie at 100 → min key
    assert(r(0).getDouble(4) == 100.0)
  }

  test("case_when: threshold values fall into the next tier (strict <)") {
    val d = ordersDir(
      (1L, 1L, "F", 49999.9999, "1995-01-01 00:00:00", "x"),
      (2L, 1L, "O", 50000.0, "1995-01-01 00:00:00", "x"),   // exactly 50k → medium
      (3L, 1L, "F", 150000.0, "1995-01-01 00:00:00", "x"))  // exactly 150k → large
    val r = Catalog.caseWhen(spark, d).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r("small") == ((1L, 1L)))
    assert(r("medium") == ((1L, 0L)))
    assert(r("large") == ((1L, 1L)))
  }

  test("window_range: RANGE frame includes same-day peers, 30-day edge is inclusive") {
    val d = ordersDir(
      (1L, 7L, "O", 10.0, "1995-01-01 00:00:00", "x"), // day 0
      (2L, 7L, "O", 20.0, "1995-01-01 00:00:00", "x"), // day 0 peer
      (3L, 7L, "O", 40.0, "1995-01-31 00:00:00", "x"), // day 30: 0 in range
      (4L, 7L, "O", 80.0, "1995-02-01 00:00:00", "x")) // day 31: 0 out of range
    val r = Analytics.windowRange(spark, d).collect()
      .map(x => x.getLong(1) -> x.getDouble(3)).toMap
    assert(r(1L) == 30.0) // both day-0 rows are peers of each other
    assert(r(2L) == 30.0)
    assert(r(3L) == 70.0) // day 30 still sees day 0 (30-30=0 ≥ frame start)
    assert(r(4L) == 120.0) // day 31 drops day 0, keeps day 30
  }

  test("gaps_islands: adjacency splits on gaps and on non-open orders") {
    val d = ordersDir(
      (1L, 1L, "O", 1.0, "1995-01-01 00:00:00", "x"),
      (2L, 1L, "O", 1.0, "1995-01-01 00:00:00", "x"),
      (3L, 1L, "O", 1.0, "1995-01-01 00:00:00", "x"),
      (4L, 1L, "F", 1.0, "1995-01-01 00:00:00", "x"), // gap: not status O
      (5L, 1L, "O", 1.0, "1995-01-01 00:00:00", "x"), // singleton island
      (7L, 1L, "O", 1.0, "1995-01-01 00:00:00", "x"),
      (8L, 1L, "O", 1.0, "1995-01-01 00:00:00", "x"))
    val r = Analytics.gapsIslands(spark, d).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq
    assert(r == Seq((1L, 3L, 3L), (5L, 5L, 1L), (7L, 8L, 2L)))
  }

  test("gaps_islands: an island spanning every range partition reunites into one row") {
    // 60 consecutive keys force the island across all 4 test range
    // partitions (~15 rows each): the distributed row_number's prefix
    // stitch must make key − rn identical on every side of every
    // boundary, or the island fragments at each range edge. Flanked by
    // a singleton on each end so off-by-one prefix errors shift a
    // detectable boundary. The size gate is forced BOTH ways: the
    // distributed stitch (conf 0) and the default global window must
    // emit identical rows.
    val keys = Seq(1L) ++ (10L to 69L) ++ Seq(100L)
    val d = ordersDir(keys.map(k =>
      (k, 1L, "O", 1.0, "1995-01-01 00:00:00", "x")): _*)
    def run(): Seq[(Long, Long, Long)] = Analytics.gapsIslands(spark, d)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq
    val want = Seq((1L, 1L, 1L), (10L, 69L, 60L), (100L, 100L, 1L))
    assert(run() == want) // default: under the gate, global window
    spark.conf.set("graft.islands.distributedMinRows", "0")
    try assert(run() == want) // forced distributed stitch
    finally spark.conf.unset("graft.islands.distributedMinRows")
  }

  test("gaps_islands: empty input emits zero islands on both branches") {
    // no open orders at all — the distributed branch's range shuffle,
    // per-partition counts, and prefix fold must all tolerate the
    // degenerate relation (an all-F corpus is a legal input)
    val d = ordersDir((1L, 1L, "F", 1.0, "1995-01-01 00:00:00", "x"))
    assert(Analytics.gapsIslands(spark, d).collect().isEmpty)
    spark.conf.set("graft.islands.distributedMinRows", "0")
    try assert(Analytics.gapsIslands(spark, d).collect().isEmpty)
    finally spark.conf.unset("graft.islands.distributedMinRows")
  }

  test("histogram: bucket edges are left-inclusive and the top bucket caps") {
    val d = ordersDir(
      (1L, 1L, "O", 0.0, "1995-01-01 00:00:00", "x"),       // bucket 0
      (2L, 1L, "O", 59999.9999, "1995-01-01 00:00:00", "x"), // bucket 0
      (3L, 1L, "O", 60000.0, "1995-01-01 00:00:00", "x"),    // bucket 1 (edge)
      (4L, 1L, "O", 540000.0, "1995-01-01 00:00:00", "x"),   // bucket 9
      (5L, 1L, "O", 5000000.0, "1995-01-01 00:00:00", "x"))  // capped at 9
    val r = Analytics.histogram(spark, d).collect()
      .map(x => x.getInt(0) -> x.getLong(1)).toMap
    assert(r == Map(0 -> 2L, 1 -> 1L, 9 -> 2L))
  }

  test("union_by_name: missing column becomes null, counted null-aware") {
    val d = fixtureDir("events" -> Seq(
      (1L, ts("2024-01-01 00:00:00"), 10L, "signup", 1.5, "{}"),
      (2L, ts("2024-01-01 00:00:01"), 11L, "purchase", 2.5, "{}"),
      (3L, ts("2024-01-01 00:00:02"), 12L, "purchase", 4.0, "{}"),
      (4L, ts("2024-01-01 00:00:03"), 13L, "error", 99.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val r = Analytics.unionByName(spark, d).collect()(0)
    assert(r.getLong(0) == 3L)       // error row excluded
    assert(r.getLong(1) == 1L)       // only the signup side carries user_id
    assert(r.getDouble(2) == 8.0)    // 1.5 + 2.5 + 4.0
  }

  test("range_join: band edges are lo-inclusive, hi-exclusive") {
    val d = fixtureDir("events" -> Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "a", 99.9999, "{}"),
      (2L, ts("2024-01-01 00:00:01"), 1L, "a", 100.0, "{}"),  // exactly lo of mid
      (3L, ts("2024-01-01 00:00:02"), 1L, "a", 249.9999, "{}"),
      (4L, ts("2024-01-01 00:00:03"), 1L, "a", 250.0, "{}"),  // exactly lo of large
      (5L, ts("2024-01-01 00:00:04"), 1L, "a", -5.0, "{}")    // below every band
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val r = Analytics.rangeJoin(spark, d).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r == Map("p00_small" -> 1L, "p01_mid" -> 2L, "p02_large" -> 1L))
  }

  test("dedup_keepfirst: min doc_id survives with the full group size") {
    val txt = "alpha beta gamma"
    val d = fixtureDir("documents" -> Seq(
      (5L, txt, "en", "s", 16L),
      (2L, txt, "en", "s", 16L),
      (9L, txt, "de", "s", 16L),  // same text, different lang: still one group
      (1L, "other", "fr", "s", 5L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val r = Analytics.dedupKeepFirst(spark, d).collect()
      .map(x => (x.getLong(0), x.getLong(3))).toSeq
    assert(r == Seq((1L, 1L), (2L, 3L)))
  }

  test("hash_sample is deterministic and equals the manual md5 predicate") {
    val d = sf("sf0.001")
    val a = Analytics.hashSample(spark, d).collect().toSeq
    val b = Analytics.hashSample(spark, d).collect().toSeq
    assert(a == b && a.nonEmpty)
    val expectKeys = Tables.orders(spark, d).select("o_orderkey").collect()
      .map(_.getLong(0))
      .count { k =>
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(k.toString.getBytes("UTF-8"))
        "%02x".format(md(0)).startsWith("0")
      }
    assert(a.map(_.getLong(1)).sum == expectKeys)
  }

  test("pair_groups (flatMapGroups) ≡ declarative conditional-agg pairing") {
    val d = sf("sf0.001")
    val a = Pairing.pairGroups(spark, d).collect().toSeq.map(_.toSeq)
    val b = Pairing.pairMatch(spark, d).collect().toSeq.map(_.toSeq)
    assert(a == b)
  }

  test("from_json PERMISSIVE: garbage → all-null struct (not null, not a failure)") {
    val d = fixtureDir("events" -> Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "a", 1.0, """{"k": 7}"""),
      (2L, ts("2024-01-01 00:00:01"), 1L, "a", 1.0, "{definitely not json"),
      (3L, ts("2024-01-01 00:00:02"), 1L, "a", 1.0, null)
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val r = Pairing.fromJson(spark, d).collect()
      .map(x => x.getLong(0) -> (Option(x.get(1)), x.getBoolean(2))).toMap
    assert(r(1L) == ((Some(7), false)))   // parsed
    assert(r(2L) == ((None, false)))      // garbage: all-null struct, query alive
    assert(r(3L) == ((None, true)))       // SQL-NULL input is the flagged case
  }

  test("minmax_by: tie-break stays injective beyond the 1e6 key range") {
    // keys above 1e6 would collide under a scaled-arithmetic measure;
    // the struct (price, key) ordering cannot
    val d = ordersDir(
      (1000000005L, 1L, "O", 500.0, "1995-01-01 00:00:00", "1-URGENT"),
      (1000000002L, 1L, "O", 500.0, "1995-01-02 00:00:00", "1-URGENT"),
      (999999999L, 1L, "O", 499.9999, "1995-01-03 00:00:00", "1-URGENT"))
    val r = Analytics.minmaxBy(spark, d).collect()(0)
    assert(r.getLong(1) == 1000000005L) // max (price, key)
    assert(r.getLong(3) == 999999999L)  // min (price, key)
  }

  test("date_funcs: add_months clamps to month end; weekday is Monday=0") {
    val d = ordersDir(
      (1L, 1L, "O", 1.0, "1997-01-31 00:00:00", "x"),  // +3m → Apr 30
      (2L, 1L, "O", 1.0, "1997-06-02 00:00:00", "x"))  // a Monday
    val r = Catalog.dateFuncs(spark, d).collect()
      .map(x => x.getLong(0) -> x).toMap
    val aprilEnd = ts("1997-04-30 00:00:00").getTime
    assert(r(1L).getLong(5) == aprilEnd)   // plus3m_ms clamped
    assert(r(2L).getInt(3) == 0)           // Monday → 0
  }

  test("q_approx_distinct: HLL estimate within its error bound of the exact count") {
    // the one declared query with no SQL oracle gets a hard property
    // check instead: approx_count_distinct's default rsd is 5 %, and the
    // sketch is deterministic for fixed input — 4·rsd is a firm bound
    // (observed error here is well under 1·rsd).
    val dir = sf("sf0.01")
    val approx = Relational.approxDistinct(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.nonEmpty && exact.keySet == approx.keySet)
    exact.foreach { case (k, ex) =>
      val err = math.abs(approx(k).toDouble - ex)
      assert(err <= math.max(4 * 0.05 * ex, 2.0),
        s"$k: approx=${approx(k)} exact=$ex err=$err")
    }
  }

  test("q_approx_quantile: sketch lands between the exact ±1%-rank order stats") {
    // approx_percentile(…, accuracy=1000) guarantees rank error ≤
    // n/1000; the exact percentiles at q ± 0.01 are therefore firm
    // brackets (10× the sketch's worst case).
    val dir = sf("sf0.01")
    val approx = Relational.approxQuantile(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val bounds = graft.Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(expr("percentile(o_totalprice, 0.49)").as("p49"),
        expr("percentile(o_totalprice, 0.51)").as("p51"),
        expr("percentile(o_totalprice, 0.89)").as("p89"),
        expr("percentile(o_totalprice, 0.91)").as("p91"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(bounds.nonEmpty && bounds.keySet == approx.keySet)
    bounds.foreach { case (k, (p49, p51, p89, p91)) =>
      val (a50, a90) = approx(k)
      assert(a50 >= p49 && a50 <= p51, s"$k p50: $a50 not in [$p49, $p51]")
      assert(a90 >= p89 && a90 <= p91, s"$k p90: $a90 not in [$p89, $p91]")
    }
  }

  test("ewma_smooth: leading edge renormalizes over present taps; same-minute events pre-sum") {
    // one type, minutes 0/1/2 with per-minute totals 1.0 / 2.0 / 4.0
    // (minute 0 arrives as two 0.5 events — the pre-aggregation must
    // fold them before the smoother sees the series). Hand-computed
    // α=1/2 8-tap EWMA with leading-edge renormalization:
    //   m0: 1.0 (only its own tap)
    //   m1: (2·128 + 1·64)/(192) · 1e-? → 3200000/1920000 = 1.666667
    //   m2: (4·128 + 2·64 + 1·32)/224  → 6720000/2240000 = 3.0
    val d = fixtureDir("events" -> Seq(
      (1L, ts("2024-01-01 00:00:10"), 1L, "a", 0.5, "{}"),
      (2L, ts("2024-01-01 00:00:40"), 2L, "a", 0.5, "{}"),
      (3L, ts("2024-01-01 00:01:10"), 1L, "a", 2.0, "{}"),
      (4L, ts("2024-01-01 00:02:10"), 1L, "a", 4.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val r = Analytics.ewmaSmooth(spark, d).collect()
      .map(x => (x.getDouble(2), x.getDouble(3)))
    assert(r.toSeq == Seq((1.0, 1.0), (2.0, 1.666667), (4.0, 3.0)))
  }

  test("skyline: dominated drop, ties co-survive, candidate union is complete under partitioning") {
    // crafted suppliers: (bal, vol) frontier is {(9, 10), (5, 50),
    // (5, 50) tie, (1, 99)}; (5, 40) is dominated by the (5, 50) pair
    // (equal bal, higher vol) and (8, 9) by (9, 10) (both axes).
    // Volumes come from one lineitem row each (quantity = vol).
    val sup = Seq(
      (1L, "s1", 1, 9.0), (2L, "s2", 1, 5.0), (3L, "s3", 1, 5.0),
      (4L, "s4", 1, 1.0), (5L, "s5", 1, 5.0), (6L, "s6", 1, 8.0)
    ).toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    val vols = Map(1L -> 10.0, 2L -> 50.0, 3L -> 50.0, 4L -> 99.0,
      5L -> 40.0, 6L -> 9.0)
    val li = vols.toSeq.map { case (k, q) =>
      (k, k, k, 1, q, 1.0, 0.0, 0.0, "N", "O", ts("2024-01-01 00:00:00"))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
    val d = fixtureDir("supplier" -> sup.repartition(4), "lineitem" -> li)
    val got = graft.operators.Scale.skyline(spark, d).collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == Seq((1L, 9.0, 10.0), (2L, 5.0, 50.0),
      (3L, 5.0, 50.0), (4L, 1.0, 99.0)))
    // completeness under partitioning, the heavy-hitters-style proof,
    // checked against driver-side brute force on a random multi-
    // partition corpus
    val rnd = new scala.util.Random(5)
    val pts = (1L to 60L).map(i => (i, rnd.nextInt(40).toDouble, rnd.nextInt(40).toDouble))
    val sup2 = pts.map { case (i, b, _) => (i, s"s$i", 1, b) }
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    val li2 = pts.map { case (i, _, v) =>
      (i, i, i, 1, v, 1.0, 0.0, 0.0, "N", "O", ts("2024-01-01 00:00:00"))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
    val d2 = fixtureDir("supplier" -> sup2.repartition(4), "lineitem" -> li2)
    val got2 = graft.operators.Scale.skyline(spark, d2).collect()
      .map(r => r.getLong(0)).toSet
    val want2 = pts.filter { case (i, b, v) =>
      !pts.exists { case (j, b2, v2) =>
        j != i && b2 >= b && v2 >= v && (b2 > b || v2 > v)
      }
    }.map(_._1).toSet
    assert(got2 == want2)
  }

  test("skyline: size-gated fallback sweep is row-identical to the broadcast anti-join on anti-correlated data") {
    // the broadcast guard's worst case: (bal, vol) perfectly anti-
    // correlated, so EVERY undominated point is on the frontier and
    // the candidate union is ~the whole relation — plus equal-balance
    // ties (co-survive iff volumes tie too) and dominated-in-group
    // rows to exercise the sweep's group logic at every edge
    val pts = (1L to 40L).map(i => (i, i.toDouble, (41 - i).toDouble)) ++ Seq(
      (41L, 20.0, 21.0),  // ties (20, 21): co-survives with id 20
      (42L, 20.0, 5.0),   // equal bal, lower vol: dominated in-group
      (43L, 10.0, 10.0))  // dominated on both axes by (20, 21)
    val sup = pts.map { case (i, b, _) => (i, s"s$i", 1, b) }
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    val li = pts.map { case (i, _, v) =>
      (i, i, i, 1, v, 1.0, 0.0, 0.0, "N", "O", ts("2024-01-01 00:00:00"))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
    val d = fixtureDir("supplier" -> sup.repartition(4), "lineitem" -> li)
    def run(): Seq[(Long, Double, Double)] =
      graft.operators.Scale.skyline(spark, d).collect()
        .map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3))).toSeq
    val viaBroadcast = run()
    spark.conf.set("graft.skyline.broadcastMaxCands", "0")
    val viaSweep = try run()
      finally spark.conf.unset("graft.skyline.broadcastMaxCands")
    assert(viaSweep == viaBroadcast)
    // and both match driver-side brute force
    val want = pts.filter { case (i, b, v) =>
      !pts.exists { case (j, b2, v2) =>
        j != i && b2 >= b && v2 >= v && (b2 > b || v2 > v)
      }
    }.map(_._1).toSet
    assert(viaSweep.map(_._1).toSet == want)
    assert(viaSweep.map(_._1).contains(41L) && viaSweep.map(_._1).contains(20L))
  }

  test("skyline: empty relation emits an empty frontier on both branches") {
    // a supplier with no lineitems joins to nothing → the candidate
    // relation is empty; the distributed sweep's group-max, range
    // shuffle, partition maxima, and prefix fold must all tolerate it
    val sup = Seq((1L, "s1", 1, 10.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    val li = Seq.empty[(Long, Long, Long, Int, Double, Double, Double,
        Double, String, String, java.sql.Timestamp)]
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
    val d = fixtureDir("supplier" -> sup, "lineitem" -> li)
    assert(graft.operators.Scale.skyline(spark, d).collect().isEmpty)
    spark.conf.set("graft.skyline.broadcastMaxCands", "0")
    try assert(graft.operators.Scale.skyline(spark, d).collect().isEmpty)
    finally spark.conf.unset("graft.skyline.broadcastMaxCands")
  }
}
