package graft

import org.apache.spark.sql.DataFrame

import graft.operators.{Analytics, Pairing, Relational, Reshape, Scale, Sources, TypedPairing}

/** Cross-formulation equivalence: independent implementations of the
  * same semantics must agree row-for-row on the real testdata — the
  * in-JVM analog of the DuckDB oracle compare. */
class EquivalenceSpec extends SparkSpec {

  private val d = sf("sf0.001")

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("salted join ≡ plain join (salting must not change the answer)") {
    val plain = Tables.lineitem(spark, d)
      .join(Tables.orders(spark, d),
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_lines"),
        graft.operators.Det.dsum(
          org.apache.spark.sql.functions.col("l_extendedprice")).as("revenue"))
      .orderBy("o_orderpriority")
    assert(rows(Scale.saltedJoin(spark, d)) == rows(plain))
  }

  test("typed Aggregator ≡ conditional-agg pairing ≡ streaming pairing") {
    val a = rows(TypedPairing.pairTyped(spark, d))
    val b = rows(Pairing.pairMatch(spark, d))
    val c = rows(graft.streaming.EventPairing.sPairMatch(spark, d))
    assert(a == b && b == c)
  }

  test("custom TopKPerKey ≡ window row_number formulation") {
    assert(rows(Relational.topKCustom(spark, d)) == rows(Relational.windowRank(spark, d)))
  }

  test("file round trips preserve the exact rows") {
    import org.apache.spark.sql.functions._
    val src = Tables.events(spark, d).select(
      col("event_id"), col("user_id"), col("event_type"),
      unix_millis(col("ts")).as("ts_ms"), col("value")).orderBy("event_id")
    assert(rows(Sources.jsonRoundtrip(spark, d)) == rows(src))
    assert(rows(Sources.csvRoundtrip(spark, d)) == rows(src))
  }

  test("unpivot is the inverse reshape of pivot") {
    val melted = rows(Reshape.unpivot(spark, d))
    val wide = Reshape.pivot(spark, d).collect()
    val expect = wide.flatMap { r =>
      Seq("F", "O", "P").map(st =>
        Seq[Any](r.getString(0), st, r.getLong(r.fieldIndex(st))))
    }.sortBy(s => (s(0).toString, s(1).toString)).toSeq
    assert(melted == expect)
  }

  test("TopKPerKey edges: k beyond group size ranks every row; empty input yields empty") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val tiny = Seq((1L, 10.0), (1L, 20.0), (2L, 5.0)).toDF("k", "v")
    val dir = fixtureDir("orders" -> tiny.select(
      col("k").as("o_custkey"), col("v").as("o_totalprice"),
      col("k").as("o_orderkey"), lit("O").as("o_orderstatus"),
      lit("1-URGENT").as("o_orderpriority"),
      lit(new java.sql.Timestamp(0)).as("o_orderdate")))
    val all = graft.plans.TopK.topKPerKey(
      Tables.orders(spark, dir), Seq("o_custkey"),
      Seq(("o_totalprice", true)), k = 10).collect()
    assert(all.length == 3) // k=10 > any group: every row survives, ranked
    assert(all.map(r => (r.getLong(r.fieldIndex("o_custkey")),
      r.getInt(r.fieldIndex("rn")))).toSet == Set((1L, 1), (1L, 2), (2L, 1)))

    val none = graft.plans.TopK.topKPerKey(
      Tables.orders(spark, dir).filter(col("o_custkey") < 0),
      Seq("o_custkey"), Seq(("o_totalprice", true)), k = 3).collect()
    assert(none.isEmpty)
  }

  test("IVF results are a subset of brute-force cosine ranking (probing loses, never invents)") {
    val brute = graft.operators.Similarity.knn(spark, d).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ivf = graft.operators.Similarity.ivf(spark, d).collect()
    ivf.foreach { r =>
      // any IVF hit must carry the same cosine the exact path computes
      brute.get(r.getLong(0)).foreach(c => assert(c == r.getDouble(2)))
    }
  }

  test("streaming variants ≡ their batch twins on one ingest") {
    import org.apache.spark.sql.functions._
    val ms = graft.streaming.MoreStreaming

    assert(rows(ms.sSlidingAgg(spark, d)) ==
      rows(graft.operators.Temporal.slidingWindow(spark, d)))
    assert(rows(ms.sSession(spark, d)) ==
      rows(graft.operators.Temporal.sessionWindow(spark, d)))
    assert(rows(ms.sDedup(spark, d)) ==
      rows(Tables.events(spark, d).select(col("user_id"), col("event_type"))
        .distinct().orderBy("user_id", "event_type")))
    assert(rows(ms.sCompleteAgg(spark, d)) ==
      rows(Tables.events(spark, d).groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          unix_millis(min(col("ts"))).as("first_ms"),
          unix_millis(max(col("ts"))).as("last_ms"))
        .orderBy("event_type")))
    assert(rows(ms.sForeachSink(spark, d)) ==
      rows(Tables.events(spark, d).filter(col("value") > 100.0)
        .select(col("event_id"), col("value")).orderBy("event_id")))
  }

  test("funnel: stages count at-or-after the previous stage only") {
    import spark.implicits._
    def e(id: Long, ms: Long, u: Long, t: String) =
      (id, new java.sql.Timestamp(ms), u, t, 0.0, null: String)
    val dir = fixtureDir("events" -> Seq(
      e(1, 1000, 1, "view"), e(2, 2000, 1, "signup"), e(3, 3000, 1, "purchase"),
      // user 2: purchase BEFORE signup → purchased must NOT count
      e(4, 1000, 2, "view"), e(5, 3000, 2, "signup"), e(6, 2000, 2, "purchase"),
      // user 3: signup before the first view → signup must NOT count
      e(7, 2000, 3, "signup"), e(8, 3000, 3, "view"),
      // user 4: never enters the funnel
      e(9, 1000, 4, "error"),
      // user 5: all three stages at the SAME ts — >= boundary includes them
      e(10, 1000, 5, "view"), e(11, 1000, 5, "signup"), e(12, 1000, 5, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val r = Analytics.funnel(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((5L, 4L, 3L, 2L)))
  }

  test("table checksum: invariant to row order/partitioning, sensitive to one cell") {
    import spark.implicits._
    val rows = Seq(
      (1L, 1, 1.0, "A", "F"), (2L, 1, 2.5, "R", "O"), (3L, 2, 3.0, "N", "F"))
    def dirOf(rs: Seq[(Long, Int, Double, String, String)], parts: Int) =
      fixtureDir("lineitem" -> rs
        .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_linestatus")
        .repartition(parts))
    def sum(d: String) = Scale.tableChecksum(spark, d).collect().head.getLong(1)
    val base = sum(dirOf(rows, 1))
    assert(base == sum(dirOf(rows.reverse, 3)))   // order + partitioning free
    val touched = rows.updated(1, (2L, 1, 2.51, "R", "O"))
    assert(base != sum(dirOf(touched, 1)))        // one cell flips the sum
  }

  test("null-safe join: the NULL<=>NULL group survives with real pairs") {
    val r = Relational.nullsafeJoin(spark, d).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    // plain `=` would silently drop exactly this group
    assert(r.keySet == Set("1", "2", "3", "4", "5", "6", "NULL"), r)
    assert(r("NULL") > 0)
  }

  test("fixed-point pagerank ≡ driver-side integer model on a crafted graph") {
    import spark.implicits._
    val dir = fixtureDir(
      "orders" -> Seq((100L, 1L), (101L, 1L), (102L, 2L))
        .toDF("o_orderkey", "o_custkey"),
      "lineitem" -> Seq((100L, 1L), (101L, 2L), (102L, 2L))
        .toDF("l_orderkey", "l_suppkey"))
    // pairs: c1–s1, c1–s2, c2–s2 → node ids c=2k, s=2k+1
    val got = graft.operators.Graph.pagerank(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges = Set((2L, 3L), (2L, 5L), (4L, 5L))
      .toSeq.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n = deg.size.toLong
    var rank = deg.keys.map(_ -> 1000000000000L / n).toMap
    for (_ <- 1 to 3) {
      val in = edges.groupBy(_._2).view
        .mapValues(_.map { case (s, _) => rank(s) / deg(s) }.sum).toMap
      rank = in.map { case (v, m) => v -> (150000000000L / n + 85L * m / 100L) }
    }
    assert(got == rank) // exact, to the 1e-12 unit
    // floor division only ever LOSES mass, and not much of it
    assert(rank.values.sum <= 1000000000000L &&
      rank.values.sum >= 1000000000000L * 99L / 100L)
  }

  test("streaming upsert sink converges to the one-shot batch merge") {
    // the two-micro-batch foreachBatch apply must land on exactly the
    // state the single full-outer merge computes (per-action fixed-point
    // sums add exactly in double: integers ≪ 2^53)
    val st = rows(graft.streaming.MoreStreaming.sUpsertSink(spark, d)).head
    val live = Scale.upsertMerge(spark, d).collect()
      .filter(_.getString(0) != "delete")
    // re-scale each per-action sum to its exact fixed-point long before
    // adding (the /1e4 edge division is the only inexact step)
    val sumFp = live.map(r => Math.round(r.getDouble(2) * 10000)).sum
    assert(st(0) == live.map(_.getLong(1)).sum)                    // n_rows
    assert(st(1) == sumFp.toDouble / 10000.0)                      // sum_price
    assert(st(2) == live.map(_.getLong(3)).min)                    // min_k
    assert(st(3) == live.map(_.getLong(4)).max)                    // max_k
  }

  test("Misra-Gries heavy hitters ≡ brute force under forced decrements (k=2)") {
    import spark.implicits._
    // vocab (7) ≫ k (2): the counter-eviction path MUST run; 'x' holds
    // 8/14 > total/(k+1) and must survive eviction in every partition
    val docs = Seq(
      (1L, "x a x b x c x", "en", "s", 1L),
      (2L, "x d x e x f x", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = fixtureDir("documents" -> docs)
    val got = Scale.heavyHitters(spark, dir, 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("x", 8L, 14L))) // exact count, not the MG estimate
    // and the generic-k path agrees with a driver-side brute force
    val brute = "x a x b x c x x d x e x f x".split(" ")
      .groupBy(identity).view.mapValues(_.length.toLong)
      .filter { case (_, c) => c * 3 > 14 }.keys.toSeq
    assert(got.map(_._1) == brute)
  }

  test("upsert merge pins all four actions (keep/update/delete/insert)") {
    import spark.implicits._
    val dir = fixtureDir("orders" -> Seq(
      (10L, 1000.0), (11L, 2000.0), (12L, 3000.0), (13L, 4000.0))
      .toDF("o_orderkey", "o_totalprice"))
    val r = Scale.upsertMerge(spark, dir).collect()
      .map(x => x.getString(0) ->
        ((x.getLong(1), Option(x.get(2)), x.getLong(3), x.getLong(4)))).toMap
    // key 12 keeps its base row too — its change lands on a NEW key
    assert(r("keep") == ((2L, Some(7000.0), 12L, 13L)))
    assert(r("update") == ((1L, Some(1100.0), 10L, 10L)))   // 1000 + 100
    assert(r("delete") == ((1L, None, 11L, 11L)))           // tombstoned: no price
    assert(r("insert") == ((1L, Some(3100.0), 100000012L, 100000012L)))
  }

  test("incremental agg merges a partial present in only one batch") {
    import spark.implicits._
    // type 'solo' exists only among even event_ids: the union+re-agg
    // must surface it from a single partial without a null-identity bug
    val dir = fixtureDir("events" -> Seq(
      (2L, "solo", 10.0), (4L, "solo", 20.0),
      (1L, "both", 1.0), (2L + 4L, "both", 3.0))
      .map { case (id, t, v) =>
        (id, new java.sql.Timestamp(id * 1000), id, t, v, null: String)
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val r = Scale.incrementalAgg(spark, dir).collect()
      .map(x => x.getString(0) ->
        ((x.getLong(1), x.getDouble(2), x.getDouble(3), x.getDouble(4), x.getDouble(5)))).toMap
    assert(r("solo") == ((2L, 30.0, 10.0, 20.0, 15.0)))
    assert(r("both") == ((2L, 4.0, 1.0, 3.0, 2.0)))
  }
}
