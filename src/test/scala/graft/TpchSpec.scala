package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

import graft.operators.Tpch

/** Crafted-fixture specs for the round-9 TPC-H shapes — each pins the
  * boundary the organic testdata passes only in aggregate (q21 is
  * EMPTY at sf0.001, so without these a broken semi/anti could match
  * its oracle by shared emptiness). */
class TpchSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def lineitemDF(rows: Seq[(Long, Long, Long, Int, Double, Double, Double, Double, String, String, Timestamp)]): DataFrame =
    rows.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")

  private def ordersDF(rows: Seq[(Long, Long, String, Double, Timestamp, String)]): DataFrame =
    rows.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")

  test("q13: zero-order customers land in the 0 bucket; urgent orders excluded inside the join") {
    // c1: two qualifying + one URGENT (excluded by the join condition,
    // NOT a post-join where — a where would drop c1's row entirely);
    // c2: only an URGENT order → must count 0, not vanish; c3: no
    // orders at all → the LEFT OUTER's null row → 0.
    val cust = Seq(
      (1L, "c1", 1, 10.0, "SEG"), (2L, "c2", 1, 10.0, "SEG"),
      (3L, "c3", 1, 10.0, "SEG")
    ).toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val ord = ordersDF(Seq(
      (101L, 1L, "O", 1.0, ts("2024-01-01 00:00:00"), "3-MEDIUM"),
      (102L, 1L, "O", 1.0, ts("2024-01-02 00:00:00"), "5-LOW"),
      (103L, 1L, "O", 1.0, ts("2024-01-03 00:00:00"), "1-URGENT"),
      (104L, 2L, "O", 1.0, ts("2024-01-04 00:00:00"), "1-URGENT")))
    val d = fixtureDir("customer" -> cust, "orders" -> ord)
    val got = Tpch.q13Shape(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((0L, 2L), (2L, 1L)))
  }

  test("q17: the 0.2*avg threshold is per-part and STRICT — an at-threshold line is excluded") {
    // part 1 (Brand#1, size 5): quantities sum to 60 over 6 lines →
    // avg exactly 10.0 on the fixed-point grid, threshold 2.0; the
    // qty-2.0 line sits EXACTLY at it (excluded: strict <), only the
    // qty-1.9 line (price 70) qualifies → 70/7 = 10.0. Part 2 has a
    // qty-0.1 line but the wrong brand — the filter must keep it out.
    val part = Seq(
      (1L, "p1", "Brand#1", "PROMO", 5, 1.0),
      (2L, "p2", "Brand#2", "PROMO", 5, 1.0)
    ).toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
    val li = lineitemDF(Seq(
      (1L, 1L, 1L, 1, 2.0, 35.0, 0.0, 0.0, "N", "O", ts("2024-01-01 00:00:00")),
      (2L, 1L, 1L, 1, 1.9, 70.0, 0.0, 0.0, "N", "O", ts("2024-01-01 00:00:00")),
      (3L, 1L, 1L, 1, 5.0, 1.0, 0.0, 0.0, "N", "O", ts("2024-01-01 00:00:00")),
      (4L, 1L, 1L, 1, 5.0, 1.0, 0.0, 0.0, "N", "O", ts("2024-01-01 00:00:00")),
      (5L, 1L, 1L, 1, 10.0, 1.0, 0.0, 0.0, "N", "O", ts("2024-01-01 00:00:00")),
      (6L, 1L, 1L, 1, 36.1, 1.0, 0.0, 0.0, "N", "O", ts("2024-01-01 00:00:00")),
      (7L, 2L, 1L, 1, 0.1, 999.0, 0.0, 0.0, "N", "O", ts("2024-01-01 00:00:00"))))
    val d = fixtureDir("part" -> part, "lineitem" -> li)
    val got = Tpch.q17Shape(spark, d).collect()
    assert(got.length == 1)
    assert(got(0).getDouble(0) == 10.0, got(0))
  }

  test("q21: only-late supplier of a multi-supplier F order; co-late and solo orders drop; per-LINE count") {
    // order 1 (F): s1 late, s2 on time            → s1 qualifies (1 line)
    // order 2 (F): s1 late, s2 late               → NOT EXISTS kills both
    // order 3 (F): s1 late, sole supplier         → EXISTS kills it
    // order 4 (O): s1 late, s2 on time            → status filter kills it
    // order 5 (F): s3 late TWICE, s2 on time      → s3 qualifies, numwait 2
    // s4 qualifies on order 6 but sits in NATION_2 → nation filter kills it
    val base = ts("2024-01-01 00:00:00")
    val late = ts("2024-03-15 00:00:00") // > +60 days
    val fine = ts("2024-01-15 00:00:00")
    val ord = ordersDF(Seq(
      (1L, 1L, "F", 1.0, base, "3-MEDIUM"),
      (2L, 1L, "F", 1.0, base, "3-MEDIUM"),
      (3L, 1L, "F", 1.0, base, "3-MEDIUM"),
      (4L, 1L, "O", 1.0, base, "3-MEDIUM"),
      (5L, 1L, "F", 1.0, base, "3-MEDIUM"),
      (6L, 1L, "F", 1.0, base, "3-MEDIUM")))
    val li = lineitemDF(Seq(
      (1L, 1L, 1L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", late),
      (1L, 1L, 2L, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", fine),
      (2L, 1L, 1L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", late),
      (2L, 1L, 2L, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", late),
      (3L, 1L, 1L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", late),
      (4L, 1L, 1L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", late),
      (4L, 1L, 2L, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", fine),
      (5L, 1L, 3L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", late),
      (5L, 1L, 3L, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", late),
      (5L, 1L, 2L, 3, 1.0, 1.0, 0.0, 0.0, "N", "O", fine),
      (6L, 1L, 4L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", late),
      (6L, 1L, 2L, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", fine)))
    val sup = Seq(
      (1L, "s1", 1, 0.0), (2L, "s2", 1, 0.0), (3L, "s3", 1, 0.0),
      (4L, "s4", 2, 0.0)
    ).toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    val nat = Seq((1, "NATION_1", 0), (2, "NATION_2", 0))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val d = fixtureDir("orders" -> ord, "lineitem" -> li,
      "supplier" -> sup, "nation" -> nat)
    val got = Tpch.q21Shape(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("s3", 2L), ("s1", 1L)))
  }

  test("q8: nation's two roles stay apart — region gates the CUSTOMER, share follows the SUPPLIER") {
    // n0 is in AMERICA (customer side qualifies), n1/n2 are not; the
    // share nation NATION_1 is a SUPPLIER nation outside the region —
    // a single-role nation join would zero the share or the total.
    // Excluded by exactly one dimension each: o3 (customer region),
    // o4 (date window), p2 line (part type).
    val reg = Seq((0, "AMERICA"), (1, "EUROPE")).toDF("r_regionkey", "r_name")
    val nat = Seq((0, "NATION_0", 0), (1, "NATION_1", 1), (2, "NATION_2", 1))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val cust = Seq((1L, "c1", 0, 0.0, "SEG"), (2L, "c2", 1, 0.0, "SEG"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val sup = Seq((1L, "s1", 1, 0.0), (2L, "s2", 2, 0.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    val part = Seq(
      (1L, "red widget", "Brand#1", "ECONOMY", 5, 1.0),
      (2L, "blue bolt", "Brand#1", "PROMO", 5, 1.0)
    ).toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
    val ord = ordersDF(Seq(
      (1L, 1L, "O", 1.0, ts("1995-03-01 00:00:00"), "3-MEDIUM"),
      (2L, 1L, "O", 1.0, ts("1996-03-01 00:00:00"), "3-MEDIUM"),
      (3L, 2L, "O", 1.0, ts("1995-05-01 00:00:00"), "3-MEDIUM"),
      (4L, 1L, "O", 1.0, ts("1997-02-01 00:00:00"), "3-MEDIUM")))
    val li = lineitemDF(Seq(
      (1L, 1L, 1L, 1, 1.0, 100.0, 0.0, 0.0, "N", "O", ts("1995-03-05 00:00:00")),
      (1L, 1L, 2L, 2, 1.0, 50.0, 0.0, 0.0, "N", "O", ts("1995-03-05 00:00:00")),
      (2L, 1L, 1L, 1, 1.0, 30.0, 0.5, 0.0, "N", "O", ts("1996-03-05 00:00:00")),
      (2L, 1L, 2L, 2, 1.0, 10.0, 0.0, 0.0, "N", "O", ts("1996-03-05 00:00:00")),
      (3L, 1L, 1L, 1, 1.0, 999.0, 0.0, 0.0, "N", "O", ts("1995-05-05 00:00:00")),
      (4L, 1L, 1L, 1, 1.0, 999.0, 0.0, 0.0, "N", "O", ts("1997-02-05 00:00:00")),
      (1L, 2L, 1L, 3, 1.0, 999.0, 0.0, 0.0, "N", "O", ts("1995-03-05 00:00:00"))))
    val d = fixtureDir("region" -> reg, "nation" -> nat, "customer" -> cust,
      "supplier" -> sup, "part" -> part, "orders" -> ord, "lineitem" -> li)
    val got = Tpch.q8(spark, d).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(got == Seq(
      (1995, 100.0, 150.0, 100.0 / 150.0),
      (1996, 15.0, 25.0, 15.0 / 25.0)))
  }

  test("q9: profit is rev minus retail*qty (negative allowed) and the name filter is SUBSTRING contains") {
    // p2 'bored gear' contains 'red' — the spec's '%green%' is a
    // substring, not a word match; p3 'blue bolt' is out. s2's single
    // line loses money (1.0 revenue vs 2.0 cost) — profit may be
    // negative and the group must still emit. Order: nation ASC,
    // year DESC.
    val nat = Seq((0, "NATION_0", 0), (1, "NATION_1", 0))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val sup = Seq((1L, "s1", 0, 0.0), (2L, "s2", 1, 0.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    val part = Seq(
      (1L, "red widget", "Brand#1", "ECONOMY", 5, 2.0),
      (2L, "bored gear", "Brand#1", "ECONOMY", 5, 1.0),
      (3L, "blue bolt", "Brand#1", "ECONOMY", 5, 1.0)
    ).toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
    val ord = ordersDF(Seq(
      (1L, 1L, "O", 1.0, ts("1995-03-01 00:00:00"), "3-MEDIUM"),
      (2L, 1L, "O", 1.0, ts("1996-03-01 00:00:00"), "3-MEDIUM")))
    val li = lineitemDF(Seq(
      (1L, 1L, 1L, 1, 3.0, 10.0, 0.1, 0.0, "N", "O", ts("1995-03-05 00:00:00")),
      (1L, 2L, 1L, 2, 2.0, 5.0, 0.0, 0.0, "N", "O", ts("1995-03-05 00:00:00")),
      (2L, 3L, 1L, 1, 1.0, 999.0, 0.0, 0.0, "N", "O", ts("1996-03-05 00:00:00")),
      (2L, 1L, 2L, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", ts("1996-03-05 00:00:00"))))
    val d = fixtureDir("nation" -> nat, "supplier" -> sup, "part" -> part,
      "orders" -> ord, "lineitem" -> li)
    val got = Tpch.q9Shape(spark, d).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getLong(3))).toSeq
    // s1 1995: (10*0.9 - 2*3) + (5*1 - 1*2) = 3 + 3 = 6 over 2 lines
    // s2 1996: 1 - 2 = -1
    assert(got == Seq(("NATION_0", 1995, 6.0, 2L), ("NATION_1", 1996, -1.0, 1L)))
  }
}
